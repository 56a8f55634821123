package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.{EntityRes, Geo}

/** Linkage operators — joining rows by CLOSENESS rather than
  * equality, made shuffle-scalable by key engineering: fuzzy entity
  * resolution via blocking (q165) and planar proximity join via
  * grid cells (q168). Both confine the quadratic comparison to small
  * buckets and replay bit-identically in the oracle.
  */
object Linkage {

  /** q165 — blocked entity resolution ([[graft.operators
    * .EntityRes.resolve]]): part records plus two planted dirty
    * copies per eligible part (an in-word character substitution at
    * a key-dependent position ≥ 5, and a pluralized suffix) resolve
    * back to entities via distinct-name collapse → prefix-4 blocks →
    * levenshtein ≤ 2 → transitive closure. The digest pins cluster
    * membership exactly (count, record sum, name-id sum, canonical
    * name per entity). The oracle re-derives the same graph and
    * closes it with a recursive CTE. */
  val q165 = Qry(
    "q165_entity_resolution",
    (s: SparkSession, d: String) => {
      val p = Tables.part(s, d)
      val base = p.selectExpr("p_partkey AS rec_id", "p_name AS name")
      val typo = p.filter(col("p_partkey") % 3 === 0).selectExpr(
        "p_partkey + 1000000 AS rec_id",
        """concat(
             substring(p_name, 1,
               4 + pmod(p_partkey, length(p_name) - 4)),
             'x',
             substring(p_name,
               6 + pmod(p_partkey, length(p_name) - 4))) AS name""")
      val plural = p.filter(col("p_partkey") % 5 === 0).selectExpr(
        "p_partkey + 2000000 AS rec_id",
        "concat(p_name, 's') AS name")
      val records = base.unionByName(typo).unionByName(plural)
      EntityRes.resolve(records, "rec_id", "name",
          blockPrefix = 4, maxDist = 2)
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_names"),
          sum(col("n_recs")).as("n_records"),
          sum(col("name_id")).as("sum_name_id"),
          min(col("name")).as("canonical"))
        .orderBy(col("entity_id"))
    },
    Some("""
      WITH RECURSIVE recs AS (
        SELECT p_partkey AS rec_id, p_name AS name FROM part
        UNION ALL
        SELECT p_partkey + 1000000,
               substr(p_name, 1,
                 4 + (p_partkey % (length(p_name) - 4)))
               || 'x' ||
               substr(p_name,
                 6 + (p_partkey % (length(p_name) - 4)))
        FROM part WHERE p_partkey % 3 = 0
        UNION ALL
        SELECT p_partkey + 2000000, p_name || 's'
        FROM part WHERE p_partkey % 5 = 0),
      names AS (
        SELECT name, MIN(rec_id) AS name_id, COUNT(*) AS n_recs
        FROM recs GROUP BY name),
      edges AS (
        SELECT l.name_id AS a, r.name_id AS b
        FROM names l JOIN names r
          ON substr(l.name, 1, 4) = substr(r.name, 1, 4)
         AND l.name_id < r.name_id
         AND levenshtein(l.name, r.name) <= 2),
      sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION SELECT b, a FROM edges),
      walk AS (
        SELECT name_id AS id, name_id AS label FROM names
        UNION
        SELECT e.dst, w.label FROM walk w JOIN sym e ON e.src = w.id),
      comp AS (SELECT id, MIN(label) AS entity_id FROM walk GROUP BY id)
      SELECT c.entity_id, COUNT(*) AS n_names,
             CAST(SUM(n.n_recs) AS BIGINT) AS n_records,
             CAST(SUM(n.name_id) AS BIGINT) AS sum_name_id,
             MIN(n.name) AS canonical
      FROM names n JOIN comp c ON c.id = n.name_id
      GROUP BY c.entity_id ORDER BY c.entity_id"""))

  /** q168 — grid-cell proximity join ([[graft.operators
    * .Geo.proximityPairs]]): deterministic integer points derived
    * from event ids (md5-avalanche 16-bit coordinates onto a
    * 10000×10000 plane — a linear mix here is degenerate, its
    * lattice lines leave no close pairs at small sf), all pairs
    * within radius 60 via 64-unit cells, digested per probe-side
    * cell column (pair count, distance and id sums pin every pair).
    * The oracle builds the identical candidate set with a ±1-cell
    * range join and the same exact integer distance test. */
  val q168 = Qry(
    "q168_geo_proximity",
    (s: SparkSession, d: String) => {
      val pts = Tables.events(s, d).selectExpr(
        "event_id AS id",
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 4)," +
          " 16, 10) AS BIGINT) % 10000 AS x",
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 5, 4)," +
          " 16, 10) AS BIGINT) % 10000 AS y")
      Geo.proximityPairs(pts, "id", "x", "y",
          cellSize = 64L, r2 = 3600L)
        .withColumn("cx", expr("ax div 64"))
        .groupBy(col("cx"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("d2")).as("sum_d2"),
          sum(col("a")).as("sum_a"), sum(col("b")).as("sum_b"))
        .orderBy(col("cx"))
    },
    Some(s"""
      WITH pts AS (
        SELECT event_id AS id,
               ${Q.md5Hex16Sql("event_id", 1)} % 10000 AS x,
               ${Q.md5Hex16Sql("event_id", 5)} % 10000 AS y
        FROM events),
      cells AS (
        SELECT id, x, y, x // 64 AS cx, y // 64 AS cy FROM pts),
      pairs AS (
        SELECT a.id AS a, b.id AS b, a.cx,
               (a.x - b.x) * (a.x - b.x) +
               (a.y - b.y) * (a.y - b.y) AS d2
        FROM cells a JOIN cells b
          ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         AND a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) +
              (a.y - b.y) * (a.y - b.y) <= 3600)
      SELECT cx, COUNT(*) AS n_pairs,
             CAST(SUM(d2) AS BIGINT) AS sum_d2,
             CAST(SUM(a) AS BIGINT) AS sum_a,
             CAST(SUM(b) AS BIGINT) AS sum_b
      FROM pairs GROUP BY cx ORDER BY cx"""))

  /** q209 — edit-distance-1 similarity join
    * ([[graft.operators.EntityRes.editDistance1Pairs]]): the
    * deletion-neighborhood (FastSS/SymSpell) blocking scheme on
    * customer names — every single-typo pair is found by an
    * equi-join on delete-one-char variants, then verified with exact
    * Levenshtein. The oracle does NOT replay the blocking: it runs
    * the brute-force all-pairs Levenshtein, so a lost candidate
    * (wrong variant generation, off-by-one substring) breaks
    * rows_match — the zero-false-negative property is verified
    * against ground truth (the q203 auditing pattern). Fixture:
    * sequential customer names differ in exactly one digit, so the
    * ED-1 pair set is dense and position-diverse. */
  val q209 = Qry(
    "q209_edjoin",
    (s: SparkSession, d: String) =>
      graft.operators.EntityRes.editDistance1Pairs(
          Tables.customer(s, d).filter(col("c_custkey") < 60),
          "c_custkey", "c_name")
        .orderBy(col("a"), col("b")),
    Some("""
      WITH c AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey < 60)
      SELECT a.id AS a, b.id AS b,
             CAST(levenshtein(a.s, b.s) AS BIGINT) AS ed
      FROM c a JOIN c b ON a.id < b.id
      WHERE levenshtein(a.s, b.s) <= 1
      ORDER BY a, b"""))

  /** q212 — edit-distance ≤ 2 similarity join
    * ([[graft.operators.EntityRes.editDistance2Pairs]]): the k = 2
    * deletion-neighborhood instance — a two-typo pair (two digit
    * substitutions in the sequential customer names) must still
    * block together. Same auditing posture as q209: the oracle is
    * the brute-force all-pairs Levenshtein ground truth, so any lost
    * candidate (missing delete-two variant, wrong substring bounds)
    * breaks rows_match — the zero-false-negative property of the
    * ≤2-deletion block is verified, not replayed. The id band is
    * wider than q209's so cross-magnitude names (one digit vs two)
    * exercise the insert+substitute mixed alignments. */
  val q212 = Qry(
    "q212_edjoin2",
    (s: SparkSession, d: String) =>
      graft.operators.EntityRes.editDistance2Pairs(
          Tables.customer(s, d).filter(col("c_custkey") < 120),
          "c_custkey", "c_name")
        .orderBy(col("a"), col("b")),
    Some("""
      WITH c AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey < 120)
      SELECT a.id AS a, b.id AS b,
             CAST(levenshtein(a.s, b.s) AS BIGINT) AS ed
      FROM c a JOIN c b ON a.id < b.id
      WHERE levenshtein(a.s, b.s) <= 2
      ORDER BY a, b"""))

  /** q214 — sorted-neighborhood blocking
    * ([[graft.operators.EntityRes.sortedNeighborhoodPairs]], w = 5)
    * over the FULL customer table by name: the positional-window
    * complement to the q209/q212 variant blocks — candidate count is
    * exactly (w−1)·n by construction regardless of key skew. The
    * digest groups the window pairs by rank distance and hashes pair
    * counts, id sums, and how many candidates verify at ED ≤ 1 —
    * any rank off-by-one (wrong offsets, a dropped partition
    * boundary, a duplicated bucket pair) moves a count. The oracle
    * computes ranks with a plain ROW_NUMBER and a rank-band join —
    * independent of the distributed offset/bucket mechanics it
    * audits. */
  val q214 = Qry(
    "q214_sorted_neighborhood",
    (s: SparkSession, d: String) =>
      graft.operators.EntityRes.sortedNeighborhoodPairs(
          Tables.customer(s, d), "c_custkey", "c_name", w = 5)
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a")).as("sum_a"),
          sum(col("b")).as("sum_b"),
          sum(when(levenshtein(col("key_a"), col("key_b")) <= 1, 1L)
            .otherwise(0L)).as("n_ed1"))
        .orderBy(col("dist")),
    Some("""
      WITH r AS (
        SELECT c_custkey AS id, c_name AS key,
               ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rk
        FROM customer),
      p AS (
        SELECT a.id AS a, b.id AS b, b.rk - a.rk AS dist,
               levenshtein(a.key, b.key) AS ed
        FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk < 5)
      SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(a) AS BIGINT) AS sum_a,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(SUM(CASE WHEN ed <= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ed1
      FROM p GROUP BY 1 ORDER BY dist"""))

  val all: Seq[Qry] = Seq(q165, q168, q209, q212, q214)
}
