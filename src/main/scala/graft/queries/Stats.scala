package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import Q._

/** Statistical / product-analytics queries: exact-moment correlation
  * and regression, weekly retention cohorts, and co-occurrence
  * (market-basket) pairs.
  *
  * The correlation trick is the cross-engine determinism key: naive
  * corr()/regr_slope() accumulate doubles in engine-specific order
  * and never hash-match. Instead BOTH engines compute the five raw
  * moments EXACTLY (decimal sums via [[Q.dsum]] — associativity-
  * free), then derive corr/slope/intercept with an identical IEEE
  * double expression. Exact in, deterministic out.
  */
object Stats {

  /** Pearson correlation + least-squares fit of extendedprice on
    * quantity per returnflag, from exact decimal moments. One pass
    * over the three projected columns, [[graft.Tables.fanOut]]-
    * spread so the decimal moment math parallelizes off a narrow
    * local scan (identity at scale); the derived statistics are
    * per-group scalar math. */
  val q88 = Qry(
    "q88_corr_regression",
    (s: SparkSession, d: String) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val m = Tables.fanOut(Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dsum(x, 2).as("sx"), dsum(y, 2).as("sy"),
          dsum(x * y, 4).as("sxy"),
          dsum(x * x, 4).as("sxx"),
          dsum(y * y, 4).as("syy"))
      val nn = col("n").cast("double")
      val cov = nn * col("sxy") - col("sx") * col("sy")
      val vx = nn * col("sxx") - col("sx") * col("sx")
      val vy = nn * col("syy") - col("sy") * col("sy")
      val slope = cov / vx
      m.select(col("l_returnflag"), col("n"),
          r6(cov / sqrt(vx * vy)).as("corr_qty_price"),
          r6(slope).as("slope"),
          r6((col("sy") - slope * col("sx")) / nn).as("intercept"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag, COUNT(*) AS n,
               ${dsumSql("l_quantity", 2)} AS sx,
               ${dsumSql("l_extendedprice", 2)} AS sy,
               ${dsumSql("l_quantity * l_extendedprice", 4)} AS sxy,
               ${dsumSql("l_quantity * l_quantity", 4)} AS sxx,
               ${dsumSql("l_extendedprice * l_extendedprice", 4)} AS syy
        FROM lineitem GROUP BY l_returnflag),
      dm AS (
        SELECT l_returnflag, n,
               CAST(n AS DOUBLE) * sxy - sx * sy AS cov,
               CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
               CAST(n AS DOUBLE) * syy - sy * sy AS vy,
               sx, sy
        FROM m)
      SELECT l_returnflag, n,
             ${r6Sql("cov / sqrt(vx * vy)")} AS corr_qty_price,
             ${r6Sql("cov / vx")} AS slope,
             ${r6Sql("(sy - (cov / vx) * sx) / CAST(n AS DOUBLE)")}
               AS intercept
      FROM dm ORDER BY l_returnflag"""))

  /** Weekly retention cohorts (product-analytics staple): users
    * cohorted by first-event week (week index from the corpus epoch
    * 2024-01-01, a Monday — pure day arithmetic, no engine calendar
    * semantics), counted if active k weeks later. The stream is
    * first thinned to a deterministic 2% md5-bucket sample of
    * events — the dense fixture has every user active from day one,
    * which degenerates to a single cohort (and sampled-cohort
    * analysis is itself the realistic shape over a full event
    * firehose). Two shuffles: first-event per user, then the cohort
    * rollup of the distinct (user, week) activity grid. */
  val q89 = Qry(
    "q89_retention_cohorts",
    (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
        .filter(graft.operators.Splits.hashBucket(col("event_id")) < 2)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("d")).as("fd"))
      val grid = ev.join(first, Seq("user_id"))
        .select(col("user_id"),
          floor(datediff(col("d"), col("fd")) / 7).cast("int").as("wk"),
          floor(datediff(col("fd"), lit("2024-01-01").cast("date")) / 7)
            .cast("int").as("cohort"))
        .distinct()
      def active(k: Int) =
        countDistinct(when(col("wk") === k, col("user_id")))
          .as(s"w$k")
      grid.groupBy(col("cohort"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          active(1), active(2), active(3))
        .orderBy(col("cohort"))
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events
        WHERE ${bucketSql("event_id")} < 2),
      f AS (SELECT user_id, MIN(d) AS fd FROM ev GROUP BY user_id),
      grid AS (
        SELECT DISTINCT ev.user_id,
               CAST(FLOOR(date_diff('day', fd, d) / 7.0) AS INTEGER)
                 AS wk,
               CAST(FLOOR(date_diff('day', DATE '2024-01-01', fd) / 7.0)
                 AS INTEGER) AS cohort
        FROM ev JOIN f ON ev.user_id = f.user_id)
      SELECT cohort,
             COUNT(DISTINCT user_id) AS n_users,
             COUNT(DISTINCT CASE WHEN wk = 1 THEN user_id END) AS w1,
             COUNT(DISTINCT CASE WHEN wk = 2 THEN user_id END) AS w2,
             COUNT(DISTINCT CASE WHEN wk = 3 THEN user_id END) AS w3
      FROM grid GROUP BY cohort ORDER BY cohort"""))

  /** Co-purchase pairs (market-basket co-occurrence): top-20 part
    * pairs by number of orders containing both. The classic
    * frequent-itemset first pass, built with the one-shuffle
    * [[graft.operators.Graph.coOccurrencePairs]] set expansion
    * (collect_set per order absorbs the (order, part) dedup and the
    * p1 < p2 pairs expand map-side — baskets are bounded, so the
    * per-group expansion is too), then count + top-k with a full
    * deterministic tiebreak. */
  val q90 = Qry(
    "q90_copurchase_pairs",
    (s: SparkSession, d: String) => {
      graft.operators.Graph.coOccurrencePairs(
          Tables.lineitem(s, d), "l_orderkey", "l_partkey")
        .select(col("src").as("p1"), col("dst").as("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    },
    Some("""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem),
      p AS (
        SELECT a.pk AS p1, b.pk AS p2
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk)
      SELECT p1, p2, COUNT(*) AS n_orders
      FROM p GROUP BY p1, p2
      ORDER BY n_orders DESC, p1, p2 LIMIT 20"""))

  /** Shared k-means E-step for [[q92]]/[[q93]]: every vector
    * assigned to its nearest of the 8 seed centroids (the first
    * eight vectors) by squared L2. Scale shape: centroids broadcast,
    * distances map-side through the codegen'd `vec_dot` kernel as
    * ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩ (the interpreted fold-of-squared-
    * differences HOF was 4× slower), argmin via partial-aggregable
    * min(struct(dist, cid)) — no window sort, one groupBy shuffle of
    * N pre-combined rows. first(embedding) is safe: the group key is
    * vec_id, so every row in the group carries the same embedding
    * (and Catalyst prunes it for consumers that don't use it).
    * @return (vec_id, cid, dist, emb) */
  private def kmeansAssigned(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val c = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    def vd(a: Column, b: Column) = call_function("vec_dot", a, b)
    def d2(a: Column, b: Column) =
      vd(a, a) - lit(2.0) * vd(a, b) + vd(b, b)
    e.crossJoin(broadcast(c))
      .withColumn("dist", d2(col("embedding"), col("cemb")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"),
        first(col("embedding")).as("emb"))
      .select(col("vec_id"), col("m.cid").as("cid"),
        col("m.dist").as("dist"), col("emb"))
  }

  /** DuckDB mirror of [[kmeansAssigned]]: CTE chain ending in
    * `a` (filter `rn = 1` for the winning assignment). */
  private def kmeansAssignedSql: String = s"""c AS (
        SELECT vec_id AS cid, embedding AS cemb
        FROM embeddings WHERE vec_id < 8),
      d AS (
        SELECT e.vec_id, c.cid, e.embedding,
               ${SimilarityQ.dotSql("e.embedding", "e.embedding")}
               - 2.0 * ${SimilarityQ.dotSql("e.embedding", "c.cemb")}
               + ${SimilarityQ.dotSql("c.cemb", "c.cemb")} AS dist
        FROM embeddings e CROSS JOIN c),
      a AS (
        SELECT vec_id, cid, embedding, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY dist, cid) AS rn
        FROM d)"""

  /** The k-means E-step report: cluster sizes, member-id checksum,
    * and inertia. Determinism: both engines run the same
    * left-to-right dot fold and combine with an identical double
    * expression; inertia is snapped per-row to integer micro-units
    * (floor(dist·1e6+0.5) — dist is a CONTINUOUS double, where
    * engine round() half-tie modes could diverge; see the
    * [[Q.r6]] rule) and summed exactly. */
  val q92 = Qry(
    "q92_kmeans_assign",
    (s: SparkSession, d: String) =>
      kmeansAssigned(s, d)
        .select(col("vec_id"), col("cid"),
          floor(col("dist") * lit(1e6) + lit(0.5)).as("dm"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_assigned"),
          sum(col("vec_id")).as("id_checksum"),
          sum(col("dm")).as("im"))
        .select(col("cid").as("cluster_id"), col("n_assigned"),
          col("id_checksum"),
          (col("im").cast("double") / lit(1e6)).as("inertia"))
        .orderBy(col("cluster_id")),
    Some(s"""
      WITH $kmeansAssignedSql,
      mm AS (
        SELECT vec_id, cid, FLOOR(dist * 1e6 + 0.5) AS dm
        FROM a WHERE rn = 1)
      SELECT cid AS cluster_id, COUNT(*) AS n_assigned,
             CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
             CAST(SUM(dm) AS DOUBLE) / 1e6 AS inertia
      FROM mm GROUP BY cid ORDER BY cid"""))

  /** The k-means M-step completing [[q92]]'s Lloyd iteration: after
    * assigning every vector to its nearest of the 8 seed centroids,
    * recompute each centroid as the per-dimension mean of its
    * members (8×64 rows out). Scale shape: the assignment is the
    * q92 plan (broadcast centroids, map-side `vec_dot` distances,
    * partial-aggregable argmin); the update posexplodes members
    * map-side and partially aggregates per (cluster, dim) — the
    * shuffle carries only k·dim pre-combined rows per partition,
    * never raw vectors. Determinism: each element is snapped to
    * integer micro-units (floor(x·1e6+0.5) — exact IEEE ops on the
    * exactly-widened float) BEFORE summing, so the cross-engine sum
    * is integer-exact and the mean is one identical double division
    * chain. first(embedding) is safe: the group key is vec_id, so
    * every row in the group carries the same embedding. */
  val q93 = Qry(
    "q93_kmeans_update",
    (s: SparkSession, d: String) => {
      kmeansAssigned(s, d)
        .select(col("cid"),
          posexplode(col("emb")).as(Seq("i", "x")))
        .select(col("cid"), (col("i") + 1).cast("long").as("dim"),
          floor(col("x").cast("double") * lit(1e6) + lit(0.5)).as("xm"))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n_members"), sum(col("xm")).as("sm"))
        .select(col("cid").as("cluster_id"), col("dim"),
          col("n_members"),
          r6(col("sm").cast("double") / lit(1e6)
            / col("n_members").cast("double")).as("c_new"))
        .orderBy(col("cluster_id"), col("dim"))
    },
    Some(s"""
      WITH $kmeansAssignedSql,
      m AS (
        SELECT cid, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM a WHERE rn = 1),
      mm AS (
        SELECT cid, dim,
               FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS xm
        FROM m)
      SELECT cid AS cluster_id, dim,
             COUNT(*) AS n_members,
             ${r6Sql(
               "CAST(SUM(xm) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE)")}
               AS c_new
      FROM mm GROUP BY cid, dim ORDER BY cid, dim"""))

  /** Semantic dedup (SemDeDup-style): assign every vector to its
    * nearest seed centroid (the q92 E-step plan), then inside each
    * cluster drop every vector that has a LOWER-id neighbor within
    * the cosine threshold — keep-min-id, the deterministic variant
    * of SemDeDup's keep-one-per-ε-ball.
    *
    * Scale shape: this is the whole point of the clustering step —
    * the pairwise cosine join runs WITHIN-CLUSTER only (equi-join on
    * cluster id), turning an all-pairs O(N²) corpus problem into
    * Σ|cluster|², with k as the granularity dial; norms are computed
    * once per ROW before the join (never per pair), and the pair
    * side carries only (id, vec, norm). Bounded to vec_id < 300 so
    * the oracle's list-fold cosines stay cheap — the Spark plan is
    * the unbounded shape.
    *
    * Determinism: cos = dot/(√⟨a,a⟩·√⟨b,b⟩) is one identical IEEE
    * chain in both engines (the `vec_dot` kernel and DuckDB's
    * list_reduce both fold left-to-right), snapped via round(·,6)
    * BEFORE the threshold compare so a boundary pair can't diverge. */
  val q101 = Qry(
    "q101_semantic_dedup",
    (s: SparkSession, d: String) => {
      def vd(a: Column, b: Column) = call_function("vec_dot", a, b)
      val a = kmeansAssigned(s, d).filter(col("vec_id") < 300)
        .select(col("vec_id"), col("cid"), col("emb"),
          sqrt(vd(col("emb"), col("emb"))).as("nrm"))
      val l = a.select(col("cid"), col("vec_id").as("a"),
        col("emb").as("ea"), col("nrm").as("na"))
      val r = a.select(col("cid"), col("vec_id").as("b"),
        col("emb").as("eb"), col("nrm").as("nb"))
      val dropped = l.join(r, Seq("cid"))
        .filter(col("a") < col("b"))
        .select(col("b"),
          round(vd(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
            .as("cos"))
        .filter(col("cos") >= 0.35)
        .select(col("b")).distinct()
        .withColumn("dr", lit(1L))
      a.join(dropped, a("vec_id") === dropped("b"), "left")
        .select(col("cid"), col("vec_id"),
          coalesce(col("dr"), lit(0L)).as("dr"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("dr")).as("n_dropped"),
          sum(when(col("dr") === 0L, col("vec_id"))).as("kept_checksum"))
        .select(col("cid").as("cluster_id"), col("n_members"),
          col("n_dropped"), col("kept_checksum"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""
      WITH $kmeansAssignedSql,
      nn AS (
        SELECT vec_id, cid, embedding,
               sqrt(${SimilarityQ.dotSql("embedding", "embedding")}) AS nrm
        FROM a WHERE rn = 1 AND vec_id < 300),
      dropped AS (
        SELECT DISTINCT r.vec_id AS b
        FROM nn l JOIN nn r ON l.cid = r.cid AND l.vec_id < r.vec_id
        WHERE ROUND(${SimilarityQ.dotSql("l.embedding", "r.embedding")}
                / (l.nrm * r.nrm), 6) >= 0.35),
      flagged AS (
        SELECT cid, vec_id,
               CASE WHEN b IS NULL THEN 0 ELSE 1 END AS dr
        FROM nn LEFT JOIN dropped ON nn.vec_id = dropped.b)
      SELECT cid AS cluster_id, COUNT(*) AS n_members,
             CAST(SUM(dr) AS BIGINT) AS n_dropped,
             CAST(SUM(CASE WHEN dr = 0 THEN vec_id END) AS BIGINT)
               AS kept_checksum
      FROM flagged GROUP BY cid ORDER BY cid"""))

  /** q170 — percentile sketch audit (the q134 in-band contract for
    * QUANTILE sketches): exact discrete p25/p50/p75 of cent-snapped
    * values per event_type, hashed, plus a boolean per percentile
    * checking each engine's OWN approximate-quantile sketch (Spark
    * `percentile_approx` / DuckDB `approx_quantile`) lands within a
    * 2%-of-n rank band of the exact target. Sketch internals differ
    * by engine, so only the band verdict is cross-checked — the
    * exact values gate bit-for-bit.
    *
    * Scale shape: the exact side never globally sorts — it runs on
    * the (type, value) FREQUENCY table (bounded by distinct cents ≈
    * 33k per type, independent of row count), with a cumulative
    * window over those bounded partitions; the q142 rank-free idea
    * applied to percentile extraction. The sketch side is one
    * partial-aggregable pass. */
  val q170 = Qry(
    "q170_percentile_sketch_audit",
    (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val src = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      val freq = src.groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      val totals = freq.groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = freq.withColumn("cum", sum(col("cnt")).over(w))
        .join(broadcast(totals), Seq("event_type"))
      val apx = src.groupBy(col("event_type"))
        .agg(percentile_approx(col("cents"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
          .as("av"))
        .select(col("event_type"), col("av")(0).as("av25"),
          col("av")(1).as("av50"), col("av")(2).as("av75"))
      cum.join(broadcast(apx), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") >= expr("(n + 3) div 4"),
            col("cents"))).as("p25"),
          min(when(col("cum") >= expr("(n + 1) div 2"),
            col("cents"))).as("p50"),
          min(when(col("cum") >= expr("(3 * n + 3) div 4"),
            col("cents"))).as("p75"),
          sum(when(col("cents") <= col("av25"), col("cnt"))
            .otherwise(0L)).as("r25"),
          sum(when(col("cents") <= col("av50"), col("cnt"))
            .otherwise(0L)).as("r50"),
          sum(when(col("cents") <= col("av75"), col("cnt"))
            .otherwise(0L)).as("r75"))
        .select(col("event_type"), col("n"),
          col("p25"), col("p50"), col("p75"),
          (abs(col("r25") - expr("(n + 3) div 4")) <=
            greatest(expr("n div 50"), lit(5L))).as("ok25"),
          (abs(col("r50") - expr("(n + 1) div 2")) <=
            greatest(expr("n div 50"), lit(5L))).as("ok50"),
          (abs(col("r75") - expr("(3 * n + 3) div 4")) <=
            greatest(expr("n div 50"), lit(5L))).as("ok75"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH src AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      freq AS (
        SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM src GROUP BY event_type, cents),
      tot AS (
        SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
        FROM freq GROUP BY event_type),
      cum AS (
        SELECT f.event_type, f.cents, f.cnt, t.n,
               CAST(SUM(f.cnt) OVER (PARTITION BY f.event_type
                 ORDER BY f.cents
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM freq f JOIN tot t USING (event_type)),
      apx AS (
        SELECT event_type,
               CAST(approx_quantile(cents, 0.25) AS BIGINT) AS av25,
               CAST(approx_quantile(cents, 0.50) AS BIGINT) AS av50,
               CAST(approx_quantile(cents, 0.75) AS BIGINT) AS av75
        FROM src GROUP BY event_type),
      agg AS (
        SELECT c.event_type, MAX(c.n) AS n,
               MIN(CASE WHEN cum >= (n + 3) // 4 THEN cents END)
                 AS p25,
               MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
                 AS p50,
               MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN cents END)
                 AS p75,
               CAST(SUM(CASE WHEN cents <= av25 THEN cnt ELSE 0 END)
                 AS BIGINT) AS r25,
               CAST(SUM(CASE WHEN cents <= av50 THEN cnt ELSE 0 END)
                 AS BIGINT) AS r50,
               CAST(SUM(CASE WHEN cents <= av75 THEN cnt ELSE 0 END)
                 AS BIGINT) AS r75
        FROM cum c JOIN apx USING (event_type)
        GROUP BY c.event_type)
      SELECT event_type, n, p25, p50, p75,
             ABS(r25 - (n + 3) // 4) <= GREATEST(n // 50, 5) AS ok25,
             ABS(r50 - (n + 1) // 2) <= GREATEST(n // 50, 5) AS ok50,
             ABS(r75 - (3 * n + 3) // 4) <= GREATEST(n // 50, 5)
               AS ok75
      FROM agg ORDER BY event_type"""))

  /** q174 — association rules (support / confidence / lift) over
    * order baskets: the market-basket mining step above q90's raw
    * pair counts. Directed rules a→b from the symmetric pair counts;
    * all three metrics are nano-snapped single divisions of exact
    * basket counts (lift's cross-product c_a·c_b stays in long
    * range; decimal-widen applies beyond ~3e9-item catalogs). Top 30
    * by lift surface — the high-lift tail is what a recommender
    * actually consumes.
    *
    * Scale shape: basket collapse → one (pair) count shuffle (the
    * q90 path, fan-out bounded by basket size²) + one broadcast-size
    * item-count join; the global top-k is a TakeOrdered, never a
    * full sort. */
  val q174 = Qry(
    "q174_association_rules",
    (s: SparkSession, d: String) => {
      import graft.operators.Graph
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val n = li.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n"))
      val items = li.groupBy(col("pk")).agg(count(lit(1)).as("c"))
      val pairs = Graph.coOccurrencePairs(
          li, "ok", "pk")
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c_ab"))
      // symmetrize map-side from ONE aggregated-pairs subtree: the
      // union-of-flip form plants the whole basket expansion twice in
      // the physical plan and executes it twice (filter pushdown into
      // the legs defeats exchange reuse)
      val rules = pairs.filter(col("c_ab") >= 2)
        .select(explode(array(
          struct(col("src").as("a"), col("dst").as("b"), col("c_ab")),
          struct(col("dst").as("a"), col("src").as("b"),
            col("c_ab")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"),
          col("e.c_ab").as("c_ab"))
      rules
        .join(items.select(col("pk").as("a"), col("c").as("c_a")),
          Seq("a"))
        .join(items.select(col("pk").as("b"), col("c").as("c_b")),
          Seq("b"))
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("c_ab"),
          floor(col("c_ab").cast("double") / col("n").cast("double")
            * lit(1e9) + lit(0.5)).cast("long").as("support_nano"),
          floor(col("c_ab").cast("double") / col("c_a").cast("double")
            * lit(1e9) + lit(0.5)).cast("long").as("conf_nano"),
          floor((col("c_ab") * col("n")).cast("double") /
            (col("c_a") * col("c_b")).cast("double")
            * lit(1e9) + lit(0.5)).cast("long").as("lift_nano"))
        .orderBy(col("lift_nano").desc, col("a"), col("b"))
        .limit(30)
    },
    Some("""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem),
      n AS (SELECT COUNT(DISTINCT ok) AS n FROM li),
      items AS (SELECT pk, COUNT(*) AS c FROM li GROUP BY pk),
      p AS (
        SELECT a.pk AS src, b.pk AS dst, COUNT(*) AS c_ab
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk),
      rules AS (
        SELECT src AS a, dst AS b, c_ab FROM p WHERE c_ab >= 2
        UNION ALL
        SELECT dst, src, c_ab FROM p WHERE c_ab >= 2)
      SELECT r.a, r.b, r.c_ab,
             CAST(floor(CAST(r.c_ab AS DOUBLE) / CAST(n.n AS DOUBLE)
               * 1e9 + 0.5) AS BIGINT) AS support_nano,
             CAST(floor(CAST(r.c_ab AS DOUBLE) / CAST(ia.c AS DOUBLE)
               * 1e9 + 0.5) AS BIGINT) AS conf_nano,
             CAST(floor(CAST(r.c_ab * n.n AS DOUBLE) /
               CAST(ia.c * ib.c AS DOUBLE) * 1e9 + 0.5) AS BIGINT)
               AS lift_nano
      FROM rules r
      JOIN items ia ON ia.pk = r.a
      JOIN items ib ON ib.pk = r.b
      CROSS JOIN n
      ORDER BY lift_nano DESC, r.a, r.b LIMIT 30"""))

  /** q176 — item-item collaborative-filtering neighbors: per-item
    * top-3 by binary-vector cosine c_ab / (√c_a·√c_b) over the
    * basket co-occurrence counts (the "customers who bought X also
    * bought Y" kernel). Distinct shape from q174's global lift cut:
    * a per-key ranking window over the similarity graph, restricted
    * to items appearing in ≥ 8 baskets so the neighborhoods are
    * supported. All inputs exact integers; cosine = one cast, two
    * correctly-rounded sqrts, one division, r6-snapped; rank ties
    * break on the neighbor id.
    *
    * Scale shape: the pair graph comes from the bounded basket
    * expansion (q90 path); the per-item window partitions on the
    * item key — no global sort; the c_a/c_b lookups are broadcast-
    * size joins of the item-count relation. */
  val q176 = Qry(
    "q176_item_neighbors",
    (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val items = li.groupBy(col("pk")).agg(count(lit(1)).as("c"))
      val pairs = graft.operators.Graph.coOccurrencePairs(
          li, "ok", "pk")
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c_ab"))
      // symmetrize map-side from ONE aggregated-pairs subtree (the
      // union-of-flip form executed the whole basket expansion once
      // per leg — the per-leg filter pushdown defeats exchange reuse)
      val sym = pairs.select(explode(array(
          struct(col("src").as("a"), col("dst").as("b"), col("c_ab")),
          struct(col("dst").as("a"), col("src").as("b"),
            col("c_ab")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"),
          col("e.c_ab").as("c_ab"))
      val w = Window.partitionBy(col("a"))
        .orderBy(col("sim").desc, col("b"))
      // support + md5-bucket predicates evaluated per ITEM on the
      // vertex-sized count relation, not per pair row — the md5
      // bucket is ~4 string ops per evaluation, and the old shape
      // ran it on every one of the millions of symmetric pair rows
      val qualB = items.filter(col("c") >= 8)
      val qualA = qualB
        .filter(graft.operators.Splits.hashBucket(col("pk")) < 5)
      sym
        .join(qualA.select(col("pk").as("a"), col("c").as("c_a")),
          Seq("a"))
        .join(qualB.select(col("pk").as("b"), col("c").as("c_b")),
          Seq("b"))
        .withColumn("sim",
          r6(col("c_ab").cast("double") /
            (sqrt(col("c_a").cast("double")) *
             sqrt(col("c_b").cast("double")))))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("a").as("item"), col("rank"),
          col("b").as("neighbor"), col("c_ab"), col("sim"))
        .orderBy(col("item"), col("rank"))
    },
    Some(s"""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem),
      items AS (SELECT pk, COUNT(*) AS c FROM li GROUP BY pk),
      p AS (
        SELECT a.pk AS src, b.pk AS dst, COUNT(*) AS c_ab
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk),
      sym AS (
        SELECT src AS a, dst AS b, c_ab FROM p
        UNION ALL SELECT dst, src, c_ab FROM p),
      scored AS (
        SELECT s.a, s.b, s.c_ab,
               ${r6Sql("""CAST(s.c_ab AS DOUBLE) /
                 (sqrt(CAST(ia.c AS DOUBLE)) *
                  sqrt(CAST(ib.c AS DOUBLE)))""")} AS sim
        FROM sym s
        JOIN items ia ON ia.pk = s.a
        JOIN items ib ON ib.pk = s.b
        WHERE ia.c >= 8 AND ib.c >= 8
          AND ${bucketSql("s.a")} < 5),
      rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY a
          ORDER BY sim DESC, b) AS rank
        FROM scored)
      SELECT a AS item, rank, b AS neighbor, c_ab, sim
      FROM rk WHERE rank <= 3 ORDER BY item, rank"""))

  /** q187 — dominant principal component ([[graft.operators.Pca
    * .topComponent]]): exact d×d covariance in one distributed pass
    * (n·d² expanded rows collapse map-side into d² decimal
    * accumulators), then 4 power iterations — each a d²-matrix ⋈
    * broadcast d-vector matvec with decimal-exact folds — from the
    * all-ones start, renormalized to unit length EVERY round (the
    * eigenvalue here is ~0.02, so the raw iterate would shrink under
    * the rounding scale within rounds). The anisotropy diagnostic for
    * embedding spaces (dominant-direction removal, whitening prep).
    * The oracle replays moments, both triangles of the covariance,
    * all four matvec+normalize rounds; CTEs MATERIALIZED
    * (each matvec references its predecessor through the shared cov
    * relation — inlining would exponentiate the chain). */
  val q187 = Qry(
    "q187_pca_component",
    (s: SparkSession, d: String) => {
      import graft.operators.Pca
      Pca.topComponent(
          Tables.embeddings(s, d).filter(col("vec_id") < 1000),
          "embedding", dim = 64, iters = 4)
        .select(col("pos"), r6(col("loading")).as("loading"))
        .orderBy(col("pos"))
    },
    Some(s"""
      WITH $pcaChainSql
      SELECT pos, ${r6Sql("v")} AS loading
      FROM v4 ORDER BY pos"""))

  /** The q187 oracle's CTE chain (flat → mu → cov → v0..v4: moments,
    * covariance, four normalized power-iteration rounds over the
    * vec_id < 1000 subset) — shared with the q189 debias oracle,
    * which consumes `mu` and `v4`. Every CTE MATERIALIZED: the
    * matvec rounds reference their predecessors through the shared
    * cov relation, and DuckDB's per-reference inlining would
    * exponentiate the chain. */
  private[queries] def pcaChainSql: String = {
    val matvecs = (1 to 4).map { i =>
      s"""w$i AS MATERIALIZED (
          SELECT c.i AS pos,
                 CAST(SUM(CAST(ROUND(c.c * v.v, 9)
                   AS DECIMAL(28,9))) AS DOUBLE) AS v
          FROM cov c JOIN v${i - 1} v ON v.pos = c.j
          GROUP BY 1),
        n$i AS MATERIALIZED (
          SELECT sqrt(CAST(SUM(CAST(ROUND(v * v, 12)
            AS DECIMAL(28,12))) AS DOUBLE)) AS s
          FROM w$i),
        v$i AS MATERIALIZED (
          SELECT pos, v / (SELECT s FROM n$i) AS v FROM w$i)"""
    }.mkString(",\n      ")
    s"""flat AS MATERIALIZED (
        SELECT vec_id, CAST(u[2] AS INT) AS i,
               CAST(u[1] AS DOUBLE) AS x
        FROM (SELECT vec_id,
                     unnest(list_zip(embedding, range(0, 64))) AS u
              FROM embeddings WHERE vec_id < 1000)),
      mu AS MATERIALIZED (
        SELECT i,
               CAST(SUM(CAST(ROUND(x, 7) AS DECIMAL(28,7)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
        FROM flat GROUP BY 1),
      e2 AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(CAST(ROUND(a.x * b.x, 9) AS DECIMAL(28,9)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS e2
        FROM flat a JOIN flat b USING (vec_id) GROUP BY 1, 2),
      cov AS MATERIALIZED (
        SELECT e2.i, e2.j, e2.e2 - mi.m * mj.m AS c
        FROM e2
        JOIN mu mi ON mi.i = e2.i
        JOIN mu mj ON mj.i = e2.j),
      v0 AS (SELECT i AS pos, CAST(1.0 AS DOUBLE) AS v FROM mu),
      $matvecs"""
  }

  /** q232 — robust location stats: 10%-trimmed mean and winsorized
    * sum of extended price (exact cents) per return flag — the
    * outlier-resistant aggregates a metrics pipeline wants when the
    * tail is dirty. Entirely integer: rows rank inside the group,
    * k = n div 10 cut from each side; the trim boundary values
    * (lo = value at rank k+1, hi = at rank n−k) come from
    * conditional min/max over the SAME ranked pass, and the
    * winsorized sum is the closed form trimmed_sum + k·lo + k·hi —
    * no second clamping pass over the data. Rank ties on equal
    * cents are value-interchangeable, so every emitted number is a
    * multiset invariant (tie order can't move the hash).
    *
    * Scale shape (r16, replacing the r14 parallelRank form): the
    * ranks themselves are never needed — every output is a function
    * of the per-group (cents → count) HISTOGRAM and its running
    * prefix (the q245 bounded-domain window contract). A value v
    * with count c and cum-below cb occupies ranks (cb, cb+c], so
    * lo = min v with cb+c > k, hi = max v with cb < n−k, and the
    * trimmed sum is Σ v·(min(cb+c, n−k) − max(cb, k))⁺ — exact
    * integers, identical to the ranked form under value-
    * interchangeable ties. Cost: ONE partial-aggregable shuffle of
    * (flag, cents) pairs + a per-flag window over DISTINCT values
    * (bounded by the cents domain, not the row count — the r14 form
    * range-sorted every row). */
  val q232 = Qry(
    "q232_trimmed_stats",
    (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("cents"))
      val h = base.groupBy(col("l_returnflag"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val nPer = h.groupBy(col("l_returnflag"))
        .agg(sum(col("c")).as("n"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
        .join(broadcast(nPer), Seq("l_returnflag"))
        .withColumn("k", expr("n div 10"))
        .groupBy(col("l_returnflag"))
        .agg(
          max(col("n")).as("n"), max(col("k")).as("k"),
          min(when(col("cb") + col("c") > col("k"), col("cents")))
            .as("lo_cents"),
          max(when(col("cb") < col("n") - col("k"), col("cents")))
            .as("hi_cents"),
          sum(col("cents") * greatest(lit(0L),
            least(col("cb") + col("c"), col("n") - col("k")) -
              greatest(col("cb"), col("k"))))
            .as("trimmed_sum"))
        .select(col("l_returnflag"), col("n"), col("k"),
          col("lo_cents"), col("hi_cents"),
          expr("trimmed_sum div (n - 2 * k)")
            .as("trimmed_mean_cents"),
          (col("trimmed_sum") + col("k") * col("lo_cents") +
            col("k") * col("hi_cents")).as("winsorized_sum_cents"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH c AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS cents,
               l_orderkey, l_linenumber
        FROM lineitem),
      ranked AS (
        SELECT l_returnflag, cents,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                 ORDER BY cents, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM c),
      g AS (
        SELECT l_returnflag,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(n) // 10 AS BIGINT) AS k,
               MIN(CASE WHEN rn > n // 10 THEN cents END) AS lo_cents,
               MAX(CASE WHEN rn <= n - n // 10 THEN cents END)
                 AS hi_cents,
               CAST(SUM(CASE WHEN rn > n // 10
                 AND rn <= n - n // 10 THEN cents END) AS BIGINT)
                 AS trimmed_sum
        FROM ranked GROUP BY l_returnflag)
      SELECT l_returnflag, n, k, lo_cents, hi_cents,
             CAST(trimmed_sum // (n - 2 * k) AS BIGINT)
               AS trimmed_mean_cents,
             CAST(trimmed_sum + k * lo_cents + k * hi_cents
               AS BIGINT) AS winsorized_sum_cents
      FROM g ORDER BY l_returnflag"""))

  /** q245 — Gini concentration of event value per type, exact ppm:
    * how unequally is the metric distributed? From the cents
    * HISTOGRAM (bounded by the value domain, the q234 window
    * contract — never a row-sized sort): with per-value counts and
    * the running count below, the rank-sum B = Σ_v v·(cum_below·cnt
    * + cnt(cnt+1)/2) is an exact integer, and
    * G_ppm = (2B − (n+1)·S)·1e6 div (n·S) (S the value total) — the
    * grouped-data Gini with ties handled exactly. Partitioned
    * windows per type; one histogram shuffle. */
  val q245 = Qry(
    "q245_gini_concentration",
    (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val h = Tables.events(s, d)
        .select(col("event_type").as("seg"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
        .groupBy(col("seg"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("seg")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("below", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .select(col("seg"), col("cnt"), col("v"),
          // Rank-sum term widened BEFORE the multiplies: it is
          // quadratic in tie counts, and DuckDB's window SUM already
          // runs it in HUGEINT — an int64 inner product would wrap
          // silently at scale while the oracle stays exact.
          (col("v").cast("decimal(38,0)") *
            (col("below").cast("decimal(38,0)") * col("cnt") * 2L +
              col("cnt").cast("decimal(38,0)") *
                (col("cnt") + 1L))).as("b2"),
          (col("v").cast("decimal(38,0)") * col("cnt")).as("sv"))
        .groupBy(col("seg"))
        .agg(sum(col("cnt")).as("n"), sum(col("sv")).as("s"),
          sum(col("b2")).as("b2"))
        .select(col("seg"), col("n"), col("s").cast("long").as("s"),
          expr("((b2 - (n + 1) * s) * 1000000)" +
            " div (cast(n as decimal(38,0)) * s)").as("gini_ppm"))
        .orderBy(col("seg"))
    },
    Some("""
      WITH h AS (
        SELECT event_type AS seg,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT seg, v, cnt,
               COALESCE(SUM(cnt) OVER (PARTITION BY seg ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS below
        FROM h),
      a AS (
        SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(CAST(v AS HUGEINT) * cnt) AS HUGEINT) AS s,
               SUM(CAST(v AS HUGEINT) *
                 (below * cnt * 2 + cnt * (cnt + 1))) AS b2
        FROM r GROUP BY seg)
      SELECT seg, n, CAST(s AS BIGINT) AS s,
             CAST(((b2 - (n + 1) * s) * 1000000)
               // (CAST(n AS HUGEINT) * s) AS BIGINT) AS gini_ppm
      FROM a ORDER BY seg"""))

  /** q246 — source-concentration audit of the corpus mix, exact
    * ppm: per language, the Herfindahl-Hirschman index of document
    * sources (Σ share² — is one crawl source dominating the
    * training mix?) and the effective source count 1/HHI as exact
    * integer micro-units. One (lang, source) aggregation; the
    * language rollup is domain-sized. The source-diversity dial a
    * data-mixing decision reads next to q226's temperature quotas. */
  val q246 = Qry(
    "q246_source_concentration",
    (s: SparkSession, d: String) => {
      val c = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("k"))
      c.groupBy(col("lang"))
        .agg(sum(col("k")).as("n_docs"),
          count(lit(1)).as("n_sources"),
          sum(col("k").cast("decimal(38,0)") * col("k")).as("k2"))
        .select(col("lang"), col("n_docs"), col("n_sources"),
          expr("(k2 * 1000000)" +
            " div (cast(n_docs as decimal(38,0)) * n_docs)")
            .as("hhi_ppm"),
          expr("(cast(n_docs as decimal(38,0)) * n_docs * 1000000)" +
            " div k2").as("effective_sources_micro"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH c AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS k
        FROM documents GROUP BY 1, 2),
      a AS (
        SELECT lang, CAST(SUM(k) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               SUM(CAST(k AS HUGEINT) * k) AS k2
        FROM c GROUP BY lang)
      SELECT lang, n_docs, n_sources,
             CAST((k2 * 1000000)
               // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
               AS hhi_ppm,
             CAST((CAST(n_docs AS HUGEINT) * n_docs * 1000000) // k2
               AS BIGINT) AS effective_sources_micro
      FROM a ORDER BY lang"""))

  /** q250 — regression diagnostics with an INTEGER-EXACT fit: the
    * per-flag OLS of price-cents on (integer) quantity is snapped to
    * micro-unit coefficients (slope_micro = cov·1e6 div vx,
    * intercept from it) so every residual
    * y·1e6 − intercept − slope·x is an exact integer — MAE is an
    * integral mean of |residuals|, MSE an exact decimal, and
    * RMSE/R² derive as one shared IEEE double expression at the very
    * end (q88's exact-in/deterministic-out contract extended to the
    * residual pass: no float rounding can enter the hashed columns
    * on any regeneration). Two passes: one moment aggregation, one
    * map-side residual aggregation under a broadcast 3-row fit. */
  val q250 = Qry(
    "q250_regression_diagnostics",
    (s: SparkSession, d: String) => {
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("y"))
      val m = base.groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      val fit = m.select(col("flag"), col("n"), col("sy"),
        col("syy"), col("sx"), col("sxy"), col("sxx"),
        expr("((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)")
          .as("slope_micro"))
        .select(col("flag"), col("n"), col("sy"), col("syy"),
          col("sx"), col("sxy"), col("sxx"), col("slope_micro"),
          expr("(sy * 1000000 - slope_micro * sx) div n")
            .as("intercept_micro"))
      val r = base.join(broadcast(fit), Seq("flag"))
        .select(col("flag"), col("n"), col("sy"), col("syy"),
          col("sx"), col("sxy"), col("sxx"), col("slope_micro"),
          col("intercept_micro"),
          expr("y * 1000000 - intercept_micro - slope_micro * x")
            .as("resid"))
        .groupBy(col("flag"))
        .agg(max(col("n")).as("n"),
          max(col("slope_micro")).as("slope_micro"),
          max(col("intercept_micro")).as("intercept_micro"),
          sum(abs(col("resid")).cast("decimal(38,0)")).as("sae"),
          sum(col("resid").cast("decimal(38,0)") * col("resid"))
            .as("sse"),
          max(col("sx")).as("sx"), max(col("sy")).as("sy"),
          max(col("sxy")).as("sxy"), max(col("sxx")).as("sxx"),
          max(col("syy")).as("syy"))
      val nn = col("n").cast("double")
      val cov = nn * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val vx = nn * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val vy = nn * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")
      r.select(col("flag"), col("n"), col("slope_micro"),
          col("intercept_micro"),
          expr("sae div n").as("mae_micro"),
          (floor(sqrt(col("sse").cast("double") / nn) * lit(1e6)
            + lit(0.5)) / 1e6).as("rmse_micro"),
          r6(cov * cov / (vx * vy)).as("r2"))
        .orderBy(col("flag"))
    },
    Some("""
      WITH base AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS y
        FROM lineitem),
      m AS (
        SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM base GROUP BY flag),
      fit0 AS (
        SELECT *, ((n * sxy - sx * sy) * 1000000)
                 // (n * sxx - sx * sx) AS slope_micro
        FROM m),
      fit AS (
        SELECT *, (sy * 1000000 - slope_micro * sx) // n
                 AS intercept_micro
        FROM fit0),
      r AS (
        SELECT base.flag,
               CAST(y AS HUGEINT) * 1000000 - intercept_micro
                 - slope_micro * x AS resid
        FROM base JOIN fit ON fit.flag = base.flag),
      agg AS (
        SELECT flag, SUM(abs(resid)) AS sae,
               SUM(resid * resid) AS sse
        FROM r GROUP BY flag)
      SELECT fit.flag, n,
             CAST(slope_micro AS BIGINT) AS slope_micro,
             CAST(intercept_micro AS BIGINT) AS intercept_micro,
             CAST(sae // n AS BIGINT) AS mae_micro,
             FLOOR(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE))
               * 1e6 + 0.5) / 1e6 AS rmse_micro,
             FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS r2
      FROM agg JOIN fit ON fit.flag = agg.flag
      ORDER BY fit.flag"""))

  val all: Seq[Qry] =
    Seq(q88, q89, q90, q92, q93, q101, q170, q174, q176, q187, q232,
      q245, q246, q250)
}
