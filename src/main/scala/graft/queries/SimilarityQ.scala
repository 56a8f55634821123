package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Similarity
import Q._

/** Similarity-search queries (SURVEY.md §2.B G14) over `embeddings`
  * driving [[graft.operators.Similarity]]: exact brute-force top-k,
  * random-hyperplane LSH bucketing, IVF coarse search, and
  * embedding-cosine near-dup pairs. The SQL oracles recompute every
  * dot product with the same left-to-right double fold.
  */
object SimilarityQ {

  private val DIM = 64

  /** DuckDB sequential-fold dot product. */
  private[queries] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip($a, $b),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
        (acc, x) -> acc + x)"""

  private[queries] def cosSql(a: String, b: String): String =
    s"""(${dotSql(a, b)} /
         (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"""

  /** DuckDB micro-unit squared L2 — the [[graft.operators.Pq]]
    * snapping form: ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩ then floor(·1e6+0.5). */
  private def d2MicroSql(a: String, b: String): String =
    s"""CAST(FLOOR((${dotSql(a, a)} - 2.0 * ${dotSql(a, b)}
        + ${dotSql(b, b)}) * 1e6 + 0.5) AS BIGINT)"""

  /** CTE chain deriving the PQ codebook `cb` = seed rows (`cb0`)
    * refined by ONE Lloyd M-step ([[graft.operators.Pq.refine]]):
    * assign every sub-vector under cb0, re-estimate each (j, code)
    * centroid as the decimal-exact element mean snapped to REAL,
    * empty cells keep their seed. Shared by the q137/q144 oracles. */
  private def refinedCbSql: String = {
    val eSlice = "e.embedding[cb0.j*16+1:(cb0.j+1)*16]"
    s"""cb0 AS (
        SELECT j, vec_id AS m, embedding[j*16+1:(j+1)*16] AS cvec
        FROM embeddings, (VALUES (0),(1),(2),(3)) t(j)
        WHERE vec_id < 16),
      asg0 AS (
        SELECT e.vec_id, cb0.j, cb0.m,
               ${d2MicroSql(eSlice, "cb0.cvec")} AS dm
        FROM embeddings e CROSS JOIN cb0),
      asg AS (
        SELECT vec_id, j, m AS code FROM (
          SELECT vec_id, j, m,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY dm, m) AS rn
          FROM asg0) WHERE rn = 1),
      elems AS (
        SELECT a.j, a.code,
               unnest(list_zip(e.embedding[a.j*16+1:(a.j+1)*16],
                               range(0, 16))) AS u
        FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id),
      newc AS (
        SELECT j, code, u[2] AS pos,
               CAST(CAST(SUM(CAST(ROUND(CAST(u[1] AS DOUBLE), 7)
                     AS DECIMAL(27,7))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS REAL) AS m
        FROM elems GROUP BY j, code, u[2]),
      newcl AS (
        SELECT j, code, list(m ORDER BY pos) AS cvec
        FROM newc GROUP BY j, code),
      cb AS (
        SELECT cb0.j, cb0.m, COALESCE(n.cvec, cb0.cvec) AS cvec
        FROM cb0 LEFT JOIN newcl n
          ON n.j = cb0.j AND n.code = cb0.m)"""
  }

  /** Exact brute-force top-k cosine neighbors for a small query set —
    * the correctness baseline every ANN path is measured against. */
  val q31 = Qry(
    "q31_cosine_topk",
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      Similarity.topKBrute(
          e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("n_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
      scored AS (
        SELECT q_id, vec_id AS n_id,
               ${cosSql("q_emb", "embedding")} AS cos
        FROM q CROSS JOIN embeddings WHERE q_id <> vec_id),
      ranked AS (
        SELECT q_id, n_id, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id) AS rank
        FROM scored)
      SELECT q_id, rank, n_id, ROUND(cos, 6) AS cos
      FROM ranked WHERE rank <= 3 ORDER BY q_id, rank"""))

  /** Random-hyperplane LSH bucket assignment (8 planes → 256
    * buckets): the scale path that replaces the cross join — at
    * 100 TB the ANN search becomes an equi-join on bucket id. This
    * query verifies the deterministic bucketing end-to-end. */
  val q32 = Qry(
    "q32_ann_lsh_buckets",
    (s: SparkSession, d: String) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          Similarity.lshBucket(col("embedding"), planes = 8, dim = DIM)
            .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_vec"),
          max(col("vec_id")).as("max_vec"))
        .orderBy(col("bucket")),
    Some(s"""
      WITH b AS (SELECT vec_id, ${bucketSql(8)} AS bucket
                 FROM embeddings)
      SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec,
             MAX(vec_id) AS max_vec
      FROM b GROUP BY bucket ORDER BY bucket"""))

  /** DuckDB rendering of [[Similarity.lshBucket]] over the column
    * `embedding` — the same LCG plane weights and sign-bit sum. */
  private def bucketSql(planes: Int): String =
    (0 until planes).map { p =>
      val proj = s"""list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(0, $DIM),
          i -> CAST(embedding[i + 1] AS DOUBLE) *
               (CAST(($p * 131071 + i * 524287) % 1000003 AS DOUBLE)
                  / 1000003.0 - 0.5))),
        (acc, x) -> acc + x)"""
      s"CASE WHEN $proj > 0 THEN ${1 << p} ELSE 0 END"
    }.mkString(" + ")

  /** IVF-style coarse search: per-label centroids (element-wise
    * decimal-exact means), each query probes only its `nprobe`
    * nearest centroids' partitions — nprobe/|partitions| of the work
    * of brute force. nprobe > 1 is the standard recall/cost dial:
    * neighbors just across a partition boundary are found at the
    * price of scanning one more partition. */
  private def ivfQry(name: String, nprobe: Int): Qry = Qry(
    name,
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      val cent = Similarity.centroids(e, "label", "embedding", DIM)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val wCent = Window.partitionBy(col("q_id"))
        .orderBy(col("c_cos").desc, col("part"))
      val assigned = q.crossJoin(broadcast(cent))
        .select(col("q_id"), col("q_emb"), col("part"),
          Similarity.cosine(col("q_emb"), col("centroid")).as("c_cos"))
        .withColumn("rn", row_number().over(wCent))
        .filter(col("rn") <= nprobe)
        .select(col("q_id"), col("q_emb"), col("part"))
      val wTop = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      assigned
        .join(e.select(col("vec_id").as("n_id"), col("label"),
          col("embedding").as("n_emb")), col("part") === col("label"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("part"), col("n_id"),
          Similarity.cosine(col("q_emb"), col("n_emb")).as("cos"))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("part"), col("rank"), col("n_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      WITH expl AS (
        SELECT label, unnest(list_zip(embedding,
                 range(0, len(embedding)))) AS u
        FROM embeddings),
      cent_elem AS (
        SELECT label AS part, u[2] AS pos,
               CAST(SUM(CAST(ROUND(CAST(u[1] AS DOUBLE), 7)
                   AS DECIMAL(27,7))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS m
        FROM expl GROUP BY label, u[2]),
      cent AS (
        SELECT part, list(m ORDER BY pos) AS centroid
        FROM cent_elem GROUP BY part),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb
            FROM embeddings WHERE vec_id < 5),
      assigned AS (
        SELECT q_id, q_emb, part FROM (
          SELECT q_id, q_emb, part,
                 ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                   ${cosSql("q_emb", "centroid")} DESC, part) AS rn
          FROM q CROSS JOIN cent) t
        WHERE rn <= $nprobe),
      scored AS (
        SELECT q_id, part, vec_id AS n_id,
               ${cosSql("q_emb", "embedding")} AS cos
        FROM assigned JOIN embeddings ON part = label
        WHERE q_id <> vec_id),
      ranked AS (
        SELECT q_id, part, n_id, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id) AS rank
        FROM scored)
      SELECT q_id, part, rank, n_id, ROUND(cos, 6) AS cos
      FROM ranked WHERE rank <= 3 ORDER BY q_id, rank"""))

  val q33 = ivfQry("q33_ann_ivf", nprobe = 1)

  /** Multi-probe IVF (nprobe = 2): same plan, one more partition
    * scanned per query, strictly-no-worse recall. */
  val q71 = ivfQry("q71_ann_ivf_multiprobe", nprobe = 2)

  /** Embedding-cosine near-dup pairs (G13's vector-space variant):
    * all pairs in a bounded subset with cosine above threshold. */
  val q34 = Qry(
    "q34_embed_neardup",
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val l = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      val r = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
      l.crossJoin(r).filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          round(Similarity.cosine(col("ea"), col("eb")), 6).as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding FROM embeddings
                 WHERE vec_id < 200)
      SELECT l.vec_id AS a, r.vec_id AS b,
             ROUND(${cosSql("l.embedding", "r.embedding")}, 6) AS cos
      FROM e l JOIN e r ON l.vec_id < r.vec_id
      WHERE ROUND(${cosSql("l.embedding", "r.embedding")}, 6) >= 0.3
      ORDER BY a, b"""))

  /** Retrieval evaluation (q113): score the LSH ANN path against
    * brute-force ground truth INSIDE the engine — per query,
    * recall@10 (approx top-10 ∩ exact top-10) and the reciprocal
    * rank of the first relevant hit (the MRR contribution). The
    * eval harness every ANN deployment needs, expressed as joins
    * and windows; the oracle re-derives both rankings and both
    * metrics independently.
    *
    * 4 planes (16 buckets) rather than q32's 8 keep per-bucket
    * candidate lists non-trivial at the test corpus size — recall
    * is genuinely < 1 for some queries, so the metric arithmetic
    * (missing hits, empty-candidate guards) is actually exercised.
    *
    * Scale shape: ground truth is the bounded-|Q| broadcast cross
    * join (the documented q31 contract); the system under test is
    * the bucket equi-join. Metrics are two small aggregates over
    * ≤ 10·|Q| rows. */
  val q113 = Qry(
    "q113_retrieval_eval",
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      val exact = Similarity.topKBrute(
          e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
          k = 10)
        .select(col("q_id"), col("n_id"))
      val bucketed = e.select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), planes = 4, dim = DIM)
          .as("bucket"))
      val qs = bucketed.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"), col("bucket"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      val approx = broadcast(qs)
        .join(bucketed.select(col("vec_id").as("n_id"),
          col("embedding").as("n_emb"), col("bucket")), Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("q_emb"), col("n_emb")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
      val hits = approx.join(exact, Seq("q_id", "n_id"))
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_hits"),
          min(col("rank")).as("first_hit"))
      val nCand = approx.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_cand"))
      qs.select(col("q_id")).distinct()
        .join(nCand, Seq("q_id"), "left")
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          r6(coalesce(col("n_hits"), lit(0L)).cast("double") / 10.0)
            .as("recall_at_10"),
          r6(when(col("first_hit").isNull, lit(0.0))
            .otherwise(lit(1.0) / col("first_hit").cast("double")))
            .as("rr"))
        .orderBy(col("q_id"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
      ex0 AS (
        SELECT q_id, vec_id AS n_id,
               ${cosSql("q_emb", "embedding")} AS cos
        FROM q CROSS JOIN embeddings WHERE q_id <> vec_id),
      ex AS (
        SELECT q_id, n_id FROM (
          SELECT q_id, n_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, n_id) AS rank
          FROM ex0)
        WHERE rank <= 10),
      b AS (SELECT vec_id, embedding, ${bucketSql(4)} AS bucket
            FROM embeddings),
      ap0 AS (
        SELECT qb.q_id, cb.vec_id AS n_id,
               ${cosSql("qb.q_emb", "cb.embedding")} AS cos
        FROM (SELECT vec_id AS q_id, embedding AS q_emb, bucket
              FROM b WHERE vec_id < 10) qb
        JOIN b cb USING (bucket)
        WHERE qb.q_id <> cb.vec_id),
      ap AS (
        SELECT q_id, n_id, rank FROM (
          SELECT q_id, n_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, n_id) AS rank
          FROM ap0)
        WHERE rank <= 10),
      hits AS (
        SELECT ap.q_id, COUNT(*) AS n_hits, MIN(ap.rank) AS first_hit
        FROM ap JOIN ex USING (q_id, n_id) GROUP BY ap.q_id),
      ncand AS (SELECT q_id, COUNT(*) AS n_cand FROM ap GROUP BY q_id)
      SELECT qq.q_id,
             COALESCE(n_cand, 0) AS n_cand,
             COALESCE(n_hits, 0) AS n_hits,
             ${r6Sql("CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10.0")}
               AS recall_at_10,
             ${r6Sql("CASE WHEN first_hit IS NULL THEN 0.0 " +
        "ELSE 1.0 / CAST(first_hit AS DOUBLE) END")} AS rr
      FROM (SELECT DISTINCT q_id FROM q) qq
      LEFT JOIN ncand USING (q_id)
      LEFT JOIN hits USING (q_id)
      ORDER BY qq.q_id"""))

  /** q137 — product-quantization ADC ANN ([[graft.operators.Pq]]):
    * 64-dim vectors PQ-encoded as 4 sub-space codes against seed-row
    * codebooks refined by ONE Lloyd M-step ([[graft.operators.Pq
    * .refine]] — the k-means half the seed construction skipped;
    * centroids move to their cells' decimal-exact means. Measured on
    * this corpus: recall@10 0.32 → 0.34; a config/iteration sweep
    * (subs ∈ {4,8}, k ∈ {16,32,64}, ≤3 Lloyd steps) stays in
    * 0.26-0.36, i.e. recall here is bounded by the near-random
    * synthetic embeddings, not the codebook — see NOTES_r7); 5 query
    * vectors ranked over the WHOLE corpus purely from their
    * broadcast lookup tables (no per-candidate vector math), with
    * each estimated-top-10 row marked against the exact squared-L2
    * top-10 (`hit`). The oracle re-derives seed codebooks, the Lloyd
    * step, codes, LUTs, the ADC ranking, and the exact ranking from
    * the raw embeddings. All distances snap to integer micro-units
    * before argmin/sum/rank — tie-proof in both engines. */
  val q137 = Qry(
    "q137_pq_adc_ann",
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      val cb0 = graft.operators.Pq.codebook(
        e, "vec_id", "embedding", subs = 4, subDim = 16, k = 16)
      val cb = graft.operators.Pq.refine(
        e, "vec_id", "embedding", cb0, subDim = 16)
      val enc = graft.operators.Pq.encode(
        e, "vec_id", "embedding", cb, subDim = 16)
      val q = e.filter(col("vec_id") < 5)
      val est = graft.operators.Pq.adcTopK(
        q, "vec_id", "embedding", enc, "vec_id", cb, subDim = 16, k = 10)
      val exact = graft.operators.Pq.exactTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding", k = 10)
      est.join(
          exact.select(col("q_id"), col("n_id"), lit(true).as("hit")),
          Seq("q_id", "n_id"), "left")
        .select(col("q_id"), col("rank"), col("n_id"),
          (col("est_micro").cast("double") / lit(1e6)).as("est_d2"),
          coalesce(col("hit"), lit(false)).as("hit"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      val eSlice = "e.embedding[cb.j*16+1:(cb.j+1)*16]"
      val qSlice = "q.embedding[cb.j*16+1:(cb.j+1)*16]"
      s"""
      WITH $refinedCbSql,
      enc0 AS (
        SELECT e.vec_id, cb.j, cb.m,
               ${d2MicroSql(eSlice, "cb.cvec")} AS dm
        FROM embeddings e CROSS JOIN cb),
      enc AS (
        SELECT vec_id, j, m AS code FROM (
          SELECT vec_id, j, m,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY dm, m) AS rn
          FROM enc0) WHERE rn = 1),
      lut AS (
        SELECT q.vec_id AS q_id, cb.j, cb.m,
               ${d2MicroSql(qSlice, "cb.cvec")} AS qdm
        FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 5),
      est AS (
        SELECT l.q_id, e.vec_id AS n_id,
               CAST(SUM(l.qdm) AS BIGINT) AS est_micro
        FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.m
        WHERE e.vec_id <> l.q_id
        GROUP BY l.q_id, e.vec_id),
      er AS (
        SELECT q_id, n_id, est_micro,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY est_micro, n_id) AS rank
        FROM est),
      ex0 AS (
        SELECT q.vec_id AS q_id, e.vec_id AS n_id,
               ${d2MicroSql("q.embedding", "e.embedding")} AS dm
        FROM embeddings q CROSS JOIN embeddings e
        WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id),
      ex AS (
        SELECT q_id, n_id FROM (
          SELECT q_id, n_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY dm, n_id) AS rank
          FROM ex0) WHERE rank <= 10)
      SELECT er.q_id, CAST(er.rank AS BIGINT) AS rank, er.n_id,
             CAST(er.est_micro AS DOUBLE) / 1e6 AS est_d2,
             (ex.n_id IS NOT NULL) AS hit
      FROM er LEFT JOIN ex ON er.q_id = ex.q_id AND er.n_id = ex.n_id
      WHERE er.rank <= 10
      ORDER BY er.q_id, er.rank"""
    })

  /** q144 — the composed IVF-PQ index ([[graft.operators.Pq
    * .adcTopKInCells]], the pairing the PQ scaladoc promises): the
    * coarse quantizer (q33/q71's per-label centroids) routes each of
    * 5 queries to its nprobe=2 nearest cells, and the ADC lookup
    * scan runs over those cells' PQ codes only — the full 100 TB ANN
    * shape where neither the vectors nor the whole code table are
    * scanned per query. Emits the q137 contract (est_d2, hit vs the
    * GLOBAL exact top-10) plus per-query `recall10`, which prices
    * the IVF restriction: a true neighbor in an unprobed cell is
    * unreachable by construction, so recall measures the composed
    * index, not just the quantizer. Oracle re-derives centroids,
    * probes, the refined codebook, codes, LUTs, the in-cell ADC
    * ranking, and the exact ranking. */
  val q144 = Qry(
    "q144_ivf_pq_adc",
    (s: SparkSession, d: String) => {
      import graft.operators.Pq
      val e = Tables.embeddings(s, d)
      val cb0 = Pq.codebook(
        e, "vec_id", "embedding", subs = 4, subDim = 16, k = 16)
      val cb = Pq.refine(e, "vec_id", "embedding", cb0, subDim = 16)
      val enc = Pq.encode(e, "vec_id", "embedding", cb, subDim = 16)
        .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      val cent = Similarity.centroids(e, "label", "embedding", DIM)
      val q = e.filter(col("vec_id") < 5)
      val wCent = Window.partitionBy(col("q_id"))
        .orderBy(col("c_cos").desc, col("part"))
      val probes = q
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .crossJoin(broadcast(cent))
        .select(col("q_id"), col("part"),
          Similarity.cosine(col("q_emb"), col("centroid")).as("c_cos"))
        .withColumn("rn", row_number().over(wCent))
        .filter(col("rn") <= 2)
        .select(col("q_id").as("vec_id"), col("part").as("label"))
      val est = Pq.adcTopKInCells(q, "vec_id", "embedding",
        enc, "vec_id", "label", probes, cb, subDim = 16, k = 10)
      val exact = Pq.exactTopK(
        q, "vec_id", "embedding", e, "vec_id", "embedding", k = 10)
      val wQ = Window.partitionBy(col("q_id"))
      est.join(
          exact.select(col("q_id"), col("n_id"), lit(true).as("hit")),
          Seq("q_id", "n_id"), "left")
        .select(col("q_id"), col("rank"), col("n_id"),
          (col("est_micro").cast("double") / lit(1e6)).as("est_d2"),
          coalesce(col("hit"), lit(false)).as("hit"))
        .withColumn("recall10",
          sum(when(col("hit"), 1L).otherwise(0L)).over(wQ)
            .cast("double") / lit(10.0))
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      val eSlice = "e.embedding[cb.j*16+1:(cb.j+1)*16]"
      val qSlice = "q.q_emb[cb.j*16+1:(cb.j+1)*16]"
      s"""
      WITH $refinedCbSql,
      enc0 AS (
        SELECT e.vec_id, cb.j, cb.m,
               ${d2MicroSql(eSlice, "cb.cvec")} AS dm
        FROM embeddings e CROSS JOIN cb),
      enc AS (
        SELECT vec_id, j, m AS code FROM (
          SELECT vec_id, j, m,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY dm, m) AS rn
          FROM enc0) WHERE rn = 1),
      encl AS (
        SELECT enc.vec_id, enc.j, enc.code, e.label
        FROM enc JOIN embeddings e USING (vec_id)),
      expl AS (
        SELECT label, unnest(list_zip(embedding,
                 range(0, len(embedding)))) AS u
        FROM embeddings),
      cent_elem AS (
        SELECT label AS part, u[2] AS pos,
               CAST(SUM(CAST(ROUND(CAST(u[1] AS DOUBLE), 7)
                   AS DECIMAL(27,7))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS m
        FROM expl GROUP BY label, u[2]),
      cent AS (
        SELECT part, list(m ORDER BY pos) AS centroid
        FROM cent_elem GROUP BY part),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb
            FROM embeddings WHERE vec_id < 5),
      probes AS (
        SELECT q_id, part FROM (
          SELECT q_id, part,
                 ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                   ${cosSql("q_emb", "centroid")} DESC, part) AS rn
          FROM q CROSS JOIN cent) t
        WHERE rn <= 2),
      lut AS (
        SELECT q.q_id, cb.j, cb.m,
               ${d2MicroSql(qSlice, "cb.cvec")} AS qdm
        FROM q CROSS JOIN cb),
      est AS (
        SELECT l.q_id, c.vec_id AS n_id,
               CAST(SUM(l.qdm) AS BIGINT) AS est_micro
        FROM encl c
        JOIN probes p ON p.part = c.label
        JOIN lut l ON l.q_id = p.q_id AND l.j = c.j AND l.m = c.code
        WHERE c.vec_id <> l.q_id
        GROUP BY l.q_id, c.vec_id),
      er AS (
        SELECT q_id, n_id, est_micro,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY est_micro, n_id) AS rank
        FROM est),
      er10 AS (SELECT * FROM er WHERE rank <= 10),
      ex0 AS (
        SELECT q.q_id, e.vec_id AS n_id,
               ${d2MicroSql("q.q_emb", "e.embedding")} AS dm
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id <> q.q_id),
      ex AS (
        SELECT q_id, n_id FROM (
          SELECT q_id, n_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY dm, n_id) AS rank
          FROM ex0) WHERE rank <= 10)
      SELECT er10.q_id, CAST(er10.rank AS BIGINT) AS rank, er10.n_id,
             CAST(er10.est_micro AS DOUBLE) / 1e6 AS est_d2,
             (ex.n_id IS NOT NULL) AS hit,
             CAST(SUM(CASE WHEN ex.n_id IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY er10.q_id) AS DOUBLE) / 10.0
               AS recall10
      FROM er10 LEFT JOIN ex
        ON er10.q_id = ex.q_id AND er10.n_id = ex.n_id
      ORDER BY er10.q_id, er10.rank"""
    })

  /** q186 — MMR diversity re-rank ([[Similarity.mmrTopK]], λ=0.7,
    * k=5): greedy maximal-marginal-relevance over a 199-vector
    * candidate pool (vec_id 1-199; at scale this pool is an ANN
    * stage's top-N) against query vec_id 0. The oracle unrolls the
    * five greedy steps — each a scored arg-max over the pool against
    * the previously selected rows — with (1.0 − 0.7) computed, not
    * written as 0.3 (the two doubles differ). Scores snap via the
    * shared floor(·1e6+0.5) rule. */
  val q186 = Qry(
    "q186_mmr_rerank",
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      Similarity.mmrTopK(
          e.filter(col("vec_id") >= 1 && col("vec_id") < 200),
          "vec_id", "embedding", qv, k = 5, lam = 0.7)
        .select(col("rank"), col("n_id"), r6(col("score")).as("score"))
        .orderBy(col("rank"))
    },
    Some {
      val steps = (1 to 5).map { i =>
        val prev = (1 until i).map(j => s"s$j")
        val score =
          if (i == 1) "0.7 * r.rel"
          else s"""0.7 * r.rel - (1.0 - 0.7) * GREATEST(
              ${prev.map(p => cosSql("r.e", s"$p.e")).mkString(",\n              ")})"""
        val from = "rel r" + prev.map(p => s", $p").mkString
        val excl =
          if (i == 1) ""
          else "WHERE " +
            prev.map(p => s"r.vec_id <> $p.vec_id").mkString(" AND ")
        s"""s$i AS (
            SELECT r.vec_id, r.e, r.rel, $score AS score
            FROM $from $excl
            ORDER BY score DESC, r.vec_id LIMIT 1)"""
      }.mkString(",\n      ")
      val out = (1 to 5).map(i =>
        s"SELECT $i AS rank, vec_id AS n_id, ${r6Sql("score")} AS score FROM s$i")
        .mkString("\n      UNION ALL ")
      s"""
      WITH q AS (SELECT embedding AS qe FROM embeddings
                 WHERE vec_id = 0),
      cand AS (SELECT vec_id, embedding AS e FROM embeddings
               WHERE vec_id >= 1 AND vec_id < 200),
      rel AS (
        SELECT vec_id, e, ${cosSql("e", "qe")} AS rel
        FROM cand, q),
      $steps
      $out
      ORDER BY rank"""
    })

  /** q188 — JL random-projection search + recall ([[Similarity
    * .jlProject]]): reduce 64 → 16 dims with the deterministic LCG
    * hyperplanes, run the same top-3 cosine search in the reduced
    * space, and score it against the full-dimension exact top-3 —
    * recall@3 per query, honestly computed (a projection regression
    * breaks the hash). At corpus scale the projection is a map-side
    * codegen'd column (4× less ANN bandwidth) and the recall leg is
    * the bounded evaluation harness, not the serving path. */
  val q188 = Qry(
    "q188_jl_projection_recall",
    (s: SparkSession, d: String) => {
      val PLANES = 16
      val e = Tables.embeddings(s, d)
      val proj = e.select(col("vec_id"),
        Similarity.jlProject(col("embedding"), PLANES, DIM).as("p"))
      val q = proj.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("p").as("q_p"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      val reduced = broadcast(q)
        .crossJoin(proj.select(col("vec_id").as("n_id"), col("p")))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("q_p"), col("p")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
      val exact = Similarity.topKBrute(
          e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
          k = 3)
        .select(col("q_id"), col("n_id").as("x_id"))
      val wr = Window.partitionBy(col("q_id"))
      reduced
        .join(exact, reduced("q_id") === exact("q_id") &&
          col("n_id") === col("x_id"), "left")
        .select(reduced("q_id"), col("rank"), col("n_id"),
          col("x_id").isNotNull.as("hit"))
        .withColumn("recall3",
          sum(when(col("hit"), 1).otherwise(0)).over(wr)
            .cast("double") / 3.0d)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      val projSql = s"""list_transform(range(0, 16), p ->
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(range(0, $DIM),
              i -> CAST(embedding[i + 1] AS DOUBLE) *
                   (CAST((p * 131071 + i * 524287) % 1000003
                      AS DOUBLE) / 1000003.0 - 0.5))),
            (acc, x) -> acc + x))"""
      s"""
      WITH pr AS MATERIALIZED (
        SELECT vec_id, $projSql AS p FROM embeddings),
      q AS (SELECT vec_id AS q_id, p AS q_p FROM pr
            WHERE vec_id < 10),
      red AS (
        SELECT q_id, n_id, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id) AS rank
        FROM (
          SELECT q.q_id, pr.vec_id AS n_id,
                 ${cosSql("q_p", "p")} AS cos
          FROM q CROSS JOIN pr WHERE q.q_id <> pr.vec_id)),
      ex AS (
        SELECT q_id, n_id AS x_id FROM (
          SELECT f.q_id, e.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY f.q_id
                   ORDER BY ${cosSql("f.q_emb", "e.embedding")} DESC,
                     e.vec_id) AS rank
          FROM (SELECT vec_id AS q_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10) f
          CROSS JOIN embeddings e WHERE f.q_id <> e.vec_id)
        WHERE rank <= 3)
      SELECT r.q_id, r.rank, r.n_id, (x.x_id IS NOT NULL) AS hit,
             CAST(SUM(CASE WHEN x.x_id IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY r.q_id) AS DOUBLE) / 3.0 AS recall3
      FROM red r LEFT JOIN ex x
        ON x.q_id = r.q_id AND x.x_id = r.n_id
      WHERE r.rank <= 3
      ORDER BY r.q_id, r.rank"""
    })

  /** q189 — all-but-the-top debias + search ([[graft.operators.Pca]]
    * composition, Mu & Viswanath '18 with the single dominant
    * direction): center every embedding on the corpus mean, remove
    * its projection onto the q187 principal component, and run the
    * exact top-3 cosine search in the debiased space, scored against
    * the RAW-space top-3 — the classic anisotropy fix that stops one
    * dominant direction from swamping cosine similarity. μ and v are
    * d-vectors: Spark holds them as broadcast literals (never a row
    * of data on the driver beyond those 2·d doubles); the oracle
    * re-derives BOTH through the shared q187 CTE chain and replays
    * the center→project→subtract→search arithmetic. */
  val q189 = Qry(
    "q189_debias_search",
    (s: SparkSession, d: String) => {
      import graft.operators.Pca
      val session = s
      import session.implicits._
      val e = Tables.embeddings(s, d)
      val sub = e.filter(col("vec_id") < 1000)
      val muArr = Pca.meanVector(sub, "embedding")
        .orderBy(col("i")).as[(Int, Double)].collect().map(_._2)
      val vArr = Pca.topComponent(sub, "embedding", dim = 64,
          iters = 4)
        .orderBy(col("pos")).as[(Int, Double)].collect().map(_._2)
      val muLit = array(muArr.map(lit(_)): _*)
      val vLit = array(vArr.map(lit(_)): _*)
      val deb = e.select(col("vec_id"),
          zip_with(col("embedding"), muLit,
            (x, m) => x.cast("double") - m).as("cent"))
        .select(col("vec_id"), col("cent"),
          aggregate(zip_with(col("cent"), vLit, (c, vi) => c * vi),
            lit(0d), (a, x) => a + x).as("proj"))
        .select(col("vec_id"),
          zip_with(col("cent"), vLit,
            (c, vi) => c - col("proj") * vi).as("e"))
      val q = deb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("e").as("q_e"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      val debTop = broadcast(q)
        .crossJoin(deb.select(col("vec_id").as("n_id"), col("e")))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("q_e"), col("e")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
      val raw = Similarity.topKBrute(
          e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
          k = 3)
        .select(col("q_id"), col("n_id").as("x_id"))
      val wr = Window.partitionBy(col("q_id"))
      debTop
        .join(raw, debTop("q_id") === raw("q_id") &&
          col("n_id") === col("x_id"), "left")
        .select(debTop("q_id"), col("rank"), col("n_id"),
          r6(col("cos")).as("cos"), col("x_id").isNotNull.as("in_raw"))
        .withColumn("overlap3",
          sum(when(col("in_raw"), 1).otherwise(0)).over(wr)
            .cast("double") / 3.0d)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      s"""
      WITH ${Stats.pcaChainSql},
      mulist AS MATERIALIZED (
        SELECT list(m ORDER BY i) AS ml FROM mu),
      vlist AS MATERIALIZED (
        SELECT list(v ORDER BY pos) AS vl FROM v4),
      cent AS MATERIALIZED (
        SELECT e.vec_id,
               list_transform(list_zip(e.embedding, m.ml),
                 z -> CAST(z[1] AS DOUBLE) - z[2]) AS cent
        FROM embeddings e, mulist m),
      -- proj must be a plain column: DuckDB rejects subqueries
      -- inside lambda bodies
      pr0 AS MATERIALIZED (
        SELECT c.vec_id, c.cent, v.vl,
               list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(list_zip(c.cent, v.vl),
                   p -> CAST(p[1] AS DOUBLE) * p[2])),
                 (acc, x) -> acc + x) AS proj
        FROM cent c, vlist v),
      deb AS MATERIALIZED (
        SELECT vec_id,
               list_transform(list_zip(cent, vl),
                 z -> z[1] - proj * z[2]) AS e
        FROM pr0),
      q AS (SELECT vec_id AS q_id, e AS q_e FROM deb
            WHERE vec_id < 10),
      dt AS (
        SELECT q_id, n_id, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id) AS rank
        FROM (
          SELECT q.q_id, d.vec_id AS n_id,
                 ${cosSql("q_e", "d.e")} AS cos
          FROM q CROSS JOIN deb d WHERE q.q_id <> d.vec_id)),
      raw AS (
        SELECT q_id, n_id AS x_id FROM (
          SELECT f.q_id, e.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY f.q_id
                   ORDER BY ${cosSql("f.q_emb", "e.embedding")} DESC,
                     e.vec_id) AS rank
          FROM (SELECT vec_id AS q_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 10) f
          CROSS JOIN embeddings e WHERE f.q_id <> e.vec_id)
        WHERE rank <= 3)
      SELECT t.q_id, t.rank, t.n_id, ${r6Sql("t.cos")} AS cos,
             (r.x_id IS NOT NULL) AS in_raw,
             CAST(SUM(CASE WHEN r.x_id IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY t.q_id) AS DOUBLE) / 3.0
               AS overlap3
      FROM dt t LEFT JOIN raw r
        ON r.q_id = t.q_id AND r.x_id = t.n_id
      WHERE t.rank <= 3
      ORDER BY t.q_id, t.rank"""
    })

  /** DuckDB sequential-fold squared L2 — same index-order
    * accumulation as [[graft.operators.Similarity.dist2]], so the
    * doubles are bit-identical. */
  private def dist2Sql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip($a, $b),
            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
        (acc, x) -> acc + x)"""

  /** q218 — farthest-first k-center coreset
    * ([[graft.operators.Similarity.farthestFirst]], k = 6): the
    * diversity-first exemplar selector (Gonzalez 2-approximation) —
    * seed at the smallest id, then repeatedly take the point
    * farthest from everything chosen, maintaining the min-distance
    * frame incrementally (O(k·n·d), one 1-row argmax collect per
    * round — the BpeTrain bounded-collect shape). The digest hashes
    * the full selection trajectory (step, id, distance-at-selection)
    * PLUS the k-center coverage radius row — a wrong argmax, a stale
    * min-distance, or a missed exclusion shifts the trajectory. The
    * oracle unrolls the identical 6 rounds; distances fold in index
    * order on both engines (bit-identical doubles, rounded only at
    * hash time — the q31 contract). */
  val q218 = Qry(
    "q218_kcenter_coreset",
    (s: SparkSession, d: String) =>
      Similarity.farthestFirst(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 6)
        .select(col("step"), col("n_id"),
          round(col("d2"), 6).as("d2"))
        .orderBy(col("step")),
    Some {
      def d2s(b: String) = dist2Sql("emb", b)
      val rounds = (2 to 6).map { i =>
        val excl = (1 until i).map(j => s"SELECT id FROM c$j")
          .mkString(" UNION ALL ")
        s""",
      c$i AS MATERIALIZED (
        SELECT id, emb, mind AS d FROM m${i - 1}
        WHERE id NOT IN ($excl) ORDER BY mind DESC, id LIMIT 1),
      m$i AS MATERIALIZED (
        SELECT id, emb,
               LEAST(mind, ${d2s(s"(SELECT emb FROM c$i)")}) AS mind
        FROM m${i - 1})"""
      }.mkString
      val sel = (1 to 6).map(i =>
        s"SELECT $i AS step, id AS n_id, d FROM c$i")
        .mkString(" UNION ALL ")
      s"""
      WITH e AS MATERIALIZED (
        SELECT vec_id AS id, embedding AS emb FROM embeddings),
      c1 AS MATERIALIZED (
        SELECT id, emb, 0.0::DOUBLE AS d FROM e ORDER BY id LIMIT 1),
      m1 AS MATERIALIZED (
        SELECT id, emb, ${d2s("(SELECT emb FROM c1)")} AS mind
        FROM e)$rounds
      SELECT step, n_id, ROUND(d, 6) AS d2 FROM (
        $sel
        UNION ALL
        SELECT 7, -1, (SELECT MAX(mind) FROM m6))
      ORDER BY step"""
    })

  /** q224 — hard-negative mining ([[Similarity.hardNegatives]]):
    * the contrastive-training curation step — for each probe
    * vector, the 2 most-similar DIFFERENT-label vectors (the
    * negatives that carry gradient; random negatives are trivially
    * separated). Exact cosine under the q31 fold contract; the
    * cross-label restriction happens BEFORE ranking, so rank k is
    * the k-th hardest negative. The oracle replays the filter +
    * ranking; a same-label leak anywhere breaks the hash. */
  val q224 = Qry(
    "q224_hard_negatives",
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      Similarity.hardNegatives(
          e.filter(col("vec_id") < 25), e, "vec_id", "embedding",
          "label", k = 2)
        .select(col("q_id"), col("q_label"), col("rank"),
          col("n_id"), col("n_label"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                        embedding AS q_emb
                 FROM embeddings WHERE vec_id < 25),
      scored AS (
        SELECT q_id, q_label, vec_id AS n_id, label AS n_label,
               ${cosSql("q_emb", "embedding")} AS cos
        FROM q CROSS JOIN embeddings
        WHERE q_label <> label),
      ranked AS (
        SELECT q_id, q_label, n_id, n_label, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id) AS rank
        FROM scored)
      SELECT q_id, q_label, rank, n_id, n_label,
             ROUND(cos, 6) AS cos
      FROM ranked WHERE rank <= 2 ORDER BY q_id, rank"""))

  /** q225 — rank-biased precision (Moffat & Zobel 2008, p = 1/2)
    * for the q113 ANN-vs-exact eval: the top-weighted rank metric
    * nDCG wants, WITHOUT nDCG's 1/log₂(rank+1) — libm logs are not
    * correctly-rounded and differ across engines, which is exactly
    * why the graph family uses 1e6 div d (q223) instead of
    * Adamic-Adar. RBP's weights are dyadic (0.5^rank via an integer
    * shift, 1.0 / (1 << rank)): every weight and every partial sum
    * is EXACT in IEEE doubles, so the metric hashes bit-identical
    * unrounded. A relevant hit at rank 1 is worth all ranks 2-10
    * combined — the top-heaviness recall@10 (flat) and MRR
    * (first-hit-only) both miss. */
  val q225 = Qry(
    "q225_rank_biased_precision",
    (s: SparkSession, d: String) => {
      val e = Tables.embeddings(s, d)
      val exact = Similarity.topKBrute(
          e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
          k = 10)
        .select(col("q_id"), col("n_id"))
      val bucketed = e.select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), planes = 4, dim = DIM)
          .as("bucket"))
      val qs = bucketed.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"), col("bucket"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      val approx = broadcast(qs)
        .join(bucketed.select(col("vec_id").as("n_id"),
          col("embedding").as("n_emb"), col("bucket")), Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("q_emb"), col("n_emb")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
      val rbp = approx.join(exact, Seq("q_id", "n_id"))
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_hits"),
          sum(lit(1.0) /
            expr("CAST(shiftleft(1L, rank) AS DOUBLE)")).as("rbp"))
      qs.select(col("q_id")).distinct()
        .join(rbp, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("rbp"), lit(0.0)).as("rbp"))
        .orderBy(col("q_id"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 10),
      ex0 AS (
        SELECT q_id, vec_id AS n_id,
               ${cosSql("q_emb", "embedding")} AS cos
        FROM q CROSS JOIN embeddings WHERE q_id <> vec_id),
      ex AS (
        SELECT q_id, n_id FROM (
          SELECT q_id, n_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, n_id) AS rank
          FROM ex0)
        WHERE rank <= 10),
      b AS (SELECT vec_id, embedding, ${bucketSql(4)} AS bucket
            FROM embeddings),
      ap0 AS (
        SELECT qb.q_id, cb.vec_id AS n_id,
               ${cosSql("qb.q_emb", "cb.embedding")} AS cos
        FROM (SELECT vec_id AS q_id, embedding AS q_emb, bucket
              FROM b WHERE vec_id < 10) qb
        JOIN b cb USING (bucket)
        WHERE qb.q_id <> cb.vec_id),
      ap AS (
        SELECT q_id, n_id, rank FROM (
          SELECT q_id, n_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, n_id) AS rank
          FROM ap0)
        WHERE rank <= 10),
      m AS (
        SELECT ap.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
               SUM(1.0 / CAST((CAST(1 AS BIGINT) << ap.rank)
                 AS DOUBLE)) AS rbp
        FROM ap JOIN ex ON ex.q_id = ap.q_id AND ex.n_id = ap.n_id
        GROUP BY ap.q_id)
      SELECT q.q_id,
             COALESCE(m.n_hits, 0) AS n_hits,
             COALESCE(m.rbp, 0.0) AS rbp
      FROM (SELECT DISTINCT q_id FROM q) q
      LEFT JOIN m ON m.q_id = q.q_id
      ORDER BY q.q_id"""))

  val all: Seq[Qry] =
    Seq(q31, q32, q33, q34, q71, q113, q137, q144, q186, q188, q189,
      q218, q224, q225)
}
