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

  private def cosSql(a: String, b: String): String =
    s"""(${dotSql(a, b)} /
         (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"""

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
        .orderBy(col("bucket")), {
      val bucketSql = (0 until 8).map { p =>
        val proj = s"""list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(0, $DIM),
            i -> CAST(embedding[i + 1] AS DOUBLE) *
                 (CAST(($p * 131071 + i * 524287) % 1000003 AS DOUBLE)
                    / 1000003.0 - 0.5))),
          (acc, x) -> acc + x)"""
        s"CASE WHEN $proj > 0 THEN ${1 << p} ELSE 0 END"
      }.mkString(" + ")
      Some(s"""
      WITH b AS (SELECT vec_id, $bucketSql AS bucket FROM embeddings)
      SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec,
             MAX(vec_id) AS max_vec
      FROM b GROUP BY bucket ORDER BY bucket""")
    })

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

  val all: Seq[Qry] = Seq(q31, q32, q33, q34, q71)
}
