package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over int8 scalar-quantized vectors: the
  * memory-bandwidth path between brute-force float scan and PQ-ADC.
  * Candidate generation scores [[Quantize]] absmax codes with an
  * INTEGER dot product (4× less data moved than float32, exact
  * integer arithmetic), normalized by the integer self-dots into a
  * CODE-SPACE COSINE — the per-vector absmax scales cancel, so the
  * nomination metric is the quantized mirror of the exact-cosine
  * re-rank that follows. Nominating by raw (rescaled) dot instead
  * looks equivalent at small scale, where the oversample covers most
  * of the candidate set, but at corpus scale it silently favors
  * large-norm candidates over near-by ones: measured recall@10 on
  * the 1M-vector planted fixture was 0.32 nominating by dot vs
  * 1.00 nominating by code cosine at the same m = 30
  * (BENCH_planted_recall_r9.json). The top `m`
  * approximate candidates per query are then re-ranked with the
  * exact float cosine; recall degrades only when quantization error
  * reorders a true top-k neighbor past rank m — m/k oversampling is
  * the knob.
  *
  * Scale shape: the scan side carries (id, codes, self-dot) — 64
  * bytes + one long per vector vs 256 bytes for float32; the
  * self-dot is computed once at coding time (the "store the norm
  * with the code" practice), so scoring a candidate is one integer
  * dot + two sqrts + one division; the approximate stage is a
  * broadcast of the (small) query set over a linear corpus scan with
  * a per-query top-m window; the exact stage touches m·|Q| full
  * vectors. [[searchTopKInCells]] composes with IVF routing the same
  * way [[Pq.adcTopKInCells]] does.
  */
object Sq8 {

  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Code-space cosine from the integer dot and the two integer
    * self-dots. The absmax scales cancel algebraically, so no float
    * rescale enters the score; zero vectors (self-dot 0) score 0 —
    * both engines replay the identical two-sqrt one-division chain. */
  private def codeCos(qd: Column, qn2: Column, nn2: Column): Column =
    when(qn2 === 0L || nn2 === 0L, lit(0d))
      .otherwise(qd.cast("double") /
        (sqrt(qn2.cast("double")) * sqrt(nn2.cast("double"))))

  private def coded(df: DataFrame, idCol: String, embCol: String,
      p: String, extra: Seq[(String, String)] = Seq.empty): DataFrame =
    df.select((Seq(col(idCol).as(s"${p}_id"), col(embCol).as(s"${p}_emb"),
        Quantize.absmaxScale(col(embCol)).as(s"${p}_scale")) ++
        extra.map { case (c, a) => col(c).as(a) }): _*)
      .withColumn(s"${p}_q",
        Quantize.int8Codes(col(s"${p}_emb"), col(s"${p}_scale")))
      .withColumn(s"${p}_n2", idot(col(s"${p}_q"), col(s"${p}_q")))

  /** Exact-rerank int8 ANN: top `k` of the top `m` approximate.
    *
    * @return (q_id, rank, n_id, cos, acos): `cos` exact, `acos` the
    *         code-space cosine that nominated the row.
    */
  def searchTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, m: Int, k: Int): DataFrame = {
    require(m >= k, "oversample m must be >= k")
    val q = coded(queries, idCol, embCol, "q")
    val c = coded(corpus, idCol, embCol, "n")
    val wa = Window.partitionBy(col("q_id"))
      .orderBy(col("acos").desc, col("n_id"))
    val cand = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("acos",
        codeCos(idot(col("q_q"), col("n_q")), col("q_n2"), col("n_n2")))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= m)
    val we = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    cand
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        col("cos"), col("acos"))
  }

  /** [[searchTopK]] restricted to IVF-probed cells — the composed
    * int8 × IVF index form (the routed twin of
    * [[Pq.adcTopKInCells]]): the coarse quantizer routes each query
    * to `nprobe` cells via the `probes` relation, and the integer-dot
    * scan touches those cells' vectors ONLY. Same quantization/
    * scoring/re-rank algebra as [[searchTopK]]; the difference is
    * one broadcast equi-join of the (query, cell) probe relation
    * against the cell-keyed corpus before scoring — at 100 TB the
    * corpus stays cell-partitioned, so that join is partition
    * pruning in relational form, and the 4×-narrower int8 codes cut
    * the bandwidth of the cells that ARE scanned.
    *
    * @param corpus must carry `cellCol` (the coarse cell of each
    *        vector); each corpus row lives in exactly one cell, so a
    *        (query, neighbor) candidate appears at most once even
    *        under multi-probe
    * @param probes (idCol, cellCol) — the cells each query scans
    * @return (q_id, rank, n_id, cell, cos, acos): `cell` the cell
    *         the neighbor was found in
    */
  def searchTopKInCells(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, cellCol: String,
      probes: DataFrame, m: Int, k: Int): DataFrame = {
    require(m >= k, "oversample m must be >= k")
    val q = coded(queries, idCol, embCol, "q")
    val c = coded(corpus, idCol, embCol, "n",
      extra = Seq(cellCol -> "cell"))
    val wa = Window.partitionBy(col("q_id"))
      .orderBy(col("acos").desc, col("n_id"))
    val cand = c
      .join(broadcast(probes.select(col(idCol).as("q_id"),
        col(cellCol).as("__pc"))), col("__pc") === col("cell"))
      .join(broadcast(q), Seq("q_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("acos",
        codeCos(idot(col("q_q"), col("n_q")), col("q_n2"), col("n_n2")))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= m)
    val we = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    cand
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cell"),
        col("cos"), col("acos"))
  }
}
