package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over int8 scalar-quantized vectors: the
  * memory-bandwidth path between brute-force float scan and PQ-ADC.
  * Candidate generation scores [[Quantize]] absmax codes with an
  * INTEGER dot product (4× less data moved than float32, exact
  * integer arithmetic → bit-stable ranking on any engine), rescales
  * by the two per-vector scales, keeps the top `m` approximate
  * candidates per query, and re-ranks only those with the exact
  * float cosine. Recall degrades only when quantization error
  * reorders a true top-k neighbor past rank m — m/k oversampling is
  * the knob.
  *
  * Scale shape: the scan side carries (id, codes, scale) — the codes
  * column is 64 bytes/vector here vs 256 for float32; the approximate
  * stage is a broadcast of the (small) query set over a linear
  * corpus scan with a per-query top-m window; the exact stage
  * touches m·|Q| full vectors, fetched by an equi-join on candidate
  * id. Composes with IVF routing the same way [[Pq]] does.
  */
object Sq8 {

  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Exact-rerank int8 ANN: top `k` of the top `m` approximate.
    *
    * @return (q_id, rank, n_id, cos, adot): `cos` exact, `adot` the
    *         approximate rescaled int-dot that nominated the row.
    */
  def searchTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, m: Int, k: Int): DataFrame = {
    require(m >= k, "oversample m must be >= k")
    def coded(df: DataFrame, p: String) = df.select(
        col(idCol).as(s"${p}_id"), col(embCol).as(s"${p}_emb"),
        Quantize.absmaxScale(col(embCol)).as(s"${p}_scale"))
      .withColumn(s"${p}_q",
        Quantize.int8Codes(col(s"${p}_emb"), col(s"${p}_scale")))
    val q = coded(queries, "q")
    val c = coded(corpus, "n")
    val wa = Window.partitionBy(col("q_id"))
      .orderBy(col("adot").desc, col("n_id"))
    val cand = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adot",
        idot(col("q_q"), col("n_q")).cast("double") *
          col("q_scale") * col("n_scale") / lit(16129d))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= m)
    val we = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    cand
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        col("cos"), col("adot"))
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
    * @return (q_id, rank, n_id, cell, cos, adot): `cell` the cell
    *         the neighbor was found in
    */
  def searchTopKInCells(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, cellCol: String,
      probes: DataFrame, m: Int, k: Int): DataFrame = {
    require(m >= k, "oversample m must be >= k")
    val q = queries.select(col(idCol).as("q_id"),
        col(embCol).as("q_emb"),
        Quantize.absmaxScale(col(embCol)).as("q_scale"))
      .withColumn("q_q",
        Quantize.int8Codes(col("q_emb"), col("q_scale")))
    val c = corpus.select(col(idCol).as("n_id"),
        col(embCol).as("n_emb"), col(cellCol).as("cell"),
        Quantize.absmaxScale(col(embCol)).as("n_scale"))
      .withColumn("n_q",
        Quantize.int8Codes(col("n_emb"), col("n_scale")))
    val wa = Window.partitionBy(col("q_id"))
      .orderBy(col("adot").desc, col("n_id"))
    val cand = c
      .join(broadcast(probes.select(col(idCol).as("q_id"),
        col(cellCol).as("__pc"))), col("__pc") === col("cell"))
      .join(broadcast(q), Seq("q_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adot",
        idot(col("q_q"), col("n_q")).cast("double") *
          col("q_scale") * col("n_scale") / lit(16129d))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= m)
    val we = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    cand
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cell"),
        col("cos"), col("adot"))
  }
}
