package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.B G14):
  * exact cosine via higher-order functions, brute-force top-k as the
  * correctness baseline, and two sublinear paths — random-hyperplane
  * LSH bucketing and an IVF-style coarse partition — for the 100 TB
  * shape where all-pairs is impossible.
  *
  * Numeric determinism: every dot product is a LEFT-TO-RIGHT
  * sequential fold in double precision (`aggregate` over a
  * `zip_with`), which a DuckDB `list_reduce` reproduces bit-for-bit;
  * floats are widened to double before any arithmetic. No UDFs —
  * all codegen'd Catalyst expressions.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  /** L2 norm (sqrt is IEEE correctly-rounded → cross-engine stable). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0d, lit(0d)).otherwise(d / nn)
  }

  /** Brute-force exact top-k: every query row paired with every
    * corpus row (minus itself). O(|Q|·|C|) — correct at any scale
    * only when |Q| is small; the LSH/IVF paths below are the
    * corpus×corpus answer. One shuffle for the ranking window. */
  def topKBrute(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("n_id"),
      col(embCol).as("n_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("n_emb")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim i): LCG over pure integer arithmetic, reproducible in any
    * SQL engine — no RNG state, no hash function dependence. */
  def planeComponent(p: Int, i: Column): Column =
    ((lit(p.toLong) * 131071L + i.cast("long") * 524287L) % 1000003L)
      .cast("double") / 1000003d - 0.5d

  /** Dot of an embedding with pseudo-random plane `p`. */
  def planeDot(emb: Column, p: Int, dim: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(dim - 1)),
        i => element_at(emb, i + 1).cast("double") * planeComponent(p, i)),
      lit(0d), (acc, v) => acc + v)

  /** Johnson-Lindenstrauss-style random projection: the embedding's
    * dot products with `planes` deterministic pseudo-random
    * hyperplanes ([[planeComponent]]), as a double array — the
    * dimensionality-reduction step that turns a d-dim ANN problem
    * into a planes-dim one (distances distort by ~(1±ε) with
    * planes = O(log n / ε²)). Map-side, codegen'd, no shuffle; the
    * same LCG weights reproduce in any SQL engine. */
  def jlProject(emb: Column, planes: Int, dim: Int): Column =
    array((0 until planes).map(p => planeDot(emb, p, dim)): _*)

  /** Random-hyperplane LSH bucket id: bit p is the sign of the
    * projection onto plane p. Cosine-similar vectors collide with
    * high probability; at scale the ANN search joins query buckets
    * to corpus buckets instead of cross-joining everything. */
  def lshBucket(emb: Column, planes: Int, dim: Int): Column =
    (0 until planes).map(p =>
      when(planeDot(emb, p, dim) > 0d, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein '98):
    * greedily select k results maximizing
    * `λ·cos(query, c) − (1−λ)·max_{s∈selected} cos(c, s)` — the
    * standard diversity re-rank over an ANN candidate pool (RAG
    * retrieval, dedup-aware search results). Inherently sequential in
    * k: each of the k steps is ONE distributed arg-max over the
    * still-distributed candidate pool scored against the ≤ k-vector
    * selected set (embedded as literals — a broadcast of at most
    * k·dim floats); the driver holds only the k winners, never the
    * pool. Ties break to the smallest id; every dot product is the
    * sequential fold, so any engine replays the greedy walk exactly.
    *
    * @param candidates pool (idCol, embCol) — at scale, the top-N of
    *                   an ANN stage, NOT a full corpus
    * @param query      the query embedding
    * @return k rows (rank, n_id, score) in selection order; fewer
    *         when the pool exhausts first. score is the raw MMR
    *         objective (unrounded)
    */
  def mmrTopK(candidates: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, lam: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(lam >= 0d && lam <= 1d, s"lambda must be in [0,1]: $lam")
    val spark = candidates.sparkSession
    val qCol = array(query.map(lit(_)): _*)
    val pool = candidates
      .select(col(idCol).cast("long").as("id"), col(embCol).as("e"),
        cosine(col(embCol), qCol).as("rel"))
      .localCheckpoint(true)
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Float], Double)]
    var step = 0
    var exhausted = false
    while (step < k && !exhausted) {
      val scoreCol =
        if (selected.isEmpty) col("rel") * lit(lam)
        else {
          val sims = selected.map { case (_, e, _) =>
            cosine(col("e"), array(e.map(lit(_)): _*))
          }.toSeq
          val maxSim =
            if (sims.size == 1) sims.head else greatest(sims: _*)
          col("rel") * lit(lam) - lit(1d - lam) * maxSim
        }
      val chosen = selected.map(_._1).toSet
      val top = pool
        .filter(!col("id").isin(chosen.toSeq: _*))
        .select(col("id"), col("e"), scoreCol.as("score"))
        .orderBy(col("score").desc, col("id"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        selected += ((r.getLong(0),
          r.getSeq[Float](1).toArray, r.getDouble(2)))
        step += 1
      }
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, s), i) => (i + 1, id, s) }
      .toSeq.toDF("rank", "n_id", "score")
  }

  /** IVF-style coarse quantization using an existing partition column
    * (or precomputed cluster assignment): centroids are the
    * per-partition element-wise means (decimal-summed for
    * cross-engine determinism), queries probe only their nearest
    * centroid's partition. */
  def centroids(corpus: DataFrame, partCol: String, embCol: String,
      dim: Int): DataFrame =
    corpus.select(col(partCol).as("part"),
        posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col("part"), col("pos"))
      .agg((sum(round(col("v").cast("double"), 7)
          .cast("decimal(27,7)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col("part"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
}
