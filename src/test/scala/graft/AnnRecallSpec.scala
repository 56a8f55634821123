package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Planted, Pq, Similarity, Sq8}

/** ANN recall assertions that BITE. The driver's synthetic embeddings
  * are near-random, so every indexed ranking scores recall@10 in the
  * 0.26-0.36 band no matter how good or broken the quantizer is —
  * those runs price the IVF restriction but cannot detect a
  * quantization regression. Here the corpus is [[Planted.vectors]]:
  * 16 well-separated clusters of 12, where the true top-10 of every
  * vector is provably its cluster mates. A healthy PQ pipeline
  * (seed codebook → Lloyd refine → ADC) must score ≥ 0.8; a
  * sabotaged codebook must NOT — the mutation test proves the
  * assertion can fail, so a silent regression of the real pipeline
  * has a tripwire.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val C = 16    // clusters
  private val G = 12    // members per cluster (11 mates >= k=10)
  private val Dim = 8
  private val Subs = 4
  private val SubDim = 2

  private def corpus: DataFrame =
    Planted.vectors(spark, C, G, Dim).localCheckpoint(true)

  /** Mean recall@10 of an ADC ranking against the exact top-10. */
  private def recall10(est: DataFrame, exact: DataFrame): Double = {
    val hits = est.join(
        exact.select(col("q_id"), col("n_id"), lit(1L).as("hit")),
        Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))) / lit(10.0)).as("r"))
    val (s, n) = hits.agg(sum(col("r")), count(lit(1)))
      .as[(Double, Long)].collect().head
    s / n
  }

  test("planted fixture: true top-10 of every vector is its cluster mates") {
    val e = corpus
    val exact = Pq.exactTopK(e, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 10)
    // every exact neighbor shares the query's planted label
    val crossCluster = exact
      .join(e.select(col("vec_id").as("q_id"), col("label").as("ql")),
        Seq("q_id"))
      .join(e.select(col("vec_id").as("n_id"), col("label").as("nl")),
        Seq("n_id"))
      .filter(col("ql") =!= col("nl")).count()
    assert(crossCluster == 0L,
      s"$crossCluster exact neighbors crossed a planted cluster")
  }

  test("healthy PQ (refined codebook) scores recall@10 >= 0.8 on planted data") {
    val e = corpus
    val cb0 = Pq.codebook(e, "vec_id", "embedding",
      subs = Subs, subDim = SubDim, k = C)
    val cb = Pq.refine(e, "vec_id", "embedding", cb0, subDim = SubDim)
    val enc = Pq.encode(e, "vec_id", "embedding", cb, subDim = SubDim)
    val est = Pq.adcTopK(e, "vec_id", "embedding", enc, "vec_id",
      cb, subDim = SubDim, k = 10)
    val exact = Pq.exactTopK(e, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 10)
    val r = recall10(est, exact)
    info(f"healthy PQ recall@10 = $r%.3f")
    assert(r >= 0.8, f"healthy PQ recall@10 = $r%.3f < 0.8")
  }

  test("composed IVF-PQ (centroid routing, nprobe=2) scores recall@10 >= 0.8") {
    val e = corpus
    val cb0 = Pq.codebook(e, "vec_id", "embedding",
      subs = Subs, subDim = SubDim, k = C)
    val cb = Pq.refine(e, "vec_id", "embedding", cb0, subDim = SubDim)
    val enc = Pq.encode(e, "vec_id", "embedding", cb, subDim = SubDim)
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
    val cent = Similarity.centroids(e, "label", "embedding", Dim)
    val wCent = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("part"))
    val probes = e
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cent))
      .select(col("q_id"), col("part"),
        Similarity.cosine(col("q_emb"), col("centroid")).as("c_cos"))
      .withColumn("rn", row_number().over(wCent))
      .filter(col("rn") <= 2)
      .select(col("q_id").as("vec_id"), col("part").as("label"))
    val est = Pq.adcTopKInCells(e, "vec_id", "embedding",
      enc, "vec_id", "label", probes, cb, subDim = SubDim, k = 10)
    val exact = Pq.exactTopK(e, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 10)
    val r = recall10(est, exact)
    info(f"IVF-PQ recall@10 = $r%.3f")
    assert(r >= 0.8, f"IVF-PQ recall@10 = $r%.3f < 0.8")
  }

  test("MUTATION: a sabotaged router (wrong cells) collapses IVF recall " +
      "while the quantizer is intact") {
    // perspective diversity for the tripwire: the first mutation
    // breaks QUANTIZATION; this one breaks ROUTING — probes point
    // every query at the wrong cell, so even perfect codes cannot
    // recover the planted neighbors. A regression in either half of
    // the composed index now has its own failing signal.
    val e = corpus
    val cb0 = Pq.codebook(e, "vec_id", "embedding",
      subs = Subs, subDim = SubDim, k = C)
    val cb = Pq.refine(e, "vec_id", "embedding", cb0, subDim = SubDim)
    val enc = Pq.encode(e, "vec_id", "embedding", cb, subDim = SubDim)
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
    val wrongProbes = e.select(col("vec_id"),
      ((col("label") + 1) % C).as("label"))
    val est = Pq.adcTopKInCells(e, "vec_id", "embedding",
      enc, "vec_id", "label", wrongProbes, cb, subDim = SubDim, k = 10)
    val exact = Pq.exactTopK(e, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 10)
    val r = recall10(est, exact)
    info(f"wrong-cell routing recall@10 = $r%.3f")
    assert(r < 0.3, f"IVF routing sabotage still scored $r%.3f — " +
      "the recall assertion cannot detect a broken router")
  }

  test("routed SQ8 (int8 × IVF, nprobe=2) scores recall@10 >= 0.8 on planted data") {
    // the q179 composition: coarse routing confines the int8
    // integer-dot scan to 2 cells per query, exact cosine re-ranks
    val e = corpus
    val cent = Similarity.centroids(e, "label", "embedding", Dim)
    val wCent = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("part"))
    val probes = e
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cent))
      .select(col("q_id"), col("part"),
        Similarity.cosine(col("q_emb"), col("centroid")).as("c_cos"))
      .withColumn("rn", row_number().over(wCent))
      .filter(col("rn") <= 2)
      .select(col("q_id").as("vec_id"), col("part").as("label"))
    val est = Sq8.searchTopKInCells(e, e, "vec_id", "embedding",
      "label", probes, m = 20, k = 10)
    val exact = Similarity.topKBrute(e, e, "vec_id", "embedding",
      k = 10)
    val r = recall10(est, exact)
    info(f"routed SQ8 recall@10 = $r%.3f")
    assert(r >= 0.8, f"routed SQ8 recall@10 = $r%.3f < 0.8")
  }

  test("MUTATION: wrong cells collapse routed SQ8 recall while the " +
      "quantizer is intact") {
    val e = corpus
    val wrongProbes = e.select(col("vec_id"),
      ((col("label") + 1) % C).as("label"))
    val est = Sq8.searchTopKInCells(e, e, "vec_id", "embedding",
      "label", wrongProbes, m = 20, k = 10)
    val exact = Similarity.topKBrute(e, e, "vec_id", "embedding",
      k = 10)
    val r = recall10(est, exact)
    info(f"wrong-cell routed SQ8 recall@10 = $r%.3f")
    assert(r < 0.3, f"SQ8 routing sabotage still scored $r%.3f — " +
      "the recall assertion cannot detect a broken router")
  }

  test("MUTATION: a sabotaged (all-zero) codebook drives recall@10 below 0.3") {
    // proves the >= 0.8 assertions can fail: collapse every centroid
    // to the origin — codes lose all information, ADC estimates
    // degenerate to a constant, and the ranking falls back to id
    // order, which on planted data recovers (nearly) nothing
    val e = corpus
    val cb0 = Pq.codebook(e, "vec_id", "embedding",
      subs = Subs, subDim = SubDim, k = C)
    val dead = cb0.withColumn("cvec",
      array((0 until SubDim).map(_ => lit(0.0f)): _*))
    val enc = Pq.encode(e, "vec_id", "embedding", dead, subDim = SubDim)
    val est = Pq.adcTopK(e, "vec_id", "embedding", enc, "vec_id",
      dead, subDim = SubDim, k = 10)
    val exact = Pq.exactTopK(e, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 10)
    val r = recall10(est, exact)
    info(f"sabotaged PQ recall@10 = $r%.3f")
    assert(r < 0.3, f"sabotaged codebook still scored $r%.3f — " +
      "the recall assertion cannot detect a broken quantizer")
  }
}
