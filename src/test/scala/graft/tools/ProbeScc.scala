package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ckpt

/** Dev-only probe (r16): compare sccLabels variants on the q213
  * fixture in ONE JVM — wall seconds + driver job counts per rep.
  * Variants: pre (f39fa21 materialized-drop/isEmpty), head (r15
  * count+lazy-drop), flag (r16 flagged trim frame), obs (flag +
  * Observation-fused counts: the convergence count rides the
  * checkpoint job instead of a separate action).
  *
  * Usage: Test/runMain graft.ProbeScc <sfDir> <reps> [variants]
  */
object ProbeScc {

  private def fixture(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val r64 = ev.select((col("event_id") % 64).as("v")).distinct()
    val b4 = ev.select((col("event_id") % 4 + 1).as("b")).distinct()
    val r8 = ev.select((col("event_id") % 8).as("i")).distinct()
    val core = (0 to 3).map(k =>
      r64.select(col("v").as("src"),
        ((col("v") * 4 + k) % 64).as("dst"))).reduce(_ unionAll _)
    val blocks = b4.crossJoin(r8)
      .filter(col("i") < col("b") + 2)
      .select((col("b") * 100 + col("i")).as("src"),
        (col("b") * 100 + (col("i") + 1) % (col("b") + 2)).as("dst"))
    val bridges = r64.filter(col("v").between(1, 4))
      .select(col("v").as("src"), (col("v") * 100).as("dst"))
    val one = r8.filter(col("i") === 0)
    val tails = one.select(lit(900L).as("src"), lit(0L).as("dst"))
      .unionAll(one.select(lit(5L).as("src"), lit(950L).as("dst")))
    core.unionAll(blocks).unionAll(bridges).unionAll(tails)
  }

  // ---- variant: pre-r15 (f39fa21) --------------------------------
  def sccPre(edges: DataFrame): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().transform(Ckpt.cut)
    var v = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().transform(Ckpt.cut)
    val settled = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (!v.isEmpty) {
      var trimming = true
      while (trimming && !v.isEmpty) {
        val keep = v
          .join(e.select(col("src").as("id")).distinct(), Seq("id"), "left_semi")
          .join(e.select(col("dst").as("id")).distinct(), Seq("id"), "left_semi")
          .transform(Ckpt.cut)
        val drop = v.join(keep, Seq("id"), "left_anti").transform(Ckpt.cut)
        if (drop.isEmpty) trimming = false
        else {
          settled += drop.select(col("id"), col("id").as("scc"))
          v = keep
          e = e.join(v.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(v.select(col("id").as("dst")), Seq("dst"), "left_semi")
            .transform(Ckpt.cut)
        }
      }
      if (!v.isEmpty) {
        var color = v.select(col("id"), col("id").as("c")).transform(Ckpt.cut)
        var improved = color
        while (!improved.isEmpty) {
          val prop = e
            .join(improved.select(col("id").as("src"), col("c")), Seq("src"))
            .select(col("dst").as("id"), col("c"))
          val upd = color.unionByName(prop)
            .groupBy(col("id")).agg(min(col("c")).as("c"))
            .transform(Ckpt.cut)
          improved = upd
            .join(color.select(col("id"), col("c").as("c0")), Seq("id"))
            .filter(col("c") < col("c0"))
            .select(col("id"), col("c"))
            .transform(Ckpt.cut)
          color = upd
        }
        var frontier = color.filter(col("id") === col("c")).transform(Ckpt.cut)
        var reached = frontier
        while (!frontier.isEmpty) {
          frontier = e
            .join(frontier.select(col("id").as("dst"), col("c")), Seq("dst"))
            .select(col("src").as("id"), col("c"))
            .join(color.select(col("id"), col("c").as("vc")), Seq("id"))
            .filter(col("c") === col("vc"))
            .select(col("id"), col("c"))
            .distinct()
            .join(reached.select(col("id")), Seq("id"), "left_anti")
            .transform(Ckpt.cut)
          reached = reached.unionByName(frontier)
        }
        settled += reached.select(col("id"), col("c").as("scc"))
        v = v.join(reached.select(col("id")), Seq("id"), "left_anti")
          .transform(Ckpt.cut)
        e = e.join(v.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(v.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .transform(Ckpt.cut)
      }
    }
    settled.reduceOption(_ unionByName _)
      .getOrElse(e.select(col("src").as("id"), col("src").as("scc")).limit(0))
  }

  // ---- variant: obs (flagged trim + Observation-fused counts) ----
  /** Ckpt.cut with a row-count observation fused into the same job.
    * Returns (cut frame, row count). */
  private var obsId = 0L
  def cutCounted(df: DataFrame): (DataFrame, Long) = {
    obsId += 1
    val obs = new Observation(s"graft_cut_$obsId")
    val cut = Ckpt.cut(df.observe(obs, count(lit(1)).as("n")))
    (cut, obs.get("n").asInstanceOf[Long])
  }

  def sccObs(edges: DataFrame): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().transform(Ckpt.cut)
    var v = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
    var nV = { val (c, n) = cutCounted(v); v = c; n }
    val settled = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (nV > 0) {
      var trimming = true
      while (trimming && nV > 0) {
        val mRaw = v
          .join(e.select(col("src").as("id")).distinct()
            .withColumn("ho", lit(1)), Seq("id"), "left")
          .join(e.select(col("dst").as("id")).distinct()
            .withColumn("hi", lit(1)), Seq("id"), "left")
          .select(col("id"),
            (col("ho").isNotNull && col("hi").isNotNull).as("keep"))
        obsId += 1
        val obs = new Observation(s"graft_keep_$obsId")
        val m = Ckpt.cut(mRaw.observe(obs,
          sum(when(col("keep"), 1L).otherwise(0L)).as("n")))
        val nKeep = obs.get("n").asInstanceOf[Long]
        if (nKeep == nV) trimming = false
        else {
          settled += m.filter(!col("keep"))
            .select(col("id"), col("id").as("scc"))
          v = m.filter(col("keep")).select(col("id"))
          nV = nKeep
          e = e.join(v.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(v.select(col("id").as("dst")), Seq("dst"), "left_semi")
            .transform(Ckpt.cut)
        }
      }
      if (nV > 0) {
        var color = v.select(col("id"), col("id").as("c")).transform(Ckpt.cut)
        var improved = color
        var nImp = nV
        while (nImp > 0) {
          val prop = e
            .join(improved.select(col("id").as("src"), col("c")), Seq("src"))
            .select(col("dst").as("id"), col("c"),
              lit(null).cast("long").as("c0"))
          val updRaw = color
            .select(col("id"), col("c"), col("c").as("c0"))
            .unionByName(prop)
            .groupBy(col("id"))
            .agg(min(col("c")).as("c"), min(col("c0")).as("c0"))
          obsId += 1
          val obs = new Observation(s"graft_imp_$obsId")
          val upd = Ckpt.cut(updRaw.observe(obs,
            sum(when(col("c") < col("c0"), 1L).otherwise(0L)).as("n")))
          improved = upd.filter(col("c") < col("c0"))
            .select(col("id"), col("c"))
          nImp = obs.get("n").asInstanceOf[Long]
          color = upd.select(col("id"), col("c"))
        }
        var frontier = color.filter(col("id") === col("c"))
        var nF = { val (c, n) = cutCounted(frontier); frontier = c; n }
        var reached = frontier
        while (nF > 0) {
          val fRaw = e
            .join(frontier.select(col("id").as("dst"), col("c")), Seq("dst"))
            .select(col("src").as("id"), col("c"))
            .join(color.select(col("id"), col("c").as("vc")), Seq("id"))
            .filter(col("c") === col("vc"))
            .select(col("id"), col("c"))
            .distinct()
            .join(reached.select(col("id")), Seq("id"), "left_anti")
          nF = { val (c, n) = cutCounted(fRaw); frontier = c; n }
          reached = reached.unionByName(frontier)
        }
        settled += reached.select(col("id"), col("c").as("scc"))
        val vRaw = v.join(reached.select(col("id")), Seq("id"), "left_anti")
        nV = { val (c, n) = cutCounted(vRaw); v = c; n }
        e = e.join(v.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(v.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .transform(Ckpt.cut)
      }
    }
    settled.reduceOption(_ unionByName _)
      .getOrElse(e.select(col("src").as("id"), col("src").as("scc")).limit(0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val which = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("pre", "cur", "obs"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val variants: Map[String, DataFrame => DataFrame] = Map(
      "pre" -> sccPre,
      "cur" -> (e => operators.Graph.sccLabels(e, "src", "dst")),
      "obs" -> sccObs)
    which.foreach { name =>
      val fn = variants(name)
      val digest = fn(fixture(spark, sfDir))
        .groupBy(col("scc")).agg(count(lit(1)).as("sz"))
        .agg(sum(col("scc") * col("sz")).as("sig")).head().getLong(0)
      (1 to reps).foreach { i =>
        jobs.set(0)
        val t0 = System.nanoTime()
        fn(fixture(spark, sfDir)).write.format("noop")
          .mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"""{"variant":"$name","rep":$i,"wall":$wall%.3f,""" +
          f""""jobs":${jobs.get},"sig":$digest}""")
      }
    }
    spark.stop()
  }
}
