package graft

import org.apache.spark.sql.functions._

import graft.operators.Erasure

/** Unit semantics for [[Erasure.audit]] / [[Erasure.retain]]
  * (q181): the transitive cascade, checksum coverage, conservation
  * (purged + retained = table size), and the empty-batch identity.
  */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  // subjects 1..3; child orders (key, cust); grand items (key, order)
  private def subjects = Seq(1L, 2L, 3L).toDF("ck")
  private def orders = Seq((10L, 1L), (11L, 1L), (12L, 2L),
    (13L, 3L)).toDF("ok", "cust")
  private def items = Seq((100L, 10L), (101L, 10L), (102L, 11L),
    (103L, 12L), (104L, 13L)).toDF("ik", "ord")

  private def auditMap(erased: Seq[Long]) =
    Erasure.audit(subjects, "ck", erased.toDF("k"),
        orders, "cust", "ok", items, "ord", "ik")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("erasing one subject cascades through orders to items") {
    val a = auditMap(Seq(1L))
    assert(a("subjects") === ((1L, 1L, 2L)))
    // orders 10 and 11 belong to subject 1
    assert(a("child") === ((2L, 21L, 2L)))
    // items 100-102 hang off orders 10/11 — item 103/104 survive
    assert(a("grand") === ((3L, 303L, 2L)))
  }

  test("purged + retained always equals the table size") {
    val a = auditMap(Seq(2L, 3L))
    assert(a.values.forall { case (np, _, nr) => np + nr > 0 })
    assert(a("subjects")._1 + a("subjects")._3 === 3L)
    assert(a("child")._1 + a("child")._3 === 4L)
    assert(a("grand")._1 + a("grand")._3 === 5L)
  }

  test("an empty erasure batch purges nothing anywhere") {
    val a = auditMap(Seq.empty)
    assert(a === Map("subjects" -> ((0L, 0L, 3L)),
      "child" -> ((0L, 0L, 4L)), "grand" -> ((0L, 0L, 5L))))
  }

  test("retain returns exactly the anti-join complement") {
    val kept = Erasure.retain(orders, "cust", Seq(1L).toDF("k"))
      .select(col("ok")).as[Long].collect().toSet
    assert(kept === Set(12L, 13L))
  }

  test("an erased key absent from a fact purges zero rows there") {
    // subject 99 exists nowhere: all legs untouched, checksum 0
    val a = auditMap(Seq(99L))
    assert(a("subjects") === ((0L, 0L, 3L)))
    assert(a("child") === ((0L, 0L, 4L)))
    assert(a("grand") === ((0L, 0L, 5L)))
  }

  test("streaming erasure purges the snapshot per trigger, survives " +
      "restart, and replays idempotently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ers")
    val snap = root.toString + "/snap"
    val ckpt = root.toString + "/ckpt"
    orders.write.parquet(snap)
    val in = MemoryStream[Long]
    def start() = StreamOps.startErasureApply(in.toDF().toDF("k"),
      snap, ckpt, "cust")
    val q1 = start()
    in.addData(1L)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(snap).select(col("ok"))
      .as[Long].collect().toSet === Set(12L, 13L))
    // restart: a new request AND a replay of an already-erased key
    val q2 = start()
    in.addData(2L, 1L)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(snap).select(col("ok"))
      .as[Long].collect().toSet === Set(13L))
    // erasure of a table that does not exist refuses loudly
    val err = intercept[Exception] {
      StreamOps.applyErasureBatch(Seq(1L).toDF("k"),
        root.toString + "/missing", "cust")
    }
    assert(err.getMessage.contains("existing table"))
  }
}
