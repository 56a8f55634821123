package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable exact ranking for LOW-CARDINALITY groups — the shape
  * `row_number().over(Window.partitionBy(fewGroups).orderBy(...))`
  * cannot survive: a window partitioned by a 3-value column runs
  * the whole rank sort as 3 single-threaded tasks, which is 2M rows
  * per task at sf1 and a job that never finishes at 100 TB. This is
  * the classic two-phase distributed rank (TeraSort's bookkeeping
  * applied per group):
  *
  *  1. range-partition the rows by (group ++ order) into P
  *     partitions — each partition holds a contiguous slice of the
  *     global per-group order, and equal keys never split;
  *  2. count rows per (partition, group) — a P×|groups| frame,
  *     collected (bounded: this operator REQUIRES few groups, and
  *     guards the collect) and turned into per-(partition, group)
  *     EXCLUSIVE prefix offsets;
  *  3. rank = offset + row_number over (partition, group) — P
  *     parallel sorts of ~n/P rows instead of |groups| sorts of
  *     ~n/|groups|.
  *
  * The range exchange is materialized ONCE through [[Ckpt.cut]]
  * before both consumers read it: RangePartitioning picks its
  * bounds by sampling, so two independent executions of the same
  * plan could disagree on partition boundaries — the cut pins one
  * set of boundaries for the count pass and the rank pass (and
  * keeps plan depth O(1), as every iterative kernel here does).
  *
  * Determinism contract: `orderCols` must be a TOTAL order within
  * each group (include a unique tiebreaker, e.g. the row's key
  * columns) — same contract a deterministic window rank needs.
  *
  * When NOT to use: high-cardinality groups (the P×G count frame is
  * the bound — the guard throws past 1M entries); there the plain
  * window is already parallel because the groups themselves spread
  * over the cluster.
  *
  * SQL surface: `SELECT * FROM parallel_rank('view',
  * 'group_cols_csv', 'order_cols_csv'[, 'out_col'])`
  * ([[graft.GraftExtensions]]) — so SQL users don't fall back into
  * the low-cardinality window trap this operator exists to fix.
  */
object Ranks {

  /** Exact 1-based per-group rank of every row.
    * @param out  name of the appended rank column
    * @param numPartitions range-partition width; 0 = the session's
    *              shuffle-partition setting
    */
  def parallelRank(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], out: String = "rank",
      numPartitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty && orderCols.nonEmpty,
      "parallelRank: group and order columns required")
    require(!df.columns.contains(out),
      s"parallelRank: output column $out already exists")
    // reserved internals (mirrors Cdc.snapshotDiff's prefix guard):
    // an input already carrying one of these would be silently
    // overwritten by withColumn and dropped on the way out
    val reserved = Set("__pid", "__opid", "__off", "__cnt") ++
      groupCols.map(c => s"__og_$c")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"parallelRank: input columns ${clash.mkString(", ")} collide " +
        "with reserved internal names (__pid/__opid/__off/__cnt/" +
        "__og_*) — rename them first")
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys: Seq[Column] = (groupCols ++ orderCols).map(col)
    val parted = Ckpt.cut(df.repartitionByRange(p, keys: _*))
    val withPid = parted.withColumn("__pid", spark_partition_id())
    // (pid, group) counts — small by contract; guarded collect
    val counts = withPid
      .groupBy((col("__pid") +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("__cnt"))
      .limit(1000001)
      .collect()
    require(counts.length <= 1000000,
      "parallelRank: partition x group frame exceeds 1M entries — " +
        "groups are not low-cardinality; use a plain window rank " +
        "(it parallelizes over the groups themselves)")
    // exclusive prefix offsets per group, pid-ascending (range
    // partition i holds globally smaller keys than i+1)
    val offsets = counts
      .map(r => (r.getInt(0),
        groupCols.indices.map(i => r.get(i + 1)).toIndexedSeq,
        r.getLong(groupCols.length + 1)))
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, grp, cnt) =>
          val off = acc; acc += cnt; (pid, grp, off)
        }
      }.toSeq
    val offRows = offsets.map { case (pid, grp, off) =>
      org.apache.spark.sql.Row.fromSeq(pid +: grp :+ off)
    }
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        groupCols.map(c => df.schema(c)
          .copy(name = c)).toIndexedSeq :+
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val localRank = row_number().over(
      Window.partitionBy((col("__pid") +: groupCols.map(col)): _*)
        .orderBy(orderCols.map(col): _*)).cast("long")
    // null-safe join on the group columns — a NULL group is a group
    // like any other and must not silently drop through an inner join
    val offSide = offDf.select(
      (col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+
        col("__off")): _*)
    val joinCond = (col("__pid") === col("__opid")) &&
      groupCols.map(c => col(c) <=> col(s"__og_$c")).reduce(_ && _)
    withPid
      .join(broadcast(offSide), joinCond)
      .withColumn(out, col("__off") + localRank)
      .drop(("__pid" +: "__opid" +: "__off" +:
        groupCols.map(c => s"__og_$c")): _*)
  }
}
