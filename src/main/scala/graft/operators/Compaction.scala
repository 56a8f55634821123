package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the dominant operational drag of
  * long-lived lakes: streaming and incremental writers leave
  * thousands of KB-scale files per partition, and scan throughput
  * collapses under per-file open/footer/seek overhead long before
  * raw bytes matter. Compaction rewrites a directory into files of
  * roughly `targetBytes`, preserving content exactly.
  *
  * Scale shape: the rewrite is one round-robin repartition to
  * `ceil(totalBytes / targetBytes)` output slots — balanced file
  * sizes with no assumptions about key distribution — and the file
  * listing runs on the driver against the filesystem metadata only
  * (no data read). For a partitioned lake, run per partition
  * directory so each rewrite stays bounded; a size-tiered policy
  * (only compact directories whose mean file size is below a
  * threshold) is the standard scheduling wrapper.
  */
object Compaction {

  /** @param before number of data files before compaction
    * @param bytes  total data bytes (compaction preserves content,
    *               not necessarily encoded size)
    * @param after  number of output files written */
  final case class Stats(before: Int, bytes: Long, after: Int)

  /** Rewrite the parquet directory `inDir` into `outDir` with file
    * sizes near `targetBytes`. Returns listing stats.
    *
    * `inDir` must be a LEAF directory (data files at the top level)
    * — enforced, because the sizing listing is non-recursive while
    * the parquet read is recursive: a partitioned root would size to
    * one output file and silently collapse every partition into it.
    * Run per partition directory, as the object doc says. */
  def compactParquet(spark: SparkSession, inDir: String,
      outDir: String, targetBytes: Long,
      maxOutputFiles: Long = 1L << 24): Stats = {
    require(targetBytes > 0, s"targetBytes must be > 0: $targetBytes")
    val path = new Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty,
      s"$inDir has no top-level .parquet files — compactParquet works " +
        "on leaf partition directories; compact a partitioned lake " +
        "one partition directory at a time")
    val totalBytes = files.map(_.getLen).sum
    val nLong = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes)
    require(nLong <= maxOutputFiles,
      s"targetBytes=$targetBytes would produce $nLong output files " +
        s"for $totalBytes bytes — raise targetBytes (misconfigured " +
        "unit?)")
    spark.read.parquet(inDir)
      .repartition(nLong.toInt)
      .write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new Path(outDir)).toSeq
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Stats(files.size, totalBytes, outFiles)
  }
}
