package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the maintenance pass every long-running ingest
  * needs (streaming sinks and per-batch appends leave thousands of KB-sized
  * files; at 100 TB the resulting driver listing + task-per-file overhead
  * dominates scan time long before the bytes do).
  *
  * Spark-first shape: size the target file count from the ACTUAL on-disk
  * bytes (FileSystem listing, not a row-count guess), then rewrite in one
  * job — `repartition(n)` round-robin for plain layouts (equal-sized output
  * files, no skew), or `repartitionByRange(n, cols)` when the table should
  * stay clustered so min/max stats keep pruning after the rewrite. The
  * rewrite lands in `<dir>__compact` and swaps in atomically (rename), so
  * readers never observe a half-written directory.
  */
object Compaction {

  /** Bytes currently under `dir` (data files only, dot/underscore files
    * skipped — Spark's own _SUCCESS etc).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getLen).sum
  }

  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_")
      && !s.getPath.getName.startsWith("."))
  }

  /** Compact `dir` (a parquet directory) to ~`targetFileBytes` files.
    * `clusterBy` non-empty keeps the layout range-clustered on those
    * columns (file-level min/max stay disjoint → post-compaction skipping).
    * Returns the number of output files written.
    */
  def compact(spark: SparkSession, dir: String, targetFileBytes: Long,
              clusterBy: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val total = dataBytes(spark, dir)
    if (total == 0) return dataFileCount(spark, dir) // nothing to rewrite
    val nFiles = math.max(1, math.ceil(total.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(dir)
    val repacked =
      if (clusterBy.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, clusterBy.map(col): _*)

    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compact")
    repacked.write.mode("overwrite").parquet(tmp.toString)
    // swap: old dir out of the way first so a crash leaves either the old
    // or the new complete directory, never a merge of both
    val trash = new Path(dir + "__old")
    fs.delete(trash, true)
    if (!fs.rename(p, trash)) sys.error(s"compact: cannot move $p aside")
    if (!fs.rename(tmp, p)) { fs.rename(trash, p); sys.error(s"compact: swap failed for $p") }
    fs.delete(trash, true)
    dataFileCount(spark, dir)
  }
}
