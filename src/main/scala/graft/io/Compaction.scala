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
  * rewrite lands in `<dir>__compact` and swaps in via two renames. Readers
  * never observe a HALF-WRITTEN directory, but the swap is not atomic: a
  * concurrent reader can catch the brief window between the two renames
  * where the path is absent (and a listing taken before the swap can
  * reference since-deleted files). Run compaction in the ingest's own
  * maintenance window, or front the path with a catalog/manifest
  * indirection when readers are truly concurrent.
  */
object Compaction {

  /** Data files under `dir`, RECURSIVE (Hive-partitioned layouts keep data
    * in subdirectories), dot/underscore files skipped — Spark's own
    * _SUCCESS etc.
    */
  private def dataFiles(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plain listStatus walk — names and sizes already ride the listing;
    // fs.listFiles(p, recursive = true) additionally resolves BLOCK
    // LOCATIONS per file, a serial driver pass measured 75× slower over
    // 1500 local files (the r14 CONVERT lesson, recorded in CLAUDE.md)
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    def walk(d: Path): Unit = fs.listStatus(d).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory) walk(s.getPath)
      else if (!n.startsWith("_") && !n.startsWith(".")) out += s
    }
    walk(p)
    out.toSeq
  }

  /** Bytes currently under `dir` (recursive data files only). */
  def dataBytes(spark: SparkSession, dir: String): Long =
    dataFiles(spark, dir).map(_.getLen).sum

  def dataFileCount(spark: SparkSession, dir: String): Int =
    dataFiles(spark, dir).size

  /** Compact `dir` (a parquet directory) to ~`targetFileBytes` files.
    * `clusterBy` non-empty keeps the layout range-clustered on those
    * columns (file-level min/max stay disjoint → post-compaction skipping).
    * Returns the number of output files written.
    */
  def compact(spark: SparkSession, dir: String, targetFileBytes: Long,
              clusterBy: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val p0 = new Path(dir)
    val fs0 = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A flat rewrite of a Hive-partitioned directory would FLATTEN it
    // (drop the partition layout); fail loudly instead of silently
    // restructuring — compact each leaf partition directory, or use
    // PartitionedLayout's writer to re-emit the partitioned shape.
    require(!fs0.listStatus(p0).exists(_.isDirectory),
      s"compact: $dir has subdirectories (Hive-partitioned layout); " +
        "compact leaf partition directories individually")
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
