package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The per-batch directory manifest shared by the exactly-once-via-
  * filesystem streaming sinks ([[IngestDedupSink]], [[CurationIngestSink]]):
  * one `b<batchId>/` parquet directory per micro-batch, plus `g<floor>/`
  * GENERATION directories a compaction pass folds old batches into.
  *
  * Commit soundness: a batch dir counts as committed only when it holds the
  * committer's `_SUCCESS` marker — written at JOB COMPLETION, unlike the
  * directory itself, which `df.write` creates before the first task runs. A
  * crash mid-write therefore leaves a visibly-uncommitted dir (no marker)
  * that every reader skips and the replay overwrites; testing bare
  * `fs.exists(dir)` — the pre-r14 check — could mistake a partial write for
  * a commit and permanently skip the batch's real content.
  *
  * Generations: `compact` folds the current generation (if any) plus every
  * committed `b` dir into one `g<maxBatchId>/` dir. Readers take the MAX
  * generation plus the `b` dirs ABOVE it, so the fold is duplicate-free at
  * every crash point: each generation is a superset of every older one, and
  * a `b` dir at-or-below the generation floor is superseded by name alone —
  * the stale dirs it deletes afterwards are already invisible the moment the
  * staging dir renames into place. Listing cost after compaction is
  * O(batches since the last compact), not O(stream age) — the sink-family
  * answer to the Delta log's `compactLog`.
  */
object BatchManifest {

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** A data dir is committed when the write job finished (`_SUCCESS`). */
  private def isCommitted(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** Dirs holding committed rows: max generation + batch dirs above it,
    * each as (batchId, path), sorted by id. Uncommitted (marker-less) and
    * superseded (at-or-below the generation floor) dirs are excluded; so
    * are committed-but-EMPTY dirs (`_SUCCESS`, zero part files — a batch
    * whose survivors were all rejected), which would fail schema
    * inference in a multi-dir read.
    */
  def liveDirs(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return Nil
    val entries = fs.listStatus(root).filter(_.isDirectory)
    def ids(prefix: Char) = entries
      .filter(_.getPath.getName.startsWith(prefix.toString))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.drop(1).toLong -> s.getPath).toOption)
    val gens = ids('g').filter { case (_, p) => isCommitted(fs, p) }
    val floor = if (gens.isEmpty) -1L else gens.map(_._1).max
    val gen = gens.filter(_._1 == floor)
    val batches = ids('b').filter { case (id, p) => id > floor && isCommitted(fs, p) }
    (gen ++ batches).toSeq.sortBy(_._1).collect {
      case (id, p) if fs.listStatus(p).exists(
          _.getPath.getName.endsWith(".parquet")) => id -> p.toString
    }
  }

  /** The generation floor: every batch id at or below it is committed and
    * folded into the max generation dir. -1 when no generation exists.
    */
  def generationFloor(spark: SparkSession, dir: String): Long = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return -1L
    val gens = fs.listStatus(root).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("g") && isCommitted(fs, s.getPath))
      .flatMap(s => scala.util.Try(s.getPath.getName.drop(1).toLong).toOption)
    if (gens.isEmpty) -1L else gens.max
  }

  /** True when `batchId`'s rows are durably committed under `dir` —
    * folded into a generation, or present as a committed batch dir.
    */
  def isBatchCommitted(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val (fs, root) = fsOf(spark, dir)
    batchId <= generationFloor(spark, dir) ||
      isCommitted(fs, new Path(root, s"b$batchId"))
  }

  /** All committed rows under `dir`; None before the first commit. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val dirs = liveDirs(spark, dir).map(_._2)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Fold the current generation + every committed batch dir into ONE
    * `g<maxBatchId>/` dir, then delete the superseded dirs. Crash-safe at
    * every point: the fold writes to a dot-staging dir (invisible), renames
    * into place (the commit point — older dirs are superseded by the floor
    * in the new dir's NAME), then deletes; a crash mid-delete leaves
    * already-invisible dirs the next compact removes. Caller owns the
    * single-maintainer contract (same as every sink in this family — one
    * stream, one compactor). No-ops (returns -1) when fewer than two live
    * dirs exist. Returns the new floor.
    */
  def compact(spark: SparkSession, dir: String): Long = {
    val (fs, root) = fsOf(spark, dir)
    val live = liveDirs(spark, dir)
    // also count committed-but-empty batch dirs as foldable clutter
    val emptyCommitted: Seq[(Long, String)] = {
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).filter(_.isDirectory).toSeq
        .filter(s => s.getPath.getName.startsWith("b") && isCommitted(fs, s.getPath))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.drop(1).toLong -> s.getPath.toString).toOption)
        .filterNot(e => live.exists(_._1 == e._1))
        .filter(_._1 > generationFloor(spark, dir))
    }
    if (live.isEmpty || live.size + emptyCommitted.size < 2) return -1L
    val floor = (live ++ emptyCommitted).map(_._1).max
    val staging = new Path(root,
      s".gen-staging-${java.util.UUID.randomUUID()}")
    spark.read.parquet(live.map(_._2): _*)
      .write.mode("overwrite").parquet(staging.toString)
    val dest = new Path(root, s"g$floor")
    fs.delete(dest, true) // a re-compact at the same floor is idempotent
    require(fs.rename(staging, dest), s"failed to publish generation $dest")
    // superseded dirs are invisible already (floor in the name) — delete:
    // the folded inputs, every other generation, and any STALE sub-floor
    // batch dir a crashed earlier cleanup left behind (invisible to
    // readers, but permanent listing clutter unless swept here)
    (live ++ emptyCommitted).map(p => new Path(p._2))
      .filterNot(_.getName == dest.getName)
      .foreach(p => fs.delete(p, true))
    fs.listStatus(root).filter(_.isDirectory).foreach { st =>
      val name = st.getPath.getName
      val stale =
        (name.startsWith("g") && name != dest.getName &&
          scala.util.Try(name.drop(1).toLong).isSuccess) ||
        (name.startsWith("b") &&
          scala.util.Try(name.drop(1).toLong).toOption.exists(_ <= floor))
      if (stale) fs.delete(st.getPath, true)
    }
    floor
  }
}
