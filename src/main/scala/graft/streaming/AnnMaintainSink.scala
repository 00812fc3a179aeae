package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.AnnIndex

/** Streaming maintenance loop for a persisted [[AnnIndex]] — the
  * ingest-forever glue between the batch verbs: every micro-batch of
  * embeddings APPENDS to the index ([[AnnIndex.append]] — cost ∝ batch,
  * untouched cells gain no files), then the drift monitor runs
  * ([[AnnIndex.cellStats]], one footer-cheap aggregate) and remediation
  * fires only past its threshold: a cell whose balance exceeds
  * `maxBalance` triggers [[AnnIndex.rebalance]] (hot cells split, starved
  * cells fold when `minBalance > 0`), and every `refreshEvery`-th batch of
  * a PQ index offers [[AnnIndex.refreshCodebooks]] a candidate retrain
  * (discarded unless reconstruction error materially improves — the
  * versioned-codebook contract keeps mixed generations exact).
  *
  * Exactly-once across restarts WITHOUT a transactional store — the
  * [[IngestDedupSink]] manifest trick cannot apply directly because
  * [[AnnIndex.append]] adds files to shared `cell=` directories rather
  * than writing a per-batch directory, so the sink brackets the append in
  * a two-phase marker under `<index>/_stream/`:
  *
  *   1. `b<id>.inflight` written BEFORE the append;
  *   2. append;
  *   3. rename to `b<id>.done` — the commit point.
  *
  * A replayed batch that finds `.done` skips entirely. One that finds
  * `.inflight` crashed mid-append: it RECONCILES by deleting the batch's
  * ids from the index ([[AnnIndex.delete]] — id-pushed scan, a no-op when
  * nothing landed) before appending again, so the append is idempotent.
  * The batch id set crosses the driver only on this recovery path and is
  * bounded by one micro-batch (admission-controlled upstream).
  *
  * Maintenance runs AFTER the commit point and is deliberately outside
  * it: a crash mid-rebalance replays as a committed batch (skip), and the
  * NEXT batch's stats check re-derives the same drift signal and
  * re-triggers remediation — the decision is stateless, the remediation
  * ops carry their own documented single-writer swap contracts.
  */
object AnnMaintainSink {

  private def markers(spark: SparkSession, indexPath: String): (org.apache.hadoop.fs.FileSystem, Path) = {
    val dir = new Path(indexPath, "_stream")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    (fs, dir)
  }

  /** One micro-batch through the append + drift-remediation loop.
    * `afterAppend` is a failpoint hook between the append and the commit
    * rename (the crash window the reconcile path exists for) — production
    * callers leave it a no-op; the crash spec throws from it once.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String, indexPath: String,
      maxBalance: Double, minBalance: Double,
      refreshEvery: Int, errorFactor: Double,
      extraCols: Seq[String],
      afterAppend: () => Unit = () => ()): Unit = {
    val spark = batch.sparkSession
    val (fs, dir) = markers(spark, indexPath)
    val done = new Path(dir, s"b$batchId.done")
    val inflight = new Path(dir, s"b$batchId.inflight")
    if (fs.exists(done)) return
    val b = batch.select(col(idCol).cast("long").as(idCol) +: col(vecCol) +:
      extraCols.map(col): _*).localCheckpoint()
    if (b.isEmpty) {
      fs.create(done, true).close()
      return
    }
    if (fs.exists(inflight)) {
      // previous attempt crashed between append and commit: some, all, or
      // none of this batch's files may have landed — delete its ids (the
      // ONLY rows they can hold; ids are unique per stream contract) and
      // redo the append from scratch
      val ids = b.select(col(idCol)).collect().map(_.getLong(0)).toSeq
      AnnIndex.delete(spark, indexPath, ids)
    } else {
      fs.create(inflight, true).close()
    }
    AnnIndex.append(b, idCol, vecCol, indexPath, extraCols)
    afterAppend()
    require(fs.rename(inflight, done), s"failed to commit marker $done")

    // ---- drift monitor + remediation (outside the commit point) ----
    val maxBal = AnnIndex.cellStats(spark, indexPath)
      .agg(max(col("balance"))).collect()(0).getDouble(0)
    if (maxBal > maxBalance)
      AnnIndex.rebalance(spark, indexPath, maxBalance, minBalance = minBalance)
    if (refreshEvery > 0 && (batchId + 1) % refreshEvery == 0 &&
        AnnIndex.meta(spark, indexPath).m > 0)
      AnnIndex.refreshCodebooks(spark, indexPath, errorFactor)
  }

  /** Wire an embedding stream into a persisted index built by
    * [[AnnIndex.build]]. `refreshEvery = 0` disables codebook refresh
    * (always disabled for non-PQ indexes); `minBalance = 0` disables the
    * starved-cell merge pass.
    */
  def run(vectors: DataFrame, idCol: String, vecCol: String,
      indexPath: String, checkpoint: String,
      maxBalance: Double = 4.0, minBalance: Double = 0.0,
      refreshEvery: Int = 0, errorFactor: Double = 1.05,
      extraCols: Seq[String] = Nil): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, vecCol, indexPath,
          maxBalance, minBalance, refreshEvery, errorFactor, extraCols)
      }
      .start()
}
