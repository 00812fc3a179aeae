package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.io.{DeltaMerge, DeltaWrite}

/** Streaming UPSERT sink — the CDC-apply shape: each micro-batch MERGEs
  * into the Delta table keyed by `keyCols` (matched rows update, new keys
  * insert), with the same EXACTLY-ONCE `txn` handshake as
  * [[DeltaStreamSink]]: the epoch marker commits atomically WITH the
  * copy-on-write rewrite, so a crash-replayed batch is recognized by its
  * id and skipped whole — an upsert is not idempotent by itself (replaying
  * `cents += x` twice corrupts), which is exactly why the marker must ride
  * the same commit.
  *
  * The batch must be one row per key ([[DeltaMerge.merge]]'s cardinality
  * guard refuses otherwise) — aggregate or last-wins-dedupe upstream; a
  * streaming aggregation in update mode produces exactly this shape.
  */
object DeltaMergeSink {

  /** Start an exactly-once streaming upsert of `stream` into the Delta
    * table at `tablePath`. `appId` namespaces the epoch markers, as in
    * [[DeltaStreamSink.append]].
    */
  def upsert(stream: DataFrame, tablePath: String, keyCols: Seq[String],
      appId: String, checkpoint: String,
      outputMode: String = "update",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, tablePath, keyCols, appId, batchId): Unit
      }
      .start()

  /** One epoch's merge — also the BATCH idempotent-upsert surface.
    * Returns true when the batch committed, false when the txn high-water
    * mark shows it already had (replay → skip).
    */
  def mergeBatch(batch: DataFrame, tablePath: String, keyCols: Seq[String],
      appId: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    if (batchId <= DeltaWrite.lastTxnVersion(spark, tablePath, appId)) false
    else {
      DeltaMerge.merge(spark, tablePath, batch, keyCols,
        txn = Some(appId -> batchId))
      true
    }
  }
}
