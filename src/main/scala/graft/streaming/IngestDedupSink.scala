package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming corpus ingest with near-dup ADMISSION CONTROL: every
  * micro-batch fingerprints itself (one long per doc), rejects rows that
  * near-dup the already-accepted corpus (checked against the persisted
  * [[Dedup.simhashIndex]] — the corpus is never re-hashed) or each other
  * (smaller id wins inside the batch), then appends the survivors and
  * their fingerprints. The index is append-only — one `b<batchId>/`
  * parquet directory per micro-batch — so state grows by |survivors| per
  * trigger and a reader is a plain multi-directory scan.
  *
  * Exactly-once across restarts without a transactional store: the index
  * directory is written LAST and named by the batch id, and a batch
  * counts as committed only once the write JOB finished — its `_SUCCESS`
  * marker, [[BatchManifest]]'s rule, because `df.write` creates the
  * directory itself before any task runs, so a bare existence check
  * would mistake a crash-mid-write for a commit and skip the batch's
  * real content forever. A replayed batch either finds the committed
  * index dir (skip) or redoes both overwrite-mode writes idempotently;
  * uncommitted partials are invisible to every reader, including the
  * admission check itself. [[compactGenerations]] folds old batch dirs
  * so listing cost tracks batches-since-compaction, not stream age.
  */
object IngestDedupSink {

  /** All committed index rows (id, sh); None before the first commit. */
  def readIndex(spark: SparkSession, indexDir: String): Option[DataFrame] =
    BatchManifest.read(spark, indexDir)

  /** Fold committed index + accepted batch dirs into one generation each.
    * The two stores fold independently — replay consults only the INDEX's
    * committed state, and each store's readers use its own floor — so any
    * crash between the folds leaves both correct. Exactly-once replay
    * survives the fold: a pre-floor batch id reads as committed from the
    * generation floor itself. Safe mid-stream between triggers
    * (single-maintainer contract). Returns the new index floor (-1 =
    * nothing to fold).
    *
    * COST asymmetry, deliberate: the INDEX fold rewrites fingerprints —
    * ~16 bytes per accepted doc, cheap at any corpus size, and the index
    * is what every epoch's admission LISTS — while the ACCEPTED fold
    * rewrites the full text corpus. `foldAccepted = false` folds the
    * index alone (accepted listing then grows with batch count, which
    * only its occasional batch-pass consumers pay); leave it true when
    * accepted is small or the fold rides a scheduled maintenance window.
    */
  def compactGenerations(spark: SparkSession, indexDir: String,
      acceptedDir: String, foldAccepted: Boolean = true): Long = {
    if (foldAccepted) BatchManifest.compact(spark, acceptedDir)
    BatchManifest.compact(spark, indexDir)
  }

  /** `compactIndexEvery > 0` folds the INDEX generations automatically
    * every N batches (index-only — the cheap, hot-path fold; see
    * [[compactGenerations]] for the cost asymmetry), so an unattended
    * ingest-forever stream never accretes unbounded batch dirs.
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, acceptedDir: String, checkpoint: String,
      maxHamming: Int = 3, compactIndexEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.isBatchCommitted(spark, indexDir, batchId)) {
          // one fingerprint/text materialization feeds both checks and the
          // anti-join (foreachBatch frames re-execute per action otherwise)
          val b = batch.select(col(idCol), col(textCol)).localCheckpoint()
          val vsCorpus = readIndex(spark, indexDir) match {
            case Some(idx) =>
              Dedup.simhashAgainstIndex(b, idCol, textCol, idx, maxHamming)
                .select(col("new_id").as("__loser"))
            case None => spark.range(0).select(col("id").as("__loser"))
          }
          // inside the batch the smaller id wins its pair
          val vsBatch = Dedup.simhashNearDupPairs(b, idCol, textCol, maxHamming)
            .select(col("id_b").as("__loser"))
          val losers = vsCorpus.unionByName(vsBatch).distinct()
          val survivors = b
            .join(losers, b(idCol) === losers("__loser"), "left_anti")
            .localCheckpoint()
          survivors.write.mode("overwrite").parquet(s"$acceptedDir/b$batchId")
          Dedup.simhashIndex(survivors, idCol, textCol)
            .write.mode("overwrite").parquet(s"$indexDir/b$batchId")
        }
        if (compactIndexEvery > 0 && (batchId + 1) % compactIndexEvery == 0) {
          BatchManifest.compact(spark, indexDir)
          ()
        }
      }
      .start()
}
