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
  * Exactly-once across restarts without a transactional store (the
  * IncrementalSink manifest trick): the index directory is written LAST
  * and named by the batch id, so a crash-replayed batch either finds it
  * (fully committed → skip) or redoes both overwrite-mode writes
  * idempotently.
  */
object IngestDedupSink {

  /** All committed index rows (id, sh); None before the first commit. */
  def readIndex(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("b")).map(_.getPath.toString)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs.toSeq: _*))
  }

  def run(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, acceptedDir: String, checkpoint: String,
      maxHamming: Int = 3): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val commitMarker = new Path(s"$indexDir/b$batchId")
        val fs = commitMarker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(commitMarker)) {
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
      }
      .start()
}
