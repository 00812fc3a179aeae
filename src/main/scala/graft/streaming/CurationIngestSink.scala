package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.{Dedup, TextAnalysis}

/** Streaming CURATION with admission control — the
  * [[graft.ext.Curation]] pipeline's ingest-forever form: every
  * micro-batch runs the BATCH-LOCAL cleaning stages (PII mask →
  * repetition gate → quality gate → optional perplexity gate, all
  * per-row codegen that cuts rows at the scan stage), then near-dup
  * admission against the already-ACCEPTED corpus — checked on stored
  * SimHash fingerprints alone (one long per accepted doc, the
  * [[IngestDedupSink]] index; the corpus text is never re-read) — plus
  * in-batch near-dup collapse (smaller id wins; exact duplicates are the
  * hamming-0 case, so a separate exact stage is redundant here).
  * Survivors append with their `quality` score.
  *
  * What is deliberately NOT here: the corpus-WIDE stages (boilerplate
  * line removal, substring-level span dedup, connected-component cluster
  * collapse, split assignment, packing) aggregate over the whole corpus
  * and belong to a periodic batch [[graft.ext.Curation.curate]] pass
  * over the accepted set — running them per micro-batch would either
  * re-scan the corpus each trigger or silently change semantics to
  * batch-local. This sink is the admission half; compose both.
  *
  * Exactly-once: the [[IngestDedupSink]] / [[BatchManifest]] layout — one
  * `b<batchId>/` directory per micro-batch under accepted/ and the
  * fingerprint index, index dir written LAST, and a batch counts as
  * committed only once the index write JOB finished (the dir's `_SUCCESS`
  * marker — the directory itself appears before any task runs, so a bare
  * existence check would mistake a crash mid-index-write for a commit and
  * leave the batch's accepted docs permanently missing from admission). A
  * crash-replayed batch either finds the committed index (skip) or redoes
  * both overwrite-mode writes idempotently; gates are deterministic
  * per-row expressions, so a replay admits the identical set.
  * [[compactGenerations]] folds old batch dirs so per-epoch listing cost
  * tracks batches-since-compaction, not stream age.
  */
object CurationIngestSink {

  /** All accepted rows so far; None before the first commit. */
  def readAccepted(spark: SparkSession, acceptedDir: String): Option[DataFrame] =
    BatchManifest.read(spark, acceptedDir)

  /** Fold committed batch dirs into one generation per store — see
    * [[IngestDedupSink.compactGenerations]] (same layout, same contract).
    */
  def compactGenerations(spark: SparkSession, indexDir: String,
      acceptedDir: String): Long =
    IngestDedupSink.compactGenerations(spark, indexDir, acceptedDir)

  def run(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, acceptedDir: String, checkpoint: String,
      minQuality: Double = 0.5, maxHamming: Int = 3,
      scrubPii: Boolean = false, maxDupNgramFrac: Option[Double] = None,
      perplexityGate: Option[(String, Double)] = None,
      normalizeNfc: Boolean = false,
      compactIndexEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!BatchManifest.isBatchCommitted(spark, indexDir, batchId)) {
          // per-row gates in cleaning order, one codegen'd pass; the
          // normalized/masked text is what fingerprints (NFC first, so a
          // decomposed re-encoding of an accepted doc collapses onto its
          // stored fingerprint instead of re-ingesting as new)
          var cur = batch.select(col(idCol), col(textCol))
          if (normalizeNfc)
            cur = cur.withColumn(textCol,
              TextAnalysis.normalizeUnicode(col(textCol)))
          if (scrubPii)
            cur = cur.withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))
          maxDupNgramFrac.foreach { bound =>
            cur = cur.filter(
              TextAnalysis.dupNgramFraction(col(textCol), 2) <= bound)
          }
          cur = cur
            .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
            .filter(col("quality") >= minQuality)
          perplexityGate.foreach { case (modelId, bound) =>
            cur = cur.filter(
              graft.ext.LangModel.perplexityBits(col(textCol), modelId) <= bound)
          }
          // one materialization feeds both dedup checks and the anti-join
          val b = cur.localCheckpoint()
          val vsCorpus = IngestDedupSink.readIndex(spark, indexDir) match {
            case Some(idx) =>
              Dedup.simhashAgainstIndex(b, idCol, textCol, idx, maxHamming)
                .select(col("new_id").as("__loser"))
            case None => spark.range(0).select(col("id").as("__loser"))
          }
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
