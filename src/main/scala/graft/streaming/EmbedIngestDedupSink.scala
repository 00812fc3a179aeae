package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Similarity

/** Streaming EMBEDDING ingest with near-dup admission control — the
  * [[IngestDedupSink]] pattern for vector corpora (multimodal pipelines
  * dedup on embeddings, not text): every micro-batch sign-LSH-bands
  * itself, rejects rows whose exact cosine against a banded CANDIDATE set
  * of the accepted corpus reaches the threshold (corpus vectors are
  * fetched per candidate — the corpus is never re-banded, cost scales
  * with the batch), drops in-batch dups (smaller id wins), then appends
  * survivors + their band rows + their vectors.
  *
  * State layout per committed batch `bN`: `accepted/bN` (original rows),
  * `vecs/bN` (id, vec, nrm), and `bands/bN` (id, band, h) written LAST as
  * the commit marker — a crash-replayed batch either finds it (skip) or
  * redoes the overwrite-mode writes idempotently, the
  * [[IngestDedupSink]]/IncrementalSink manifest trick.
  */
object EmbedIngestDedupSink {

  private def readDir(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("b")).map(_.getPath.toString)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs.toSeq: _*))
  }

  /** All committed band rows / vector rows; None before the first commit. */
  def readBands(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readDir(spark, s"$stateDir/bands")
  def readVecs(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readDir(spark, s"$stateDir/vecs")

  def run(vectors: DataFrame, idCol: String, vecCol: String,
      stateDir: String, checkpoint: String, threshold: Double, dim: Int,
      bands: Int = 32, rowsPerBand: Int = 8, seed: Long = 42L): StreamingQuery = {
    val planes = Similarity.hyperplanes(dim, bands * rowsPerBand, seed)
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new Path(s"$stateDir/bands/b$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          val b = batch.select(col(idCol), col(vecCol)).localCheckpoint()
          val vsCorpus = (readBands(spark, stateDir), readVecs(spark, stateDir)) match {
            case (Some(idx), Some(vecs)) =>
              Similarity.nearDupsAgainstBandIndex(
                b, idCol, vecCol, idx, vecs, threshold, planes, bands)
                .select(col("new_id").as("__loser"))
            case _ => spark.range(0).select(col("id").as("__loser"))
          }
          // in-batch: the banded exact-verify pair set, greater id loses
          val vsBatch = Similarity.nearDupPairsBanded(
            b, idCol, vecCol, threshold, dim, bands, rowsPerBand, seed)
            .select(col("id_b").as("__loser"))
          val losers = vsCorpus.unionByName(vsBatch).distinct()
          val survivors = b
            .join(losers, b(idCol) === losers("__loser"), "left_anti")
            .localCheckpoint()
          survivors.write.mode("overwrite").parquet(s"$stateDir/accepted/b$batchId")
          Similarity.vectorStoreRows(survivors, idCol, vecCol)
            .write.mode("overwrite").parquet(s"$stateDir/vecs/b$batchId")
          Similarity.bandIndexRows(survivors, idCol, vecCol, planes, bands)
            .write.mode("overwrite").parquet(s"$stateDir/bands/b$batchId")
        }
      }
      .start()
  }
}
