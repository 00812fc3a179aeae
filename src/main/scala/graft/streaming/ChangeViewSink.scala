package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.io.{DeltaMerge, DeltaRead, DeltaWrite}

/** Streaming MATERIALIZED VIEW maintenance: keep a per-key aggregate Delta
  * table exactly current with a source Delta table, by tailing the
  * source's change stream ([[DeltaChangeSource]]) and folding each
  * micro-batch's signed row changes into the view — the full CDC loop
  * (DML on the source → change tail → incremental apply → exactly-once
  * view commit) as one call.
  *
  * The view's columns are `keyCols..., n, sum, mn, mx`
  * ([[graft.ext.Incremental]]'s state layout): count and sum form a group
  * under insert/delete signs, so they stay EXACT under arbitrary source
  * DML (DV deletes, copy-on-write updates, merges); min/max are
  * non-invertible and degrade to bounds once an extremum is deleted —
  * the same contract as `Incremental.applyChanges`, which this is the
  * streaming composition of. Cost per epoch is O(|batch| + touched keys):
  * one aggregate over the change rows, one left-outer join against the
  * view's touched keys, one MERGE whose copy-on-write scope is the
  * touched keys' files — the view's history is never rescanned.
  *
  * Exactly-once across crashes, without a view-side log of applied
  * batches beyond Delta's own `txn` markers:
  *
  *   1. the epoch's new state rows (INCLUDING keys whose count reached
  *      zero, kept as tombstone rows `n = 0`) MERGE in with
  *      `txn = (appId, batchId)` — a replayed epoch is recognized by the
  *      marker and skipped whole, so the fold is applied exactly once
  *      even though `n += d_n` is not idempotent;
  *   2. tombstone rows then DELETE by predicate (`n <= 0`) — idempotent
  *      by construction, so it needs no marker, and a crash between the
  *      two commits heals on replay (step 1 skips, step 2 re-deletes).
  *
  * Readers between the two commits may see a tombstone row; [[readView]]
  * filters them and derives `avg`, matching `Incremental.readView`.
  */
object ChangeViewSink {

  /** Create the (empty) view table when absent, then start the stream.
    * `startingVersion = "earliest"` folds the source's full history —
    * the bootstrap shape; pass a version to start from a snapshot you
    * derived some other way.
    */
  def maintain(spark: SparkSession, sourcePath: String, viewPath: String,
      keyCols: Seq[String], valueCol: String, appId: String,
      checkpoint: String, startingVersion: String = "earliest",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val srcSchema = DeltaRead.readDeltaTable(spark, sourcePath).schema
    val viewSchema = StructType(
      keyCols.map(k => srcSchema(k)) ++ Seq(
        StructField("n", LongType), StructField("sum", DoubleType),
        StructField("mn", DoubleType), StructField("mx", DoubleType)))
    val logDir = new org.apache.hadoop.fs.Path(viewPath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir))
      DeltaWrite.writeDeltaTable(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], viewSchema),
        viewPath, "append")
    spark.readStream
      .format("graft.streaming.DeltaChangeSource")
      .option("path", sourcePath)
      .option("startingVersion", startingVersion)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, viewPath, keyCols, valueCol, appId, batchId): Unit
      }
      .start()
  }

  /** Fold one change batch into the view — also the poll-driven batch
    * surface (pair with [[graft.io.DeltaRead.changeDiff]]). Returns true
    * when the epoch committed, false on a recognized replay.
    */
  def applyBatch(changes: DataFrame, viewPath: String, keyCols: Seq[String],
      valueCol: String, appId: String, batchId: Long): Boolean = {
    val spark = changes.sparkSession
    if (batchId <= DeltaWrite.lastTxnVersion(spark, viewPath, appId)) {
      DeltaMerge.deleteWhere(spark, viewPath, col("n") <= 0) // heal step 2
      return false
    }
    val v = col(valueCol).cast("double")
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(lit(-1L))
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(v.isNotNull, sign).otherwise(lit(0L))).as("d_n"),
        sum(coalesce(v, lit(0.0)) * sign).as("d_sum"),
        min(when(sign > 0, v)).as("d_mn"),
        max(when(sign > 0, v)).as("d_mx"))
    if (delta.isEmpty) return false
    // new state of the TOUCHED keys only (left outer: new keys have no
    // state row) — materialized BEFORE the merge mutates what it reads
    val view = DeltaRead.readDeltaTable(spark, viewPath)
    val folded = delta.join(view, keyCols, "left_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + col("d_n")).as("n"),
        (coalesce(col("sum"), lit(0.0)) + col("d_sum")).as("sum"),
        least(col("mn"), col("d_mn")).as("mn"),
        greatest(col("mx"), col("d_mx")).as("mx")): _*)
      .localCheckpoint()
    DeltaMerge.merge(spark, viewPath, folded, keyCols,
      txn = Some(appId -> batchId))
    DeltaMerge.deleteWhere(spark, viewPath, col("n") <= 0)
    true
  }

  /** The consumer-facing view: tombstones filtered, `avg` derived. */
  def readView(spark: SparkSession, viewPath: String): DataFrame =
    DeltaRead.readDeltaTable(spark, viewPath)
      .filter(col("n") > 0)
      .withColumn("avg", col("sum") / col("n"))

  /** Convenience for specs/pipelines: the exact aggregate the view must
    * equal, computed from the source's CURRENT snapshot.
    */
  def expectedView(spark: SparkSession, sourcePath: String,
      keyCols: Seq[String], valueCol: String): DataFrame = {
    val v: Column = col(valueCol).cast("double")
    DeltaRead.readDeltaTable(spark, sourcePath)
      .groupBy(keyCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("sum"))
  }
}
