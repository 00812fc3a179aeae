package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming ingest of the label-event stream (the `events`
  * table's schema), per SURVEY §2.9 — the reference is batch-only, this is
  * the north-star streaming extension.
  *
  * Design for scale: event-time processing with watermarks bounds state;
  * tumbling/sliding aggregation state is per (window, type) — small; the
  * session-window and within-watermark dedup operators keep per-key state
  * that the watermark GCs. Sinks are `foreachBatch`-able DataFrames, so any
  * batch sink (parquet/Delta/API) reuses the batch code path.
  */
object EventsStream {

  /** events schema as stored (ts arrives as LongType nanos in our parquet —
    * see graft.Tables.events — so the streaming reader takes it as long and
    * converts, identically to the batch path).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over a directory of events parquet.
    * `maxFilesPerTrigger=1` gives deterministic micro-batches in tests; at
    * scale the source is Kafka/queue with the same downstream plan.
    */
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
  }

  /** Tumbling-window counts + sums per event type with a watermark that
    * bounds state: late events beyond `lateness` are dropped, closed windows
    * are emitted and GC'd.
    */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user: a session closes after `gap` of inactivity.
    * State per active (user, session), GC'd by the watermark.
    */
  def sessionAgg(events: DataFrame, gap: String = "10 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("session_window.start").as("sstart"),
        col("session_window.end").as("send"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Exactly-once-per-key ingest dedup: duplicate event_ids arriving within
    * the watermark horizon are dropped with bounded state (the streaming
    * analog of the batch last-write-wins dedupe).
    */
  def dedupEvents(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")
}
