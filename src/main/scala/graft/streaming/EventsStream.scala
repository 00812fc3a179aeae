package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  // ------------------------------------------------- streaming API sink

  /** Streaming → batched-API sink bridge: every micro-batch runs through
    * the BATCH upload path (graft.io.BatchedSink.uploadDistributed —
    * executor-side POSTs, `batchSize`-bounded bodies), so the streaming
    * sink is the batch sink plus checkpointing. Exactly the reference's
    * upload pipeline (S10) fed by a stream instead of a table; pair with
    * [[dedupEvents]] upstream for within-watermark idempotence.
    *
    * Returns the started query; the caller owns awaitTermination/stop.
    */
  def uploadSink(events: DataFrame, payload: org.apache.spark.sql.Column,
      transport: graft.io.UploadTransport, batchSize: Int,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.io.BatchedSink.uploadDistributed(batch.toDF(), payload, transport, batchSize)
        ()
      }
      .start()

  // --------------------------------- custom state: flatMapGroupsWithState

  /** One in-flight event for the custom-state path. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Per-user open-session accumulator (kept in the state store). */
  case class SessionState(startUs: Long, lastUs: Long, n: Long,
      sumValue: Double, types: Set[String])

  /** Emitted when a session closes (gap elapsed past the watermark). */
  case class SessionSummary(user_id: Long, sstart: java.sql.Timestamp,
      send: java.sql.Timestamp, n_events: Long, sum_value: Double, n_types: Int)

  /** Custom sessionization via `flatMapGroupsWithState` — for session
    * payloads `session_window` can't express (here: the DISTINCT event-type
    * count per session, i.e. per-key state beyond an algebraic aggregate).
    *
    * State per ACTIVE user only: an event folds into the open session; the
    * event-time timeout fires once the watermark passes last-event + gap,
    * emitting the summary and clearing the state — so state size tracks
    * concurrently-active users, not history, and the watermark GCs exactly
    * like the built-in session_window.
    */
  def customSessions(events: DataFrame, gapSeconds: Long = 600L,
      lateness: String = "30 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def us(t: java.sql.Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000

    // Inverse of `us` at full microsecond precision (Timestamp(millis)
    // alone would truncate the sub-millisecond digits the batch twin keeps).
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def emit(userId: Long, s: SessionState): SessionSummary =
      SessionSummary(userId, tsOf(s.startUs), tsOf(s.lastUs),
        s.n, s.sumValue, s.types.size)

    events
      .withWatermark("ts", lateness)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(userId, _))
            state.remove()
            out.iterator
          } else {
            // A trigger may carry MANY sessions for the key (one micro-batch
            // can hold a whole history), so split by gap inside the batch
            // too: sort by event time, emit every session closed within the
            // batch, keep only the open tail in state for the timeout.
            // Cross-trigger late events are folded in arrival order — the
            // same approximation every incremental sessionizer makes inside
            // the watermark horizon.
            val sorted = evs.toArray.sortBy(e => us(e.ts))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
            var open = state.getOption
            sorted.foreach { e =>
              val t = us(e.ts)
              open match {
                case Some(s) if t - s.lastUs <= gapUs =>
                  open = Some(SessionState(
                    math.min(s.startUs, t), math.max(s.lastUs, t),
                    s.n + 1, s.sumValue + e.value, s.types + e.event_type))
                case Some(s) =>
                  closed += emit(userId, s)
                  open = Some(SessionState(t, t, 1L, e.value, Set(e.event_type)))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value, Set(e.event_type)))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSeconds * 1000L)
            }
            closed.iterator
          }
      }
  }
}
