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

  /** events schema with `tsType` as the physical `ts` encoding — the
    * parquet has shipped nanos-as-long, micros-NTZ, and micros-UTC across
    * testdata generations (see graft.Tables.events).
    */
  def rawSchema(tsType: DataType = LongType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over a directory of events parquet.
    * `maxFilesPerTrigger=1` gives deterministic micro-batches in tests; at
    * scale the source is Kafka/queue with the same downstream plan.
    *
    * A file stream needs its schema up front; probe the physical `ts` type
    * from the existing footers with one batch read (driver-side metadata
    * only — no data scan), then normalize exactly like the batch path.
    * The probe MUST succeed: the stream's schema is fixed at construction,
    * so guessing a fallback for an empty/unreadable dir would corrupt or
    * break the stream the moment differently-encoded files arrive (a
    * LongType guess div-1000s micros, a timestamp guess rejects nanos).
    * Callers must point at a dir holding at least one representative file.
    */
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = scala.util.Try(spark.read.parquet(dir).schema("ts").dataType)
      .getOrElse(throw new IllegalArgumentException(
        s"readEvents($dir): cannot probe the physical ts encoding — the dir " +
          "must contain at least one representative events parquet file " +
          "before the stream is constructed (the schema is fixed up front)"))
    val raw = spark.readStream
      .schema(rawSchema(tsType))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    tsType match {
      // integer division — `/` on epoch nanos loses µs precision (see
      // graft.Tables.events)
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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

  /** Sliding (hopping) windowed aggregation: same state/watermark contract
    * as [[windowedAgg]], but each event contributes to size/slide
    * overlapping windows — q87 is the batch analog. State holds
    * size/slide× more open windows; the watermark GCs them identically.
    */
  def slidingAgg(events: DataFrame, size: String = "1 hour",
      slide: String = "30 minutes", lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-static enrichment: join each micro-batch against a (small)
    * static dimension with an explicit broadcast — the planner re-plans the
    * static side per batch, so the join is stateless (no watermarks, no
    * state store) and the stream never shuffles. The classic "attach user /
    * ontology attributes to the event firehose" stage: at 100 TB/day of
    * events the dimension rides along as a broadcast variable while the
    * stream stays embarrassingly parallel.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String,
      joinType: String = "left_outer"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)

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

  /** Stream-stream interval join: each click pairs with the view events of
    * the same user in the preceding `horizonSeconds` (attribution join).
    *
    * Both sides carry a watermark and the join condition bounds event time
    * on BOTH sides, so the state store holds only `lateness + horizon` of
    * either stream per key — without the time-range predicate a
    * stream-stream join would buffer its inputs forever. Inner-join matches
    * emit as they arrive (no watermark gating needed for inner joins); the
    * shuffle is one exchange per side on user_id.
    */
  def clickViewJoin(events: DataFrame, horizonSeconds: Long = 600L,
      lateness: String = "30 minutes"): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", lateness)
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", lateness)
    clicks.join(views,
        col("c_user") === col("v_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") < col("v_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** Left-outer variant of [[clickViewJoin]]: unattributed clicks survive
    * with a null view. Outer results are watermark-GATED — a click can only
    * be declared view-less once the watermark proves no admissible view can
    * still arrive inside its horizon — so null rows emit `lateness` behind
    * the matched ones; state bounds are identical to the inner join.
    */
  def clickViewJoinOuter(events: DataFrame, horizonSeconds: Long = 600L,
      lateness: String = "30 minutes"): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", lateness)
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", lateness)
    clicks.join(views,
        col("c_user") === col("v_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") < col("v_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

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

  /** Stream → date-partitioned parquet layout (graft.io.PartitionedLayout's
    * streaming producer): each micro-batch appends into
    * `path/event_date=.../`, so downstream date-filtered batch readers prune
    * at planning time while the stream is still running. Exactly-once per
    * file via the checkpoint + file-sink manifest. Returns the started
    * query; the caller owns awaitTermination/stop.
    */
  def partitionedSink(events: DataFrame, path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("event_date")
      .start()

  // --------------------------------- custom state: flatMapGroupsWithState

  /** One in-flight event for the custom-state path. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Per-user open-session accumulator (kept in the state store). */
  case class SessionState(startUs: Long, lastUs: Long, n: Long,
      sumValue: Double, types: Set[String])

  /** Full per-user state: ALL sessions the watermark has not yet sealed,
    * gap-separated and sorted by start. Sessions closed by an intra-batch
    * gap stay buffered here — append output must remain watermark-gated (a
    * later-but-within-watermark event may still belong to, or bridge,
    * "closed" sessions), so nothing emits until the watermark passes that
    * session's end + gap, exactly like the built-in session_window.
    */
  case class UserState(sessions: List[SessionState])

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

    // Watermark ms at which a session is sealed: no admissible future event
    // (all have ts >= watermark) can fall within `gap` of its end.
    def deadlineMs(s: SessionState): Long =
      math.floorDiv(s.lastUs + 999999L, 1000000L) * 1000L + gapSeconds * 1000L

    // Emit every sealed session, keep the rest; state and timeout follow.
    def flush(userId: Long, sessions: List[SessionState],
        state: GroupState[UserState]): Iterator[SessionSummary] = {
      val wm = state.getCurrentWatermarkMs()
      val (ripe, kept) = sessions.partition(deadlineMs(_) <= wm)
      if (kept.isEmpty) state.remove()
      else {
        state.update(UserState(kept))
        state.setTimeoutTimestamp(math.max(kept.map(deadlineMs).min, wm + 1L))
      }
      ripe.map(emit(userId, _)).iterator
    }

    events
      .withWatermark("ts", lateness)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            flush(userId, state.getOption.map(_.sessions).getOrElse(Nil), state)
          } else {
            // A trigger may carry MANY sessions for the key (one micro-batch
            // can hold a whole history), so split by gap inside the batch.
            // Buffered not-yet-sealed sessions and the new singletons merge
            // together in one sorted gap-fold — a late-but-within-watermark
            // event lands in (or bridges) the buffered session it belongs
            // to, instead of opening a spurious overlapping one.
            val incoming = evs.toArray.sortBy(e => us(e.ts)).map { e =>
              val t = us(e.ts)
              SessionState(t, t, 1L, e.value, Set(e.event_type))
            }
            val all = (state.getOption.map(_.sessions).getOrElse(Nil) ++ incoming)
              .sortBy(_.startUs)
            val merged = all.foldLeft(List.empty[SessionState]) {
              case (cur :: done, s) if s.startUs - cur.lastUs <= gapUs =>
                SessionState(
                  math.min(cur.startUs, s.startUs), math.max(cur.lastUs, s.lastUs),
                  cur.n + s.n, cur.sumValue + s.sumValue, cur.types ++ s.types) :: done
              case (acc, s) => s :: acc
            }.reverse
            flush(userId, merged, state)
          }
      }
  }
}
