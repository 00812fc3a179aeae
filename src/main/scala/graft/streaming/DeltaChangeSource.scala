package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.io.DeltaRead

/** Structured-streaming CHANGE TAIL over a Delta table — the streaming
  * form of [[DeltaRead.changeFeed]]/[[DeltaRead.changeDiff]], closing the
  * gap [[DeltaRead.readStreamAppendOnly]] refuses: tables that take
  * row-level DML (deletion vectors, copy-on-write rewrites), partitioned
  * tables, and id/name-mapped tables, with or without
  * `delta.enableChangeDataFeed`.
  *
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.DeltaChangeSource")
  *     .option("path", tablePath)
  *     .option("startingVersion", "0")     // or "earliest" / "latest" (default)
  *     .option("startingTimestamp", "1700000000000") // changes at/after (excl. with startingVersion)
  *     .option("maxVersionsPerBatch", "10") // admission bound (optional)
  *     .load()                              // cols..., _change_type, _commit_version
  * }}}
  *
  * Offsets are COMMIT VERSIONS (the table's own log is the replay
  * authority), so exactly-once falls out of determinism: a micro-batch is
  * the change rows of a `(fromVersion, toVersion]` log range, re-derivable
  * bit-for-bit on recovery from the checkpointed offsets — no source-side
  * state beyond the integer. Each `getBatch` serves the range through
  * [[DeltaRead.changeDiff]], which routes to the recorded change feed
  * when the table has one (update pre/post images preserved) and
  * otherwise decomposes the log's add/remove/DV actions exactly; the
  * returned frame stays LAZY (`queryExecution.toRdd` under a streaming
  * wrapper), so range cost is paid by the micro-batch's own executors —
  * O(changed files), never a table rescan.
  *
  * `startingVersion`: "latest" (default) tails changes committed after
  * the stream starts — the CDC-consumer shape; "earliest" (= -1) replays
  * from the table's first commit — the bootstrap shape; an explicit N
  * serves `(N, head]`, matching the batch APIs' exclusive-from convention.
  * A "latest" resolution is persisted under the source's `metadataPath`
  * on FIRST creation and read back on recovery — resolving it per restart
  * would silently re-floor an uncommitted batch-0 range at the NEW head
  * and lose the original range (the classic v1-source recovery edge).
  *
  * Admission control: `maxVersionsPerBatch` bounds every micro-batch to
  * at most that many commit versions past the previous end offset, so a
  * stream recovering from a long outage drains the backlog in bounded
  * epochs instead of one giant range. [[SupportsTriggerAvailableNow]] is
  * implemented natively: `Trigger.AvailableNow` snapshots the head at
  * start and drains `(committed, head]` — in `maxVersionsPerBatch`-sized
  * epochs when set — then stops, with no engine fallback warning.
  *
  * The v1 `Source` API is deliberate: its `getBatch` returns a DataFrame,
  * which lets the micro-batch BE the (pruned, bitmap-filtered) change
  * query — the DSv2 micro-batch API would force hand-built partition
  * readers and re-implement the entire change-decomposition scan. The
  * engine still routes offset computation through the admission-control
  * seam ([[SupportsAdmissionControl.latestOffset]]) whenever a v1 source
  * implements it — the same Source + SupportsAdmissionControl +
  * SupportsTriggerAvailableNow combination Spark's own Kafka v1 source
  * uses for `maxOffsetsPerTrigger`.
  */
class DeltaChangeSource extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-delta-changes"

  private def pathOf(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta-changes requires .option(\"path\", <delta table>)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-delta-changes derives its schema from the " +
      "table; a user schema is not supported")
    (shortName(), DeltaChangeSource.changeSchema(ctx.sparkSession, pathOf(params)))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val spark = ctx.sparkSession
    val path = pathOf(params)
    val startTs = params.get("startingTimestamp")
      .orElse(params.get("startingtimestamp"))
    val startVer = params.get("startingVersion")
      .orElse(params.get("startingversion"))
    require(startTs.isEmpty || startVer.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    // startingTimestamp resolves to a version FLOOR once (persisted like
    // every start), delta-spark's CDF semantics: changes committed AT or
    // AFTER the instant. Commits all before it → only future commits.
    // By-name into resolveStartVersion: a RECOVERY reads the persisted
    // floor and never re-lists the log to re-resolve the timestamp.
    def option: String = startTs match {
      case Some(ts) =>
        val t = ts.toLong
        val commits = graft.io.DeltaRead.commitTimestamps(spark, path)
        commits.filter(_._2 >= t).map(_._1).minOption match {
          case Some(first) => (first - 1).toString
          case None => "latest"
        }
      case None => startVer.getOrElse("latest")
    }
    val start = DeltaChangeSource.resolveStartVersion(spark, path, metadataPath,
      option)
    val maxVersions = params.get("maxVersionsPerBatch")
      .orElse(params.get("maxversionsperbatch")).map(_.toLong)
    maxVersions.foreach(n => require(n > 0,
      s"maxVersionsPerBatch must be positive, got $n"))
    new DeltaChangeSource.ChangeTail(spark, path, start, maxVersions)
  }
}

object DeltaChangeSource {
  private[streaming] def changeSchema(spark: SparkSession, path: String): StructType = {
    val table = DeltaRead.readDeltaTable(spark, path).schema
    StructType(table.fields ++ Seq(StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
  }

  /** The stream's start version, resolved EXACTLY ONCE per stream: the
    * first creation resolves the option ("latest" → current head) and
    * persists the result under `metadataPath`; every recovery reads the
    * persisted value back. Without this, "latest" re-resolved at restart
    * — if batch 0's offset was logged but not committed while commits
    * landed during the outage, the recomputed floor would jump PAST the
    * logged range and `getBatch` would serve it empty, permanently losing
    * those rows.
    */
  private[streaming] def resolveStartVersion(spark: SparkSession, path: String,
      metadataPath: String, option: => String): Long = {
    val fs = new Path(metadataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(metadataPath, "graft-start-version")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } else {
      val resolved = option match {
        case "latest" => DeltaRead.latestVersion(spark, path)
        case "earliest" => -1L
        case v => v.toLong
      }
      fs.mkdirs(new Path(metadataPath))
      val tmp = new Path(metadataPath, s".graft-start-version.tmp")
      val out = fs.create(tmp, true)
      try out.write(resolved.toString.getBytes("UTF-8")) finally out.close()
      require(fs.rename(tmp, marker) || fs.exists(marker),
        s"could not persist start version under $metadataPath")
      resolved
    }
  }

  private final class ChangeTail(spark: SparkSession, path: String,
      startVersion: Long, maxVersionsPerBatch: Option[Long])
      extends Source with SupportsAdmissionControl
      with SupportsTriggerAvailableNow {
    override val schema: StructType = changeSchema(spark, path)

    /** Head snapshot taken when `Trigger.AvailableNow` starts: the drain
      * target. `MaxValue` (no cap) for continuous triggers — `prepare` is
      * only invoked for AvailableNow runs, and the source instance is
      * per-query, so the cap never leaks across runs.
      */
    @volatile private var availableNowCap: Long = Long.MaxValue

    override def prepareForTriggerAvailableNow(): Unit =
      availableNowCap = DeltaRead.latestVersion(spark, path)

    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

    /** Next end offset: the log head, clipped to the AvailableNow snapshot
      * and to `maxVersionsPerBatch` versions past the previous end —
      * progress floors come from the ENGINE's `startOffset` (committed /
      * available offset), never recomputed here, so recovery resumes from
      * the checkpoint even when the head moved while the stream was down.
      */
    override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
      val from = Option(startOffset).map(versionOf).getOrElse(startVersion)
      val head = math.min(DeltaRead.latestVersion(spark, path), availableNowCap)
      val to = maxVersionsPerBatch.map(n => math.min(head, from + n)).getOrElse(head)
      if (to <= from) startOffset else LongOffset(to)
    }

    /** Unbounded head — only reachable when the engine bypasses the
      * admission-control seam (it does not for sources implementing it;
      * kept for API completeness).
      */
    override def getOffset: Option[Offset] = {
      val head = DeltaRead.latestVersion(spark, path)
      if (head >= 0) Some(LongOffset(head)) else None
    }

    /** Offsets arrive as [[LongOffset]] from this source's own offset
      * methods and as serialized-json wrappers on checkpoint recovery —
      * `json()` is the one representation all share.
      */
    private def versionOf(o: OffsetV2): Long = o.json().trim.toLong

    override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
      val from = start.map(versionOf).getOrElse(startVersion)
      val to = versionOf(end)
      val out =
        if (from >= to)
          // recovery edge: a fully-committed range re-offered as empty
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else
          DeltaRead.changeDiff(spark, path, from, Some(to))
            .select(schema.fieldNames.map(col).toSeq: _*)
      GraftSqlShims.streamingDataFrame(spark, out.queryExecution.toRdd, schema)
    }

    override def stop(): Unit = ()
    override def toString: String = s"DeltaChangeSource[$path, > $startVersion]"
  }
}
