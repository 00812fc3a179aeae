package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlShims, SQLContext, SparkSession}
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
  *     .option("startingVersion", "0")   // or "earliest" / "latest" (default)
  *     .load()                            // cols..., _change_type, _commit_version
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
  *
  * The v1 `Source` API is deliberate: its `getBatch` returns a DataFrame,
  * which lets the micro-batch BE the (pruned, bitmap-filtered) change
  * query — the DSv2 micro-batch API would force hand-built partition
  * readers and re-implement the entire change-decomposition scan.
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
    val head = DeltaRead.latestVersion(spark, path)
    val start = params.getOrElse("startingVersion",
        params.getOrElse("startingversion", "latest")) match {
      case "latest" => head
      case "earliest" => -1L
      case v => v.toLong
    }
    new DeltaChangeSource.ChangeTail(spark, path, start)
  }
}

object DeltaChangeSource {
  private[streaming] def changeSchema(spark: SparkSession, path: String): StructType = {
    val table = DeltaRead.readDeltaTable(spark, path).schema
    StructType(table.fields ++ Seq(StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
  }

  private final class ChangeTail(spark: SparkSession, path: String,
      startVersion: Long) extends Source {
    override val schema: StructType = changeSchema(spark, path)

    /** Always the log head: progress clipping is NOT this method's job —
      * on a checkpoint restart the committed offset (not `startVersion`)
      * is the range floor, and MicroBatchExecution owns that comparison.
      * `startVersion` only floors the FIRST range, inside [[getBatch]]'s
      * `getOrElse` — so a fresh "latest" stream's first micro-batch is
      * empty rather than a replay, and a recovered stream picks up from
      * its checkpoint even when the head moved while it was down.
      */
    override def getOffset: Option[Offset] = {
      val head = DeltaRead.latestVersion(spark, path)
      if (head >= 0) Some(LongOffset(head)) else None
    }

    /** Offsets arrive as [[LongOffset]] from this source's own
      * `getOffset` and as serialized-json wrappers on checkpoint
      * recovery — `json()` is the one representation both share.
      */
    private def versionOf(o: Offset): Long = o.json().trim.toLong

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
