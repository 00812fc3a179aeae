package graft.io

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE path for the batched API sink (SURVEY S10) — the
  * contract-bearing form of `BatchedSink.uploadDistributed`:
  *
  *   - each task's [[DataWriter]] groups payload rows into API-sized
  *     batches (10k default / 30k ceiling, create_labelbox_dataset.py:35,
  *     192) and reports its accepted count through a
  *     [[WriterCommitMessage]];
  *   - the driver's `commit` sees every task's message, so the total is
  *     exact even under speculative execution (Spark commits one winner
  *     per task);
  *   - `abort` hooks the API-side cleanup seam a transactional ingest
  *     endpoint would use.
  *
  * Usage:
  * {{{
  *   df.select(to_json(...).as("payload"))
  *     .write.format("graft.io.UploadSinkV2")
  *     .option("transport", key).option("batchSize", "10000").save()
  * }}}
  * The transport is looked up from [[UploadTransportRegistry]] by the
  * `transport` option (same injection seam as [[ExportFeedRegistry]]).
  */
class UploadSinkV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UploadSinkV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = new UploadSinkTable
}

object UploadSinkV2 {
  val schema: StructType = new StructType().add("payload", StringType)

  /** Total accepted by the LAST completed write per transport key —
    * surfaced for callers/tests (commit runs on the driver).
    */
  val lastCommitted = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Epoch ids already folded into [[lastCommitted]] per transport key.
    * A crash-replayed epoch re-commits; without this guard the surfaced
    * total double-counts even when the transport dedupes idempotently
    * (the file sink's manifest idempotence, mirrored for the metric).
    */
  private[io] val committedEpochs =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.Set[java.lang.Long]]()

  private[io] def markEpoch(key: String, epochId: Long): Boolean =
    committedEpochs
      .computeIfAbsent(key, _ => java.util.concurrent.ConcurrentHashMap.newKeySet())
      .add(epochId)
}

/** Pluggable upload transports, keyed by the `transport` writer option. */
object UploadTransportRegistry {
  private val transports =
    new java.util.concurrent.ConcurrentHashMap[String, UploadTransport]()

  def register(key: String, t: UploadTransport): Unit = transports.put(key, t)

  def apply(key: String): UploadTransport = {
    val t = transports.get(key)
    require(t != null, s"no upload transport registered under '$key'")
    t
  }
}

private[io] class UploadSinkTable extends Table with SupportsWrite {
  override def name(): String = "graft_upload_sink"
  override def schema(): StructType = UploadSinkV2.schema
  // append-only: an upload API has no truncate, so SaveMode.Overwrite must
  // fail at planning rather than silently behave like append
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.length == 1 && s.head.dataType == StringType,
      s"UploadSinkV2 expects exactly one string payload column, got $s")
    val key = info.options.get("transport")
    require(key != null, "writer option 'transport' is required")
    val batchSize = Option(info.options.get("batchSize")).map(_.toInt)
      .getOrElse(BatchedSink.DefaultBatchSize)
    require(batchSize > 0 && batchSize <= BatchedSink.MaxBatchWithMetadata,
      s"batchSize must be in (0, ${BatchedSink.MaxBatchWithMetadata}]")
    new WriteBuilder {
      override def build(): Write = new UploadWrite(key, batchSize)
    }
  }
}

private[io] case class UploadCommit(accepted: Long) extends WriterCommitMessage

private[io] class UploadWrite(transportKey: String, batchSize: Int) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new UploadWriterFactory(transportKey, batchSize)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val total = messages.collect { case UploadCommit(n) => n }.sum
      UploadSinkV2.lastCommitted.put(transportKey, total)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  /** Streaming epochs reuse the same task writer; per-epoch commit
    * ACCUMULATES into the transport's running total (each epoch's messages
    * are that epoch's accepted counts). The engine tracks epoch ids in the
    * checkpoint, so a replayed epoch re-commits — transports must be
    * idempotent per batch, and the surfaced total skips epochs it has
    * already folded in so recovery cannot over-report.
    */
  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new UploadStreamingWriterFactory(transportKey, batchSize)

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      if (UploadSinkV2.markEpoch(transportKey, epochId)) {
        val total = messages.collect { case UploadCommit(n) => n }.sum
        UploadSinkV2.lastCommitted.merge(transportKey, total, (a, b) => a + b)
      }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

private[io] class UploadStreamingWriterFactory(transportKey: String, batchSize: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new UploadWriterFactory(transportKey, batchSize).createWriter(partitionId, taskId)
}

private[io] class UploadWriterFactory(transportKey: String, batchSize: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val transport = UploadTransportRegistry(transportKey)
      private val buf = new scala.collection.mutable.ArrayBuffer[String](batchSize)
      private var accepted = 0L

      override def write(row: InternalRow): Unit = {
        buf += row.getString(0)
        if (buf.length == batchSize) flush()
      }

      private def flush(): Unit =
        if (buf.nonEmpty) { accepted += transport.send(buf.toSeq); buf.clear() }

      override def commit(): WriterCommitMessage = { flush(); UploadCommit(accepted) }
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
