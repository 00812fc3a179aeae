package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.LongAccumulator

/** S10: the batched API sink (labelspark/create_labelbox_dataset.py:188-210
  * uploads 10k-row batches; 30k max with metadata).
  *
  * Two shapes:
  *   - [[uploadDriverSide]] — `toLocalIterator.grouped`: bounded driver
  *     memory (one partition at a time, never a full collect — the
  *     reference's `.rdd.map(...).collect()` at uploader.py:93 is the
  *     anti-pattern this replaces). For transports that must be driver-local
  *     (single API token, strict global rate limit).
  *   - [[uploadDistributed]] — `foreachPartition` with an executor-side
  *     transport: each partition opens one transport, sends its batches,
  *     closes. The 100 TB shape; repartition by e.g. dataset_id upstream to
  *     route related rows to one connection.
  */
trait UploadTransport extends Serializable {
  /** Send one batch of serialized payloads; returns the accepted count.
    * Implementations must be idempotent per batch (the sink may retry).
    */
  def send(batch: Seq[String]): Int
}

object BatchedSink {

  val DefaultBatchSize = 10000
  val MaxBatchWithMetadata = 30000

  /** Driver-side batched upload; returns total accepted. */
  def uploadDriverSide(df: DataFrame, payload: Column, transport: UploadTransport,
      batchSize: Int = DefaultBatchSize): Long = {
    require(batchSize > 0 && batchSize <= MaxBatchWithMetadata,
      s"batchSize must be in (0, $MaxBatchWithMetadata], got $batchSize")
    var total = 0L
    val it = df.select(payload.cast("string")).toLocalIterator()
    val buf = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    while (it.hasNext) {
      buf += it.next().getString(0)
      if (buf.length == batchSize) { total += transport.send(buf.toSeq); buf.clear() }
    }
    if (buf.nonEmpty) total += transport.send(buf.toSeq)
    total
  }

  /** Executor-side batched upload; `accepted` (optional accumulator) sums
    * transport-accepted counts across partitions.
    */
  def uploadDistributed(df: DataFrame, payload: Column, transport: UploadTransport,
      batchSize: Int = DefaultBatchSize, accepted: Option[LongAccumulator] = None): Unit = {
    require(batchSize > 0 && batchSize <= MaxBatchWithMetadata,
      s"batchSize must be in (0, $MaxBatchWithMetadata], got $batchSize")
    df.select(payload.cast("string")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.map(_.getString(0)).grouped(batchSize).foreach { batch =>
          val n = transport.send(batch)
          accepted.foreach(_.add(n))
        }
    }
  }
}
