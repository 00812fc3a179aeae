package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` content
  * plus typed metadata, with decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving batch
  * shape, codegen'd metadata expressions. The actual media decode is STUBBED
  * (deterministic fake: no image/audio libraries in this environment); the
  * stub sits behind [[decodeStub]] so a real decoder slots into the same
  * `mapPartitions` seam. At 100 TB the decode stage is embarrassingly
  * parallel and partition-local: no shuffle enters or leaves it.
  */
object Multimodal {

  /** One media row: opaque bytes + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, content: Array[Byte], meta: Map[String, String])

  /** Decoded features produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, fingerprint: String)

  /** Build a media table from any (id, text) source by treating the UTF-8
    * bytes as opaque content — the test harness for the binary plumbing.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      map(lit("source"), lit("text"), lit("codec"), lit("utf-8")).as("meta"))

  // ---- codegen'd metadata expressions (no decode needed) ----

  /** Content size in bytes. */
  def byteLength(content: Column): Column = length(content).cast("long")

  /** Stable content hash (sha-256 hex). */
  def contentHash(content: Column): Column = sha2(content, 256)

  /** Hex of the leading bytes — the "magic number" sniff. */
  def headHex(content: Column, nBytes: Int): Column =
    lower(hex(substring(content, 1, nBytes)))

  /** Byte-range sample of the content (frame-sample analog for opaque
    * streams): `n` evenly spaced slices of `sliceLen` bytes each.
    */
  def sampleSlices(content: Column, n: Int, sliceLen: Int): Column =
    array(Seq.tabulate(n) { i =>
      substring(content, i * sliceLen + 1, sliceLen)
    }: _*)

  /** Partition-local decode stage. Batch shape: one `Iterator[MediaRow] =>
    * Iterator[MediaFeatures]` per partition, so a real decoder can hold
    * native state (codec contexts, GPU handles) per partition and amortize
    * init across rows — the Scala analog of `mapInPandas` batching.
    *
    * STUB: dimensions are derived deterministically from the content bytes
    * (first/last byte + length); a real build replaces only the body.
    */
  def decodeStub(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.content
        val n = bytes.length.toLong
        val head = if (bytes.nonEmpty) bytes(0) & 0xff else 0
        val tail = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = n,
          width = 16 + head % 640,
          height = 16 + tail % 480,
          n_frames = if (r.kind == "video") 1 + (n % 300).toInt else 1,
          fingerprint = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString)
      }
    }
  }
}
