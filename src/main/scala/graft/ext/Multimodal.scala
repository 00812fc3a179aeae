package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` content
  * plus typed metadata, with decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving batch
  * shape, codegen'd metadata expressions. IMAGE dimension decode is real
  * (JDK ImageIO header parse: PNG/BMP/GIF/JPEG) and AUDIO header decode is
  * real (javax.sound.sampled: WAV/AIFF/AU sample rate, channels, bit
  * depth, frame count — zero added deps); video and compressed-audio
  * decode is STUBBED (deterministic fake: no demuxer libraries in this
  * environment) behind the same `mapPartitions` seam a real decoder slots
  * into. At 100 TB the decode stage is embarrassingly parallel and
  * partition-local: no shuffle enters or leaves it.
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

  /** REAL image-header decode via the JDK's ImageIO (PNG, BMP, GIF, JPEG,
    * WBMP — the standard plugins, zero added dependencies). Header-only:
    * `ImageReader.getWidth/getHeight(0)` parses the container header
    * without materializing pixel buffers, which is the right cost model
    * when the decode stage only needs dimensions — a 100 MB image costs a
    * few hundred header bytes, not a full raster. Returns None when no
    * installed reader recognizes the bytes (caller falls back).
    */
  private[ext] def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.isEmpty) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val rd = readers.next()
        try { rd.setInput(iis); Some((rd.getWidth(0), rd.getHeight(0))) }
        finally rd.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Partition-local decode stage. Batch shape: one `Iterator[MediaRow] =>
    * Iterator[MediaFeatures]` per partition, so a real decoder can hold
    * native state (codec contexts, GPU handles) per partition and amortize
    * init across rows — the Scala analog of `mapInPandas` batching.
    *
    * Image dimensions are REAL (ImageIO header parse — PNG/BMP/GIF/JPEG)
    * whenever the bytes are a recognized image; audio/video and
    * unrecognized content fall back to the deterministic stub arithmetic
    * (no media demuxers exist in this environment; a real build replaces
    * only that branch).
    */
  def decodeStub(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.content
        val n = bytes.length.toLong
        val head = if (bytes.nonEmpty) bytes(0) & 0xff else 0
        val tail = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
        val vid = if (r.kind == "video") videoInfo(bytes) else None
        val (w, h) = imageDims(bytes)
          .orElse(vid.collect { case i if i.width > 0 => (i.width, i.height) })
          .getOrElse((16 + head % 640, 16 + tail % 480))
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = n,
          width = w,
          height = h,
          n_frames =
            if (r.kind == "video")
              vid.collect { case i if i.nFrames > 0 => i.nFrames.toInt }
                .getOrElse(1 + (n % 300).toInt)
            else 1,
          fingerprint = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString)
      }
    }
  }

  /** REAL audio-header decode via the JDK's javax.sound.sampled (WAV,
    * AIFF, AU — the standard providers, zero added dependencies).
    * Header-only like [[imageDims]]: `AudioSystem.getAudioFileFormat`
    * parses the container header without decoding samples. Returns
    * (sampleRateHz, channels, bitsPerSample, frameLength, containerType),
    * or None when no installed provider recognizes the bytes.
    */
  private[ext] def audioInfo(bytes: Array[Byte])
      : Option[(Float, Int, Int, Long, String)] = {
    if (bytes.isEmpty) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val f = aff.getFormat
      Some((f.getSampleRate, f.getChannels, f.getSampleSizeInBits,
        aff.getFrameLength.toLong, aff.getType.toString))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded audio features. `duration_sec` is frames / sample-rate; -1
    * when the container does not declare a frame count.
    */
  final case class AudioFeatures(
      media_id: Long, n_bytes: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_frames: Long, duration_sec: Double, codec: String)

  /** Partition-local audio decode stage — REAL for WAV/AIFF/AU headers
    * (javax.sound.sampled), deterministic stub arithmetic for containers
    * the JDK cannot demux (mp3/ogg/flac need codec libraries this
    * environment does not ship; a real build replaces only the fallback
    * branch). Same batch shape as [[decodeStub]]: one iterator per
    * partition, no shuffle in or out.
    */
  def decodeAudio(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.content
        audioInfo(bytes) match {
          case Some((rate, ch, bits, frames, codec)) =>
            AudioFeatures(r.media_id, bytes.length.toLong, rate.toInt, ch, bits,
              frames, if (frames >= 0 && rate > 0) frames / rate.toDouble else -1.0,
              codec)
          case None =>
            val head = if (bytes.nonEmpty) bytes(0) & 0xff else 0
            AudioFeatures(r.media_id, bytes.length.toLong,
              sample_rate = 8000 + (head % 8) * 4000, channels = 1 + head % 2,
              bits_per_sample = 16, n_frames = bytes.length.toLong,
              duration_sec = -1.0, codec = "stub")
        }
      }
    }
  }

  /** Parsed ISO-BMFF (MP4/MOV/3GP) container facts: major brand, movie
    * timescale + duration (`mvhd`), first video track's pixel dimensions
    * (`tkhd`) and sample count (`stsz`). Dimensions/frames are 0 when the
    * container holds no video track.
    */
  private[ext] final case class Mp4Info(
      brand: String, timescale: Long, duration: Long,
      width: Int, height: Int, nFrames: Long)

  /** REAL video-container parse for the ISO base media file format
    * (MP4/MOV/3GP — the `ftyp`…`moov` box walk, zero added dependencies;
    * the JDK ships no video demuxer, but the container layout is a plain
    * length-prefixed tree). Header-only like [[imageDims]]/[[audioInfo]]:
    * reads box headers plus the tiny `mvhd`/`tkhd`/`hdlr`/`stsz` payloads
    * and never touches `mdat` sample data, so a multi-GB video costs a
    * few KB. Returns None unless the bytes open with a well-formed `ftyp`
    * (caller falls back to the stub arithmetic).
    */
  private[ext] def videoInfo(bytes: Array[Byte]): Option[Mp4Info] = {
    val n = bytes.length
    def u16(o: Int): Long =
      ((bytes(o) & 0xffL) << 8) | (bytes(o + 1) & 0xffL)
    def u32(o: Int): Long = (u16(o) << 16) | u16(o + 2)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int): String = new String(bytes, o, 4, "ISO-8859-1")
    // children of [lo, hi): (type, payloadFrom, payloadTo)
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var at = lo
        def hasNext: Boolean = at + 8 <= hi
        def next(): (String, Int, Int) = {
          val size = u32(at)
          val tpe = fourcc(at + 4)
          val (payload, end) =
            if (size == 1 && at + 16 <= hi) (at + 16, at + u64(at + 8))
            else if (size == 0) (at + 8, hi.toLong)
            else (at + 8, at + size)
          if (size != 0 && size != 1 && size < 8 || end > hi) { at = hi; ("", hi, hi) }
          else { at = end.toInt; (tpe, payload, end.toInt) }
        }
      }
    def find(lo: Int, hi: Int, tpe: String): Option[(Int, Int)] =
      boxes(lo, hi).collectFirst { case (`tpe`, f, t) => (f, t) }
    try {
      if (n < 16 || fourcc(4) != "ftyp") return None
      val brand = fourcc(8)
      val (moovF, moovT) = find(0, n, "moov").getOrElse(return None)
      val (mvhdF, _) = find(moovF, moovT, "mvhd").getOrElse(return None)
      val (timescale, duration) =
        if (bytes(mvhdF) == 1) (u32(mvhdF + 20), u64(mvhdF + 24))
        else (u32(mvhdF + 12), u32(mvhdF + 16))
      // first trak whose media handler is 'vide'
      val vide = boxes(moovF, moovT).collectFirst(Function.unlift {
        case ("trak", tf, tt) =>
          for {
            (mdF, mdT) <- find(tf, tt, "mdia")
            (hF, _) <- find(mdF, mdT, "hdlr") if fourcc(hF + 8) == "vide"
            (tkF, _) <- find(tf, tt, "tkhd")
          } yield {
            val dimAt = if (bytes(tkF) == 1) tkF + 88 else tkF + 76
            val frames = (for {
              (miF, miT) <- find(mdF, mdT, "minf")
              (sbF, sbT) <- find(miF, miT, "stbl")
              (szF, _) <- find(sbF, sbT, "stsz")
            } yield u32(szF + 8)).getOrElse(0L)
            // tkhd width/height are 16.16 fixed point
            ((u32(dimAt) >> 16).toInt, (u32(dimAt + 4) >> 16).toInt, frames)
          }
        case _ => None
      })
      val (w, h, frames) = vide.getOrElse((0, 0, 0L))
      Some(Mp4Info(brand, timescale, duration, w, h, frames))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded video-container features. `duration_sec` is the mvhd
    * duration over its timescale; `fps` is declared frames over that (0
    * when either is unknown).
    */
  final case class VideoFeatures(
      media_id: Long, n_bytes: Long, brand: String, width: Int, height: Int,
      n_frames: Long, duration_sec: Double, fps: Double)

  /** Partition-local video decode stage — REAL for ISO-BMFF containers
    * (MP4/MOV/3GP header walk via [[videoInfo]]), deterministic stub
    * arithmetic for containers without a parseable `moov` (mkv/webm/avi
    * would need a demuxer this environment does not ship; a real build
    * replaces only the fallback branch). Same batch shape as
    * [[decodeAudio]]: one iterator per partition, no shuffle in or out.
    */
  def decodeVideo(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.content
        videoInfo(bytes) match {
          case Some(i) =>
            val dur = if (i.timescale > 0) i.duration.toDouble / i.timescale else -1.0
            VideoFeatures(r.media_id, bytes.length.toLong, i.brand, i.width,
              i.height, i.nFrames, dur,
              if (dur > 0 && i.nFrames > 0) i.nFrames / dur else 0.0)
          case None =>
            val head = if (bytes.nonEmpty) bytes(0) & 0xff else 0
            VideoFeatures(r.media_id, bytes.length.toLong, "stub",
              16 + head % 640, 16 + head % 480,
              1 + (bytes.length % 300).toLong, -1.0, 0.0)
        }
      }
    }
  }

  /** One sampled frame of a media row. */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: every `everyN`-th frame as its own row — the generator
    * (flatMap/explode) shape, partition-local, output rows ∝ frames kept.
    * Downstream stages (resize, feature-extract) then run per frame with
    * full parallelism. STUB: a "frame" is a `frameLen`-byte window of the
    * content at its frame offset; a real demuxer replaces only the slicing.
    */
  def frameSample(media: Dataset[MediaRow], everyN: Int, frameLen: Int = 64)(
      implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    require(everyN > 0 && frameLen > 0, "everyN and frameLen must be positive")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = math.max(1, r.content.length / frameLen)
        (0 until nFrames by everyN).iterator.map { f =>
          val from = f * frameLen
          val until = math.min(from + frameLen, r.content.length)
          FrameRow(r.media_id, f, java.util.Arrays.copyOfRange(r.content, from, until))
        }
      }
    }
  }

  /** Resize stage: every frame to a fixed `outBytes` buffer (the pixel-grid
    * analog — output shape is constant regardless of input size, which is
    * what the downstream batch-inference stage requires). STUB:
    * deterministic byte resampling (nearest-neighbour over the byte axis);
    * a real implementation swaps in an image scaler, same signature.
    */
  def resizeStub(frames: Dataset[FrameRow], outBytes: Int)(
      implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    require(outBytes > 0, "outBytes must be positive")
    frames.mapPartitions { rows =>
      rows.map { f =>
        val in = f.frame_bytes
        val out = new Array[Byte](outBytes)
        if (in.nonEmpty) {
          var i = 0
          while (i < outBytes) {
            out(i) = in((i.toLong * in.length / outBytes).toInt)
            i += 1
          }
        }
        FrameRow(f.media_id, f.frame_idx, out)
      }
    }
  }

  /** A media row's embedding (ready for graft.ext.Similarity operators). */
  final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

  /** Feature extraction: content → dense `dim`-float embedding, the bridge
    * into the similarity/ANN surface (`annLsh`, `ivfKnn`, `nearDupPairs`
    * consume exactly this shape). Partition-local batches so a real model
    * can load once per partition and run batched inference. STUB: a
    * deterministic hash-derived unit vector — equal content ⇒ equal
    * embedding, so near-dup-by-embedding finds exact dups.
    */
  def featureStub(media: Dataset[MediaRow], dim: Int)(
      implicit spark: SparkSession): Dataset[MediaEmbedding] = {
    import spark.implicits._
    require(dim > 0, "dim must be positive")
    media.mapPartitions { rows =>
      rows.map { r =>
        val md = java.security.MessageDigest.getInstance("SHA-256").digest(r.content)
        val v = Array.tabulate(dim) { i =>
          // widen the 32 digest bytes cyclically, offset-mixed per index
          (((md(i % md.length) & 0xff) ^ (i * 31 & 0xff)) / 255.0f) - 0.5f
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        MediaEmbedding(r.media_id, if (norm == 0f) v else v.map(_ / norm))
      }
    }
  }
}
