package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Delta deletion-vector (DV) decode — the PUBLIC protocol layout (delta.io
  * PROTOCOL.md "Deletion Vectors"), re-derived with no delta jars:
  *
  *   - An `add` action may carry a `deletionVector` descriptor
  *     `{storageType, pathOrInlineDv, offset?, sizeInBytes, cardinality}`;
  *     the referenced bitmap marks ROW INDEXES of the data file that are
  *     deleted (invisible to readers) without rewriting the file.
  *   - storageType `u`: pathOrInlineDv = `<random prefix><Z85 uuid>`; the
  *     vector lives in `<prefix>/deletion_vector_<uuid>.bin` under the
  *     table root. `i`: pathOrInlineDv IS the Z85-encoded vector. `p`: an
  *     absolute path.
  *   - DV FILE layout: 1 version byte (=1), then per stored vector at
  *     `offset`: [dataSize Int32 BE][data: 4-byte LE magic 1681511377 +
  *     serialized bitmap][CRC-32 of data, Int32 BE].
  *   - The bitmap is a 64-bit RoaringBitmapArray in "portable" form:
  *     [number of 32-bit bitmaps, Int64 LE][each: standard 32-bit roaring
  *     serialization (RoaringFormatSpec): cookie 12346 (+size word) or
  *     12347 (run-capable, containers-1 in the high 16 bits, run-flag
  *     bitset), descriptive header of (key, cardinality-1) u16 pairs,
  *     optional offset words (skipped — containers are contiguous in key
  *     order), then array (u16 values) / bitmap (1024 u64 words) / run
  *     (numRuns × start,length-1 u16 pairs) containers].
  *
  * Scale: a DV is O(deleted rows) bits, loaded once on the DRIVER per
  * file and broadcast; the membership test per scanned row is an array /
  * bitset / run binary-search — no shuffle, no extra I/O beyond the
  * vector blob itself.
  */
object DeletionVectors {

  private val Magic = 1681511377

  /** Descriptor carried by an `add` action. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Long, cardinality: Long)

  // ------------------------------------------------------------------ Z85
  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Z85 decode (RFC32/ZeroMQ alphabet — the Delta base85 variant): 5
    * chars → 4 bytes, big-endian base 85.
    */
  private[io] def decodeZ85(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  // ------------------------------------------------ 64-bit roaring bitmap
  /** One 32-bit roaring bitmap: containers keyed by the value's high 16
    * bits. Serializable — the per-table DV map broadcasts to executors.
    */
  private[io] sealed trait Container extends Serializable {
    def contains(low: Char): Boolean
    /** Member low-16-bit values in ascending order. */
    def lowValues: Iterator[Char]
  }
  private[io] final case class ArrayContainer(values: Array[Char]) extends Container {
    def contains(low: Char): Boolean =
      java.util.Arrays.binarySearch(values, low) >= 0
    def lowValues: Iterator[Char] = values.iterator
  }
  private[io] final case class BitmapContainer(words: Array[Long]) extends Container {
    def contains(low: Char): Boolean =
      (words(low >>> 6) & (1L << (low & 63))) != 0
    def lowValues: Iterator[Char] = (0 until 65536).iterator
      .filter(v => (words(v >>> 6) & (1L << (v & 63))) != 0).map(_.toChar)
  }
  private[io] final case class RunContainer(starts: Array[Char], lens: Array[Char])
      extends Container {
    def contains(low: Char): Boolean = {
      var i = java.util.Arrays.binarySearch(starts, low)
      if (i >= 0) return true
      i = -i - 2 // last run starting at or before low
      i >= 0 && low <= starts(i) + lens(i)
    }
    def lowValues: Iterator[Char] = starts.iterator.zip(lens.iterator).flatMap {
      case (s, l) => (s.toInt to s.toInt + l.toInt).iterator.map(_.toChar)
    }
  }

  /** A 64-bit roaring bitmap array: per high-32 "index" a map of 32-bit
    * roaring containers. `contains` is the row-survival test.
    */
  final class RoaringArray(
      private val bitmaps: Array[(Int, Array[(Char, Container)])]) extends Serializable {
    def contains(v: Long): Boolean = {
      require(v >= 0, s"negative row index $v")
      val high32 = (v >>> 32).toInt
      val low32 = v.toInt
      // linear over the (tiny) per-file bitmap count; binary over containers
      var i = 0
      while (i < bitmaps.length) {
        if (bitmaps(i)._1 == high32) {
          val cs = bitmaps(i)._2
          val key = (low32 >>> 16).toChar
          var lo = 0; var hi = cs.length - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val k = cs(mid)._1
            if (k == key) return cs(mid)._2.contains((low32 & 0xFFFF).toChar)
            else if (k < key) lo = mid + 1
            else hi = mid - 1
          }
          return false
        }
        i += 1
      }
      false
    }
    def cardinality: Long = bitmaps.iterator.flatMap(_._2.iterator).map {
      case (_, ArrayContainer(v)) => v.length.toLong
      case (_, BitmapContainer(w)) => w.map(java.lang.Long.bitCount(_).toLong).sum
      case (_, RunContainer(_, l)) => l.map(_.toLong + 1).sum
    }.sum
    /** All member row indexes in ascending order — the DV-union seam
      * ([[DvWrite]] merges an existing vector with newly deleted rows by
      * streaming both sorted sets; never materializes O(cardinality)).
      * Bitmaps are stored dense in high-32 index order and containers in
      * key order, so concatenation IS ascending order.
      */
    def values: Iterator[Long] = bitmaps.iterator.flatMap { case (high32, cs) =>
      val hi = high32.toLong << 32
      cs.iterator.flatMap { case (key, c) =>
        val mid = (key.toLong << 16)
        c.lowValues.map(low => hi | mid | low.toLong)
      }
    }
  }

  /** Deserialize the portable RoaringBitmapArray (after the magic). */
  private[io] def deserializeBitmap(data: Array[Byte]): RoaringArray = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    require(n >= 0 && n <= Int.MaxValue, s"implausible bitmap count $n")
    val bitmaps = new Array[(Int, Array[(Char, Container)])](n.toInt)
    var b = 0
    while (b < n) {
      // portable form: bitmaps are DENSE in index order — bitmap b covers
      // values whose high 32 bits == b (row-index DVs have exactly one)
      bitmaps(b) = (b, read32BitBitmap(buf))
      b += 1
    }
    new RoaringArray(bitmaps)
  }

  private def read32BitBitmap(buf: ByteBuffer): Array[(Char, Container)] = {
    val cookie = buf.getInt
    val hasRuns = (cookie & 0xFFFF) == 12347
    require(hasRuns || cookie == 12346,
      s"unrecognized roaring cookie ${cookie & 0xFFFF}")
    val nContainers = if (hasRuns) (cookie >>> 16) + 1 else buf.getInt
    require(nContainers >= 0 && nContainers <= 65536, s"bad container count $nContainers")
    val runFlags = new Array[Boolean](nContainers)
    if (hasRuns) {
      var i = 0
      while (i < (nContainers + 7) / 8) {
        val byte = buf.get()
        var bit = 0
        while (bit < 8 && i * 8 + bit < nContainers) {
          runFlags(i * 8 + bit) = (byte & (1 << bit)) != 0
          bit += 1
        }
        i += 1
      }
    }
    val keys = new Array[Char](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getChar
      cards(i) = (buf.getChar: Int) + 1
      i += 1
    }
    // offset words present for the no-run format, or run format with >= 4
    // containers; containers are contiguous in key order so just skip them
    if (!hasRuns || nContainers >= 4) buf.position(buf.position() + 4 * nContainers)
    val out = new Array[(Char, Container)](nContainers)
    i = 0
    while (i < nContainers) {
      val c: Container =
        if (runFlags(i)) {
          val nRuns = buf.getChar: Int
          val starts = new Array[Char](nRuns); val lens = new Array[Char](nRuns)
          var r = 0
          while (r < nRuns) { starts(r) = buf.getChar; lens(r) = buf.getChar; r += 1 }
          RunContainer(starts, lens)
        } else if (cards(i) > 4096) {
          val words = new Array[Long](1024)
          var w = 0
          while (w < 1024) { words(w) = buf.getLong; w += 1 }
          BitmapContainer(words)
        } else {
          val vs = new Array[Char](cards(i))
          var v = 0
          while (v < cards(i)) { vs(v) = buf.getChar; v += 1 }
          ArrayContainer(vs)
        }
      out(i) = (keys(i), c)
      i += 1
    }
    out
  }

  // ------------------------------------------------------------- loading
  /** The on-disk blob a FILE-stored descriptor (`u`/`p`) resolves to —
    * `u` uuid-decodes relative to the table root (the reason a shallow
    * clone must rewrite `u` descriptors to absolute `p` form), `p` is
    * already absolute. Inline (`i`) descriptors have no file.
    */
  def resolvedPath(tableRoot: Path, d: Descriptor): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"DV uuid payload too short: $enc")
      val prefix = enc.dropRight(20)
      val uuidBytes = decodeZ85(enc.takeRight(20))
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tableRoot, name)
      else new Path(new Path(tableRoot, prefix), name)
    case other =>
      throw new IllegalArgumentException(s"DV storageType '$other' has no file path")
  }

  /** Resolve + decode one descriptor into its bitmap (driver-side). */
  def load(fs: FileSystem, tableRoot: Path, d: Descriptor): RoaringArray = {
    val data: Array[Byte] = d.storageType match {
      case "i" => decodeZ85(d.pathOrInlineDv)
      case "u" | "p" =>
        val file = resolvedPath(tableRoot, d)
        val offset = d.offset.getOrElse(
          throw new IllegalArgumentException(s"file-stored DV without offset: $d"))
        val in = fs.open(file)
        try {
          in.seek(offset)
          val sizeBytes = new Array[Byte](4)
          in.readFully(sizeBytes)
          val dataSize = ByteBuffer.wrap(sizeBytes).order(ByteOrder.BIG_ENDIAN).getInt
          require(dataSize == d.sizeInBytes,
            s"DV size mismatch at $file:$offset — stored $dataSize, descriptor ${d.sizeInBytes}")
          val payload = new Array[Byte](dataSize)
          in.readFully(payload)
          val crcBytes = new Array[Byte](4)
          in.readFully(crcBytes)
          val crc = new java.util.zip.CRC32()
          crc.update(payload)
          val expect = ByteBuffer.wrap(crcBytes).order(ByteOrder.BIG_ENDIAN).getInt
          require(crc.getValue.toInt == expect,
            s"DV checksum mismatch at $file:$offset")
          payload
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(s"unsupported DV storageType '$other'")
    }
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad DV magic $magic (want $Magic)")
    val bitmap = deserializeBitmap(java.util.Arrays.copyOfRange(data, 4, data.length))
    require(bitmap.cardinality == d.cardinality,
      s"DV cardinality mismatch: bitmap has ${bitmap.cardinality}, " +
        s"descriptor says ${d.cardinality}")
    bitmap
  }
}
