package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Delta deletion-vector ENCODE — the write half of [[DeletionVectors]],
  * against the same public delta.io layout (PROTOCOL.md "Deletion
  * Vectors" + the RoaringFormatSpec portable form the decoder documents).
  * This is what makes row-level DELETE scale-honest: marking 0.1% of rows
  * deleted must cost O(deleted rows) bits of new data, not a rewrite of
  * every touched file ([[DeltaMerge.deleteWhereDv]] is the consumer).
  *
  * Serialization is built to run on EXECUTORS: [[serializeData]] takes
  * one ascending iterator of row indexes and streams it into container
  * buffers (≤ 64Ki u16s at a time), so a delete builds its per-file
  * bitmaps where the rows are and ships only the compressed blobs to the
  * driver — the same bytes the driver must write into the vector file
  * anyway.
  */
object DvWrite {

  private val Magic = 1681511377 // shared with the decoder

  // ------------------------------------------------------------------ Z85
  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"

  /** Z85 encode (the Delta base85 variant): 4 bytes → 5 chars, big-endian
    * base 85 — exact inverse of [[DeletionVectors.decodeZ85]].
    */
  private[io] def encodeZ85(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 input length ${bytes.length} not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  // ------------------------------------------------- portable serialization
  /** Serialize an ASCENDING, DISTINCT iterator of row indexes into the DV
    * "data" payload: 4-byte LE magic + portable 64-bit RoaringBitmapArray.
    * Containers are chosen exactly as the decoder expects them back
    * (array ≤ 4096 values, bitmap above); runs are never written — legal
    * per the format (cookie 12346), and run-compression would buy little
    * for delete patterns while complicating the writer. The portable form
    * stores its 32-bit bitmaps DENSE in high-32 order, so gaps emit empty
    * bitmaps (row indexes above 2^32 only occur for >4G-row files).
    */
  private[io] def serializeData(sorted: Iterator[Long]): Array[Byte] = {
    // accumulate one 32-bit bitmap at a time: (key, lowValues) containers
    val out = new ByteArrayOutputStream()
    out.write(0); out.write(0); out.write(0); out.write(0) // magic patched below
    var nBitmaps = 0L
    val bitmapBytes = new ByteArrayOutputStream()

    var curHigh = -1L // high 32 bits of the bitmap being accumulated
    var containers = scala.collection.mutable.ArrayBuffer[(Char, Array[Char])]()
    var curKey = -1 // high 16 of low 32
    var lows = new scala.collection.mutable.ArrayBuffer[Char]()
    var last = -1L

    def flushContainer(): Unit = if (curKey >= 0) {
      containers += ((curKey.toChar, lows.toArray))
      lows = new scala.collection.mutable.ArrayBuffer[Char]()
    }
    def flush32(): Unit = if (curHigh >= 0) {
      flushContainer()
      val n = containers.length
      // RoaringFormatSpec no-run layout: cookie, container count,
      // (key, card-1) pairs, byte offsets from the bitmap start, containers
      val header = 4 + 4 + 4 * n + 4 * n
      val size = header + containers.iterator.map { case (_, v) =>
        if (v.length > 4096) 8192 else 2 * v.length
      }.sum
      val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(12346).putInt(n)
      containers.foreach { case (k, v) =>
        buf.putChar(k).putChar((v.length - 1).toChar)
      }
      var off = header
      containers.foreach { case (_, v) =>
        buf.putInt(off)
        off += (if (v.length > 4096) 8192 else 2 * v.length)
      }
      containers.foreach { case (_, v) =>
        if (v.length > 4096) {
          val words = new Array[Long](1024)
          v.foreach(c => words(c >>> 6) |= (1L << (c & 63)))
          words.foreach(buf.putLong)
        } else v.foreach(buf.putChar)
      }
      bitmapBytes.write(buf.array())
      nBitmaps += 1
      containers = scala.collection.mutable.ArrayBuffer[(Char, Array[Char])]()
      curKey = -1
    }
    def emptyBitmap(): Unit = {
      val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(12346).putInt(0)
      bitmapBytes.write(buf.array())
      nBitmaps += 1
    }

    sorted.foreach { v =>
      require(v >= 0, s"negative row index $v")
      require(v > last, s"row indexes must be ascending and distinct ($v after $last)")
      last = v
      val high = v >>> 32
      if (high != curHigh) {
        flush32()
        // dense: pad the gap with empty bitmaps
        var fill = if (curHigh < 0) 0L else curHigh + 1
        while (fill < high) { emptyBitmap(); fill += 1 }
        curHigh = high
      }
      val key = (v.toInt >>> 16) & 0xFFFF
      if (key != curKey) { flushContainer(); curKey = key }
      lows += (v & 0xFFFF).toChar
    }
    flush32()

    val countBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    countBuf.putLong(nBitmaps)
    out.write(countBuf.array())
    bitmapBytes.writeTo(out)
    val data = out.toByteArray
    // patch the magic (LE) into the first 4 bytes
    data(0) = (Magic & 0xFF).toByte; data(1) = ((Magic >>> 8) & 0xFF).toByte
    data(2) = ((Magic >>> 16) & 0xFF).toByte; data(3) = ((Magic >>> 24) & 0xFF).toByte
    data
  }

  /** Merge two ascending iterators into one ascending deduplicated stream
    * — the union of an existing vector with newly deleted rows.
    */
  private[io] def mergeSorted(a: Iterator[Long], b: Iterator[Long]): Iterator[Long] =
    new Iterator[Long] {
      private val pa = a.buffered
      private val pb = b.buffered
      def hasNext: Boolean = pa.hasNext || pb.hasNext
      def next(): Long =
        if (!pb.hasNext) pa.next()
        else if (!pa.hasNext) pb.next()
        else if (pa.head < pb.head) pa.next()
        else if (pb.head < pa.head) pb.next()
        else { pb.next(); pa.next() }
    }

  /** Default rotation threshold for [[VectorFileWriter]] — vectors pack
    * into one file per task until it crosses this, bounding any single
    * vector file (and the sequential read a prefetching reader does) to
    * ~the threshold plus one blob.
    */
  private[io] val DefaultMaxVectorFileBytes: Long = 64L << 20

  /** Streams (data, cardinality) deletion-vector frames into uuid-named
    * files under `tableRoot`, packing many vectors per file (the
    * protocol's intended shape — a wide delete adds a handful of blobs,
    * not one file per touched data file) and ROTATING to a fresh file
    * once the current one crosses `maxFileBytes`.
    *
    * Built to run ON EXECUTORS: each DML task drains its partition of
    * per-file bitmaps through one writer and ships back descriptors only,
    * so the driver never holds vector bytes — deleting 1% of a 10¹¹-row
    * table streams the ~compressed-bitmap volume straight from executors
    * to storage instead of staging O(100 MB+) in driver memory. Layout
    * per the decoder: version byte 1, then per vector at its offset
    * [dataSize Int32 BE][data][CRC-32 of data, Int32 BE]. Descriptors use
    * `u` storage (uuid-named file at the table root), so shallow clones
    * rewrite them to absolute form exactly like foreign-written vectors.
    * Files written by a failed/retried task are never referenced by a
    * commit and age out via VACUUM like any orphan.
    */
  private[io] final class VectorFileWriter(fs: FileSystem, tableRoot: Path,
      maxFileBytes: Long = DefaultMaxVectorFileBytes) {
    private var out: org.apache.hadoop.fs.FSDataOutputStream = null
    private var enc: String = null
    private var offset = 0L

    def append(data: Array[Byte], cardinality: Long): DeletionVectors.Descriptor = {
      if (out == null) {
        val uuid = java.util.UUID.randomUUID()
        val uuidBytes = ByteBuffer.allocate(16)
          .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
          .array()
        out = fs.create(new Path(tableRoot, s"deletion_vector_$uuid.bin"), false)
        enc = encodeZ85(uuidBytes)
        out.write(1) // format version
        offset = 1L
      }
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val frame = ByteBuffer.allocate(4 + data.length + 4).order(ByteOrder.BIG_ENDIAN)
      frame.putInt(data.length).put(data).putInt(crc.getValue.toInt)
      out.write(frame.array())
      val d = DeletionVectors.Descriptor("u", enc, Some(offset),
        data.length.toLong, cardinality)
      offset += 4 + data.length + 4
      if (offset >= maxFileBytes) close()
      d
    }

    def close(): Unit = if (out != null) { out.close(); out = null; enc = null }
  }
}
