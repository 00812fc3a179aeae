package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style TAR sharding — the multimodal training-data
  * interchange (a corpus of `(key, payload...)` samples packed as
  * sequential `.tar` shards whose entries are `key.ext` files; data
  * loaders stream shards sequentially, which is the whole point: at
  * 100 TB random-access per-sample reads thrash object storage, while
  * shard streaming is pure sequential I/O). The layout is the PUBLIC
  * webdataset convention — plain USTAR archives, one sample = adjacent
  * entries sharing a key stem — so any standard loader (or `tar` itself)
  * reads the output.
  *
  * Writer: one pass, fully executor-side (`foreachPartition`; the driver
  * never sees a byte) — each partition streams its rows into
  * `shard-<partition>-<n>.tar` files under `dir`, rolling at
  * `maxShardBytes`, entries in row order. Shard names are deterministic
  * per (partition, roll); re-running the same job overwrites the same
  * names. Headers are hand-rolled USTAR (magic `ustar`, octal size,
  * checksum over a space-filled field) with mtime pinned to 0 so output
  * is byte-deterministic. Keys must fit the 100-byte USTAR name field
  * with their extension; longer keys refuse loudly (no GNU longlink
  * variance across readers).
  *
  * Reader: `binaryFile` over the shards, entries parsed per shard on the
  * executors — returns `(key, ext, bytes)` rows. A shard must fit an
  * executor buffer (`binaryFile`'s contract); size shards accordingly
  * (the webdataset convention is 100 MB–1 GB).
  */
object WebDataset {

  private val BlockSize = 512

  private def octal(value: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(value)
    val padded = ("0" * (width - 1 - s.length)) + s
    padded.getBytes("US-ASCII") :+ 0.toByte
  }

  /** One USTAR header block for a regular file `name` of `size` bytes. */
  private[ext] def tarHeader(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"entry name '$name' exceeds the 100-byte USTAR name field — " +
        "shorten the key (GNU long-name extensions vary across readers)")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    put(0, name.getBytes("UTF-8"))           // name[100]
    put(100, octal(420, 8))                  // mode 0644
    put(108, octal(0, 8))                    // uid
    put(116, octal(0, 8))                    // gid
    put(124, octal(size, 12))                // size
    put(136, octal(0, 12))                   // mtime: pinned → deterministic bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field spaces while summing
    h(156) = '0'                             // typeflag: regular file
    put(257, Array[Byte]('u', 's', 't', 'a', 'r', 0)) // POSIX magic
    put(263, "00".getBytes("US-ASCII"))      // version
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += (h(i) & 0xff); i += 1 }
    val chk = java.lang.Long.toOctalString(sum)
    put(148, (("0" * (6 - chk.length)) + chk).getBytes("US-ASCII") ++
      Array[Byte](0, ' '.toByte))
    h
  }

  /** Pack `df` into tar shards under `dir`. `parts` maps entry EXTENSION →
    * column (binary or string; strings write UTF-8): a row with key `k`
    * and parts `Seq("txt" -> "text", "cls" -> "label")` becomes adjacent
    * entries `k.txt`, `k.cls` — one webdataset sample. Null payloads skip
    * their entry (optional modalities); a null key refuses. Returns the
    * number of shards written.
    */
  def writeShards(df: DataFrame, keyCol: String, parts: Seq[(String, String)],
      dir: String, maxShardBytes: Long = 1L << 30): Long = {
    require(parts.nonEmpty, "parts must map at least one extension to a column")
    require(maxShardBytes >= (1L << 16),
      s"maxShardBytes $maxShardBytes is below any sane shard size")
    val spark = df.sparkSession
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(root)
    val cols = col(keyCol).cast("string").as("__key") +:
      parts.map { case (_, c) => col(c) }
    val projected = df.select(cols: _*)
    val exts = parts.map(_._1)
    // captured BY VALUE: referencing the Dataset's schema inside the
    // executor closure would drag the Dataset itself in (SPARK-28702)
    val partTypes = projected.schema.fields.drop(1).map(_.dataType)
    val shardCount = spark.sparkContext.longAccumulator("graft_wds_shards")
    projected.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      // InternalRow iteration: key as UTF8String, payloads as bytes/UTF8String
      val fs = new Path(dir).getFileSystem(confSer.value)
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      var written = 0L
      var roll = 0
      def open(): Unit = {
        out = fs.create(new Path(dir, f"shard-$pid%05d-$roll%04d.tar"), true)
        written = 0L
        roll += 1
        shardCount.add(1)
      }
      def finish(): Unit = if (out != null) {
        out.write(new Array[Byte](2 * BlockSize)) // end-of-archive marker
        out.close()
        out = null
      }
      it.foreach { row =>
        require(!row.isNullAt(0), "webdataset key must not be null")
        val key = row.getUTF8String(0).toString
        val entries = exts.indices.flatMap { i =>
          if (row.isNullAt(i + 1)) None
          else {
            val v = row.get(i + 1, partTypes(i))
            val bytes = v match {
              case b: Array[Byte] => b
              case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
              case other => other.toString.getBytes("UTF-8")
            }
            Some((s"$key.${exts(i)}", bytes))
          }
        }
        val sampleBytes = entries.map { case (_, b) =>
          BlockSize + ((b.length + BlockSize - 1) / BlockSize) * BlockSize }.sum
        // a SAMPLE never splits across shards (the webdataset contract)
        if (out == null || (written > 0 && written + sampleBytes > maxShardBytes))
          { finish(); open() }
        entries.foreach { case (name, bytes) =>
          out.write(tarHeader(name, bytes.length))
          out.write(bytes)
          val pad = (BlockSize - (bytes.length % BlockSize)) % BlockSize
          if (pad > 0) out.write(new Array[Byte](pad))
          written += BlockSize + bytes.length + pad
        }
      }
      finish()
      Iterator.empty[Row]
    }.count() // the action that runs the write
    shardCount.value
  }

  /** Read tar shards back as `(key, ext, content)` rows — entry stems
    * split on the LAST dot (webdataset's key/extension rule).
    */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    parseShards(spark, spark.read.format("binaryFile").load(s"$dir/*.tar"))

  /** STREAMING shard reader: tail a directory a training-data producer
    * keeps writing shards into — each micro-batch parses only the NEW
    * `.tar` files (the file source's discovery contract), so a
    * downstream curation/ingest sink consumes samples exactly-once as
    * shards land. Same parse, same `(key, ext, content)` rows.
    */
  def readShardsStream(spark: SparkSession, dir: String): DataFrame = {
    // the streaming file source needs the schema up front; binaryFile's
    // is fixed (path, modificationTime, length, content)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    parseShards(spark,
      spark.readStream.format("binaryFile").schema(binarySchema)
        .option("pathGlobFilter", "*.tar").load(dir))
  }

  private def parseShards(spark: SparkSession, shards: DataFrame): DataFrame = {
    import spark.implicits._
    shards
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { tar =>
        val out = scala.collection.mutable.ArrayBuffer[(String, String, Array[Byte])]()
        var off = 0
        var done = false
        while (!done && off + BlockSize <= tar.length) {
          val nameEnd = {
            var i = off
            while (i < off + 100 && tar(i) != 0) i += 1
            i
          }
          if (nameEnd == off) done = true // zero block = end of archive
          else {
            val name = new String(tar, off, nameEnd - off, "UTF-8")
            // several standard writers (GNU tar, bsdtar) LEFT-pad the
            // 12-byte octal size with spaces or NULs — strip them first,
            // or the takeWhile sees an empty string and parseLong throws
            val sizeStr = new String(tar, off + 124, 12, "US-ASCII")
              .dropWhile(c => c == ' ' || c == '\u0000')
              .takeWhile(c => c >= '0' && c <= '7')
            val size = java.lang.Long.parseLong(sizeStr, 8).toInt
            val data = java.util.Arrays.copyOfRange(
              tar, off + BlockSize, off + BlockSize + size)
            val dot = name.lastIndexOf('.')
            val (key, ext) =
              if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
            out += ((key, ext, data))
            off += BlockSize + ((size + BlockSize - 1) / BlockSize) * BlockSize
          }
        }
        out
      }
      .toDF("key", "ext", "content")
  }
}
