package graft.io

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Checkpoint row for the `add` side — file-scoped (not nested in the
  * object, and not private: a private nested case class breaks the encoder's
  * generated-code accessor resolution).
  */
private[io] case class CheckpointAdd(path: String, partitionValues: Map[String, String],
    size: Long, modificationTime: Long, stats: String)

/** Minimal single-writer Delta Lake COMMIT protocol — the write half of
  * [[DeltaRead]], against the same PUBLIC delta.io log format (no delta
  * jars in this zero-egress env). This is the reference's primary sink
  * (`df.write.format("delta").mode(mode).save(path)`, labelspark
  * client.py:146, modes validated at client.py:120-121), re-derived:
  *
  *   - DATA: the DataFrame writes to a hidden staging directory inside the
  *     table (so a crashed job leaves no half-visible files), then each
  *     part file moves into the table root under a fresh unique name —
  *     readers never see a file before the commit that adds it.
  *     `partitionBy` produces the standard hive layout; the partition
  *     columns are NOT in the data files (Delta layout), their values ride
  *     each add's `partitionValues`.
  *   - LOG: one `NNN.json` per commit — `commitInfo` (operation + mode),
  *     `metaData` (schemaString, partitionColumns; emitted on table
  *     creation or schema-changing overwrite), `protocol` on version 0,
  *     `add` per data file (with footer-derived numRecords/min/max stats —
  *     fuel for [[DeltaFileIndex]] skipping), `remove` tombstones for every
  *     previously-live file on overwrite. The commit json is written to a
  *     temp name and atomically RENAMED to its version — the single-writer
  *     guard: if the destination exists, a concurrent writer won the race
  *     and this commit fails instead of clobbering it.
  *   - CHECKPOINT: [[checkpoint]] snapshots the replayed state into
  *     `NNN.checkpoint.parquet` + `_last_checkpoint` so replay cost stays
  *     bounded as commits accumulate (readers then replay only the tail).
  *
  * Scale notes: the log work is driver-side and O(files touched), never
  * O(rows); the data write is an ordinary distributed parquet write. At
  * 100 TB the commit is exactly as cheap as at 100 MB — what grows is the
  * data job, which Spark already distributes.
  */
object DeltaWrite {

  /** Write `df` to the Delta table at `path`. `mode` ∈ {append, overwrite}
    * (the reference's validated surface). Returns the committed version.
    */
  def writeDeltaTable(df: DataFrame, path: String, mode: String,
      partitionBy: Seq[String] = Nil): Long = {
    require(mode == "append" || mode == "overwrite",
      s"write_mode must be append or overwrite, got $mode")
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val logDir = new Path(root, "_delta_log")

    // Existing table state (None for a fresh path): schema compatibility
    // for append, tombstones for overwrite.
    val existing: Option[(DeltaRead.Meta, Seq[DeltaRead.LiveFile])] =
      if (fs.exists(logDir)) Some(DeltaRead.replayLog(spark, path, None)).filter(_._1 != null)
      else None
    val version = DeltaRead.latestVersion(spark, path) + 1

    existing.foreach { case (meta, _) =>
      val old = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
      if (mode == "append") {
        require(DataType.equalsStructurally(df.schema, old, ignoreNullability = true),
          s"append schema ${df.schema.simpleString} does not match table schema " +
            s"${old.simpleString} — overwrite to change the schema")
        require(meta.partitionCols == partitionBy,
          s"append partitioning $partitionBy does not match table partitioning " +
            s"${meta.partitionCols}")
      }
    }

    // 1) data files: stage inside the table (same filesystem → rename is a
    // metadata op), then move under fresh names. The staging dir is
    // dot-prefixed: invisible to any reader listing the table.
    val staging = new Path(root, s".staging-${UUID.randomUUID()}")
    val writer = df.write.mode("overwrite")
    if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
    writer.parquet(staging.toString)

    val staged = listParquet(fs, staging)
    val adds = staged.map { p =>
      val rel = relativize(staging, p)
      val dirPart = rel.split('/').dropRight(1)
      val pv = dirPart.collect { case s if s.contains('=') =>
        val Array(k, v) = s.split("=", 2)
        k -> v
      }.toMap
      val fresh = (dirPart :+ s"part-${UUID.randomUUID()}.snappy.parquet").mkString("/")
      val dest = new Path(root, fresh)
      fs.mkdirs(dest.getParent)
      require(fs.rename(p, dest), s"failed to move $p to $dest")
      val size = fs.getFileStatus(dest).getLen
      val stats = footerStats(conf, dest)
      (fresh, pv, size, stats)
    }
    fs.delete(staging, true)

    // 2) the commit
    val now = System.currentTimeMillis()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def js(s: String): String = mapper.writeValueAsString(s)
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    lines += s"""{"commitInfo":{"timestamp":$now,"operation":"WRITE","operationParameters":{"mode":${js(mode)}},"engineInfo":"graft"}}"""
    if (version == 0L)
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val schemaChanged = existing.forall { case (meta, _) =>
      !DataType.equalsStructurally(df.schema,
        DataType.fromJson(meta.schemaJson).asInstanceOf[StructType], ignoreNullability = true) ||
        meta.partitionCols != partitionBy
    }
    if (schemaChanged) {
      require(mode == "overwrite" || existing.isEmpty, "unreachable: append checked above")
      val pcols = partitionBy.map(js).mkString("[", ",", "]")
      lines += s"""{"metaData":{"id":${js(UUID.randomUUID().toString)},"format":{"provider":"parquet","options":{}},"schemaString":${js(df.schema.json)},"partitionColumns":$pcols,"configuration":{},"createdTime":$now}}"""
    }
    if (mode == "overwrite") existing.foreach { case (_, live) =>
      live.foreach { f =>
        lines += s"""{"remove":{"path":${js(f.path)},"deletionTimestamp":$now,"dataChange":true}}"""
      }
    }
    adds.foreach { case (rel, pv, size, stats) =>
      val pvJson = pv.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${js(k)}:${js(v)}" }.mkString("{", ",", "}")
      val statsField = stats.map(s => s""","stats":${js(s)}""").getOrElse("")
      lines += s"""{"add":{"path":${js(rel)},"partitionValues":$pvJson,"size":$size,"modificationTime":$now,"dataChange":true$statsField}}"""
    }

    publishCommit(fs, logDir, version, lines.toSeq)
    version
  }

  /** Atomic commit publish: tmp file + rename to `NNN.json`. An existing
    * destination means a concurrent writer committed this version first —
    * the single-writer guard fails the commit instead of clobbering.
    */
  private[io] def publishCommit(fs: org.apache.hadoop.fs.FileSystem,
      logDir: Path, version: Long, lines: Seq[String]): Unit = {
    fs.mkdirs(logDir)
    val dest = new Path(logDir, f"$version%020d.json")
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (fs.exists(dest) || !fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"commit $version already exists in $logDir — concurrent writer won")
    }
  }

  /** Snapshot the current table state into `NNN.checkpoint.parquet` +
    * `_last_checkpoint`, bounding future replay to commits after `NNN`.
    * The checkpoint carries metaData, protocol, and every live add with
    * its partitionValues/size/stats — exactly what [[DeltaRead]]'s fast
    * path consumes.
    */
  def checkpoint(spark: SparkSession, path: String): Long = {
    val version = DeltaRead.latestVersion(spark, path)
    require(version >= 0, s"$path has no commits to checkpoint")
    val (meta, live) = DeltaRead.replayLog(spark, path, None)
    require(meta != null, s"$path has no metaData action")
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = new Path(new Path(path), "_delta_log")
    val fs = logDir.getFileSystem(conf)

    import org.apache.spark.sql.functions._
    import spark.implicits._
    val addRows = live.map(f => CheckpointAdd(f.path, f.partitionValues,
      f.size, f.modificationTime, f.stats.orNull))
    val addsDf = addRows.toDF()
      .select(struct(col("path"), col("partitionValues"), col("size"),
        col("modificationTime"), col("stats")).as("add"))
      .withColumn("metaData", lit(null).cast(
        "struct<id:string,schemaString:string,partitionColumns:array<string>>"))
      .withColumn("protocol", lit(null).cast(
        "struct<minReaderVersion:int,minWriterVersion:int>"))
    val metaDf = Seq(1).toDF("__one")
      .select(
        lit(null).cast(addsDf.schema("add").dataType.sql).as("add"),
        struct(lit(UUID.randomUUID().toString).as("id"),
          lit(meta.schemaJson).as("schemaString"),
          typedlit(meta.partitionCols).as("partitionColumns")).as("metaData"),
        struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion")).as("protocol"))
    val cpDf = metaDf.unionByName(addsDf.select(col("add"), col("metaData"), col("protocol")))

    val staging = new Path(new Path(path), s".cp-staging-${UUID.randomUUID()}")
    cpDf.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = listParquet(fs, staging).head
    val dest = new Path(logDir, f"$version%020d.checkpoint.parquet")
    fs.delete(dest, false)
    require(fs.rename(part, dest), s"failed to publish checkpoint $dest")
    fs.delete(staging, true)
    val lc = new Path(logDir, "_last_checkpoint")
    val tmp = new Path(logDir, s".tmp-lc-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(s"""{"version":$version,"size":${live.size + 2}}""".getBytes("UTF-8"))
    finally out.close()
    fs.delete(lc, false)
    require(fs.rename(tmp, lc), s"failed to update $lc")
    version
  }

  private def listParquet(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[Path] = {
    val it = fs.listFiles(dir, true)
    val out = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f.getPath
    }
    out.toSeq
  }

  private def relativize(base: Path, p: Path): String = {
    val b = base.toUri.getPath.stripSuffix("/") + "/"
    val full = p.toUri.getPath
    require(full.startsWith(b), s"$p is not under $base")
    full.stripPrefix(b)
  }

  /** Per-file `add.stats` JSON from the parquet FOOTER (driver-side, no
    * data read): numRecords always; min/max for top-level primitive
    * columns whose row-group statistics are present and comparable.
    * Conservative by construction — a column with missing or undecodable
    * stats is simply omitted, and [[DeltaFileIndex]] treats absent bounds
    * as unskippable.
    */
  private[io] def footerStats(conf: org.apache.hadoop.conf.Configuration,
      file: Path): Option[String] = {
    try {
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, file, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      val blocks = footer.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val mins = scala.collection.mutable.LinkedHashMap[String, Any]()
      val maxs = scala.collection.mutable.LinkedHashMap[String, Any]()
      val nulls = scala.collection.mutable.LinkedHashMap[String, Long]()
      if (blocks.nonEmpty) {
        val cols = blocks.head.getColumns.asScala.toSeq
          .filter(_.getPath.size() == 1) // top-level only
        cols.foreach { c0 =>
          val name = c0.getPath.toDotString
          val perBlock = blocks.map(_.getColumns.asScala
            .find(_.getPath.toDotString == name).orNull)
          val stats = perBlock.map(c => if (c == null) null else c.getStatistics)
          if (!stats.contains(null) && stats.forall(s => !s.isEmpty)) {
            nulls.put(name, stats.map(_.getNumNulls).sum)
            if (stats.forall(s => s.hasNonNullValue)) {
              val typ = c0.getPrimitiveType
              def decode(v: AnyRef): Option[Any] = v match {
                case i: java.lang.Integer => Some(i.intValue())
                case l: java.lang.Long => Some(l.longValue())
                case d: java.lang.Double => Some(d.doubleValue())
                case f: java.lang.Float => Some(f.floatValue())
                case b: org.apache.parquet.io.api.Binary
                    if typ.getLogicalTypeAnnotation != null &&
                      typ.getLogicalTypeAnnotation.toString == "STRING" =>
                  Some(b.toStringUsingUTF8)
                case _ => None
              }
              val dmins = stats.map(s => decode(s.genericGetMin().asInstanceOf[AnyRef]))
              val dmaxs = stats.map(s => decode(s.genericGetMax().asInstanceOf[AnyRef]))
              if (dmins.forall(_.isDefined) && dmaxs.forall(_.isDefined)) {
                mins.put(name, dmins.flatten.min(anyOrd))
                maxs.put(name, dmaxs.flatten.max(anyOrd))
              }
            }
          }
        }
      }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def jv(v: Any): String = v match {
        case s: String => mapper.writeValueAsString(s)
        case other => other.toString
      }
      def obj(m: scala.collection.Map[String, Any]): String =
        m.map { case (k, v) => s"${mapper.writeValueAsString(k)}:${jv(v)}" }
          .mkString("{", ",", "}")
      Some(s"""{"numRecords":$numRecords,"minValues":${obj(mins)},""" +
        s""""maxValues":${obj(maxs)},"nullCount":${obj(nulls)}}""")
    } catch { case _: Throwable => None }
  }

  /** Cross-type ordering for footer stat values (within one column all
    * values share a runtime type).
    */
  private val anyOrd: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = (a, b) match {
      case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: Float, y: Float) => java.lang.Float.compare(x, y)
      case (x: String, y: String) => x.compareTo(y)
      case _ => 0
    }
  }
}
