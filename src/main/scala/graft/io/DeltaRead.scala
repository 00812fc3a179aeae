package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Read-only Delta Lake table support, implemented directly against the
  * PUBLIC Delta transaction-log format (delta.io protocol spec: a
  * `_delta_log/` directory of versioned JSON commits containing `metaData`
  * / `add` / `remove` actions, optionally compacted into
  * `NNN.checkpoint.parquet` files referenced by `_last_checkpoint`) — no
  * delta-core jars, which this zero-egress environment cannot resolve.
  *
  * The reference reads Delta tables through `spark.read.load(path)` with
  * the delta extension installed (labelspark client.py:347,500); this is
  * the same read surface re-derived from the log protocol:
  *
  *   - log REPLAY: later actions win per file path — an `add` makes the
  *     file live, a `remove` tombstones it; the live set at the requested
  *     version is exactly what a Delta reader scans.
  *   - schema comes from the LAST `metaData` action's `schemaString`
  *     (which is a Spark StructType JSON — Delta's own encoding), so reads
  *     survive schema evolution without inference.
  *   - partition columns are re-derived from each file's
  *     `partitionValues`, so files written under Hive-style directories
  *     (the Delta layout) read back with their partition columns intact.
  *   - `versionAsOf` time travel is log replay cut at the version — free
  *     once replay exists.
  *
  * Scale notes: the log itself is driver-side (a Delta log is KBs..MBs —
  * one JSON action per file, checkpointed; this is true at any table
  * size), while the DATA read is an ordinary distributed parquet scan of
  * the live files — pushdown, pruning, and codegen all apply as usual.
  * Writes stay on [[Sources.writeTable]] (an honest parquet path with mode
  * validation); implementing the Delta COMMIT protocol (optimistic
  * concurrency, atomic log append) is out of scope for a reader.
  */
object DeltaRead {

  private final case class Meta(schemaJson: String, partitionCols: Seq[String])

  /** One live file: path (log-relative) + partition values. */
  private final case class LiveFile(path: String, partitionValues: Map[String, String])

  /** Read a Delta table at `path`, optionally at an historical version. */
  def readDeltaTable(spark: SparkSession, path: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val (meta, files) = replayLog(spark, path, versionAsOf)
    require(meta != null, s"$path has no metaData action in its _delta_log")
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    if (files.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    val dataSchema = StructType(
      schema.fields.filterNot(f => meta.partitionCols.contains(f.name)))

    // Hive-style layouts (Delta's norm: `day=2024-01-01/part-...`) read as
    // ONE scan relation with `basePath` — partition columns come from the
    // directory structure, so the plan size is independent of the
    // partition count (a 10k-partition table is still one scan, and
    // partition filters prune inside it). Type inference is disabled for
    // the load: Delta's partitionValues are authoritative STRINGS ("01"
    // must not become 1), then each column casts to its schema type.
    val hiveStyle = meta.partitionCols.nonEmpty && files.forall(f =>
      meta.partitionCols.forall(c => f.path.contains(s"$c=")))
    val merged =
      if (meta.partitionCols.isEmpty) {
        spark.read.schema(dataSchema).parquet(files.map(f => s"$path/${f.path}"): _*)
      } else if (hiveStyle) {
        val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
        val prev = spark.conf.get(inferKey, "true")
        val raw = try {
          spark.conf.set(inferKey, "false")
          spark.read.schema(dataSchema).option("basePath", path)
            .parquet(files.map(f => s"$path/${f.path}"): _*)
        } finally spark.conf.set(inferKey, prev)
        meta.partitionCols.foldLeft(raw)((df, c) =>
          df.withColumn(c, col(c).cast(schema(c).dataType)))
      } else {
        // non-hive paths: one plan branch per distinct partition tuple
        // (correct for any layout; intended for small partition counts)
        files.groupBy(_.partitionValues).toSeq.map { case (pv, fs) =>
          val base = spark.read.schema(dataSchema)
            .parquet(fs.map(f => s"$path/${f.path}"): _*)
          meta.partitionCols.foldLeft(base) { (df, c) =>
            df.withColumn(c, lit(pv.get(c).orNull).cast(schema(c).dataType))
          }
        }.reduce(_.unionByName(_))
      }
    merged.select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Latest version number in the log (`-1` if the directory is empty). */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path, "_delta_log")
    if (!fs.exists(dir)) return -1L
    fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.endsWith(".json") && n.dropRight(5).forall(_.isDigit) =>
        n.dropRight(5).toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Replay the log up to (and including) `versionAsOf` (default: head).
    * Returns the last metaData and the live file set.
    */
  private def replayLog(spark: SparkSession, path: String,
      versionAsOf: Option[Long]): (Meta, Seq[LiveFile]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val dir = new Path(path, "_delta_log")
    require(fs.exists(dir), s"$path is not a Delta table (no _delta_log)")

    val cut = versionAsOf.getOrElse(Long.MaxValue)
    require(versionAsOf.forall(_ >= 0), s"versionAsOf must be >= 0")

    // checkpoint fast path: _last_checkpoint names a parquet snapshot of
    // the log; only commits AFTER it need JSON replay. Skipped when time
    // traveling to a version before the checkpoint.
    val lastCp = readLastCheckpoint(spark, fs, dir).filter(_ <= cut)
    var meta: Meta = null
    val live = scala.collection.mutable.LinkedHashMap[String, LiveFile]()

    lastCp.foreach { cpVersion =>
      val cpPath = new Path(dir, f"$cpVersion%020d.checkpoint.parquet")
      val cp = spark.read.parquet(cpPath.toString)
      val cols = cp.columns.toSet
      if (cols.contains("metaData"))
        cp.select(col("metaData.schemaString"), col("metaData.partitionColumns"))
          .filter(col("metaData.schemaString").isNotNull).collect()
          .foreach(r => meta = Meta(r.getString(0), r.getSeq[String](1)))
      if (cols.contains("add"))
        cp.select(col("add.path"), col("add.partitionValues"))
          .filter(col("add.path").isNotNull).collect()
          .foreach { r =>
            val pv = Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)
            live.put(r.getString(0), LiveFile(r.getString(0), pv))
          }
    }

    val versions = fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.endsWith(".json") && n.dropRight(5).forall(_.isDigit) =>
        n.dropRight(5).toLong }
      .filter(v => v <= cut && lastCp.forall(v > _))
      .toSeq.sorted
    versionAsOf.foreach { v =>
      require(versions.nonEmpty || lastCp.contains(v),
        s"version $v not present in $dir")
    }

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    versions.foreach { v =>
      val p = new Path(dir, f"$v%020d.json")
      val in = fs.open(p)
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.split('\n').iterator.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("metaData")) {
          val m = node.get("metaData")
          val pcols = Option(m.get("partitionColumns"))
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
          meta = Meta(m.get("schemaString").asText(), pcols)
        }
        if (node.has("add")) {
          val a = node.get("add")
          val fp = a.get("path").asText()
          val pv = Option(a.get("partitionValues"))
            .map(n => n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty[String, String])
          live.put(fp, LiveFile(fp, pv))
        }
        if (node.has("remove"))
          live.remove(node.get("remove").get("path").asText())
      }
    }
    (meta, live.values.toSeq)
  }

  private def readLastCheckpoint(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: Path): Option[Long] = {
    val p = new Path(dir, "_last_checkpoint")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(content)
    Option(node.get("version")).map(_.asLong())
  }
}
