package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1).
  *
  * S1 json-string scan, S5 CSV, S6/S7 table read/write with the reference's
  * validated write modes, S9 temp views, S11 catalog introspection. The
  * reference's Delta paths (client.py:120-121,146,347,500) become parquet
  * here (zero-egress env); the API shape is format-agnostic.
  */
object Sources {

  /** S1 (labelspark/jsonToDataFrame.py:1-6): one JSON document string →
    * DataFrame, schema inferred or explicit. Distributed parse: the string
    * becomes a 1-row dataset, so multi-document ingest (one JSON per row)
    * scales the same way.
    */
  def jsonStringToDataFrame(spark: SparkSession, json: String,
      schema: Option[StructType] = None): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(Seq(json))
    val reader = spark.read
    schema.foreach(reader.schema)
    reader.json(ds)
  }

  /** S1 at scale: a dataset of JSON documents (one per row). */
  def jsonLinesToDataFrame(spark: SparkSession, lines: org.apache.spark.sql.Dataset[String],
      schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read
    schema.foreach(reader.schema)
    reader.json(lines)
  }

  /** S5: header CSV scan (the fixture format). */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read.option("header", "true")
    schema.fold(reader.option("inferSchema", "true"))(reader.schema)
      .csv(path)
  }

  /** S6: managed-table read. A path carrying a `_delta_log` reads through
    * the log-replay Delta reader ([[DeltaRead]] — public protocol, no
    * delta jars); anything else is a plain parquet directory.
    */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path, "_delta_log")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) DeltaRead.readDeltaTable(spark, path)
    else spark.read.parquet(path)
  }

  /** S7: validated write (client.py:120-121 allows append/overwrite only). */
  def writeTable(df: DataFrame, path: String, mode: String): Unit = {
    require(mode == "append" || mode == "overwrite",
      s"write_mode must be append or overwrite, got $mode")
    df.write.mode(mode).parquet(path)
  }

  /** S6/S7 are format-agnostic: the same validated read/write surface over
    * any columnar format Spark ships (parquet default, ORC here as the
    * second witness — at scale the choice is a table property, not code).
    */
  def readTableAs(spark: SparkSession, path: String, format: String): DataFrame =
    if (format == "delta") DeltaRead.readDeltaTable(spark, path)
    else spark.read.format(format).load(path)

  def writeTableAs(df: DataFrame, path: String, mode: String, format: String): Unit = {
    require(mode == "append" || mode == "overwrite",
      s"write_mode must be append or overwrite, got $mode")
    // the reference's primary sink (client.py:146) — our own commit
    // protocol, since no delta jars resolve in this environment
    if (format == "delta") DeltaWrite.writeDeltaTable(df, path, mode)
    else df.write.format(format).mode(mode).save(path)
  }

  /** Raw-text corpus ingest: one document per line, content-addressed ids
    * (xxhash64 of the text — stable across reruns/partitioning, unlike
    * monotonically_increasing_id, and duplicate lines share an id, which is
    * exactly what exact-dedup wants downstream).
    */
  def readTextCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("value")).as("doc_id"),
        org.apache.spark.sql.functions.col("value").as("text"))

  /** S9: temp-view registration for the SQL surface. */
  def registerTempView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** S11: catalog introspection. */
  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  /** S11: DESCRIBE-style schema rows (name, type) without a SQL round-trip. */
  def describeColumns(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
}
