package graft.core

import graft.SparkSpec
import graft.core.ops.TableOps
import graft.core.schema.{ColumnSpec, ColumnValidator, SchemaFlattener, TypeEnrichment}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("ColumnSpec parses kind///type///name and ignores plain columns") {
    assert(ColumnSpec.parse("metadata///string///labelspark-String")
      .contains(ColumnSpec("metadata", "string", "labelspark-String",
        "metadata///string///labelspark-String")))
    assert(ColumnSpec.parse("row_data").isEmpty)
    assert(ColumnSpec.parse("a|b|c", divider = "|").contains(ColumnSpec("a", "b", "c", "a|b|c")))
  }

  test("ColumnValidator requires row_data and resolves reserved + indexed columns") {
    val cols = Seq("row_data", "global_key", "attachment///image///a1",
      "annotation///bbox///b1", "metadata///number///m1")
    val rc = ColumnValidator.validate(cols).toOption.get
    assert(rc.rowData == "row_data" && rc.globalKey.contains("global_key"))
    assert(rc.externalId.isEmpty)
    assert(rc.attachments.map(_.name) == Seq("a1"))
    assert(rc.annotations.map(_.tpe) == Seq("bbox"))
    assert(rc.metadata.map(_.tpe) == Seq("number"))
    assert(ColumnValidator.validate(Seq("global_key")).isLeft)
  }

  test("SchemaFlattener walks structs, one array level, stops at nested arrays") {
    val pts = StructField("pts", ArrayType(StructType(Seq(StructField("x", LongType)))))
    val objects = StructField("objects",
      ArrayType(StructType(Seq(StructField("title", StringType), pts))))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("label", StructType(Seq(objects, StructField("name", StringType))))))
    assert(SchemaFlattener.leafPaths(schema) ==
      Seq("id", "label.objects.title", "label.objects.pts", "label.name"))
  }

  test("SchemaFlattener.flatten produces selectable dotted columns") {
    val df = spark.read.json(Seq(
      """{"id":1,"label":{"name":"n1","objects":[{"title":"car"},{"title":"dog"}]}}""").toDS)
    val flat = SchemaFlattener.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "label.name", "label.objects.title"))
    val row = flat.collect().head
    assert(row.getAs[Long]("id") == 1L)
    assert(row.getAs[scala.collection.Seq[String]]("label.objects.title").toSeq == Seq("car", "dog"))
  }

  test("TypeEnrichment casts the Labelbox default columns, tolerating garbage") {
    val df = Seq(("5", "not-a-ts"), ("7", "2024-01-01 00:00:00"))
      .toDF("Agreement", "Created At")
    val out = TypeEnrichment.enrich(df)
    assert(out.schema("Agreement").dataType == IntegerType)
    assert(out.schema("Created At").dataType == TimestampType)
    assert(out.collect().map(_.isNullAt(1)).toSeq == Seq(true, false))
  }

  test("TableOps uniqueness report + deterministic last-write-wins dedupe") {
    val df = Seq(("k1", 1, "a"), ("k1", 2, "b"), ("k2", 1, "c")).toDF("key", "v", "p")
    val rep = TableOps.uniquenessReport(df, "key").collect().head
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2)) == (3L, 2L, 1L))
    val kept = TableOps.dedupeLastWins(df, Seq("key"), Seq(col("v").desc))
      .orderBy("key").collect().map(_.getString(2)).toSeq
    assert(kept == Seq("b", "c"))
  }

  test("observedUniqueness collects counters during the action, no extra job") {
    val df = Seq(("k1", 1), ("k1", 2), ("k2", 3)).toDF("key", "v")
    val (observed, obs) = TableOps.observedUniqueness(df, "key")
    observed.write.format("noop").mode("overwrite").save() // the caller's own action
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("n_keys_approx").asInstanceOf[Long] >= 2L)
  }

  test("TableOps normalizeNulls + jsonifyNested give the all-string presentation") {
    val df = Seq((Some("x"), None: Option[String], 5L)).toDF("a", "b", "n")
      .withColumn("nested", struct(lit(1).as("i"), lit("s").as("t")))
    val out = TableOps.normalizeNulls(TableOps.jsonifyNested(df)).collect().head
    assert(out.getAs[String]("b") == "")
    assert(out.getAs[String]("nested") == """{"i":1,"t":"s"}""")
  }
}
