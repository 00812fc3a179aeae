package graft.core

import graft.SparkSpec
import graft.api.Client
import graft.core.ops.SkewJoin
import graft.core.payload.UploadBuilder
import graft.io.UploadTransport
import org.apache.spark.sql.functions._

class SkewUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    val large = (Seq.fill(500)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "v")
    val small = Seq(("hot", "H"), ("a", "A"), ("z", "Z")).toDF("key", "tag")
    val plain = large.join(small, "key")
      .orderBy("key", "v").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val salted = SkewJoin.saltedJoin(large, small, "key", saltFactor = 8)
      .select(large("key"), col("v"), col("tag"))
      .orderBy("key", "v").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(salted.toSeq == plain.toSeq)
    val hist = SkewJoin.keyHistogram(large, "key", 1).collect().head
    assert(hist.getString(0) == "hot" && hist.getLong(1) == 500L)
  }

  test("salted collect produces the same sorted values as direct collect_list") {
    val df = (1 to 100).map(i => ("k", i.toLong)).toDF("key", "v")
    val out = SkewJoin.saltedCollect(df, "key", "v", 4).collect().head
    assert(out.getAs[scala.collection.Seq[Long]]("values").toSeq == (1L to 100L))
  }

  test("upsert facade: actions, predictions ndjson, per-project regroup") {
    val df = Seq(
      ("u1", "gk1", "p1", "[[[1, 2, 3, 4], []]]", "[[[9, 9, 2, 2], []]]"),
      ("u2", "gk2", "p2", "[[[5, 6, 7, 8], []]]", null)
    ).toDF("row_data", "global_key", "project_id",
      "annotation///bbox///box", "prediction///bbox///pred_box")

    val t = new UploadTransport { def send(b: Seq[String]): Int = b.size }
    val res = Client.upsertDataRowsFromTable(
      df, UploadBuilder.Config(datasetId = Some("ds")), t, modelRunId = Some("mr1"))

    assert(res.actions.createDataRows && res.actions.batchToProjects && res.actions.annotate)
    assert(res.actions.groundTruthToModelRun && res.actions.predictionsToModelRun)

    val preds = res.predictions.collect()
    assert(preds.length == 1 && preds.head.global_key == "gk1" &&
      preds.head.geometry == """{"bbox":{"left":9,"top":9,"width":2,"height":2}}""")

    val byProject = res.annotationsByProject.collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]](1)).toMap
    assert(byProject.keySet == Set("p1", "p2"))
    assert(byProject("p1").exists(_.contains(""""global_key":"gk1"""")))
  }

  test("determineActions: no model run, no predictions branch") {
    val rc = graft.core.schema.ColumnValidator
      .validate(Seq("row_data", "annotation///bbox///b")).toOption.get
    val a = Client.determineActions(rc, UploadBuilder.Config(datasetId = Some("d")))
    assert(a.createDataRows && !a.batchToProjects && !a.annotate &&
      !a.groundTruthToModelRun && !a.predictionsToModelRun)
  }
}
