package graft.io

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExportSourceV2Spec extends SparkSpec with AdaptiveSparkPlanHelper {

  ExportFeedRegistry.register("test_feed", (page, pageSize) =>
    (0 until pageSize).map { i =>
      val id = page * pageSize + i
      Map(
        "global_key" -> s"gk-$id",
        "external_id" -> s"ext-$id",
        "row_data" -> s"https://rows/$id.jpg",
        "project_id" -> s"p${id % 3}",
        "label_json" -> s"""{"answer":"a$id"}""")
    })

  private def read(pages: Int, pageSize: Int) =
    spark.read.format("graft.io.ExportSourceV2")
      .option("feed", "test_feed").option("pages", pages).option("pageSize", pageSize)
      .load()

  test("pages become partitions; all records arrive once") {
    val df = read(pages = 3, pageSize = 4)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 12)
    val keys = df.select("global_key").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(keys.length == 12 && keys.distinct.length == 12)
  }

  test("column pruning reaches the scan (ReadSchema is the projection)") {
    val df = read(pages = 2, pageSize = 5).select("project_id")
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("project_id"),
      s"expected pruned scan, got ${scans.head.scan.readSchema()}")
  }

  test("supported filters push to the source; unsupported stay post-scan") {
    val df = read(pages = 2, pageSize = 6)
      .filter(col("project_id") === "p1" && length(col("global_key")) > 3)
    val rows = df.collect()
    assert(rows.length == 4 && rows.forall(_.getAs[String]("project_id") == "p1"))

    val scan = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.scan
    }.head
    // The equality predicate is evaluated at the source (the description
    // carries the pushed set); the length() predicate is not pushable and
    // must remain a post-scan Filter.
    assert(scan.description().contains("EqualTo(project_id,p1)"),
      s"pushed filters missing from ${scan.description()}")
    assert(!scan.description().contains("length"),
      s"unexpected pushed filter in ${scan.description()}")
    val hasPostFilter = df.queryExecution.executedPlan.toString.contains("Filter")
    assert(hasPostFilter, "length() predicate should stay as a post-scan Filter")
  }

  test("fully-pushed scans return exactly the filtered records") {
    val got = read(pages = 3, pageSize = 4)
      .filter(col("project_id").isin("p0", "p2"))
      .select("global_key")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    val want = (0 until 12).filter(i => i % 3 != 1).map(i => s"gk-$i").toSet
    assert(got == want)
  }

  test("LIMIT pushes into the feed: readers stop early, result stays exact") {
    val df = read(pages = 3, pageSize = 4).limit(5)
    assert(df.count() == 5)
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scans.exists(_.contains("PushedLimit: 5")), scans.mkString("\n"))
    // with a residual-free pushed filter the limit applies post-filter
    val filtered = read(pages = 3, pageSize = 4)
      .filter(col("project_id") === "p0").limit(2)
    assert(filtered.count() == 2)
    assert(filtered.collect().forall(_.getAs[String]("project_id") == "p0"))
  }

  test("bare count/min/max answer from feed stats: pushed aggregate, ZERO page fetches") {
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    ExportFeedRegistry.register("stats_feed", (page, pageSize) => {
      fetches.incrementAndGet()
      (0 until pageSize).map(i => Map("global_key" -> s"gk-${page * pageSize + i}"))
    })
    ExportFeedRegistry.registerStats("stats_feed", ExportFeedRegistry.FeedStats(
      rowCount = 123456L,
      min = Map("global_key" -> "gk-0"),
      max = Map("global_key" -> "gk-99")))
    def readStats = spark.read.format("graft.io.ExportSourceV2")
      .option("feed", "stats_feed").option("pages", 50).option("pageSize", 1000).load()

    val df = readStats.agg(
      count(lit(1)).as("n"), min("global_key").as("lo"), max("global_key").as("hi"))
    val row = df.collect().head
    assert((row.getLong(0), row.getString(1), row.getString(2)) ==
      ((123456L, "gk-0", "gk-99")))
    val descs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.scan.description()
    }
    assert(descs.exists(_.contains("PushedAggregates")), descs.mkString("\n"))
    assert(fetches.get() == 0, s"aggregate pushdown must not fetch pages, got ${fetches.get()}")

    // a FILTERED count cannot be served from whole-feed stats — it must
    // decline the pushdown and go through the pages
    val filtered = readStats.filter(col("global_key") === "gk-5").count()
    assert(fetches.get() > 0, "filtered count must fetch pages")
    assert(filtered == 1L)
  }

  test("feeds compose with ordinary relational ops") {
    val agg = read(pages = 2, pageSize = 6)
      .groupBy("project_id").agg(count(lit(1)).as("n"))
      .orderBy("project_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(agg.toSeq == Seq(("p0", 4L), ("p1", 4L), ("p2", 4L)))
  }
}
