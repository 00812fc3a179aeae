package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition-pruned layout: the date filter must prune at planning time
  * (PartitionFilters on the scan, one directory read), and the writer must
  * not explode into per-task small files.
  */
class PartitionedLayoutSpec extends SparkSpec {

  private lazy val layoutDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    PartitionedLayout.writeDailyPartitioned(
      graft.Tables.events(spark, sf), "ts", dir)
    dir
  }

  test("writer yields one file per date directory") {
    val root = new java.io.File(layoutDir)
    val dateDirs = root.listFiles().filter(_.getName.startsWith("event_date="))
    assert(dateDirs.length > 1, "expected multiple date partitions")
    dateDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: expected 1 file, got ${files.length}")
    }
  }

  test("date filter prunes to a single partition in the scan") {
    val day = "2024-01-05"
    val df = PartitionedLayout.readDay(spark, layoutDir, day)
    val rows = df.count()

    val want = graft.Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit(day)).count()
    assert(rows == want && rows > 0)

    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // The filter must be a partition filter (planning-time pruning), not a
    // data filter evaluated per row.
    assert(scan.partitionFilters.nonEmpty, "expected partition filters")
    assert(scan.relation.location.inputFiles.length > 1,
      "layout should have many files overall")
    assert(scan.inputRDDs().head.getNumPartitions <= 2,
      "pruned scan should read ~one directory")
  }

  test("full-scan aggregation over the layout matches the unpartitioned table") {
    val got = PartitionedLayout.read(spark, layoutDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
