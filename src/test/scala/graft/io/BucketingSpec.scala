package graft.io

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("bucketed co-located join: zero shuffle exchanges, same result as plain join") {
    // The suite session uses an in-memory catalog over a persistent
    // warehouse dir: a previous JVM's table dirs survive as orphans the
    // fresh catalog knows nothing about — clear them first.
    Seq("b_lineitem", "b_orders").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "b_orders", "o_orderkey", 4)

    val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

    val agg = joined.collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

    // No exchange anywhere: the scans' bucket layout satisfies the join's
    // distribution requirement, and the partial/final agg reuses it too.
    val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"expected a shuffle-free plan, got:\n${joined.queryExecution.executedPlan}")

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(agg == plain)

    // Bucket pruning: an equality filter on the bucket key reads 1 of the
    // 4 buckets — the scan itself reports the cut.
    val pruned = spark.table("b_orders").filter(col("o_orderkey") === 42L)
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no file scan"))
    assert(scan.optionalBucketSet.isDefined
        && scan.optionalBucketSet.get.cardinality() == 1,
      s"expected 1 selected bucket:\n$scan")
  }
}
