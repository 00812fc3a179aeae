package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def sample = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
    ("b", 5L, 5.0), ("b", 6L, 7.0),
    ("c", 7L, 1.0)
  ).toDF("k", "id", "score")

  test("topKPerKey matches the window row_number formulation") {
    val got = TopKPerKey.topKPerKey(
        sample, Seq("k"), Seq(col("score").desc, col("id")), 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    val w = Window.partitionBy("k").orderBy(col("score").desc, col("id"))
    val want = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(got == want)
    assert(got == Set(("a", 2L), ("a", 3L), ("b", 6L), ("b", 5L), ("c", 7L)))
  }

  test("topKPerKey keeps groups smaller than k intact and preserves schema") {
    val out = TopKPerKey.topKPerKey(sample, Seq("k"), Seq(col("score")), 10)
    assert(out.schema == sample.schema)
    assert(out.count() == sample.count())
  }

  test("plan shape: partial heap before the exchange, final after") {
    val out = TopKPerKey.topKPerKey(
      sample.repartition(4, col("id")), Seq("k"), Seq(col("score").desc, col("id")), 1)
    out.collect() // finalize AQE
    val execs = collectWithSubqueries(out.queryExecution.executedPlan) {
      case e: TopKPerKey.TopKPerKeyExec => e
    }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final TopKPerKeyExec, got:\n${out.queryExecution.executedPlan}")
  }

  test("ties beyond k are cut by the tiebreaker, deterministically") {
    val df = Seq(("g", 1L, 9.0), ("g", 2L, 9.0), ("g", 3L, 9.0))
      .toDF("k", "id", "score")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), Seq(col("score").desc, col("id")), 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("composite keys and large-vs-k random data agree with the window formulation") {
    val df = spark.range(0, 2000).select(
      (col("id") % 37).as("k1"), (col("id") % 3).as("k2"),
      pmod(hash(col("id")), lit(1000)).cast("double").as("score"), col("id"))
    val got = TopKPerKey.topKPerKey(df, Seq("k1", "k2"), Seq(col("score"), col("id")), 3)
      .select("id").as[Long].collect().toSet
    val w = Window.partitionBy("k1", "k2").orderBy(col("score"), col("id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("empty input yields an empty result, schema intact") {
    val empty = sample.filter(col("score") > 1000)
    val out = TopKPerKey.topKPerKey(empty, Seq("k"), Seq(col("score")), 3)
    assert(out.count() == 0)
    assert(out.schema == sample.schema)
  }

  test("unknown columns are rejected with a clear error") {
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(sample, Seq("nope"), Seq(col("score")), 1)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(sample, Seq("k"), Seq(col("nope")), 1)
    }
  }
}
