package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("daily sketches union to the same estimate as one whole-corpus sketch") {
    val events = Tables.events(spark, sf)
    val daily = Sketches.dailyState(events, "ts", Seq("event_type"), "user_id")
    assert(daily.select("day").distinct().count() > 1, "fixture should span days")

    val merged = daily.groupBy(col("event_type"))
      .agg(Sketches.hllEstimate(Sketches.hllUnion(col("sketch"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy(col("event_type"))
      .agg(Sketches.hllEstimate(Sketches.hllSketch(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, "sketch union must be lossless vs direct sketching")

    // and the estimate honors the HLL error contract vs the exact count
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n) <= math.max(2L, (n * 0.05).toLong),
        s"$k: est ${merged(k)} vs exact $n")
    }
  }
}
