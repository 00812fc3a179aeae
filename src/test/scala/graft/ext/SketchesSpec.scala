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

  test("count-min: estimates never undercount, stay within eN, and daily states union losslessly") {
    val events = Tables.events(spark, sf)
    val (depth, width) = (4, 1024)
    // one whole-corpus sketch of the event_type stream
    val whole = Sketches.cm(depth, width,
      events.agg(Sketches.cmSketch(col("event_type"), depth, width)).head().getSeq[Long](0))
    val exact = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(whole.total == n, s"total ${whole.total} vs $n")
    exact.foreach { case (k, c) =>
      val est = whole.estimate(k)
      assert(est >= c, s"$k undercounted: $est < $c")
      assert(est <= c + (math.E / width * n).toLong + 1,
        s"$k over the eN bound: $est vs $c (N=$n)")
    }
    // an absent key estimates ~0 (collision mass only)
    assert(whole.estimate("no_such_event") <= (math.E / width * n).toLong + 1)
    // per-day sketches union to the identical counter array
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(Sketches.cmSketch(col("event_type"), depth, width).as("cm"))
    val unioned = daily.agg(Sketches.cmUnion(col("cm"), depth, width))
      .head().getSeq[Long](0)
    assert(unioned == whole.counters.toSeq, "union must be exact, not approximate")
  }
}
