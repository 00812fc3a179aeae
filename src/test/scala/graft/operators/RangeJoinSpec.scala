package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned range join equals the naive inequality join, boundaries exact") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // within one bin span
      (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:30:00")), // crosses 2 bin edges
      (3L, ts("2024-01-01 23:50:00"), ts("2024-01-02 00:10:00")), // crosses midnight
      (4L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:01"))  // 1s sliver
    ).toDF("iid", "start", "end")
    val points = Seq(
      (10L, ts("2024-01-01 10:00:00")), // == start of 1 → in (inclusive)
      (11L, ts("2024-01-01 11:00:00")), // == end of 1 → out (exclusive), in 2
      (12L, ts("2024-01-01 12:29:59")),
      (13L, ts("2024-01-02 00:05:00")),
      (14L, ts("2024-01-05 00:00:00")),
      (15L, ts("2024-01-07 09:00:00"))  // matches nothing
    ).toDF("pid", "pts")

    val got = RangeJoin.binnedRangeJoin(intervals, points, "start", "end", "pts")
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = intervals.join(points,
        col("pts") >= col("start") && col("pts") < col("end"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 11L), (2L, 12L), (3L, 13L), (4L, 14L)))
  }

  test("bin width does not change results") {
    val intervals = spark.range(0, 50).select(
      col("id").as("iid"),
      timestamp_micros(col("id") * 600000000L).as("start"),
      timestamp_micros(col("id") * 600000000L + 1800000000L).as("end"))
    val points = spark.range(0, 200).select(
      col("id").as("pid"),
      timestamp_micros(col("id") * 157000000L).as("pts"))
    val expected = intervals.join(points,
        col("pts") >= col("start") && col("pts") < col("end"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    Seq("5 minutes", "30 minutes", "2 hours").foreach { w =>
      val got = RangeJoin.binnedRangeJoin(intervals, points, "start", "end", "pts", w)
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"width $w differs")
    }
  }

  test("corrupt intervals (end <= start) are dropped, never exploded") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // valid
      (2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")), // zero-length
      (3L, ts("2024-06-01 00:00:00"), ts("2024-01-01 00:00:00"))  // end FAR before start
    ).toDF("iid", "start", "end")
    val points = Seq(
      (10L, ts("2024-01-01 10:30:00")),
      (11L, ts("2024-01-01 12:00:00")),
      (12L, ts("2024-03-01 00:00:00"))  // inside the inverted interval's span
    ).toDF("pid", "pts")
    val got = RangeJoin.binnedRangeJoin(intervals, points, "start", "end", "pts")
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    // only the valid interval matches; the inverted one neither errors (a
    // descending 5-month bin sequence) nor emits rows
    assert(got == Set((1L, 10L)))
  }

  test("empty sides produce empty results") {
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("iid", "start", "end")
    val points = Seq((1L, ts("2024-01-01 00:30:00"))).toDF("pid", "pts")
    assert(RangeJoin.binnedRangeJoin(
      intervals.limit(0), points, "start", "end", "pts").count() == 0)
    assert(RangeJoin.binnedRangeJoin(
      intervals, points.limit(0), "start", "end", "pts").count() == 0)
  }

  test("rejects month/day and non-positive widths") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "start", "end")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(df, df.select(col("start").as("pts")),
        "start", "end", "pts", "1 month")
    }
  }
}
