package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  test("folding daily deltas through merge equals the full recompute, exactly") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"),
        dayofmonth(col("ts")).as("day"))
    val days = events.select("day").distinct().collect().map(_.getInt(0)).sorted
    assert(days.length >= 3, "fixture should span several days")

    val keys = Seq("user_id", "event_type")
    var state = Incremental.partialAgg(events.filter(col("day") === days.head), keys, "value")
    days.tail.foreach { d =>
      val delta = Incremental.partialAgg(events.filter(col("day") === d), keys, "value")
      state = Incremental.merge(state, delta, keys)
    }

    val full = Incremental.partialAgg(events, keys, "value")
    // exact match on n/min/max; sums compare to 1e-9 (addition order differs
    // by construction — that's the point of the monoid state)
    val got = state.orderBy("user_id", "event_type").collect()
    val exp = full.orderBy("user_id", "event_type").collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getLong(2) == e.getLong(2), s"n differs at ${g.get(0)},${g.get(1)}")
      assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9, "sum")
      assert(g.getDouble(4) == e.getDouble(4), "min")
      assert(g.getDouble(5) == e.getDouble(5), "max")
    }
    // derived read view
    val v = Incremental.readView(state)
    assert(v.columns.contains("avg"))
  }

  test("merge handles keys present on only one side") {
    import spark.implicits._
    val a = Seq(("k1", 1.0), ("k1", 3.0)).toDF("k", "v")
    val b = Seq(("k2", 5.0)).toDF("k", "v")
    val s1 = Incremental.partialAgg(a, Seq("k"), "v")
    val s2 = Incremental.partialAgg(b, Seq("k"), "v")
    val m = Incremental.merge(s1, s2, Seq("k")).orderBy("k").collect()
    assert(m.map(_.getString(0)).toSeq == Seq("k1", "k2"))
    assert(m(0).getLong(1) == 2 && m(0).getDouble(2) == 4.0)
    assert(m(1).getLong(1) == 1 && m(1).getDouble(2) == 5.0
      && m(1).getDouble(3) == 5.0 && m(1).getDouble(4) == 5.0)
  }
}
