package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: greatest right ts <= left ts, equal ts matches, no match → null, keys isolated") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // after r2
      (2L, "u1", ts("2024-01-01 09:00:00")), // exactly r2's ts → matches r2
      (3L, "u1", ts("2024-01-01 07:00:00")), // before all → null
      (4L, "u2", ts("2024-01-01 12:00:00"))  // u2's own row only
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 08:00:00"), "r1"),
      ("u1", ts("2024-01-01 09:00:00"), "r2"),
      ("u2", ts("2024-01-01 09:30:00"), "r3")
    ).toDF("k2", "t2", "payload")

    val out = AsOfJoin.asOfJoin(left, right, "k", "k2", "t", "t2", Seq("payload"))
      .orderBy("id").collect().map(r => Option(r.getAs[String]("payload")))
    assert(out.toSeq == Seq(Some("r2"), Some("r2"), None, Some("r3")))
  }

  test("as-of join carries NULL payload fields from the matched row, not older rows") {
    // r2 (the most recent right row at 09:00) has a NULL b: the output must
    // carry (a2, NULL) atomically — not mix a2 with r1's b1.
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 08:30:00")) // between r1 and r2 → r1's full payload
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 08:00:00"), Some("a1"), Some("b1")),
      ("u1", ts("2024-01-01 09:00:00"), Some("a2"), None)
    ).toDF("k2", "t2", "a", "b")

    val out = AsOfJoin.asOfJoin(left, right, "k", "k2", "t", "t2", Seq("a", "b"))
      .orderBy("id").collect()
      .map(r => (Option(r.getAs[String]("a")), Option(r.getAs[String]("b"))))
    assert(out.toSeq == Seq((Some("a2"), None), (Some("a1"), Some("b1"))))
  }

  test("nearest as-of: nearer side wins, backward on ties, single window sort") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // b gap 2h, f gap 1h → forward r3
      (2L, "u1", ts("2024-01-01 08:30:00")), // b gap 30m, f gap 2.5h → backward r1
      (3L, "u1", ts("2024-01-01 09:30:00")), // b gap 1.5h == f gap 1.5h → backward r1
      (4L, "u1", ts("2024-01-01 11:00:00")), // exactly r3 → gap 0 backward
      (5L, "u2", ts("2024-01-01 05:00:00")), // only later rows → forward r4
      (6L, "u3", ts("2024-01-01 05:00:00"))  // no right rows at all → null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 08:00:00"), "r1"),
      ("u1", ts("2024-01-01 11:00:00"), "r3"),
      ("u2", ts("2024-01-01 06:00:00"), "r4")
    ).toDF("k2", "t2", "payload")

    val near = AsOfJoin.asOfJoinNearest(left, right, "k", "k2", "t", "t2", Seq("payload"))
    val out = near.orderBy("id").collect().map(r => Option(r.getAs[String]("payload")))
    assert(out.toSeq == Seq(Some("r3"), Some("r1"), Some("r1"), Some("r3"), Some("r4"), None))

    // both carries must share ONE window sort: a single exchange on the key
    // and no self-join of two as-of passes
    near.collect()
    val plan = near.queryExecution.executedPlan
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val windows = helper.collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    val joins = helper.collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(windows.size == 1, s"expected one WindowExec, got ${windows.size}")
    assert(joins.isEmpty, "nearest as-of must not plan a join")
  }

  test("as-of join rejects colliding payload column names") {
    val l = Seq((1L, "k", ts("2024-01-01 00:00:00"), "x")).toDF("id", "k", "t", "v")
    val r = Seq(("k", ts("2024-01-01 00:00:00"), "y")).toDF("k2", "t2", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(l, r, "k", "k2", "t", "t2", Seq("v"))
    }
  }

  test("broadcast as-of: the fact side never shuffles — only the packed dim exchanges") {
    val l = graft.Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val r = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("rk"), col("ts").as("rts"), col("value").as("signup_value"))
    val joined = AsOfJoin.asOfJoinBroadcast(
      l, r, "user_id", "rk", "ts", "rts", Seq("signup_value"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val shuffles = helper.collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 1, s"only the dim-side agg may shuffle:\n$plan")
    assert(plan.toString.contains("BroadcastHashJoin"), plan.toString)
  }

  test("broadcast as-of: an oversized right side falls back to the shuffled plan, same rows") {
    val l = graft.Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val r = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("rk"), col("ts").as("rts"), col("value").as("signup_value"))
    val expect = AsOfJoin.asOfJoin(l, r, "user_id", "rk", "ts", "rts", Seq("signup_value"))
      .orderBy("event_id").collect()
    // force the guard: any counted right side exceeds a 1-byte threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val guarded = AsOfJoin.asOfJoinBroadcast(
        l, r, "user_id", "rk", "ts", "rts", Seq("signup_value"))
      val rows = guarded.orderBy("event_id").collect()
      assert(rows.toSeq == expect.toSeq)
      guarded.collect()
      val p = guarded.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcast as-of: binary-search pick equals the shuffled join on a deep rates table") {
    import spark.implicits._
    // 5 keys x 1000 rates each (deep per key), facts probing before the
    // first rate (null match), exactly ON rate timestamps (<= must match),
    // between rates, and after the last
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val rates = (0 until 5).flatMap { k =>
      (0 until 1000).map(i =>
        (k.toLong, new java.sql.Timestamp(base + i * 60000L), k * 10000 + i))
    }.toDF("rk", "rts", "rate")
    val facts = (0 until 5).flatMap { k =>
      Seq(
        (k.toLong * 10 + 1, k.toLong, new java.sql.Timestamp(base - 1000L)), // before all
        (k.toLong * 10 + 2, k.toLong, new java.sql.Timestamp(base + 17 * 60000L)), // exact hit
        (k.toLong * 10 + 3, k.toLong, new java.sql.Timestamp(base + 17 * 60000L + 30000L)), // between
        (k.toLong * 10 + 4, k.toLong, new java.sql.Timestamp(base + 10000 * 60000L))) // after all
    }.toDF("fact_id", "key", "ts")
    val expect = AsOfJoin.asOfJoin(facts, rates, "key", "rk", "ts", "rts", Seq("rate"))
      .orderBy("fact_id").collect().map(r => (r.getLong(0), Option(r.get(3))))
    val got = AsOfJoin.asOfJoinBroadcast(facts, rates, "key", "rk", "ts", "rts", Seq("rate"))
      .orderBy("fact_id").collect().map(r => (r.getLong(0), Option(r.get(3))))
    assert(got.toSeq == expect.toSeq)
    // spot-check the semantics directly: exact hit carries rate i=17,
    // between carries 17 too, before-all is null, after-all is the last
    val byId = got.toMap
    assert(byId(1L).isEmpty)
    assert(byId(2L).contains(17))
    assert(byId(3L).contains(17))
    assert(byId(4L).contains(999))
  }

  test("broadcast as-of: unit-suffixed broadcast thresholds parse (10MB, 1g, 100k, -1)") {
    val l = graft.Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val r = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("rk"), col("ts").as("rts"), col("value").as("signup_value"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // "100k" (102400 bytes) is big enough for the tiny dim → broadcast
      // path; "-1" disables the guard entirely; all must parse, not throw
      for (t <- Seq("10MB", "1g", "100k", "-1")) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", t)
        val out = AsOfJoin.asOfJoinBroadcast(
          l, r, "user_id", "rk", "ts", "rts", Seq("signup_value"))
        assert(out.limit(1).collect().nonEmpty, s"threshold=$t")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
