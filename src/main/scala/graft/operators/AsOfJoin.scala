package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the right row with the greatest
  * `rightTs <= leftTs` within the same key — the standard time-series
  * enrichment operator Spark lacks.
  *
  * Implementation choice (SURVEY §7.3 preference order): COMPOSED from
  * built-ins, not a custom SparkPlan — union both sides tagged, one shuffle
  * on the key, one window sort by (ts, side), and `last(_, ignoreNulls)`
  * carries the most recent right payload forward into left rows. That is
  * already the optimal distributed shape (a custom physical operator would
  * run the same partition-sort-scan), keeps AQE/codegen, and inherits skew
  * handling. Right side must be unique per (key, ts) — pre-aggregate if not
  * (ties would make the matched row nondeterministic in ANY engine).
  *
  * Equal timestamps match (`<=`): right rows sort before left rows at the
  * same ts.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (must exist in `right`) */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!rightPayload.exists(leftCols.contains),
      s"right payload columns ${rightPayload.intersect(leftCols)} collide with left columns")

    // The whole right payload travels as ONE struct so a single
    // last(ignoreNulls=true) carries it atomically: a genuine NULL inside the
    // most recent right row stays NULL in the output instead of being
    // back-filled column-by-column from an older right row. The struct value
    // itself is non-null for every right row (even if all its fields are
    // null), and null for every left row, so ignoreNulls skips exactly the
    // left rows.
    val payloadType = StructType(rightPayload.map(c => right.schema(c)))

    val l = left
      .withColumn("__key", col(s"`$leftKey`"))
      .withColumn("__ts", col(s"`$leftTs`").cast("timestamp"))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))

    val r = right
      .select(
        col(s"`$rightKey`").as("__key"),
        col(s"`$rightTs`").cast("timestamp").as("__ts"),
        struct(rightPayload.map(c => col(s"`$c`")): _*).as("__payload"))
      .withColumn("__side", lit(0))
    val rPadded = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unionCols = "__key" +: "__ts" +: "__side" +: "__payload" +: leftCols
    val all = l.select(unionCols.map(c => col(s"`$c`")): _*)
      .unionByName(rPadded.select(unionCols.map(c => col(s"`$c`")): _*))

    // Right rows (side 0) sort before left rows (side 1) at equal ts, so
    // `<=` matches; last(ignoreNulls) carries the latest right payload.
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = all.withColumn("__payload",
      last(col("__payload"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"`$c`")) ++
        rightPayload.map(c => col("__payload").getField(c).as(c)): _*)
  }

  /** Forward as-of: for each left row, the right row with the SMALLEST
    * `rightTs >= leftTs` within the key ("next event at or after") — the
    * mirror of [[asOfJoin]], which DuckDB's native ASOF cannot express.
    * Same shape: tagged union, one shuffle, one window sort; the carry runs
    * over the FOLLOWING frame with `first(_, ignoreNulls)`, and left rows
    * (side 0) sort before right rows (side 1) at equal ts so `>=` matches.
    * Right must be unique per (key, ts), as in the backward join.
    */
  def asOfJoinForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!rightPayload.exists(leftCols.contains),
      s"right payload columns ${rightPayload.intersect(leftCols)} collide with left columns")

    val payloadType = StructType(rightPayload.map(c => right.schema(c)))

    val l = left
      .withColumn("__key", col(s"`$leftKey`"))
      .withColumn("__ts", col(s"`$leftTs`").cast("timestamp"))
      .withColumn("__side", lit(0))
      .withColumn("__payload", lit(null).cast(payloadType))

    val r = right
      .select(
        col(s"`$rightKey`").as("__key"),
        col(s"`$rightTs`").cast("timestamp").as("__ts"),
        struct(rightPayload.map(c => col(s"`$c`")): _*).as("__payload"))
      .withColumn("__side", lit(1))
    val rPadded = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unionCols = "__key" +: "__ts" +: "__side" +: "__payload" +: leftCols
    val all = l.select(unionCols.map(c => col(s"`$c`")): _*)
      .unionByName(rPadded.select(unionCols.map(c => col(s"`$c`")): _*))

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = all.withColumn("__payload",
      first(col("__payload"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 0)
      .select(leftCols.map(c => col(s"`$c`")) ++
        rightPayload.map(c => col("__payload").getField(c).as(c)): _*)
  }

  /** NEAREST-in-time as-of join: for each left row, the right row with the
    * smallest |rightTs − leftTs| within the key; backward wins exact-distance
    * ties (the conventional choice). Composing [[asOfJoin]] +
    * [[asOfJoinForward]] + an equi join on the left id gives the same rows
    * but scans every input TWICE and shuffles three times; here ONE tagged
    * union shuffles once, and both carries — `last` over the preceding frame
    * and `first` over the following frame — share a single window sort
    * (same partitioning and ordering → one WindowExec, two frame
    * processors, the q54 shape).
    *
    * Sort order is (ts, side) with right = 0: an equal-ts right row sorts
    * BEFORE the left row, so the backward carry sees it at gap 0 — which
    * beats any forward candidate under the tie rule, so the forward frame
    * legitimately only matches strictly-later right rows.
    *
    * PRECONDITION (same as the object-level contract, restated because this
    * variant is called directly): the right side must be UNIQUE per
    * (rightKey, rightTs). Two right rows at the same (key, ts) make the
    * window order (__ts, __side) non-total there, and the carried payload
    * picks whichever the sort surfaces — nondeterministic. Pre-aggregate
    * the right side (q101 reduces purchases to one row per key/ts first).
    */
  def asOfJoinNearest(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!rightPayload.exists(leftCols.contains),
      s"right payload columns ${rightPayload.intersect(leftCols)} collide with left columns")

    // carry (__t, __p) together so the gap computes from the matched row
    val carryType = StructType(Seq(
      org.apache.spark.sql.types.StructField("__t",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("__p",
        StructType(rightPayload.map(c => right.schema(c))))))

    val l = left
      .withColumn("__key", col(s"`$leftKey`"))
      .withColumn("__ts", col(s"`$leftTs`").cast("timestamp"))
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(carryType))

    val r = right
      .select(
        col(s"`$rightKey`").as("__key"),
        col(s"`$rightTs`").cast("timestamp").as("__ts"),
        struct(
          col(s"`$rightTs`").cast("timestamp").as("__t"),
          struct(rightPayload.map(c => col(s"`$c`")): _*).as("__p")).as("__carry"))
      .withColumn("__side", lit(0))
    val rPadded = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unionCols = "__key" +: "__ts" +: "__side" +: "__carry" +: leftCols
    val all = l.select(unionCols.map(c => col(s"`$c`")): _*)
      .unionByName(rPadded.select(unionCols.map(c => col(s"`$c`")): _*))

    val order = Window.partitionBy(col("__key")).orderBy(col("__ts"), col("__side"))
    val carried = all
      .withColumn("__b", last(col("__carry"), ignoreNulls = true)
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__f", first(col("__carry"), ignoreNulls = true)
        .over(order.rowsBetween(Window.currentRow, Window.unboundedFollowing)))

    val bGap = unix_micros(col("__ts")) - unix_micros(col("__b").getField("__t"))
    val fGap = unix_micros(col("__f").getField("__t")) - unix_micros(col("__ts"))
    val backWins = col("__f").isNull || (col("__b").isNotNull && bGap <= fGap)
    val winner = when(backWins, col("__b")).otherwise(col("__f"))

    carried.filter(col("__side") === 1)
      .withColumn("__m", winner)
      .select(leftCols.map(c => col(s"`$c`")) ++
        rightPayload.map(c => col("__m").getField("__p").getField(c).as(c)) :+
        col("__m").getField("__t").as("__matched_ts"): _*)
  }

  /** Broadcast as-of join — the "rates table" case: when the right side is
    * dimension-sized (currency rates, config versions, model checkpoints),
    * the fact side should not shuffle AT ALL. The right side packs into one
    * sorted array per key (tiny aggregate), broadcasts, and each left row
    * picks its match with codegen'd array functions (filter + element_at) —
    * zero exchanges of the 100 TB side, same `<=` semantics as [[asOfJoin]].
    * Per-left-row cost is O(right rows per key): use the shuffled
    * [[asOfJoin]] when the right side is large or deep per key.
    *
    * SIZE-GUARDED: the packed right side is counted and estimated against
    * `spark.sql.autoBroadcastJoinThreshold`; when it would not fit, the
    * call falls back to the shuffled [[asOfJoin]] instead of OOMing the
    * driver — a caller who guessed "rates table" about a fact table gets
    * the correct plan, not a crash.
    */
  def asOfJoinBroadcast(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!rightPayload.exists(leftCols.contains),
      s"right payload columns ${rightPayload.intersect(leftCols)} collide with left columns")

    // guard: estimated packed bytes = right rows × per-row default size of
    // what actually broadcasts (ts + payload struct). Plan statistics
    // decide for free when they are conclusive (a parquet-backed dim's
    // size estimate is bytes-accurate); only an inconclusive estimate —
    // stats above threshold can be a selectivity overestimate — pays one
    // count job of the DIMENSION side. The fact side is untouched.
    // conf.get returns the value as the user set it — possibly unit-suffixed
    // ("10MB", "1g") — so parse with Spark's own byte-string parser;
    // byteStringAsBytes rejects a leading '-', so the disable sentinel
    // ("-1") strips its sign first (same split Spark's bytesConf applies).
    val threshold = right.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760") match {
        case s if s.startsWith("-") =>
          -org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s.substring(1))
        case s => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
      }
    if (threshold > 0) {
      val statBytes = right.queryExecution.optimizedPlan.stats.sizeInBytes
      if (statBytes > BigInt(threshold)) {
        val perRow = (org.apache.spark.sql.types.TimestampType.defaultSize +
          rightPayload.map(c => right.schema(c).dataType.defaultSize).sum).toLong
        val estBytes = right.count() * perRow
        if (estBytes > threshold)
          return asOfJoin(left, right, leftKey, rightKey, leftTs, rightTs, rightPayload)
      }
    }

    // sort_array orders lexicographically by (__t, __p); right must be
    // unique per (key, ts) — the same contract as asOfJoin
    val packed = right.groupBy(col(s"`$rightKey`").as("__rk"))
      .agg(sort_array(collect_list(struct(
        col(s"`$rightTs`").cast("timestamp").as("__t"),
        struct(rightPayload.map(c => col(s"`$c`")): _*).as("__p")))).as("__arr"))

    val lts = col(s"`$leftTs`").cast("timestamp")
    // The packed array is sorted by (__t, __p), so the match is a BINARY
    // SEARCH (graft_asof_pick): O(log m) per fact row, no filtered-copy
    // allocation — the composed filter+element_at form walked all m
    // entries per row (advisor-flagged on deep rate keys).
    val matched = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.AsOfPick(
        org.apache.spark.sql.GraftSqlShims.expression(col("__arr")),
        org.apache.spark.sql.GraftSqlShims.expression(lts)))

    left.join(broadcast(packed), col(s"`$leftKey`") === col("__rk"), "left_outer")
      .withColumn("__m", matched)
      .select(leftCols.map(c => col(s"`$c`")) ++
        rightPayload.map(c => col("__m").getField("__p").getField(c).as(c)): _*)
  }
}
