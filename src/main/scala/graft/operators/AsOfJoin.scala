package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

    val l = left
      .withColumn("__key", col(s"`$leftKey`"))
      .withColumn("__ts", col(s"`$leftTs`").cast("timestamp"))
      .withColumn("__side", lit(1))
    val lPadded = rightPayload.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val r = right
      .select((col(s"`$rightKey`").as("__key") +:
        col(s"`$rightTs`").cast("timestamp").as("__ts") +:
        rightPayload.map(c => col(s"`$c`"))): _*)
      .withColumn("__side", lit(0))
    val rPadded = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val all = lPadded.select(("__key" +: "__ts" +: "__side" +: (leftCols ++ rightPayload))
        .map(c => col(s"`$c`")): _*)
      .unionByName(rPadded.select(("__key" +: "__ts" +: "__side" +: (leftCols ++ rightPayload))
        .map(c => col(s"`$c`")): _*))

    // Right rows (side 0) sort before left rows (side 1) at equal ts, so
    // `<=` matches; last(ignoreNulls) carries the latest right payload.
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(all)((d, c) =>
      d.withColumn(c, last(col(s"`$c`"), ignoreNulls = true).over(w)))

    carried.filter(col("__side") === 1)
      .select((leftCols ++ rightPayload).map(c => col(s"`$c`")): _*)
  }
}
