package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a running per-key aggregate
  * table current by merging ONLY the new data's partial aggregates into it,
  * never recomputing history. The state carries the algebraic pieces
  * (count, sum, min, max — all commutative monoids), so
  *
  *   merge(state, agg(delta)) == agg(history ∪ delta)
  *
  * holds exactly, and derived values (avg = sum/count) are computed at read
  * time. At 100 TB this is the difference between touching one day
  * (|delta| + the touched keys' state rows, one shuffle each) and
  * re-shuffling the full history every refresh; with the state stored
  * date-partitioned or bucketed by key, the merge join co-locates and the
  * rewrite touches only changed partitions.
  */
object Incremental {

  /** Column layout of the running state for `valueCol` grouped by
    * `keyCols`: n, sum, mn, mx.
    */
  def partialAgg(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        // sum in double from the start: merge() coalesces with 0.0, and an
        // integer-typed value column would otherwise flip the state schema
        // long→double between version v0 and v1
        sum(col(valueCol).cast("double")).as("sum"),
        min(col(valueCol).cast("double")).as("mn"),
        max(col(valueCol).cast("double")).as("mx"))

  /** Merge a new delta's partial aggregates into the existing state. Both
    * sides are already one row per key, so this is a single full-outer
    * sort-merge join on the key followed by monoid combines — no history
    * scan, no broadcast of anything unbounded.
    */
  def merge(state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val d = delta.select(
      keyCols.map(col) ++ Seq(col("n").as("d_n"), col("sum").as("d_sum"),
        col("mn").as("d_mn"), col("mx").as("d_mx")): _*)
    state.join(d, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++ Seq(
          (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
          (coalesce(col("sum"), lit(0.0)) + coalesce(col("d_sum"), lit(0.0))).as("sum"),
          least(col("mn"), col("d_mn")).as("mn"),
          greatest(col("mx"), col("d_mx")).as("mx")): _*)
  }

  /** Read view with the derived (non-mergeable-looking) values. */
  def readView(state: DataFrame): DataFrame =
    state.withColumn("avg", col("sum") / col("n"))

  /** CHANGE-FEED-driven maintenance: apply one
    * [[graft.io.DeltaRead.changeFeed]] batch (rows carrying
    * `_change_type`) to the running state. Count and sum form a GROUP —
    * inserts and update_postimages add, deletes and update_preimages
    * subtract — so those stay EXACT under arbitrary DML, which plain
    * [[merge]] (append-only monoids) cannot do. Min/max are not
    * invertible: they widen with added rows but cannot shrink when an
    * extremum is deleted/updated away, so after such a batch they are
    * upper/lower BOUNDS — callers needing tight extremes recompute the
    * touched keys. Cost shape is the same as [[merge]]: one aggregate
    * over the batch + one outer join on |touched keys| rows, never a
    * history scan.
    */
  def applyChanges(state: DataFrame, changes: DataFrame,
      keyCols: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(lit(-1L))
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(v.isNotNull, sign).otherwise(lit(0L))).as("d_n"),
        sum(coalesce(v, lit(0.0)) * sign).as("d_sum"),
        min(when(sign > 0, v)).as("d_mn"),
        max(when(sign > 0, v)).as("d_mx"))
    state.join(delta, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++ Seq(
          (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
          (coalesce(col("sum"), lit(0.0)) + coalesce(col("d_sum"), lit(0.0))).as("sum"),
          least(col("mn"), col("d_mn")).as("mn"),
          greatest(col("mx"), col("d_mx")).as("mx")): _*)
      // keys whose rows were all deleted drop out of the state entirely
      .filter(col("n") > 0)
  }
}
