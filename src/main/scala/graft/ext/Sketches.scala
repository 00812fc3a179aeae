package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch columns (Apache DataSketches HLL, shipped with Spark) —
  * the incremental-analytics complement to [[Incremental]]'s exact monoid
  * state: a daily job stores one binary sketch per (day, dimension) row,
  * and ANY rollup (week, month, all-time, any dimension subset) is a
  * sketch union over the stored state — never a rescan of history. The
  * union is exact over sketches: merging per-day sketches yields the SAME
  * estimate as sketching the whole corpus at once, which is what makes
  * the state composable.
  */
object Sketches {

  /** Binary HLL sketch of `c` (per group). `lgK` trades size for accuracy:
    * 12 → 2^12 buckets ≈ 1.6% RSE in ~2 KB.
    */
  def hllSketch(c: Column, lgK: Int = 12): Column =
    call_function("hll_sketch_agg", c, lit(lgK))

  /** Union of stored sketches (per group). */
  def hllUnion(sketch: Column): Column =
    call_function("hll_union_agg", sketch)

  /** Distinct-count estimate from a sketch. */
  def hllEstimate(sketch: Column): Column =
    call_function("hll_sketch_estimate", sketch)

  /** Per-key daily sketch state: one row per (day, key) with the binary
    * sketch — the storable increment.
    */
  def dailyState(df: DataFrame, tsCol: String, keyCols: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy((to_date(col(tsCol)).as("day") +: keyCols.map(col)): _*)
      .agg(hllSketch(col(valueCol), lgK).as("sketch"))
}
