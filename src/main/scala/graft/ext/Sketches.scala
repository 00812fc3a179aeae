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

  // ------------------------------------------------------------ Count-Min

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable per-key
    * FREQUENCY estimates, the heavy-hitter complement to HLL's distinct
    * counts: `depth` hash rows × `width` counters; a point estimate is the
    * min over rows, always ≥ the true count and ≤ true + εN with
    * probability 1-δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. Merge is
    * elementwise add — EXACT (the same monoid law the HLL state relies
    * on), so per-day sketches roll up to any window losslessly.
    */
  final case class CountMin(depth: Int, width: Int, counters: Array[Long]) {
    require(counters.length == depth * width)

    def estimate(key: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counters(r * width + CountMin.slot(key, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }

    /** Total stream length N (every row adds 1 to each depth row). */
    def total: Long = counters.slice(0, width).sum

    def merge(o: CountMin): CountMin = {
      require(o.depth == depth && o.width == width, "incompatible shapes")
      val out = new Array[Long](counters.length)
      var i = 0
      while (i < counters.length) { out(i) = counters(i) + o.counters(i); i += 1 }
      CountMin(depth, width, out)
    }
  }

  object CountMin {
    private[ext] def slot(key: String, row: Int, width: Int): Int = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(key)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, row.toLong)
      (((h % width) + width) % width).toInt
    }
  }

  private class CmAgg(depth: Int, width: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        var r = 0
        while (r < depth) {
          b(r * width + CountMin.slot(key, r, width)) += 1
          r += 1
        }
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private class CmUnion(size: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        scala.collection.Seq[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](size)
    override def reduce(b: Array[Long], s: scala.collection.Seq[Long]): Array[Long] = {
      var i = 0
      while (i < size && s != null && s.length == size) { b(i) += s(i); i += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < size) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Count-Min aggregate column over a string key (per group): returns the
    * flattened depth × width counter array — map-side partial aggregation
    * applies, only sketches shuffle.
    */
  def cmSketch(key: Column, depth: Int = 4, width: Int = 1024): Column = {
    val agg = org.apache.spark.sql.functions.udaf(
      new CmAgg(depth, width),
      org.apache.spark.sql.Encoders.STRING)
    agg(key)
  }

  /** Union of stored Count-Min states (elementwise add — exact). */
  def cmUnion(sketch: Column, depth: Int = 4, width: Int = 1024): Column = {
    val agg = org.apache.spark.sql.functions.udaf(
      new CmUnion(depth * width),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[scala.collection.Seq[Long]]())
    agg(sketch)
  }

  /** Lift a collected sketch row into the queryable driver-side form. */
  def cm(depth: Int, width: Int, counters: scala.collection.Seq[Long]): CountMin =
    CountMin(depth, width, counters.toArray)
}
