package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles per group, decomposed into shuffle-
  * friendly relational pieces instead of Spark's `percentile` aggregate.
  *
  * The built-in exact `Percentile` is a TypedImperativeAggregate: every
  * map task builds an OpenHashMap of boxed values, the (few) reducers merge
  * all those maps and Timsort the boxed entries — with a handful of groups
  * the final stage is a few huge single-threaded boxed sorts, and the maps
  * traverse the JVM heap. This decomposition computes the SAME result in
  * ONE shuffle + ONE Tungsten sort of the data (UnsafeExternalSorter on
  * primitive rows — radix sort, spillable, no boxing):
  *   1. one window over (key ORDER BY v) assigns each row its 0-indexed
  *      rank and the next value (`row_number`, `lead`);
  *   2. a second window over the SAME partition key adds the group size —
  *      its required (key) ordering is a PREFIX of the first window's
  *      (key, v) sort, so it reuses the exchange AND the sort (the q44
  *      prefix-ordering rule: longer ordering plans first);
  *   3. a per-row lambda keeps the fractions whose floor rank
  *      `floor(p * (n - 1))` lands exactly on this row, interpolating
  *      `v[k] + frac * (v[k+1] - v[k])` — identical arithmetic to
  *      Percentile.getPercentile and DuckDB's quantile_cont.
  * An earlier shape computed step 3's targets with a separate
  * `groupBy(key).count` + broadcast join — a SECOND full-data shuffle and
  * two extra jobs for the same answer; folding the count into the window
  * halves the passes over the data.
  *
  * Nulls in `valCol` are excluded, like the builtin. Returns one row per
  * (group, fraction): `keyCols..., frac DOUBLE, value DOUBLE`.
  */
object ExactPercentile {

  def groupedPercentiles(df: DataFrame, keyCols: Seq[String], valCol: String,
      fractions: Seq[Double], buckets: Int = 64): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0 && f <= 1))
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val keys = keyCols.map(col)
    val v = col(valCol).cast("double")
    val nonNull = df.filter(v.isNotNull).select(keys :+ v.as("__v"): _*)

    // Pass 1 (map-side combined, tiny result): per-key value range for the
    // uniform value bucketing. The bucket only steers PARALLELISM — a
    // skewed distribution degrades to fewer effective buckets but never
    // changes the answer.
    val ranges = nonNull.groupBy(keys: _*)
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val rawB = when(col("__lo") === col("__hi"), lit(1L))
      .otherwise(width_bucket(col("__v"), col("__lo"), col("__hi"), lit(buckets)))
    // width_bucket returns buckets+1 for v == hi — clamp into the top one
    val withB = nonNull.join(broadcast(ranges), keyCols)
      .withColumn("__b", least(rawB, lit(buckets.toLong)))

    // Pass 2 (map-side combined to |keys|×|buckets| rows): per-bucket
    // count and minimum → each bucket's global rank offset, the group
    // total, and the NEXT non-empty bucket's first value (the lead for a
    // bucket's last row).
    val wKey = Window.partitionBy(keys: _*).orderBy(col("__b"))
    val stats = withB.groupBy(keys :+ col("__b"): _*)
      .agg(count(lit(1)).as("__bn"), min(col("__v")).as("__bmin"))
      .withColumn("__off", coalesce(sum(col("__bn"))
        .over(wKey.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__bn")).over(Window.partitionBy(keys: _*)))
      .withColumn("__bnext", lead(col("__bmin"), 1).over(wKey))
      .drop("__bmin")

    // Pass 3: the data-sized window runs per (key, BUCKET) — parallelism =
    // keys × buckets instead of keys, which is what makes a 3-group (or
    // 1-group: global percentile) call scale across cores and executors.
    // Global rank = bucket offset + local rank (buckets are value-ordered,
    // so ranks never interleave across buckets; equal values share one
    // bucket, so ties never straddle a boundary).
    val wB = Window.partitionBy(keys :+ col("__b"): _*).orderBy(col("__v"))
    // Rank k = floor(p * (n - 1)) lands on exactly one row per (group, p):
    // explode the (tiny, constant) fraction array and keep the rows whose
    // rank is hit — ×|fractions| narrow rows inside one whole-stage-codegen
    // span (an array-filter lambda here would be CodegenFallback per row,
    // measurably slower). frac == 0 short-circuits, so neither the (null)
    // local lead of the group's overall last row nor a boundary repair is
    // ever consulted on an exact-rank hit.
    val frac = col("__p") * (col("__n") - 1) - col("__pos")
    withB
      .withColumn("__lpos", row_number().over(wB).cast("long") - 1L)
      .withColumn("__lnext", lead(col("__v"), 1).over(wB))
      .join(broadcast(stats), keyCols :+ "__b")
      .withColumn("__pos", col("__off") + col("__lpos"))
      .withColumn("__p", explode(array(fractions.map(lit): _*)))
      .filter(floor(col("__p") * (col("__n") - 1)) === col("__pos"))
      .select(keys ++ Seq(
        col("__p").as("frac"),
        when(frac === 0.0, col("__v"))
          .otherwise(col("__v") +
            frac * (coalesce(col("__lnext"), col("__bnext")) - col("__v")))
          .as("value")): _*)
  }
}
