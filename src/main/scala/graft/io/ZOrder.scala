package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: lay a table out so that file-level
  * min/max statistics prune on TWO columns at once. Range-clustering by one
  * column (`Compaction.compact(clusterBy = x)`) gives perfect skipping on x
  * and none on y; interleaving the bits of both dimensions' ranks gives
  * ~sqrt(1/nFiles) extent on EACH — the standard lakehouse layout for
  * two-dimensional predicates (date × tenant, key × time, lat × lon).
  *
  * Spark-first: the z-value is a pure column expression (normalize each
  * dimension to a 16-bit rank against its observed min/max, then interleave
  * with shift/or folds — whole-stage codegen, no UDF), and the write is one
  * `repartitionByRange(zvalue)` job. The min/max normalization bounds come
  * from one tiny aggregate (at 100 TB: from table statistics instead).
  */
object ZOrder {

  /** Interleave the low 16 bits of two non-negative int columns:
    * x occupies even bit positions, y odd. Pure bit arithmetic — inlines
    * into codegen as a chain of shifts and ors.
    */
  def interleaveBits(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1)).cast("long"), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1)).cast("long"), 2 * i + 1))
    }

  /** Normalize a numeric column to [0, 65535] against closed bounds. */
  private def rank16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, Double.MinPositiveValue)
    least(greatest(((c.cast("double") - lit(lo)) / lit(span) * 65535.0), lit(0.0)),
      lit(65535.0)).cast("int")
  }

  /** Quantile-binned z-order: [[write]]'s rank16 is LINEAR in value space,
    * so a skewed dimension (a log-normal `value`, a power-law count)
    * collapses into one quadrant and its half of the interleave prunes
    * nothing. Here each dimension is ranked against its own approximate
    * quantiles (`bins` equi-depth buckets from one approxQuantile pass —
    * the mergeable sketch, bounded memory at any scale), so every bucket
    * holds ~1/bins of the rows regardless of distribution and both halves
    * of the z-value discriminate. The bin lookup compiles to a chain of
    * `when` comparisons over literal boundaries — codegen, no UDF.
    */
  /** Equi-depth bucket id of `c` against precomputed quantile `bounds`.
    * Deliberately a SHALLOW expression (one literal array + a filter
    * lambda) rather than a `when` chain: 255 nested whens substituted
    * into each of [[interleaveBits]]'s 32 bit references overflow the
    * analyzer's stack. The HOF is CodegenFallback, which is fine here —
    * this feeds one-off REWRITE jobs (z-order compaction), never a hot
    * per-query path; materialize it into its own column before
    * interleaving so it evaluates once per row (CollapseProject keeps
    * non-cheap multi-referenced aliases in their own project).
    */
  private[io] def binOf(c: Column, bounds: Array[Double]): Column =
    size(filter(typedlit(bounds.distinct.toSeq), b => c.cast("double") > b))

  /** One approxQuantile pass over `df` → the per-dimension equi-depth
    * bounds for [[zValueRanked]].
    */
  private[io] def rankBounds(df: DataFrame, colX: String, colY: String,
      bins: Int): (Array[Double], Array[Double]) = {
    require(bins > 1 && bins <= 65536, s"bins must be in (1, 65536], got $bins")
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    val both = df.select(col(colX).cast("double").as("x"), col(colY).cast("double").as("y"))
    val Array(bx, by) = both.stat.approxQuantile(Array("x", "y"), probs, 0.001)
    (bx, by)
  }

  def writeRanked(spark: SparkSession, df: DataFrame, dir: String,
      colX: String, colY: String, nFiles: Int, bins: Int = 256): Unit = {
    val (bx, by) = rankBounds(df, colX, colY, bins)
    df.withColumn("__bx", binOf(col(colX), bx))
      .withColumn("__by", binOf(col(colY), by))
      .withColumn("__z", interleaveBits(col("__bx"), col("__by")))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__bx", "__by", "__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Rewrite `df` into `nFiles` parquet files at `dir`, z-ordered on
    * (colX, colY). One bounds aggregate + one range-partitioned write.
    */
  def write(spark: SparkSession, df: DataFrame, dir: String,
      colX: String, colY: String, nFiles: Int): Unit = {
    val b = df.agg(
      min(col(colX).cast("double")), max(col(colX).cast("double")),
      min(col(colY).cast("double")), max(col(colY).cast("double"))).head()
    require(!b.anyNull,
      s"z-order bounds undefined: $colX/$colY is empty or all-null")
    val (xLo, xHi, yLo, yHi) = (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    df.withColumn("__z",
        interleaveBits(rank16(col(colX), xLo, xHi), rank16(col(colY), yLo, yHi)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
