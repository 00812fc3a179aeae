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
    interleaveBitsN(Seq(x, y), bitsPer = 16)

  /** k-dimensional Morton interleave: bit `i` of column `j` lands at
    * position `i·k + j` (the 2-column form is the k = 2 instance — x even,
    * y odd). `k · bitsPer` must stay within a Long's 63 value bits, so at
    * the default 256 equi-depth bins (8 meaningful bits) up to 7 columns
    * interleave; real tables cluster on 3–4. Pure shift/or folds —
    * whole-stage codegen, no UDF.
    */
  def interleaveBitsN(cols: Seq[Column], bitsPer: Int): Column = {
    val k = cols.size
    require(k >= 2, s"z-order needs at least 2 columns, got $k")
    require(bitsPer >= 1 && k * bitsPer <= 63,
      s"$k columns × $bitsPer bits = ${k * bitsPer} exceeds a Long's 63 " +
        "value bits — lower bins (fewer bits per dimension) or columns")
    (0 until bitsPer).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c, i).bitwiseAND(lit(1)).cast("long"), i * k + j))
      }
    }
  }

  /** Bits needed to address `bins` equi-depth buckets (ids 0..bins-1). */
  private[io] def bitsFor(bins: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(bins - 1))

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

  /** [[binOf]] as a BALANCED `when`-tree binary search: identical result
    * (count of distinct bounds strictly below `c`; nulls land in bin 0
    * like the HOF's null-falsy filter), but depth log2(bins) instead of a
    * per-row O(bins) interpreted lambda — whole-stage codegen'd CASE
    * nesting, 8 comparisons per row at 256 bins where the HOF paid 255
    * (measured: the b70 3-column layout build over ~30M rows spent ~190s
    * in the HOF form). Nesting depth is log2, so the analyzer-stack limit
    * that rules out a LINEAR when-chain (the binOf scaladoc) never
    * applies. Equivalence is spec-pinned against binOf.
    */
  private[io] def binTree(c: Column, bounds: Array[Double]): Column = {
    val bs = bounds.distinct
    val cd = c.cast("double")
    def go(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(cd > bs(mid), go(mid + 1, hi)).otherwise(go(lo, mid))
      }
    go(0, bs.length)
  }

  /** [[binOf]] STRETCHED across the full bit lane. A low-cardinality
    * dimension collapses its quantile bounds (63 probes over 15 distinct
    * values leave ~15 distinct bounds → bin ids 0..14), so its HIGH bits
    * never vary and the z-curve never splits on it — every file then
    * spans the dimension's full range (caught by the 3-col extent spec:
    * user_id at small SF). Rescaling bin ids to [0, bins) puts the
    * variation back in the top bits; a full-cardinality dimension has
    * `nb = bins` and the factor is exactly 1 — bit-identical to the
    * unscaled form, so existing 2-col layouts are unchanged.
    */
  private[io] def binScaled(c: Column, bounds: Array[Double], bins: Int): Column = {
    val nb = bounds.distinct.length + 1 // possible bin ids: 0..nb-1
    if (nb <= 1) lit(0)
    else if (nb >= bins) binTree(c, bounds)
    else round(binTree(c, bounds) * lit((bins - 1).toDouble / (nb - 1))).cast("int")
  }

  /** One approxQuantile pass over `df` → the per-dimension equi-depth
    * bounds for [[zValueRanked]].
    */
  private[io] def rankBounds(df: DataFrame, colX: String, colY: String,
      bins: Int): (Array[Double], Array[Double]) = {
    val Seq(bx, by) = rankBoundsN(df, Seq(colX, colY), bins)
    (bx, by)
  }

  /** k-dimensional [[rankBounds]] — still ONE approxQuantile pass (the
    * sketch merges per column in the same job), bounds in `cols` order.
    */
  private[io] def rankBoundsN(df: DataFrame, cols: Seq[String],
      bins: Int): Seq[Array[Double]] = {
    require(bins > 1 && bins <= 65536, s"bins must be in (1, 65536], got $bins")
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    val named = cols.zipWithIndex.map { case (c, i) => s"__q$i" }
    val cast = df.select(cols.zip(named).map { case (c, n) =>
      col(c).cast("double").as(n) }: _*)
    cast.stat.approxQuantile(named.toArray, probs, 0.001).toSeq
  }

  def writeRanked(spark: SparkSession, df: DataFrame, dir: String,
      colX: String, colY: String, nFiles: Int, bins: Int = 256): Unit =
    writeRankedN(spark, df, dir, Seq(colX, colY), nFiles, bins)

  /** Quantile-binned z-order write on k columns — [[writeRanked]]
    * generalized: one quantile pass, one range-partitioned write, every
    * output file a tight k-cube of rank space.
    */
  def writeRankedN(spark: SparkSession, df: DataFrame, dir: String,
      zCols: Seq[String], nFiles: Int, bins: Int = 256): Unit = {
    val bounds = rankBoundsN(df, zCols, bins)
    val binCols = zCols.indices.map(i => s"__b$i")
    val withBins = zCols.zip(bounds).zip(binCols).foldLeft(df) {
      case (cur, ((c, b), name)) => cur.withColumn(name, binScaled(col(c), b, bins))
    }
    withBins
      .withColumn("__z",
        interleaveBitsN(binCols.map(col), bitsFor(bins)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop(binCols :+ "__z": _*)
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
