package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row's
  * split follows from a HASH of its key, not from `rand()` — so the
  * assignment is reproducible across runs, engines, cluster sizes, and
  * re-partitioning, rows with the same key always land in the same split
  * (no train/test leakage between duplicates), and incremental data never
  * reshuffles old rows. Pure per-row codegen'd expressions: no shuffle, no
  * state, scales embarrassingly.
  *
  * Two hash families, same contract (0 <= bucket < granularity):
  *   - [[hashBucketMd5]]: first 8 hex chars of md5 — bit-identical in any
  *     engine with md5 (the DuckDB oracle mirrors it exactly; q57).
  *   - [[hashBucket]]: xxhash64 — the fast path for production Spark
  *     (one 64-bit mix vs a cryptographic digest per row).
  */
object Splits {

  /** Engine-portable bucket in [0, granularity): md5 hex prefix as int. */
  def hashBucketMd5(key: Column, granularity: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(granularity.toLong))

  /** Fast bucket in [0, granularity): xxhash64 (Spark-native, codegen'd). */
  def hashBucket(key: Column, granularity: Int = 100): Column =
    pmod(xxhash64(key.cast("string")), lit(granularity.toLong))

  /** Efraimidis–Spirakis weighted-sampling key (md5 family): rows ordered
    * by this key DESCENDING are a weighted sample without replacement —
    * taking the top k selects each row with probability proportional to
    * `weight`, deterministically (same hash → same sample on any engine,
    * any partitioning). key = ln(u)/w with u = (h+1)/2^32 ∈ (0,1] from the
    * row key's md5 prefix; maximizing ln(u)/w is maximizing u^(1/w).
    */
  def weightedSampleKeyMd5(key: Column, weight: Column): Column =
    log((conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") + 1.0)
      / 4294967296.0) / weight

  /** TEMPERATURE-weighted mixture quotas — the GPT-3/PaLM/LLaMA source-
    * sampling rule `p_s ∝ n_s^τ` at τ = 1/2, which upweights small sources
    * relative to proportional sampling: per source, weight
    * `w_micro = round(sqrt(n_s)·10⁶)` in exact integer micro-units and
    * `quota_s = (budget · w_s) div Σw` in pure BIGINT arithmetic. τ is
    * FIXED at 1/2 deliberately: `sqrt` is the one power IEEE 754 requires
    * exactly rounded, so the weight is bit-identical on any engine —
    * `pow(n, τ)` for a general τ is not, and a last-ulp divergence lands
    * exactly on the rounding boundary (the q69/q73 money lesson applied
    * to exponents); sqrt(integer) is an integer or irrational, so
    * `·10⁶` can never produce an exact .5 either. A source's quota may
    * exceed its population when the budget outruns the corpus — the
    * sampler then keeps the whole source, still deterministic. One count
    * aggregate + a single-row broadcast of Σw; output one row per source:
    * `(source, n_docs, w_micro, quota)`.
    */
  def temperatureQuotas(df: DataFrame, srcCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    temperatureQuotasFromCounts(
      df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_docs")), srcCol, budget)
  }

  /** [[temperatureQuotas]] from a precomputed `(srcCol, n_docs)` table —
    * the arithmetic core, separated so the 100 TB regime (per-source
    * populations of 10^10+, where a naive BIGINT `budget·w` wraps) is
    * directly testable without materializing the rows.
    */
  def temperatureQuotasFromCounts(counts0: DataFrame, srcCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = counts0
      .withColumn("w_micro", round(sqrt(col("n_docs")) * 1e6, 0).cast("long"))
    val tot = counts.agg(sum(col("w_micro")).as("__wtot"))
    // budget·w_micro in DECIMAL(38,0): two longs multiply to < 8.5e37, so
    // the decimal product is EXACT where a BIGINT product overflows at
    // precisely the advertised scale (n_s = 1e10 → w = 1e11 wraps a Long
    // at budget 1e9); `div` on decimals returns the exact integral part
    // as BIGINT, so the quota value (≤ budget) is unchanged wherever the
    // old arithmetic didn't wrap
    counts.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_docs"), col("w_micro"),
        expr(s"(CAST($budget AS DECIMAL(20,0)) * w_micro) div __wtot")
          .as("quota"))
  }

  /** Per-source sampling quotas for a target mixture: integer weights
    * (`weightOf` applied to the source column — a literal map, a join, or a
    * derived expression) define the desired ratio `w_s : w_t : ...` between
    * sources; the returned quota is the LARGEST exact-ratio allocation that
    * no source can overdraw. All-integer arithmetic — `unit = min_s(n_s div
    * w_s)`, `quota_s = unit * w_s` — so the result is engine-portable with
    * no rounding-boundary hazard (the q69/q73 lesson). One count aggregate
    * + a single-row broadcast of the unit; output one row per source:
    * `(source, n_docs, quota)`.
    */
  def mixtureQuotas(df: DataFrame, srcCol: String,
      weightOf: Column => Column): DataFrame = {
    val counts = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__wgt", weightOf(col(srcCol)).cast("long"))
      // a non-positive or null weight is a caller bug — surface it as a
      // plan-time-cheap runtime assert instead of a null-poisoned quota
      .withColumn("__wgt", when(col("__wgt") > 0, col("__wgt"))
        .otherwise(raise_error(concat(lit("mixture weight must be positive for source "),
          col(srcCol).cast("string")))))
    val unit = counts.agg(min(expr("n_docs div __wgt")).as("__unit"))
    counts.crossJoin(broadcast(unit))
      .select(col(srcCol), col("n_docs"), (col("__wgt") * col("__unit")).as("quota"))
  }

  /** Deterministic mixture sampling: keep, per source, the `quota_s` rows
    * with the smallest md5 of their id — the same engine-portable hash
    * order as [[hashBucketMd5]], so the selected SET is identical on any
    * engine/partitioning and re-runs are stable. The quota side is
    * per-source (tiny) and broadcast; the rank is one shuffle on the
    * source key. Returns the surviving rows with the original schema.
    */
  def mixtureSample(df: DataFrame, idCol: String, srcCol: String,
      weightOf: Column => Column,
      precomputedQuotas: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a caller that already materialized mixtureQuotas passes it back in —
    // otherwise the quota subplan re-derives (and re-scans) per use
    val quotas = precomputedQuotas.getOrElse(mixtureQuotas(df, srcCol, weightOf))
      .withColumnRenamed(srcCol, "__msrc").select("__msrc", "quota")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")))
    df.withColumn("__rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), col(srcCol) === col("__msrc"))
      .filter(col("__rk") <= col("quota"))
      .drop("__rk", "__msrc", "quota")
  }

  /** Assign named splits by cumulative weight over the hash bucket, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)` (weights sum to
    * `granularity`). Deterministic, leakage-free by key.
    */
  def assignSplit(bucket: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    val cuts = weights.scanLeft(0)(_ + _._2).tail
    weights.zip(cuts).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), other) => when(bucket < cut, name).otherwise(other)
    }
  }
}
