package graft.core.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructType}

/** Table utility surface — parity with labelspark/connector.py plus the
  * null/JSON normalization helpers from labelspark/client.py:64-69 and
  * labelspark/is_json.py, all as lazy column expressions (no driver
  * collection unless the caller explicitly asks for it).
  */
object TableOps {

  /** connector.py:20-28 `get_col_names` — schema-only, zero jobs. */
  def colNames(df: DataFrame): Seq[String] = df.columns.toSeq

  /** connector.py:30-39 `get_unique_values` — returned as a DataFrame; the
    * reference collects to a stringified list, which only the caller should
    * decide to do (and bound).
    */
  def uniqueValues(df: DataFrame, c: String): DataFrame = df.select(c).distinct()

  /** Bounded driver-side materialization of [[uniqueValues]] for the
    * low-cardinality contract call sites (enum options, project ids).
    */
  def uniqueValueStrings(df: DataFrame, c: String, max: Int = 10000): Seq[String] =
    uniqueValues(df, c).limit(max).collect().map(r => Option(r.get(0)).map(_.toString).orNull).toSeq

  /** connector.py:41-52 `add_col`. */
  def addColumn(df: DataFrame, c: String, default: Any): DataFrame =
    df.withColumn(c, lit(default))

  /** connector.py:54-62 `get_table_length`. */
  def tableLength(df: DataFrame): Long = df.count()

  /** connector.py:64-74 `rename_col`. */
  def renameCol(df: DataFrame, from: String, to: String): DataFrame =
    df.withColumnRenamed(from, to)

  /** client.py:68-69 / 137-138: None → "" on string columns. */
  def normalizeNulls(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) coalesce(col(s"`${f.name}`"), lit("")).alias(f.name)
      else col(s"`${f.name}`")
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** client.py:64-67 / 133-136: nested (composite-typed) cells are serialized
    * to JSON strings for the all-string presentation table.
    */
  def jsonifyNested(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          to_json(col(s"`${f.name}`")).alias(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** labelspark/is_json.py:2-7 as an expression: a cell is JSON iff the
    * whole-document path extracts.
    */
  def isJson(c: Column): Column = get_json_object(c, "$").isNotNull

  /** uploader.py:76-81 uniqueness check, single pass: rows, distinct keys,
    * duplicates — one aggregation instead of the reference's two jobs.
    */
  def uniquenessReport(df: DataFrame, key: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(key)).as("n_keys"),
      (count(lit(1)) - countDistinct(col(key))).as("n_dup"))

  /** Zero-extra-job uniqueness counters: attach an `observe` to the frame so
    * row count and approx distinct keys are collected DURING whatever action
    * the caller runs next — replacing the reference's two extra full scans
    * (uploader.py:76-81) with none. Read the metrics from the returned
    * observation after the action completes.
    */
  def observedUniqueness(df: DataFrame, key: String,
      name: String = "uniqueness"): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col(s"`$key`")).as("n_keys_approx"))
    (observed, obs)
  }

  /** uploader.py:99-104 last-write-wins dedupe, made deterministic: keep the
    * row ranked first by `order` within each `key` group (the reference's
    * dict-overwrite order is whatever Spark returned; we require an explicit
    * total order).
    */
  def dedupeLastWins(df: DataFrame, key: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Size-adaptive join side (count-then-choose, the dupClusters pattern):
    * materialize `df` once (localCheckpoint — also stops the side's plan
    * from being recomputed by the count AND the join), then broadcast-hint
    * it only when it actually holds ≤ `maxBroadcastRows` rows.
    *
    * The Catalyst costing alternative under-serves exactly the case this
    * exists for: a COMPUTED side (distinct ids out of a dedup/contamination
    * pipeline) has no stats, so the optimizer either guesses from the scan
    * underneath (wrong by the dup rate) or falls back to defaults. Counting
    * the materialized result is exact. At benchmark dup rates the side is
    * thousands of ids → broadcast; on a 40%-dup web crawl it is O(corpus)
    * → shuffled join, where the old unconditional broadcast hint OOMed the
    * driver. Default threshold 4M rows ≈ 32–64 MB of ids, comfortably
    * inside executor memory and far beyond the point where a broadcast
    * stops paying.
    *
    * (On a real cluster prefer reliable `checkpoint` — localCheckpoint
    * blocks are unreplicated; an executor loss recomputes nothing and fails
    * the job.)
    */
  private val adaptiveSeq = new java.util.concurrent.atomic.AtomicLong()

  def adaptiveJoinSide(df: DataFrame, maxBroadcastRows: Long = 4000000L,
      materialize: Boolean = true): DataFrame = {
    // Driver-local side (dupClusters' union-find fast path emits a
    // LocalRelation, and ConvertToLocalRelation folds filters/projects
    // over it): the row count is already on the driver — spending a
    // Spark job (a full job-launch floor) to count it buys nothing.
    df.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        return if (lr.data.length <= maxBroadcastRows) broadcast(df) else df
      case _ => ()
    }
    // materialize=false when `df` is a cheap derivation of an
    // already-materialized frame (a filter over a checkpointed cluster
    // table): the count and the join each re-run the derivation, which is
    // cheaper than another checkpoint write.
    val (mat, n) =
      if (materialize) {
        // the count rides the checkpoint job via observe() — no second job
        val obs = new org.apache.spark.sql.Observation(
          s"adaptive_join_side_${adaptiveSeq.incrementAndGet()}")
        val out = df.observe(obs, count(lit(1)).as("n")).localCheckpoint()
        (out, obs.get("n").asInstanceOf[Long])
      } else (df, df.count())
    if (n <= maxBroadcastRows) broadcast(mat) else mat
  }
}
