package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout — the 100 TB scan-reduction workhorse: a
  * time-filtered query touches only its partition directories (partition
  * PRUNING, visible as `PartitionFilters` in the scan node), so a one-day
  * query over a year of data reads ~1/365th of the files before any
  * row-group or predicate pushdown applies.
  *
  * The writer repartitions BY the partition column first: without it every
  * write task holds rows of every date and emits one file per (task, date) —
  * the classic small-files explosion (1000 tasks x 365 dates = 365k files).
  * With it each date's rows co-locate, yielding exactly `filesPerDay` files
  * per directory; `filesPerDay` spreads a hot date over multiple writers
  * when one task per day would bottleneck the write stage.
  */
object PartitionedLayout {

  /** Write `df` laid out as `path/event_date=YYYY-MM-DD/...`. */
  def writeDailyPartitioned(df: DataFrame, tsCol: String, path: String,
      filesPerDay: Int = 1): Unit = {
    val dated = df.withColumn("event_date", to_date(col(tsCol)))
    val laid =
      if (filesPerDay <= 1) dated.repartition(col("event_date"))
      else dated.repartition(col("event_date"),
        pmod(hash(col(tsCol)), lit(filesPerDay)))
    laid.write.partitionBy("event_date").mode("overwrite").parquet(path)
  }

  /** Read the layout; `event_date` filters prune at planning time. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One day's slice — the filter is a partition filter, never a data scan. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    read(spark, path).filter(col("event_date") === lit(day))

  /** Append one day (an incremental load) without touching other dirs:
    * dynamic partition overwrite replaces ONLY the dates present in `df` —
    * the idempotent daily-backfill write (re-running a day never duplicates
    * it, and never rewrites the other 364 days).
    */
  def overwriteDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .repartition(col("event_date"))
      .write.partitionBy("event_date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)

  /** Schema-evolved read: newer days may carry columns older days lack
    * (pipelines add fields mid-history); `mergeSchema` unions the file
    * schemas and nulls the missing columns — the read-side half of additive
    * schema evolution. Costs a footer read per file at planning, so keep it
    * for evolved tables and use [[read]] on stable ones.
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
