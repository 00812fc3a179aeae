package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins (SURVEY §2 scale techniques): persist
  * both join sides bucketed (and sorted) on the join key, and every
  * subsequent equi-join on that key runs with ZERO exchanges — each bucket
  * pair joins locally, already sorted for sort-merge.
  *
  * This is the 100 TB pattern for repeated fact-fact joins: one write-time
  * shuffle amortized over every downstream join, instead of re-shuffling
  * both sides per query. (The reference persists Delta tables,
  * client.py:146, but delegates physical layout to Spark — bucketing IS the
  * Spark-native layout control.)
  *
  * Bucket counts should divide evenly into executor parallelism and keep
  * per-bucket data within one task's memory at the target scale — for
  * 100 TB of lineitem-shaped data, thousands of buckets, not dozens.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      overwrite: Boolean = true): Unit = {
    if (overwrite) df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    (if (overwrite) w.mode("overwrite") else w).saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key. With equal bucket
    * counts both sides report HashPartitioning(key, n) from the scan, so
    * EnsureRequirements inserts no exchange; the `merge` hint keeps the
    * optimizer from broadcasting a side (which would waste the layout).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
