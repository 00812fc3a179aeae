package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a self-contained operator demonstration over
  * the TESTDATA star schema; [[oracleSql]] carries the DuckDB-equivalent SQL.
  * Column names AND types are kept identical on both sides (the driver sorts
  * columns by name and hash-compares values), double aggregates are rounded,
  * and every query has a total ORDER BY so row order is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
