package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The correctness-gate query inventory (SURVEY.md §2), one named query per
  * operator family, each with a DuckDB oracle. Conventions, enforced on both
  * the Spark and the SQL side so the driver's sorted-column hash compare
  * passes:
  *   - identical column names (every computed column aliased on both sides)
  *   - identical column TYPES (DuckDB `sum(int)` → HUGEINT is cast to BIGINT,
  *     `len(list)` → BIGINT cast to INT where Spark yields IntegerType, ...)
  *   - doubles that come out of aggregation are `round(_, n)`-ed identically
  *   - a total ORDER BY on every query
  *   - timestamps never leave a query raw: formatted to string or cast to date
  */
object Queries {
  import Tables._

  // ---------------------------------------------------------------- q01
  /** Pricing summary (reference delegates all aggregation to Spark — SURVEY
    * §2.4). Map-side partial agg + 2-key shuffle; scans only the needed
    * lineitem columns.
    */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -------------------------------------------------------------- registry
  val all: Map[String, (SparkSession, String) => DataFrame] =
    Map("q01_pricing_summary" -> (q01PricingSummary _)) ++
      QRelational.registry ++ QFunctions.registry ++ QPipelineExt.registry ++
      QRound4.registry ++ QCorpus.registry ++ QRound6.registry ++ QRound8.registry ++
      QRound9.registry ++ QRound10.registry ++ QRound11.registry ++ QRound12.registry ++
      QRound13.registry ++ QRound14.registry

  val oracles: Map[String, String] =
    Map("q01_pricing_summary" -> q01Sql) ++
      QRelational.sql ++ QFunctions.sql ++ QPipelineExt.sql ++ QRound4.sql ++
      QCorpus.sql ++ QRound6.sql ++ QRound8.sql ++ QRound9.sql ++ QRound10.sql ++ QRound11.sql ++ QRound12.sql ++
      QRound13.sql ++ QRound14.sql
}
