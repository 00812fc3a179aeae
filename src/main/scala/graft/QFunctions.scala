package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.ops.TableOps

/** Scalar-function + window/set-op queries (SURVEY §2.5-§2.6): JSON
  * parse/validate, string functions, error-tolerant casts, set ops, ordered
  * top-k, grouped array collection, running windows, sessionization, and the
  * all-string export presentation (to_json + null normalization).
  *
  * Everything here is a codegen'd built-in function — no UDFs — so at 100 TB
  * these stay inside WholeStageCodegen with filters/pruning pushed to scans.
  */
object QFunctions {
  import Tables._

  /** F2/F3: JSON extraction + validity over events.props ({"k": N}).
    *
    * Single parse per row via Spark 4 VARIANT: `try_parse_json` yields NULL
    * exactly when the string is invalid JSON (= DuckDB `json_valid` = the
    * reference's per-cell json.loads try/except, add_json_answers_to_dictionary.py:12-16),
    * and `variant_get` reads the binary-encoded variant without re-parsing.
    * 2.5x faster than the two-`get_json_object` formulation (each of which
    * re-runs Jackson over the whole document).
    */
  def q11JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), try_parse_json(col("props")).as("v"))
      .select(
        col("event_type"),
        when(col("v").isNotNull, 1L).otherwise(0L).as("valid"),
        expr("try_variant_get(v, '$.k', 'long')").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("valid")).as("n_valid"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  private[graft] val q11Sql =
    """SELECT event_type,
      |  CAST(sum(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** F6/F7/P7: string kernel — concat, split+index, upper/substring, length.
    */
  def q12StringFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("tag"),
        split(col("c_name"), "#").getItem(1).as("cust_num"),
        upper(substring(col("c_name"), 1, 8)).as("up8"),
        length(col("c_name")).cast("long").as("name_len"))
      .orderBy(col("c_custkey"))

  private[graft] val q12Sql =
    """SELECT c_custkey,
      |  concat(c_name, '-', c_mktsegment) AS tag,
      |  string_split(c_name, '#')[2] AS cust_num,
      |  upper(substring(c_name, 1, 8)) AS up8,
      |  length(c_name) AS name_len
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** P5: error-tolerant casts (TypeEnrichment semantics — malformed → NULL,
    * never a job failure).
    */
  def q13TryCast(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"), col("props"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .limit(2000)
      // The casts go AFTER the top-k on purpose: projected first, the
      // optimizer keeps the Project under the Sort and get_json_object
      // runs over every row; this shape runs it over the 2000 survivors
      // only (TakeOrderedAndProject orders on raw columns, then projects).
      .select(
        col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k_int"),
        expr("try_cast(event_type AS INT)").as("bad_int"),
        expr("try_cast(value AS STRING)").as("value_str"))

  private[graft] val q13Sql =
    """SELECT event_id,
      |  TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  TRY_CAST(event_type AS INT) AS bad_int,
      |  TRY_CAST(value AS VARCHAR) AS value_str
      |FROM events
      |ORDER BY event_id
      |LIMIT 2000""".stripMargin

  /** §2.5 set ops: UNION DISTINCT across two unrelated domains. */
  def q14SetOps(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_mktsegment").as("v"))
      .union(orders(s, d).select(col("o_orderpriority").as("v")))
      .distinct()
      .orderBy(col("v"))

  private[graft] val q14Sql =
    """SELECT DISTINCT c_mktsegment AS v FROM customer
      |UNION
      |SELECT DISTINCT o_orderpriority AS v FROM orders
      |ORDER BY v""".stripMargin

  /** §2.5 ordered top-k — plans as TakeOrderedAndProject (per-partition heap
    * + driver merge), never a full sort at scale.
    */
  def q15TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private[graft] val q15Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** A6: grouped array collection with a deterministic element order
    * (sort_array ∘ collect_list — the reference's upload grouping,
    * uploader.py:92-105, minus the driver materialization).
    */
  def q16CollectSorted(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        sort_array(collect_list(col("l_quantity"))).as("qtys"),
        count(lit(1)).as("n_lines"))
      // The DuckDB-compare gate can't hash an array<double> column (pandas
      // TypeError: unhashable ndarray), so serialize deterministically on
      // both sides: sorted elements joined with ','. Double→string renders
      // identically ("3.0") in Spark and DuckDB for these values.
      .select(
        col("l_orderkey"),
        // array-level Cast, not transform(_.cast): identical per-element
        // rendering, but Cast is codegen'd where the HOF lambda is
        // CodegenFallback — and it keeps the whole projection in one
        // WholeStageCodegen span
        concat_ws(",", col("qtys").cast("array<string>")).as("qtys_csv"),
        col("n_lines"))
      .orderBy(col("l_orderkey"))

  private[graft] val q16Sql =
    """SELECT l_orderkey,
      |  array_to_string(list_sort(list(l_quantity)), ',') AS qtys_csv,
      |  count(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  /** Running window: cumulative revenue + rank per customer over an explicit
    * ROWS frame and a unique total order (date, orderkey).
    */
  def q17RunningWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        row_number().over(w).cast("long").as("rnk"),
        round(sum(col("o_totalprice")).over(cum), 2).as("running_total"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  private[graft] val q17Sql =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS rnk,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rnk""".stripMargin

  /** Sessionization via lag: a session break is a >600s gap per user. The
    * batch analog of the streaming session_window (§2.9); shuffles once on
    * user_id and reuses that partitioning for the window AND the groupBy.
    */
  def q18Sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events(s, d)
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 600000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  private[graft] val q18Sql =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(new_session) AS BIGINT) AS n_sessions
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |              ORDER BY ts, event_id) > 600000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** F1/P8: the all-string export presentation — nested values serialized
    * with to_json, nulls normalized to "" (client.py:64-69 semantics), as
    * plan-visible expressions (TableOps.jsonifyNested/normalizeNulls).
    */
  def q19ExportPresentation(s: SparkSession, d: String): DataFrame = {
    val nested = orders(s, d)
      .select(
        col("o_orderkey"),
        struct(col("o_orderstatus"), col("o_orderpriority"), col("o_custkey")).as("meta"),
        col("o_orderstatus").as("status"))
    val presented = TableOps.normalizeNulls(TableOps.jsonifyNested(nested))
    presented.orderBy(col("o_orderkey")).limit(1000)
  }

  private[graft] val q19Sql =
    """SELECT o_orderkey,
      |  to_json(struct_pack(o_orderstatus := o_orderstatus,
      |                      o_orderpriority := o_orderpriority,
      |                      o_custkey := o_custkey))::VARCHAR AS meta,
      |  coalesce(o_orderstatus, '') AS status
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 1000""".stripMargin

  /** Hierarchical subtotals via ROLLUP — one shuffle computes all three
    * grouping levels (per flag+status, per flag, grand total). Subtotal
    * rows show 'ALL' on both engines so the gate's sort/hash agree without
    * NULLS FIRST/LAST divergence.
    */
  def q38Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_price"))
      .orderBy(col("flag"), col("status"))

  private[graft] val q38Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |  coalesce(l_linestatus, 'ALL') AS status,
      |  count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  /** Exact interpolated percentiles per group (= DuckDB `quantile_cont`,
    * linear interpolation), via the decomposed
    * [[graft.operators.ExactPercentile]] — Tungsten window sort +
    * rank-interpolation join. On par with the builtin `percentile` aggregate
    * at sf0.1, but spillable where the builtin's boxed per-group value maps
    * must fit one reducer's heap. The sketch-based percentile_approx is the
    * 100 TB variant of the same call site.
    */
  def q39Percentiles(s: SparkSession, d: String): DataFrame = {
    def at(p: Double) = round(max(when(col("frac") === p, col("value"))), 4)
    graft.operators.ExactPercentile.groupedPercentiles(
        lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice")),
        Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75))
      .groupBy(col("l_returnflag"))
      .agg(at(0.25).as("p25"), at(0.5).as("p50"), at(0.75).as("p75"))
      .orderBy(col("l_returnflag"))
  }

  private[graft] val q39Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Fuzzy lookup: closest part names to a probe by edit distance — one
    * codegen'd pass + TakeOrdered (per-partition heap), no pairwise blowup.
    */
  def q40FuzzyMatch(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"), col("p_name"),
        levenshtein(col("p_name"), lit("midnight linen rose powder")).cast("long").as("dist"))
      .orderBy(col("dist"), col("p_partkey"))
      .limit(10)

  private[graft] val q40Sql =
    """SELECT p_partkey, p_name,
      |  levenshtein(p_name, 'midnight linen rose powder') AS dist
      |FROM part
      |ORDER BY dist, p_partkey
      |LIMIT 10""".stripMargin

  /** Window-frame depth: a calendar RANGE frame (30-day trailing revenue),
    * percent_rank, ntile quartiles, and lead. Four distinct window specs
    * but only TWO (partition, prefix-order) families — the specs are
    * chained so each partition key's tie-broken (longer) ordering plans
    * FIRST; the prefix-ordered spec above it then finds its required sort
    * already satisfied (`SortOrder.orderingSatisfies` accepts a longer
    * child ordering), so EnsureRequirements inserts neither a second
    * exchange nor a second sort: 2 shuffles + 2 sorts total, not 2 + 4.
    * A RANGE frame only admits a single ORDER BY column, so r30 cannot
    * itself adopt the tie-break — sharing the sort is the only way.
    *
    * FLOOR NOTE (r14, the q54/b64 decomposition applied here): bench b72
    * runs the window body alone — same-run A/B at sf0.1 measured ~0.64s
    * body vs ~0.97s total, so ~⅓ of q44 is the gate's total-ORDER-BY
    * output tax (a third global exchange+sort on a key neither window
    * family orders by). The body itself is already minimal: two distinct
    * partition keys admit no fewer than 2 exchanges + 2 sorts, both
    * already shared via the longest-ordering-first chain above. Nothing
    * left to chain; the residual is data work + the measured job floor.
    */
  def q44WindowFrames(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"), col("o_orderpriority"))
      .withColumn("tile", expr("CAST(ntile(4) OVER (PARTITION BY " +
        "o_orderpriority ORDER BY o_totalprice, o_orderkey) AS BIGINT)"))
      .withColumn("pr", expr("round(percent_rank() OVER (PARTITION BY " +
        "o_orderpriority ORDER BY o_totalprice), 6)"))
      .withColumn("nxt", expr("lead(o_orderkey, 1) OVER (PARTITION BY " +
        "o_custkey ORDER BY o_orderdate, o_orderkey)"))
      .withColumn("r30", expr("round(sum(o_totalprice) OVER (PARTITION BY " +
        "o_custkey ORDER BY o_orderdate " +
        "RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)"))
      .select(col("o_orderkey"), col("o_custkey"), col("r30"), col("pr"),
        col("tile"), col("nxt"))
      .orderBy(col("o_orderkey"))

  private[graft] val q44Sql =
    """SELECT o_orderkey, o_custkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2) AS r30,
      |  round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6) AS pr,
      |  ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS tile,
      |  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nxt
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** CUBE: all four grouping levels in one shuffle (flag×status, flag,
    * status, grand total) — q38's ROLLUP plus the status-only slice.
    */
  def q45Cube(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(avg(col("l_discount")), 6).as("avg_disc"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("avg_disc"))
      .orderBy(col("flag"), col("status"))

  private[graft] val q45Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |  coalesce(l_linestatus, 'ALL') AS status,
      |  count(*) AS n, round(avg(l_discount), 6) AS avg_disc
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_json_extract"        -> (q11JsonExtract _),
    "q12_string_funcs"        -> (q12StringFuncs _),
    "q13_try_cast"            -> (q13TryCast _),
    "q14_set_ops"             -> (q14SetOps _),
    "q15_topk"                -> (q15TopK _),
    "q16_collect_sorted"      -> (q16CollectSorted _),
    "q17_running_window"      -> (q17RunningWindow _),
    "q18_sessionize"          -> (q18Sessionize _),
    "q19_export_presentation" -> (q19ExportPresentation _),
    "q38_rollup"              -> (q38Rollup _),
    "q39_percentiles"         -> (q39Percentiles _),
    "q40_fuzzy_match"         -> (q40FuzzyMatch _),
    "q44_window_frames"       -> (q44WindowFrames _),
    "q45_cube"                -> (q45Cube _))

  val sql: Map[String, String] = Map(
    "q11_json_extract"        -> q11Sql,
    "q12_string_funcs"        -> q12Sql,
    "q13_try_cast"            -> q13Sql,
    "q14_set_ops"             -> q14Sql,
    "q15_topk"                -> q15Sql,
    "q16_collect_sorted"      -> q16Sql,
    "q17_running_window"      -> q17Sql,
    "q18_sessionize"          -> q18Sql,
    "q19_export_presentation" -> q19Sql,
    "q38_rollup"              -> q38Sql,
    "q39_percentiles"         -> q39Sql,
    "q40_fuzzy_match"         -> q40Sql,
    "q44_window_frames"       -> q44Sql,
    "q45_cube"                -> q45Sql)
}
