package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ops.TableOps

/** Relational-core operator queries (SURVEY §2.2-§2.5): projection+filter
  * pushdown, equi joins (single, composite, broadcast, left+coalesce),
  * distinct, uniqueness report, pivot counting, window dedupe, set ops,
  * top-k. Each has a DuckDB oracle in [[Queries.oracles]].
  *
  * Scale notes (100 TB design point):
  *   - every scan projects only needed columns and pushes its filters
  *     (verified via explain: PushedFilters / ReadSchema);
  *   - dimension joins (region/nation) are explicit `broadcast()`;
  *   - fact-fact joins shuffle on their join keys only, with map-side
  *     partial aggregation before any shuffle where an agg follows.
  */
object QRelational {
  import Tables._

  /** P1/P6/§2.5: filter+projection pushdown + ordered limit. At scale the
    * predicate reaches the parquet scan (min/max row-group skipping) and the
    * limit is a TakeOrderedAndProject — no full sort.
    */
  def q02FilterPushdown(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 50000.0)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_date"))
      .orderBy(col("o_orderkey"))
      .limit(100)

  private[graft] val q02Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
      |ORDER BY o_orderkey
      |LIMIT 100""".stripMargin

  /** J1: single-key fact-fact equi join + grouped agg. Shuffles both sides on
    * the key; partial aggregation runs map-side before the groupBy shuffle.
    */
  def q03JoinAgg(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))

  private[graft] val q03Sql =
    """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** J2: composite-key equi join — max-quantity line(s) per order, found by
    * joining lineitem back to its per-order max on (orderkey, quantity).
    * The grouped side reuses the shuffle partitioning of the join (same key
    * prefix), so AQE plans one exchange for the small side only.
    */
  def q04CompositeJoin(s: SparkSession, d: String): DataFrame = {
    // the composite-key self-join ("rows carrying their order's max
    // quantity") folds into ONE shuffle as a windowed max — the join form
    // scanned lineitem twice and sort-merge-joined the 600k-row fact with
    // itself for the same answer (the oracle keeps the join spelling)
    val li = lineitem(s, d)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    li.withColumn("__mx", max(col("l_quantity")).over(w))
      .filter(col("l_quantity") === col("__mx"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private[graft] val q04Sql =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
      |FROM lineitem l
      |JOIN (SELECT l_orderkey AS g_orderkey, max(l_quantity) AS max_qty
      |      FROM lineitem GROUP BY 1) g
      |  ON l.l_orderkey = g.g_orderkey AND l.l_quantity = g.max_qty
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** J3: dimension joins with explicit broadcast — region and nation are tiny
    * at any scale factor, so both sides of the customer join are broadcast
    * hash joins with zero shuffle of the fact table.
    */
  def q05BroadcastDims(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        // floor-truncate, not round: an avg landing exactly on .xx5 rounds
        // differently in Spark (decimal string) vs DuckDB (binary) — hit at
        // sf0.001 (ASIA/NATION_17 avg = 4201.315)
        (floor(avg(col("c_acctbal")) * 100.0) / 100.0).as("avg_bal"))
      .orderBy(col("r_name"), col("n_name"))

  private[graft] val q05Sql =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  floor(avg(c_acctbal) * 100.0) / 100.0 AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** J4: upsert-lookup as left join + coalesce (replaces the reference's
    * driver-side dict UDF, labelspark/update_metadata.py:33-47).
    */
  def q06LeftJoinCoalesce(s: SparkSession, d: String): DataFrame = {
    val spent = orders(s, d).groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spent_raw"), count(lit(1)).as("cnt_raw"))
    customer(s, d)
      .join(spent, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("spent_raw"), lit(0.0)).as("spent"),
        coalesce(col("cnt_raw"), lit(0L)).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  private[graft] val q06Sql =
    """SELECT c_custkey,
      |  coalesce(o.spent_raw, 0.0) AS spent,
      |  coalesce(o.cnt_raw, 0) AS n_orders
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS spent_raw,
      |                  count(*) AS cnt_raw
      |           FROM orders GROUP BY 1) o ON c_custkey = o.o_custkey
      |ORDER BY c_custkey""".stripMargin

  /** A1: distinct values (connector.py:30-39 get_unique_values), kept
    * distributed; the driver-side collect is the caller's bounded choice.
    */
  def q07Distinct(s: SparkSession, d: String): DataFrame =
    TableOps.uniqueValues(customer(s, d), "c_mktsegment")
      .withColumnRenamed("c_mktsegment", "segment")
      .orderBy(col("segment"))

  private[graft] val q07Sql =
    """SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment""".stripMargin

  /** A2/A3: the uniqueness report — rows, distinct keys, duplicates in ONE
    * aggregation pass (the reference runs two jobs, uploader.py:76-81).
    */
  def q08Uniqueness(s: SparkSession, d: String): DataFrame =
    TableOps.uniquenessReport(orders(s, d), "o_custkey")

  private[graft] val q08Sql =
    """SELECT count(*) AS n_rows, count(DISTINCT o_custkey) AS n_keys,
      |  count(*) - count(DISTINCT o_custkey) AS n_dup
      |FROM orders""".stripMargin

  /** A4: pivoted per-group counting (the reference's `<title>.count` object
    * counting, bronze_to_silver.py:47-54, done distributed). Pivot values are
    * explicit so the plan needs no discovery pass and columns are stable.
    */
  def q09PivotCount(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("A", "N", "R"))
      .orderBy(col("l_linestatus"))

  private[graft] val q09Sql =
    """SELECT l_linestatus,
      |  count(*) FILTER (l_returnflag = 'A') AS "A",
      |  count(*) FILTER (l_returnflag = 'N') AS "N",
      |  count(*) FILTER (l_returnflag = 'R') AS "R"
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** Window dedupe (TableOps.dedupeLastWins): latest order per customer with
    * a deterministic total order — replaces the reference's nondeterministic
    * dict-overwrite last-write-wins (uploader.py:99-104).
    */
  def q10DedupeLastWins(s: SparkSession, d: String): DataFrame =
    TableOps.dedupeLastWins(
        orders(s, d), Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"))

  private[graft] val q10Sql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
      |FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      |ORDER BY o_custkey""".stripMargin

  /** 4-way fact-dim join (TPC-H Q5 shape): lineitem ⋈ supplier ⋈ nation ⋈
    * region with a region filter and date predicate. The two dims broadcast;
    * the fact-fact side shuffles once on suppkey; Catalyst reorders freely
    * since everything is declarative.
    */
  def q35MultiJoin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= "1995-01-01")
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))

  private[graft] val q35Sql =
    """SELECT n_name, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-k per key via the custom physical operator (graft.plans.TopKPerKey:
    * logical node + strategy + partial/final heap execs). The window
    * row_number formulation shuffles and sorts every row; this shuffles at
    * most k rows per (map partition, key). Ordering is total
    * (totalprice DESC, orderkey) so the cut is deterministic — the DuckDB
    * oracle runs the QUALIFY equivalent.
    */
  def q36TopkPerKey(s: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
        orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"), Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  private[graft] val q36Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM orders
      |QUALIFY row_number() OVER (
      |  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** Semi/anti joins (SURVEY §2.3 extension): customers with vs without
    * URGENT orders, per segment (the priority filter makes both sides
    * non-empty — this generator gives every customer some order).
    * LeftSemi/LeftAnti ship only the probe side's columns through the
    * join — at scale the orders side reduces to a broadcast/shuffled key
    * set, never a row multiplication.
    */
  def q41SemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    val sem = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("with_orders"))
    val ant = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("no_orders"))
    sem.unionByName(ant)
      .select(col("kind"), col("c_mktsegment"), col("n"))
      .orderBy(col("kind"), col("c_mktsegment"))
  }

  private[graft] val q41Sql =
    """SELECT 'with_orders' AS kind, c_mktsegment, count(*) AS n
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT 'no_orders' AS kind, c_mktsegment, count(*) AS n
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY kind, c_mktsegment""".stripMargin

  /** Skew-salted fact-dim join (graft.core.ops.SkewJoin): the hot-key
    * mitigation as a gate-checked query — salt spreads each hot l_partkey
    * across `saltFactor` reducers, the dim side replicates per salt, and
    * the result hash-matches the plain join (salting is a pure partitioning
    * transform, not a semantic one).
    */
  def q42SkewJoin(s: SparkSession, d: String): DataFrame = {
    val dim = part(s, d).select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.core.ops.SkewJoin.saltedJoin(lineitem(s, d), dim, "l_partkey", saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("p_brand"))
  }

  private[graft] val q42Sql =
    """SELECT p_brand, count(*) AS n_items,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_multi_join"         -> (q35MultiJoin _),
    "q36_topk_per_key"       -> (q36TopkPerKey _),
    "q41_semi_anti"          -> (q41SemiAnti _),
    "q42_skew_join"          -> (q42SkewJoin _),
    "q02_filter_pushdown"    -> (q02FilterPushdown _),
    "q03_join_agg"           -> (q03JoinAgg _),
    "q04_composite_join"     -> (q04CompositeJoin _),
    "q05_broadcast_dims"     -> (q05BroadcastDims _),
    "q06_left_join_coalesce" -> (q06LeftJoinCoalesce _),
    "q07_distinct"           -> (q07Distinct _),
    "q08_uniqueness"         -> (q08Uniqueness _),
    "q09_pivot_count"        -> (q09PivotCount _),
    "q10_dedupe_lastwins"    -> (q10DedupeLastWins _))

  val sql: Map[String, String] = Map(
    "q35_multi_join"         -> q35Sql,
    "q36_topk_per_key"       -> q36Sql,
    "q41_semi_anti"          -> q41Sql,
    "q42_skew_join"          -> q42Sql,
    "q02_filter_pushdown"    -> q02Sql,
    "q03_join_agg"           -> q03Sql,
    "q04_composite_join"     -> q04Sql,
    "q05_broadcast_dims"     -> q05Sql,
    "q06_left_join_coalesce" -> q06Sql,
    "q07_distinct"           -> q07Sql,
    "q08_uniqueness"         -> q08Sql,
    "q09_pivot_count"        -> q09Sql,
    "q10_dedupe_lastwins"    -> q10Sql)
}
