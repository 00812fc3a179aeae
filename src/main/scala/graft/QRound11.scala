package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 additions: row tracking under the correctness gate. Same gate
  * conventions as [[Queries]].
  */
object QRound11 {
  import Tables._

  /** Row tracking end-to-end — stable row identity under DML
    * ([[graft.io.DeltaWrite.writeDeltaTableRowTracked]] +
    * [[graft.io.DeltaRead.readDeltaTableWithRowIds]]): build a
    * row-tracked table from a sorted single-file orders slice (so each
    * row's assigned id IS its sorted rank — the one deterministic seam
    * the oracle needs), then DV-DELETE `%3` keys, COW-UPDATE `%5` keys
    * (the rewrite must MATERIALIZE every carried row's id and original
    * commit version), and DV-UPDATE `%4` keys (shadow + re-append, the
    * appended row carrying its id forward materialized). The final read
    * serves `(_row_id, _row_commit_version)` per surviving key; the
    * oracle reconstructs ids as `row_number() - 1` over the same sorted
    * slice and versions from which verb last touched each key. An id
    * moved by a rewrite, a version stamped on a carried row, or a
    * deleted id resurfacing all break the hash. Row order inside
    * REWRITTEN files is deliberately irrelevant — identity rides the
    * materialized columns, which is the feature under test.
    */
  def q113RowTracking(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_q113_").toFile,
      "orders_rt").getAbsolutePath
    val base = orders(s, d).filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .repartition(1).sortWithinPartitions(col("o_orderkey"))
    graft.io.DeltaWrite.writeDeltaTableRowTracked(base, path) // v0: ids = rank
    graft.io.DeltaMerge.deleteWhereDv(s, path, col("o_orderkey") % 3 === 0) // v1
    graft.io.DeltaMerge.updateWhere(s, path, col("o_orderkey") % 5 === 0,
      Map("cents" -> (col("cents") + 11))) // v2: copy-on-write, ids materialize
    graft.io.DeltaMerge.updateWhereDv(s, path, col("o_orderkey") % 4 === 0,
      Map("cents" -> (col("cents") + 7))) // v3: shadow + re-append, id carried
    graft.io.DeltaRead.readDeltaTableWithRowIds(s, path)
      .select(col("o_orderkey"), col("_row_id").as("row_id"),
        col("_row_commit_version").as("row_ver"), col("cents"))
      .orderBy(col("o_orderkey"))
  }

  private val q113Sql =
    """WITH base AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
      |  FROM orders WHERE o_orderkey % 13 = 0),
      |ranked AS (
      |  SELECT k, c, row_number() OVER (ORDER BY k) - 1 AS rid FROM base)
      |SELECT k AS o_orderkey, CAST(rid AS BIGINT) AS row_id,
      |  CAST(CASE WHEN k % 4 = 0 THEN 3
      |            WHEN k % 5 = 0 THEN 2 ELSE 0 END AS BIGINT) AS row_ver,
      |  c + CASE WHEN k % 5 = 0 THEN 11 ELSE 0 END
      |    + CASE WHEN k % 4 = 0 THEN 7 ELSE 0 END AS cents
      |FROM ranked
      |WHERE k % 3 <> 0
      |ORDER BY o_orderkey""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_row_tracking" -> (q113RowTracking _))

  val sql: Map[String, String] = Map(
    "q113_row_tracking" -> q113Sql)
}
