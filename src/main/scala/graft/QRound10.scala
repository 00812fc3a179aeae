package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 additions: deletion-vector DML under the correctness gate.
  * Same gate conventions as [[Queries]].
  */
object QRound10 {
  import Tables._

  /** Deletion-vector DML round trip — q106's verb set re-run through the
    * O(changed rows) path ([[graft.io.DeltaMerge.deleteWhereDv]] /
    * `updateWhereDv` / `merge(useDeletionVectors = true)`): build a base
    * table from customer, DV-DELETE the negative balances (files keep
    * their bytes; positions go dark via roaring bitmaps), DV-UPDATE
    * custkey%10==4 (+7 cents — old positions shadowed, new rows appended),
    * then DV-MERGE a source that replaces every custkey%6==0 row with
    * cents+1000 (re-inserting the ones the delete removed). Head state
    * aggregates per segment alongside time-travel row counts at v0/v1.
    * The oracle derives the same final state straight from the source
    * parquet: %6==0 keys all end at orig+1000 (replaced or re-inserted —
    * the +7 update is overwritten for them), everything else keeps the
    * delete+update outcome — a row resurrected by a bad bitmap, lost to a
    * mis-attributed file, or double-served by a DV re-add breaks the
    * hash. Integer cents throughout (the q69/q73 convention).
    */
  def q111DvDml(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_q111_").toFile,
      "customer_delta").getAbsolutePath
    val cust = customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal") * 100, 0).cast("long").as("cents"))
    graft.io.DeltaWrite.writeDeltaTable(cust, path, "append") // v0
    graft.io.DeltaMerge.deleteWhereDv(s, path, col("cents") < 0) // v1
    graft.io.DeltaMerge.updateWhereDv(s, path, col("c_custkey") % 10 === 4,
      Map("cents" -> (col("cents") + 7))) // v2
    val source = cust.filter(col("c_custkey") % 6 === 0)
      .withColumn("cents", col("cents") + 1000)
    graft.io.DeltaMerge.merge(s, path, source, Seq("c_custkey"),
      useDeletionVectors = true) // v3
    val v0 = graft.io.DeltaRead.readDeltaTable(s, path, versionAsOf = Some(0L))
      .agg(count(lit(1)).as("v0_rows"))
    val v1 = graft.io.DeltaRead.readDeltaTable(s, path, versionAsOf = Some(1L))
      .agg(count(lit(1)).as("v1_rows"))
    graft.io.DeltaRead.readDeltaTable(s, path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .crossJoin(broadcast(v0))
      .crossJoin(broadcast(v1))
      .orderBy(col("c_mktsegment"))
  }

  private val q111Sql =
    """WITH base AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS c
      |  FROM customer),
      |final AS (
      |  -- %6==0 keys: replaced (alive) or re-inserted (deleted) at orig+1000
      |  SELECT k, seg, c + 1000 AS c FROM base WHERE k % 6 = 0
      |  UNION ALL
      |  -- everyone else: survives the delete, +7 where k%10==4
      |  SELECT k, seg, c + CASE WHEN k % 10 = 4 THEN 7 ELSE 0 END AS c
      |  FROM base WHERE k % 6 <> 0 AND c >= 0)
      |SELECT seg AS c_mktsegment, count(*) AS n, CAST(sum(c) AS BIGINT) AS cents,
      |  (SELECT count(*) FROM customer) AS v0_rows,
      |  (SELECT count(*) FROM base WHERE c >= 0) AS v1_rows
      |FROM final
      |GROUP BY seg
      |ORDER BY c_mktsegment""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_dv_dml" -> (q111DvDml _))

  val sql: Map[String, String] = Map(
    "q111_dv_dml" -> q111Sql)
}
