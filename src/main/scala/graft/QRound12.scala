package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 additions: log compaction under the correctness gate. Same
  * gate conventions as [[Queries]].
  */
object QRound12 {
  import Tables._

  /** Log compaction end-to-end ([[graft.io.DeltaWrite.compactLog]] +
    * [[graft.io.DeltaRead.replayFull]]'s segment substitution): build a
    * customer-derived table with two appends, a deletion-vector DELETE
    * (the compacted add must carry its DV descriptor), and a
    * copy-on-write UPDATE (the compacted file must keep the rewrite's
    * remove tombstones — dropping one resurrects pre-update rows), then
    * compact commits 1..3 into ONE `<s>.<e>.compacted.json` and DELETE
    * the covered per-commit JSONs, so the compacted file is the only
    * possible source of that range at replay. A final append lands on
    * top (the writer must version off the compacted head, not re-issue
    * an old number). The emitted aggregate hashes against the oracle's
    * symbolic replay of the four verbs — a dropped tombstone, lost DV,
    * or mis-sequenced segment all break it.
    */
  def q119LogCompaction(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_q119_").toFile,
      "customer_logc").getAbsolutePath
    val cust = customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal") * 100, 0).cast("long").as("cents"))
    graft.io.DeltaWrite.writeDeltaTable(
      cust.filter(col("c_custkey") % 2 === 0), path, "append")       // v0
    graft.io.DeltaWrite.writeDeltaTable(
      cust.filter(col("c_custkey") % 2 === 1), path, "append")       // v1
    graft.io.DeltaMerge.deleteWhereDv(s, path, col("c_custkey") % 7 === 0) // v2
    graft.io.DeltaMerge.updateWhere(s, path, col("c_custkey") % 5 === 0,
      Map("cents" -> (col("cents") + 11)))                           // v3 (COW)
    graft.io.DeltaWrite.compactLog(s, path, 1L, 3L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    (1L to 3L).foreach { v => // the compacted file is now the only source
      fs.delete(new org.apache.hadoop.fs.Path(path,
        f"_delta_log/$v%020d.json"), false)
    }
    graft.io.DeltaWrite.writeDeltaTable(
      cust.filter(col("c_custkey") % 3 === 0)
        .withColumn("cents", col("cents") + 1000), path, "append")   // v4
    graft.io.DeltaRead.readDeltaTable(s, path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .orderBy(col("c_mktsegment"))
  }

  private val q119Sql =
    """WITH base AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS c
      |  FROM customer),
      |final AS (
      |  SELECT seg,
      |    c + CASE WHEN k % 5 = 0 THEN 11 ELSE 0 END AS c
      |  FROM base WHERE k % 7 <> 0                     -- v0+v1 minus the DV delete, v3 update
      |  UNION ALL
      |  SELECT seg, c + 1000 FROM base WHERE k % 3 = 0 -- the post-compaction append
      |)
      |SELECT seg AS c_mktsegment, count(*) AS n, CAST(sum(c) AS BIGINT) AS cents
      |FROM final
      |GROUP BY seg
      |ORDER BY c_mktsegment""".stripMargin

  /** Heavy-hitter tokens via the bounded Misra-Gries aggregate
    * ([[graft.ext.TextAnalysis.heavyHitters]]): ONE aggregate pass over
    * documents — tokenization happens inside the aggregate's update, so
    * no per-token row ever exists and the shuffle is capacity × partitions
    * rows regardless of corpus size (the exact `explode → groupBy` form
    * shuffles every distinct token). The testdata vocabulary (31 tokens)
    * fits the capacity (64), so Misra-Gries never decrements and the
    * counts are EXACT — hashed against DuckDB's exact aggregation. The
    * approximate regime (capacity < vocabulary) is spec-pinned with the
    * classic retention/underestimate bounds (FreqSketchSpec).
    */
  def q120HeavyHitters(s: SparkSession, d: String): DataFrame = {
    documents(s, d)
      .agg(graft.ext.TextAnalysis.heavyHitters(col("text"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("token"), col("e.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)
  }

  private val q120Sql =
    """SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |WHERE tok <> ''
      |GROUP BY tok
      |ORDER BY cnt DESC, token
      |LIMIT 20""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_log_compaction" -> (q119LogCompaction _),
    "q120_heavy_hitters" -> (q120HeavyHitters _))

  val sql: Map[String, String] = Map(
    "q119_log_compaction" -> q119Sql,
    "q120_heavy_hitters" -> q120Sql)
}
