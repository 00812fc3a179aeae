package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe backing the graft_asof_pick claim (dev tool): times the composed
  * filter+element_at match (O(m) walk + filtered copy per fact row)
  * against the binary-search expression on a DEEP per-key rate table
  * (every event is a rate row). Usage: scripts/run.sh
  * graft.tools.AsOfPickBench [sfDir].
  */
object AsOfPickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, sfDir)
    val facts = ev.select(col("event_id"), col("user_id"), col("ts"))
    val rates = ev.select(col("user_id").as("rk"), col("ts").as("rts"),
        col("value").as("rate_value"))
      .groupBy(col("rk"), col("rts")).agg(max(col("rate_value")).as("rate_value"))
    val packed = rates.groupBy(col("rk").as("__rk"))
      .agg(sort_array(collect_list(struct(col("rts").cast("timestamp").as("__t"),
        struct(col("rate_value")).as("__p")))).as("__arr")).localCheckpoint()
    val joined = facts.join(broadcast(packed), col("user_id") === col("__rk"), "left_outer")
    val lts = col("ts").cast("timestamp")
    val eligible = filter(col("__arr"), x => x.getField("__t") <= lts)
    val composed = when(size(eligible) > 0, element_at(eligible, size(eligible)))
    val binary = org.apache.spark.sql.GraftSqlShims.column(graft.functions.AsOfPick(
      org.apache.spark.sql.GraftSqlShims.expression(col("__arr")),
      org.apache.spark.sql.GraftSqlShims.expression(lts)))
    for ((name, m) <- Seq("composed" -> composed, "binary" -> binary); pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = joined.withColumn("__m", m)
        .select(col("__m").getField("__p").getField("rate_value").as("rv"))
        .agg(count(col("rv"))).collect().head.getLong(0)
      println(f"$name pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s (matched=$n)")
    }
    spark.stop()
  }
}
