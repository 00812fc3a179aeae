package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: executed-plan (post-AQE) reuse check — `ProfileReuse [query]`,
  * default the LSH pipeline. AQE's ReusedExchange only exists in the FINAL
  * plan, so static explain undercounts reuse.
  */
object ProfileReuse {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("b31_minhash_lsh_fast")
    val df = graft.Bench.fastVariants.getOrElse(name, graft.SparkEntry.queries(name))(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    val s = if (cut >= 0) p.substring(0, cut) else p
    def c(pat: String) = pat.r.findAllIn(s).length
    println(s"minhash_bands=${c("graft_minhash_bands")} reused_exchange=${c("ReusedExchange")} " +
      s"reused_stage=${c("ReusedQueryStage|TableCacheQueryStage")} scans=${c("Scan parquet")}")
    spark.stop()
  }
}
