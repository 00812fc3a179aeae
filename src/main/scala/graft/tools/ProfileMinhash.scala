package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Dedup

/** Scratch profiler for the MinHash-LSH pipeline stages (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    t("shingles")(noop(sh))
    val banded = docs.select(col("doc_id"),
      Dedup.minhashBandsFast(graft.ext.TextAnalysis.tokens(col("text")), 3, 16, 4).as("bh"))
    t("bands native")(noop(banded))
    val fullFast = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5, fast = true)
    t("full fast")(noop(fullFast))
    t("full md5")(noop(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)))
    fullFast.explain("formatted")
    spark.stop()
  }
}
