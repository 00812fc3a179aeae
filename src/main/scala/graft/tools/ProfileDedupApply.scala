package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Dedup

/** Scratch profiler for b58 (LSH pairs → clusters → keepBest → agg). */
object ProfileDedupApply {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, sfDir)
    t("pairs")(noop(Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, threshold = 0.5, fast = true)))
    t("pairs+clusters") {
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, threshold = 0.5, fast = true)
      noop(Dedup.dupClusters(pairs, "id_a", "id_b"))
    }
    t("full b58") {
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, threshold = 0.5, fast = true)
      val clusters = Dedup.dupClusters(pairs, "id_a", "id_b")
      noop(Dedup.keepBest(docs, clusters, "doc_id", length(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(length(col("text"))).cast("long").as("chars_kept"))
        .orderBy(col("source")))
    }
    spark.stop()
  }
}
