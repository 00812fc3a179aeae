package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity}

/** Scratch profiler for b45 (sign-band LSH near-dup pairs): stage timings
  * and candidate-pair volume (dev tool).
  */
object ProfileBanded {
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
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val emb = Tables.embeddings(spark, sfDir)
    println(s"vectors: ${emb.count()}")
    val planes = Similarity.hyperplanes(64, 32 * 8)
    val banded = emb.select(col("vec_id").as("id"),
      Similarity.signBandBuckets(col("embedding"), planes, 32).as("bh"))
      .repartition(col("id"))
    t("sign bands")(noop(banded))
    val cands = Dedup.candidatePairs(banded, "id", "bh")
    println(s"candidate pairs: ${cands.count()}")
    t("cands")(noop(cands))
    println(cands.queryExecution.executedPlan.toString.take(4000))
    t("full b45")(noop(Similarity.nearDupPairsBanded(emb, "vec_id", "embedding",
      threshold = 0.8, dim = 64)))
    spark.stop()
  }
}
