package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Scratch profiler: where b62 (classifier train + score) spends its time
  * (dev tool). Warm numbers (second run of each block).
  */
object ProfileClassifier {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](name: String)(f: => A): A = {
      f
      val t0 = System.nanoTime(); val out = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }

    val docs = Tables.documents(spark, sfDir)
    val pos = docs.filter(col("source") === "src0")
    val neg = docs.filter(col("source") =!= "src0")

    t("gram explode (full)")(noop(
      graft.ext.Selection.hashedGramBuckets(docs, "doc_id", "text", 4096, fast = true)))
    val m1 = t("train iters=1")(
      graft.ext.Classifier.train(pos, neg, "doc_id", "text", buckets = 4096, iters = 1))
    val m3 = t("train iters=3")(
      graft.ext.Classifier.train(pos, neg, "doc_id", "text", buckets = 4096, iters = 3))
    t("score (model fixed)")(noop(
      graft.ext.Classifier.score(docs, "doc_id", "text", m3)
        .agg(count(lit(1)).as("n"), sum(col("score")).as("s"))))
    println(s"model buckets touched: ${m3.w.size}, bias=${m3.bias} (i1 ${m1.bias})")
    spark.stop()
  }
}
