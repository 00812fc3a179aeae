package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Curation

/** Scratch profiler: cumulative stage timing of the b37 curation pipeline
  * (dev tool). Each configuration materializes twice; the second (warm)
  * number is printed.
  */
object ProfileCuration {
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
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      noop(f)
      val t0 = System.nanoTime(); noop(f)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(col("source") =!= "src0")
    val eval = docs.filter(col("source") === "src0").select(col("doc_id"), col("text"))

    t("quality only")(Curation.curate(train, "doc_id", "text", None,
      Curation.Config(exactDedup = false, nearDup = None, packTokens = None)))
    t("+exact dedup")(Curation.curate(train, "doc_id", "text", None,
      Curation.Config(nearDup = None, packTokens = None)))
    t("+near dup")(Curation.curate(train, "doc_id", "text", None,
      Curation.Config(packTokens = None)))
    t("+decontaminate")(Curation.curate(train, "doc_id", "text", Some(eval),
      Curation.Config(packTokens = None)))
    t("full (b37)")(Curation.curate(train, "doc_id", "text", Some(eval),
      Curation.Config(packTokens = Some(512))))
    spark.stop()
  }
}
