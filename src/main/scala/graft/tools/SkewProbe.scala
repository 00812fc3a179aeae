package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val template = docs.orderBy("doc_id").limit(1)
      .select(col("text")).crossJoin(
        spark.range(10000).select((col("id") + 10000000L).as("doc_id")))
      .select(col("doc_id"), col("text"))
    val skewed = docs.select(col("doc_id"), col("text")).unionByName(template)
      .repartition(col("doc_id")).localCheckpoint()
    for (cap <- Seq(1024, Int.MaxValue)) {
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup.minhashLshPairs(skewed, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, threshold = 0.5, fast = true,
        maxBucket = cap).count()
      println(f"cap=$cap pairs=$n secs=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    spark.stop()
  }
}
