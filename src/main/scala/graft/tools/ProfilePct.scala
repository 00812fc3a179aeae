package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B: builtin exact `percentile` aggregate vs the decomposed
  * ExactPercentile, interleaved passes (noisy-neighbor VM — see memory
  * notes), min reported.
  */
object ProfilePct {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def builtin(): DataFrame =
      graft.Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"))

    def decomposed(): DataFrame =
      graft.operators.ExactPercentile.groupedPercentiles(
        graft.Tables.lineitem(spark, dir).select(col("l_returnflag"), col("l_extendedprice")),
        Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both
    time(builtin); time(decomposed)
    val samples = (1 to 5).map { _ => (time(builtin), time(decomposed)) }
    println(f"builtin    min ${samples.map(_._1).min}%.3f  all ${samples.map(s => f"${s._1}%.2f").mkString(",")}")
    println(f"decomposed min ${samples.map(_._2).min}%.3f  all ${samples.map(s => f"${s._2}%.2f").mkString(",")}")
    spark.stop()
  }
}
