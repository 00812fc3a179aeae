package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for a single named query: times N materializations and
  * prints the formatted plan. Not part of the bench/verify surface.
  */
object ProfileQ11 {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q11_json_extract"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = (graft.SparkEntry.queries ++ graft.Bench.fastVariants)(name)
    val df = fn(spark, sfDir)
    df.explain("formatted")
    val passes = sys.env.getOrElse("PROFILE_PASSES", "6").toInt
    val times = (1 to passes).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[$name] pass $i: $t%.3f s")
      t
    }
    println(f"[$name] min: ${times.min}%.3f s")
    spark.stop()
  }
}
