package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: compare JSON-extraction formulations for q11. */
object ProfileJson {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.events(spark, sfDir)

    def variant(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name] min ${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(" ")})")
    }

    variant("current: 2x get_json_object") {
      ev.select(col("event_type"),
          when(get_json_object(col("props"), "$").isNotNull, 1L).otherwise(0L).as("valid"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("valid").as("n_valid"), sum("k").as("sum_k"), round(avg("k"), 4).as("avg_k"))
    }
    variant("1x get_json_object($.k), valid via $") {
      ev.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          when(get_json_object(col("props"), "$").isNotNull, 1L).otherwise(0L).as("valid"))
        .groupBy("event_type")
        .agg(sum("valid").as("n_valid"), sum("k").as("sum_k"), round(avg("k"), 4).as("avg_k"))
    }
    variant("from_json struct") {
      ev.select(col("event_type"),
          from_json(col("props"), "k LONG", Map("mode" -> "FAILFAST").filter(_ => false)).as("j"))
        .select(col("event_type"), col("j.k").as("k"),
          when(col("j").isNotNull, 1L).otherwise(0L).as("valid"))
        .groupBy("event_type")
        .agg(sum("valid").as("n_valid"), sum("k").as("sum_k"), round(avg("k"), 4).as("avg_k"))
    }
    variant("variant: try_parse_json + variant_get") {
      ev.select(col("event_type"), try_parse_json(col("props")).as("v"))
        .select(col("event_type"),
          when(col("v").isNotNull, 1L).otherwise(0L).as("valid"),
          expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(sum("valid").as("n_valid"), sum("k").as("sum_k"), round(avg("k"), 4).as("avg_k"))
    }
    spark.stop()
  }
}
