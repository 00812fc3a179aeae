package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MonitorsSpec extends SparkSpec {

  test("quality metrics arrive with the action — no second scan") {
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang")).as("lang"))
    val (observed, obs) = Monitors.qualityMetrics(df, Seq("text", "lang"))
    val n = observed.count() // the ONE action
    val m = obs.get
    assert(m("n_rows") == n)
    assert(m("n_null_text") == 0L)
    assert(m("n_null_lang") == df.filter(col("lang").isNull).count())
    Monitors.expect(obs, "n_null_text")(_ == 0L)
    intercept[IllegalStateException] {
      Monitors.expect(obs, "n_null_lang")(_ == 0L)
    }
  }

  test("bounds metrics report the column envelope") {
    val (observed, obs) = Monitors.boundsMetrics(Tables.events(spark, sf), "value")
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val r = Tables.events(spark, sf)
      .agg(min(col("value")), max(col("value"))).head()
    assert(m("lo") == r.getDouble(0) && m("hi") == r.getDouble(1))
  }
}
