package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost pipeline observability: `observe()` metrics ride INSIDE the
  * job that materializes the DataFrame — row counts, null rates, and value
  * bounds arrive with the action's result, without a second scan. At 100 TB
  * a separate `df.count()` / `df.filter(isnull).count()` validation pass
  * doubles the pipeline's cost; an observation is free.
  *
  * Usage:
  * {{{
  *   val (observed, obs) = Monitors.qualityMetrics(df, Seq("text", "lang"))
  *   observed.write.parquet(out)         // any action
  *   val m = obs.get                     // metrics of THAT action
  *   m("n_rows"); m("n_null_text")
  * }}}
  */
object Monitors {

  /** Attach row-count + per-column null-count metrics. Returns the observed
    * frame (plan-identical rows) and the handle the metrics arrive on.
    */
  def qualityMetrics(df: DataFrame, nullCheckCols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation()
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        nullCheckCols.map(c => count(when(col(c).isNull, lit(1))).as(s"n_null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Attach numeric bounds metrics (min/max/mean) for one column. */
  def boundsMetrics(df: DataFrame, valueCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    (df.observe(obs,
      min(col(valueCol)).as("lo"),
      max(col(valueCol)).as("hi"),
      avg(col(valueCol)).as("mean")), obs)
  }

  /** Enforce an expectation after the action ran: throws with a clear
    * message if the observed metric violates `check`. Keeps the contract
    * "validation never re-reads the data".
    */
  def expect(obs: Observation, metric: String)(check: Any => Boolean): Unit = {
    val v = obs.get.getOrElse(metric,
      throw new IllegalStateException(s"metric $metric not observed"))
    if (!check(v))
      throw new IllegalStateException(s"expectation failed on $metric = $v")
  }
}
