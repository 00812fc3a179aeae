package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.FreqSketch

/** Per-group trending tokens over an UNBOUNDED stream with BOUNDED state —
  * the streaming form of q120's Misra-Gries aggregate: each group keeps
  * ONE MG summary (≤ `capacity` counters, no per-token row ever exists)
  * in `flatMapGroupsWithState` state, folds every micro-batch's text in
  * (tokenization inside the fold, the [[FreqSketch]] discipline), and
  * emits the group's current top-`k` snapshot per trigger — so a
  * dashboard reads trending terms with state and output both bounded by
  * `capacity × groups` no matter how much text ever streamed.
  *
  * Guarantees are the classic MG ones over the CUMULATIVE stream (the
  * state round-trips the exact buffer, so folding batch-by-batch equals
  * one batch pass): tokens with true frequency > N/capacity are retained,
  * counts are never above truth and within N/capacity below; vocabulary
  * ≤ capacity ⇒ exact. Update output mode; groups silent in a trigger
  * emit nothing that trigger.
  */
object HeavyHittersStream {

  final case class HHState(counts: Map[String, Long])
  final case class HHRow(group: String, token: String, cnt: Long)

  def topTokens(docs: DataFrame, groupCol: String, textCol: String,
      capacity: Int, k: Int): Dataset[HHRow] = {
    require(capacity > 0 && k > 0, s"capacity/k must be positive, got $capacity/$k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(groupCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[HHState]) =>
          val buf = new FreqSketch.MGBuffer(capacity)
          state.getOption.foreach(_.counts.foreach { case (t, c) =>
            buf.counts.put(t, c) })
          rows.foreach { case (_, text) =>
            if (text != null) buf.addText(UTF8String.fromString(text)) }
          import scala.jdk.CollectionConverters._
          val m = buf.counts.asScala.toMap
          state.update(HHState(m))
          m.toSeq.sortBy { case (t, c) => (-c, t) }.take(k).iterator
            .map { case (t, c) => HHRow(g, t, c) }
      }
  }
}
