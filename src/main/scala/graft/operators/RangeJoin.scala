package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval × point range join via bin bucketing — the scale pattern for a
  * join whose only predicate is `start <= ts < end` (no equi key).
  *
  * Naive Spark plans this as a BroadcastNestedLoopJoin: |intervals| × |points|
  * condition evaluations — quadratic, and a single-task disaster once
  * neither side broadcasts. Binning converts it to an EQUI join: each
  * interval explodes into the fixed-width bins it overlaps, each point maps
  * to its one bin, the join runs hash/sort-merge on the bin id (one shuffle
  * each side, parallel by bin), and the exact range predicate refines the
  * bin matches. A (interval, point) pair meets in exactly ONE bin — the
  * point's — so no dedup is needed.
  *
  * Cost: |intervals| × (1 + span/width) exploded rows. Pick `binWidth` near
  * the typical interval length: much smaller → bin blowup on long
  * intervals; much larger → each bin degenerates toward the quadratic
  * check. Calendar-free arithmetic (epoch-micros division), so bins are
  * exact for any width.
  *
  * (The reference has no range join — SURVEY §2.3 "no theta/range joins";
  * this is part of the training-pipeline extension surface, e.g. events
  * within an exposure window, spans overlapping a time slice.)
  */
object RangeJoin {

  /** Join `intervals` (with `[startCol, endCol)` timestamp bounds) to
    * `points` (with `tsCol`): one output row per pair with
    * `start <= ts < end`. Columns from both sides survive; name collisions
    * are the caller's to avoid.
    */
  def binnedRangeJoin(
      intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, tsCol: String,
      binWidth: String = "1 hour"): DataFrame = {
    val widthUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(binWidth))
    require(widthUs.months == 0 && widthUs.days == 0,
      s"binWidth must be a sub-day duration, got '$binWidth'")
    val w = widthUs.microseconds
    require(w > 0, s"binWidth must be positive, got '$binWidth'")

    def bin(c: Column): Column = floor(unix_micros(c) / w)

    // Every bin the interval [start, end) overlaps; end is exclusive so the
    // last bin is the one containing end - 1µs. Corrupt rows with
    // end <= start are dropped up front: they can never satisfy
    // `ts >= start && ts < end`, and feeding them to `sequence` would
    // generate a DESCENDING bin list (spurious exploded rows, unbounded for
    // an end far before start).
    val binned = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(
          bin(col(startCol)),
          bin(timestamp_micros(unix_micros(col(endCol)) - 1L)))))
    val probe = points.withColumn("__bin", bin(col(tsCol)))

    binned.join(probe,
        binned("__bin") === probe("__bin") &&
          col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
