package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Generic fixpoint iteration over a DataFrame — the reusable form of the
  * pattern [[graft.ext.Dedup.dupClusters]] and the q85 PageRank hand-roll:
  * Spark has no native iteration, and the naive `var df = step(df)` loop is
  * the classic scale bug — lineage doubles every round (the optimizer
  * re-plans an ever-growing tree, executors re-run every prior round) and
  * the convergence test usually costs an extra job per round.
  *
  * This operator packages the two fixes:
  *   - `localCheckpoint()` each round — lineage is cut, the next round
  *     plans against materialized partitions (cluster reality: shuffle
  *     files / storage-level blocks, not a driver collect);
  *   - convergence read from an `observe()` metric COLLECTED DURING the
  *     checkpoint materialization — zero additional jobs. The metric must
  *     be a deterministic aggregate of the state (a sum, a count, a hash
  *     sum): iteration stops when it repeats, or at `maxIters`.
  *
  * The cost model at 100 TB: each round is exactly one materialization of
  * `step`'s plan; nothing upstream is ever recomputed, and the driver
  * holds only the metric value.
  */
object Iterate {

  final case class Result(df: DataFrame, iterations: Int, converged: Boolean)

  /** Iterate `step` from `init` until the observed `metric` repeats or
    * `maxIters` rounds have run. The returned DataFrame is checkpointed
    * (safe to reuse in any number of downstream plans without replay).
    */
  def fixpoint(init: DataFrame, metric: Column, maxIters: Int)
      (step: DataFrame => DataFrame): Result = {
    require(maxIters >= 0, "maxIters must be non-negative")
    def materialize(df: DataFrame, round: Int): (DataFrame, Any) = {
      val obs = new Observation(s"graft_iterate_$round")
      val out = df.observe(obs, metric.as("m")).localCheckpoint()
      (out, obs.get("m"))
    }
    var (cur, prev) = materialize(init, -1)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val (next, m) = materialize(step(cur), it)
      cur = next
      converged = m == prev
      prev = m
      it += 1
    }
    Result(cur, it, converged)
  }

  /** Fixed-count iteration (no convergence metric): `n` checkpointed
    * rounds — the q85 shape, for algorithms with a known round budget.
    */
  def times(init: DataFrame, n: Int)(step: DataFrame => DataFrame): DataFrame = {
    require(n >= 0, "n must be non-negative")
    var cur = init.localCheckpoint()
    (0 until n).foreach(_ => cur = step(cur).localCheckpoint())
    cur
  }
}
