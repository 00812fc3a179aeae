package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key as a first-class operator: logical node + planner
  * strategy + physical operator, registered through
  * `graft.GraftExtensions` (SURVEY §7.3 rung (c) — the whole-operator
  * extension path; as-of join deliberately stayed composed, this one
  * genuinely beats what built-ins express).
  *
  * The DataFrame formulation (`row_number().over(partitionBy(k).orderBy(o))
  * <= k`) must shuffle EVERY row to its key's partition and fully sort each
  * partition before it can discard anything. This operator instead keeps a
  * k-bounded heap per key on the MAP side, shuffles only the ≤ k survivors
  * per (partition, key), and re-heaps after the exchange — the same
  * partial/final shape as an aggregate, applied to row selection. At 100 TB
  * the shuffle volume drops from |input| to ≤ k·|keys|·|map partitions|,
  * and no full sort ever runs.
  *
  * Memory: one ≤ k-row heap per distinct key per task — the same residency
  * class as a hash aggregate over the same keys (no spill path; for
  * pathological key-cardinality-per-task regimes use the window
  * formulation).
  *
  * Reference semantics: labelspark has no such operator (it delegates all
  * relational work to Spark); this is part of the training-data-pipeline
  * extension surface (top-k docs per source by quality, top-k neighbours
  * per bucket, ...).
  */
object TopKPerKey {

  /** Logical node: `output` = child output, unchanged schema; only row
    * membership changes (≤ k rows per key, the first k under `ordering`).
    */
  case class TopKPerKeyNode(
      keys: Seq[Expression], ordering: Seq[SortOrder], k: Int, child: LogicalPlan)
      extends UnaryNode {
    require(k > 0, "k must be positive")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  /** Planner strategy: partial (map-side) exec → exchange (from the final
    * exec's required distribution, inserted by EnsureRequirements) → final
    * exec.
    */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(keys, ordering, k, child) =>
        val partial = TopKPerKeyExec(keys, ordering, k, partial = true, planLater(child))
        TopKPerKeyExec(keys, ordering, k, partial = false, partial) :: Nil
      case _ => Nil
    }
  }

  /** Physical operator: one pass, k-bounded heap per key. `partial = true`
    * runs on whatever distribution the child has (map-side pre-selection);
    * `partial = false` requires clustering by `keys` so each key's
    * survivors meet in one task.
    */
  case class TopKPerKeyExec(
      keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
      partial: Boolean, child: SparkPlan)
      extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def nodeName: String =
      if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    protected override def doExecute(): RDD[InternalRow] = {
      val keyExprs = keys
      val sortOrder = ordering
      val limit = k
      val childOutput = child.output
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        val cmp = RowOrdering.create(sortOrder, childOutput)
        // Max-heap in sort order: head = the worst retained row = eviction
        // candidate when a better row arrives.
        val evictionOrder = new java.util.Comparator[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
        }
        val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        while (iter.hasNext) {
          val row = iter.next() match {
            case u: UnsafeRow => u
            case r => toUnsafe(r)
          }
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[UnsafeRow](limit, evictionOrder)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < limit) heap.offer(row.copy())
          else if (cmp.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.offer(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          // Drain the max-heap back-to-front → per-key rows emit in sort
          // order (cheap determinism for the final phase; harmless partial).
          val out = new Array[UnsafeRow](heap.size)
          var i = heap.size - 1
          while (i >= 0) { out(i) = heap.poll(); i -= 1 }
          out.iterator
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)
  }

  // ----------------------------------------------------------- public API

  private def resolveAgainst(e: Expression, out: Seq[Attribute]): Expression =
    e.transformUp {
      case u: UnresolvedAttribute =>
        out.find(_.name.equalsIgnoreCase(u.name)).getOrElse(
          throw new IllegalArgumentException(
            s"topKPerKey: column '${u.name}' not in ${out.map(_.name).mkString(", ")}"))
    }

  /** First `k` rows per `keyCols` group under `orderBy` (e.g.
    * `Seq(col("score").desc, col("id"))`). Make the ordering total (add a
    * tiebreaker) for deterministic output. Schema is unchanged.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val keyExprs: Seq[Expression] = keyCols.map { n =>
      analyzed.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"topKPerKey: key column '$n' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    }
    val sortOrders = orderBy.map { c =>
      GraftSqlShims.expression(c) match {
        case so: SortOrder => so.copy(child = resolveAgainst(so.child, analyzed.output))
        case e => SortOrder(resolveAgainst(e, analyzed.output), Ascending)
      }
    }
    // Grouping compares keys by UnsafeRow bytes (and the exchange hashes
    // them), which would put -0.0 vs 0.0 and differing NaN bit patterns in
    // separate groups/partitions. Normalize like Spark's
    // NormalizeFloatingNumbers rule does for Aggregate/Join keys, so
    // float/double keys group identically to the groupBy/window formulation.
    val normalizedKeys = keyExprs.map(GraftSqlShims.normalizeFloats)
    GraftSqlShims.ofRows(df.sparkSession,
      TopKPerKeyNode(normalizedKeys, sortOrders, k, analyzed))
  }
}
