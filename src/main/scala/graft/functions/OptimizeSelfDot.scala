package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `graft_dot(a, a)` → `graft_self_dot(a)` — one array pass
  * instead of two synchronized ones. Every cosine computes two norms, so
  * this halves the element accesses of the dominant term in similarity
  * scans. Semantically exact (same elementwise square, same fold order →
  * bit-identical doubles), hence safe under the DuckDB oracle.
  *
  * Injected via graft.GraftExtensions (injectOptimizerRule).
  */
object OptimizeSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HashExpressions.DotF64(a, b) if a.deterministic && a.semanticEquals(b) =>
        HashExpressions.SelfDotF64(a)
    }
}
