package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{BpeExpressions, HashExpressions, OptimizeSelfDot}
import graft.plans.TopKPerKey

/** SparkSessionExtensions entry point: registers the graft native functions
  * (graft_minhash_bands, graft_minhash_sig, graft_simhash64, graft_dot,
  * graft_bpe_token_count, graft_bpe_tokens, graft_lm_bits_per_token),
  * the self-dot optimizer rule, and the TopKPerKey planner strategy.
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    HashExpressions.registrations.foreach(ext.injectFunction)
    BpeExpressions.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => OptimizeSelfDot)
    ext.injectPlannerStrategy(_ => TopKPerKey.Strategy)
  }
}
