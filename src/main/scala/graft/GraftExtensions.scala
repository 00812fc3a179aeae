package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{HashExpressions, OptimizeSelfDot}

/** SparkSessionExtensions entry point: registers the graft native functions
  * (graft_minhash_bands, graft_simhash64, graft_dot) and the self-dot
  * optimizer rule. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    HashExpressions.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => OptimizeSelfDot)
  }
}
