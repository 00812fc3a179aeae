package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` constructor surface: wrapping a custom
  * [[LogicalPlan]] node back into a public DataFrame requires
  * `Dataset.ofRows`, which Spark scopes to its own package. This object is
  * the single, minimal crossing point — graft code never touches other
  * internals through it.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The (possibly unresolved) Catalyst expression behind a public Column —
    * eagerly converted (ExpressionUtils.expression returns a lazy
    * ColumnNodeExpression wrapper that pattern matches as nothing useful).
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a raw Catalyst expression back into a public Column (the inverse
    * of [[expression]]) — needed for expressions Spark ships but does not
    * expose through `functions` (e.g. the runtime-filter bloom pair).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Wrap an `InternalRow` RDD as a STREAMING DataFrame — the shape a v1
    * streaming [[org.apache.spark.sql.execution.streaming.Source]] must
    * return from `getBatch` (MicroBatchExecution asserts
    * `isStreaming = true` on the returned plan). The RDD is typically a
    * batch query's `queryExecution.toRdd`, which keeps the batch lazy:
    * nothing runs until the micro-batch itself executes.
    */
  def streamingDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Spark's floating-point key normalization (-0.0 → 0.0, canonical NaN),
    * applied to Aggregate/Join/Window keys by the NormalizeFloatingNumbers
    * rule — custom operators that group or hash-partition on raw
    * expressions need the same treatment, and the method is
    * `private[sql]`.
    */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
