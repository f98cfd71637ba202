package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Thin accessors for `private[sql]` Spark APIs the graft SQL layer
  * needs: running a hand-built logical plan and wrapping raw Catalyst
  * expressions as Columns. Lives under org.apache.spark.sql for
  * visibility only — no Spark internals are modified (the reference's
  * Spark module sits inside org.apache.spark.sql the same way).
  */
object Shims {

  /** DataFrame over an arbitrary (possibly unresolved) logical plan —
    * the plan goes through the full analyzer.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a Catalyst expression (resolved or not) as a user-facing
    * Column.
    */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a user-facing Column (inverse of
    * [[column]]).
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** If `c` is a plain `desc` (nulls last) sort order, the ordered child
    * column; None for any other shape. Lets callers rewrite a
    * newest-first ranking as a max_by over the children (Spark 4 models
    * sort order as a private[sql] ColumnNode, hence the shim).
    */
  def descNullsLastChild(c: Column): Option[Column] = c.node match {
    case org.apache.spark.sql.internal.SortOrder(child,
        org.apache.spark.sql.internal.SortOrder.Descending,
        org.apache.spark.sql.internal.SortOrder.NullsLast, _) =>
      Some(new Column(child))
    case _ => None
  }

  /** Rebind a streaming micro-batch DataFrame as a batch DataFrame so the
    * batch writer can run normal actions on it (the standard V1 sink
    * pattern — the incremental plan's rows are re-wrapped, not copied).
    */
  def asBatchDf(data: DataFrame): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }

  /** Wrap a batch DataFrame's rows as a streaming DataFrame (what a V1
    * Source.getBatch must return).
    */
  def asStreamingDf(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
