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

  /** Collect a DataFrame's result on the driver in Catalyst's INTERNAL
    * row format (fresh UnsafeRow copies), plus the analyzed output
    * attributes. The public collect() + createDataFrame round trip
    * converts every row to an external Row and back — two full
    * driver-side conversions of the data that [[localDf]] skips.
    */
  def collectInternal(df: DataFrame): (Array[org.apache.spark.sql.catalyst.InternalRow],
      Seq[org.apache.spark.sql.catalyst.expressions.Attribute]) = {
    val qe = df.queryExecution
    (qe.executedPlan.executeCollect(), qe.analyzed.output)
  }

  /** Wrap driver-held internal rows (from [[collectInternal]]) as a
    * LocalRelation-backed DataFrame — the same plan shape
    * createDataFrame(list, schema) produces, minus the conversions.
    */
  def localDf(spark: SparkSession,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      rows: IndexedSeq[org.apache.spark.sql.catalyst.InternalRow]): DataFrame =
    ofRows(spark,
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(attrs, rows))

  /** Driver-side projection of internal rows to a named column subset,
    * as a LocalRelation DataFrame. A `.select` over a LocalRelation gets
    * eagerly evaluated by the optimizer's ConvertToLocalRelation with an
    * INTERPRETED projection (per row, per optimizer pass, and again per
    * AQE re-optimization) — this does it once, with a codegen'd
    * UnsafeProjection, before the plan exists.
    */
  def projectLocal(spark: SparkSession,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      rows: Array[org.apache.spark.sql.catalyst.InternalRow],
      names: Seq[String]): DataFrame = {
    val picked = names.map(n => attrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"projectLocal: no column $n")))
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(picked, attrs)
    val out = new Array[org.apache.spark.sql.catalyst.InternalRow](rows.length)
    var i = 0
    while (i < rows.length) { out(i) = proj(rows(i)).copy(); i += 1 }
    localDf(spark, picked.map(_.newInstance()), out)
  }

  /** Rename-only view over driver-held internal rows: attribute names are
    * plan metadata, so renaming columns of a LocalRelation is ZERO-COPY —
    * no projection runs at all (the Project-over-LocalRelation
    * alternative is eagerly evaluated row-by-row by the optimizer).
    * Fresh exprIds keep the result join-safe against other local frames
    * built from the same rows.
    */
  def renamedLocalDf(spark: SparkSession,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      rows: IndexedSeq[org.apache.spark.sql.catalyst.InternalRow],
      rename: String => String): DataFrame =
    localDf(spark, attrs.map(a => a.newInstance().withName(rename(a.name))), rows)

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
