package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into `private[sql]` Column↔Expression conversion (Spark 4 wraps
 * Columns in ColumnNodes; `classic.ExpressionUtils` does the plumbing but
 * is sql-package-private). Lives in org.apache.spark.sql purely to widen
 * access for graft's custom Catalyst expressions.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. [[expression]] wraps node-built
    * Columns in a LAZY `ColumnNodeExpression` that only converts at
    * plan-boundary positions; embedded in an arbitrary expression slot
    * (a SQL-registered composed function under field extraction, say) it
    * reports VOID and fails analysis. This converts the node tree to a
    * plain Catalyst expression up front. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Apply an extensions object's injected functions onto a registry
    * (`registerFunctions` is also sql-private) — lets tests confirm what a
    * `spark.sql.extensions`-built session would register. */
  def applyFunctions(ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)
}
