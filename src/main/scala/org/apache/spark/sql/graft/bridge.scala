package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's public Column no longer exposes its
  * Catalyst expression; the conversion lives in the sql-private classic
  * module, so this shim sits inside the org.apache.spark.sql package — the
  * standard pattern for Catalyst-level extensions built against Spark's
  * public jars. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
