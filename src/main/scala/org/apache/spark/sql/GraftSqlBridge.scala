package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's `private[sql]` Expression↔Column conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Used by
  * graft.engine.SqlIncremental to re-anchor analyzed-plan expressions onto
  * circuit DataFrames. Kept to exactly two forwarders so the internal API
  * surface we depend on stays auditable. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
