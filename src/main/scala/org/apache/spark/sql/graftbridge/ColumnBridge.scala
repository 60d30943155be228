package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for building a [[Column]] directly from a Catalyst
  * [[Expression]] (and back) without going through the session
  * function registry — Spark 4 gates `ExpressionUtils` as
  * private[sql], so this one-file bridge lives under the sql package
  * (the standard extension-library pattern). Used for native
  * expressions that must be constructible from pure-column helpers
  * with no SparkSession in scope (TextFns.h60). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
