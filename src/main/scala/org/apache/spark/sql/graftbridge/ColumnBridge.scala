package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column API no longer exposes an Expression constructor
  * publicly; `classic.ExpressionUtils.column` is `private[sql]`. This
  * shim lives in a subpackage of org.apache.spark.sql solely to bridge
  * graft's custom Catalyst expressions into DataFrame code — no Spark
  * internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
