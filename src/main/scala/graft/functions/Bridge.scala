package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` onto ColumnNode; catalyst `Expression`s cross the
  * boundary through `classic.ExpressionUtils`, which is `private[sql]` — so
  * this one-file shim lives under org.apache.spark.sql to reach it (the
  * standard extension-library technique; everything else in this repo stays
  * in the graft namespace).
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
