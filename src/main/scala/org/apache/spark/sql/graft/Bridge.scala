package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge.
  *
  * Spark 4 made `Column` representation-agnostic; the converters live
  * in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This object sits in an `org.apache.spark.sql`
  * subpackage solely to re-export the two converters to graft's
  * custom expressions (the sanctioned pattern for Catalyst-level
  * extensions without a SparkSessionExtensions round-trip).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
