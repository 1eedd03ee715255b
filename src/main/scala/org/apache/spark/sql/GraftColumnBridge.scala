package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Expression <-> Column converters (Spark 4
  * moved Column off Expression; `classic.ExpressionUtils` is
  * private[sql]). Same technique as the reference's internal-package
  * accessor (org/apache/spark/sql/execution/datasources/
  * PartitionMetadataExtractor.scala:13-52): a minimal shim in the sql
  * package, everything else stays in graft.*.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
