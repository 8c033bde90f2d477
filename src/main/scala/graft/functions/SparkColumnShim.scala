// Lives in org.apache.spark.sql to reach the private[sql] classic
// ExpressionUtils — the supported classic-mode bridge between a raw
// Catalyst Expression and the public Column API. Needed because
// graft.functions.TopCells carries a driver-collected centroid matrix,
// which cannot round-trip through the string-based function registry the
// other custom expressions use.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
