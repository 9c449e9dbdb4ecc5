package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bridge into `private[sql]` Column↔Expression converters — the same
  * pattern public Spark extension libraries use to expose custom
  * Catalyst expressions as Columns.
  */
object Shims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → catalyst conversion (the converter the classic
    * session applies at analysis): unlike [[expression]]'s lazy
    * wrapper, the returned tree is pattern-matchable immediately —
    * needed for plan-time predicate inspection outside any query.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Spark's own runtime-filter bloom aggregate (the expression
    * InjectRuntimeFilter builds), exposed as a Column: aggregates
    * xxhash64 of `c` into a serialized BloomFilter binary.
    */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(new XxHash64(Seq(expression(c))),
      Literal(estimatedItems), Literal(numBits), 0, 0)
      .toAggregateExpression())

  /** might_contain(serializedBloom, xxhash64(c)) — the probe side of
    * the runtime filter. No false negatives by construction.
    */
  def bloomMightContain(bloom: Array[Byte], c: Column): Column =
    column(BloomFilterMightContain(Literal(bloom, BinaryType),
      new XxHash64(Seq(expression(c)))))
}
