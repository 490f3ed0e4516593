package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters, needed to
  * expose custom Catalyst expressions (graft.functions.FoldDotProduct) as
  * user-facing Columns on Spark 4's ColumnNode API. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` on Spark 4; expressions outside
    * the spark package need this alias to declare `inputTypes`. */
  type AbsDataType = org.apache.spark.sql.types.AbstractDataType

  /** Register a custom expression as a SQL-callable temp function
    * (sessionState is private[sql]). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
