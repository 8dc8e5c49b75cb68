package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and catalyst Expressions.
  *
  * Spark 4's Column (sql-api) no longer wraps a catalyst Expression
  * directly; the converters live in `classic.ExpressionUtils`, which is
  * private[sql]. This tiny shim — the standard pattern for third-party
  * Catalyst extensions — re-exports just the two conversions the graft
  * custom expressions need.
  */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a custom Expression under a SQL function name so
    * spark.sql text can call it (the reference's SQL front-end reaches
    * the same custom operators as the DataFrame API). */
  def registerExpression(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
