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

  /** Like [[registerExpression]] but arity-checked: a SQL call with the
    * wrong argument count raises a clear analysis-time error instead of
    * silently ignoring extras (or an IndexOutOfBounds from the builder). */
  def registerExpression(spark: SparkSession, name: String, arity: Int,
      builder: Seq[Expression] => Expression): Unit =
    registerExpression(spark, name, exprs => {
      // builders run during analysis, so this surfaces as an analysis
      // failure with the function name and both counts in the message
      if (exprs.length != arity) throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name: " +
          s"expected $arity, got ${exprs.length}")
      builder(exprs)
    })

  /** The analyzed logical plan behind a DataFrame — the input a custom
    * logical operator wraps. */
  def analyzedPlan(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame (classic.Dataset.ofRows
    * is private[sql]; this shim is the sanctioned third-party seam). */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to the session (the runtime
    * twin of SparkSessionExtensions.injectPlannerStrategy, for sessions
    * built without the extension config). */
  def addStrategy(spark: SparkSession,
      strategy: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    // the contains/append pair is a read-modify-write on shared session
    // state; unsynchronized, two concurrent callers can lose or double
    // a registration
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy))
        exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
