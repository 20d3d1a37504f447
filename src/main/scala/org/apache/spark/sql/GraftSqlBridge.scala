package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `private[sql]` surface that custom logical plans need: a
  * Dataset factory over an arbitrary `LogicalPlan` and Column →
  * catalyst-Expression conversion. The same pattern open-source Spark
  * extensions use for their custom operators (e.g. Qbeast's
  * `DatasetFactory` — see SNIPPETS.md [3]); Spark 4 keeps these
  * `private[sql]`, so the shim lives in this package and the rest of
  * graft stays in its own.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def addStrategy(spark: SparkSession, strategy: execution.SparkStrategy): Unit = {
    val s = spark.asInstanceOf[classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(strategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ strategy
  }
}
