package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge: Spark 4 made these conversions
  * `private[sql]`, so extension libraries expose them from inside the
  * package — the standard pattern for custom-Expression integration. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a hand-constructed LogicalPlan (Spark 4 keeps
    * `Dataset.ofRows` `private[sql]`) — the entry point for custom logical
    * operators like graft.plans.AsOfJoin. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Apply an extensions object's function injections to a LIVE session —
    * lets tests exercise injection without building a second SparkContext
    * (extensions normally bind only at session build time). */
  def registerExtensionFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      session: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(session.sessionState.functionRegistry)
}
