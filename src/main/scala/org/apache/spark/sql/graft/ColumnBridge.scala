package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Catalyst ↔ public-API bridge: `ExpressionUtils.column` is
  * `private[sql]`, so the one place the engine must wrap an analyzer-built
  * Catalyst expression into a user-facing [[Column]] (the SQL UPDATE
  * command's assignments/condition) goes through this shim — the standard
  * Spark-extension pattern (Delta, Iceberg, and most connectors ship the
  * same few lines) rather than a lossy `expr(e.sql)` re-parse.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The reverse direction — a [[Column]]'s Catalyst expression (for
    * engine-built expressions over user-facing columns, e.g. the
    * deletion-vector probe).
    */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an analyzer-built logical plan back into a [[DataFrame]]
    * (`Dataset.ofRows` is `private[sql]`) — used by the MERGE
    * schema-evolution command to execute its already-resolved source plan
    * through the warehouse write path.
    */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
