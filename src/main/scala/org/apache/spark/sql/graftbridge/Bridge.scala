package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: building a DataFrame from a custom
  * LogicalPlan needs `Dataset.ofRows`, which Spark scopes to its own
  * package — the standard extension-library pattern (Delta, Sedona, etc.
  * ship the same shim) is one forwarding object inside
  * `org.apache.spark.sql`. Nothing else in the engine lives outside
  * `graft.*`. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Parse a SQL expression string to a catalyst Expression (Spark 4's
    * Column wraps a lazily-converted ColumnNode, so going through the
    * parser is the reliable way to obtain a transformable tree). */
  def parseExpression(spark: SparkSession, sql: String): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parseExpression(sql)
}
