package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column.expr` / `ExpressionUtils` `private[sql]` (Connect
  * split); third-party expression libraries bridge from inside the
  * `org.apache.spark.sql` namespace — the standard extension-library shim.
  * Kept to exactly these two forwarders.
  */
object Shim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Register a custom expression on a LIVE session (builder.withExtensions
    * only applies to newly-created sessions; this is the runtime path). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
