package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 hides the
  * Column(expr) constructor behind the connect/classic split; extension
  * libraries bridge it with a shim in the `org.apache.spark.sql`
  * package — this is the only file outside the `graft` namespace.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Register a function builder on an ALREADY-RUNNING session (the
    * `withExtensions` path only applies at session build time).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
