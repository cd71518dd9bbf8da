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

  /** Build a DataFrame from a custom LogicalPlan (runs full analysis). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def logicalPlan(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently add a planner strategy to a running session. */
  def addStrategy(spark: SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }

  /** Idempotently add / remove an optimizer rule on a running session. */
  def addOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(r)) {
      exp.extraOptimizations = exp.extraOptimizations :+ r
    }
  }

  /** Distributed Bloom-filter build: merges per-partition sketches into
    * one binary (the same `BloomFilterAggregate` Spark's own
    * InjectRuntimeFilter rule uses; values are xxhash64-ed first, the
    * pairing `bloomMightContain` expects).
    */
  def bloomFilterAgg(c: Column, expectedItems: Long): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(expression(c))),
        expectedItems).toAggregateExpression())

  /** Codegen'd membership probe against a literal Bloom-filter binary
    * produced by [[bloomFilterAgg]].
    */
  def bloomMightContain(bloomBinary: Column, c: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      expression(bloomBinary),
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(expression(c)))))

  /** Block until the listener bus has delivered all queued events —
    * needed for exact before/after task-metric snapshots around an
    * action (`listenerBus` is `private[spark]`, hence here).
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** SQL-operator attribution for a completed stage: the distinct RDD
    * operation-scope names inside it, innermost first (e.g.
    * "Exchange < WholeStageCodegen (3) < Scan parquet"). Under AQE the
    * stage CALLSITE is always `withThreadLocalCaptured at
    * CompletableFuture` — useless for plan audits — while the RDD
    * scopes still carry the physical operator names.
    * (`RDDOperationScope` is `private[spark]`, hence here.)
    */
  def stageScopeNames(
      si: org.apache.spark.scheduler.StageInfo): Seq[String] = {
    val names = si.rddInfos.sortBy(-_.id)
      .flatMap(_.scope).map(_.name)
    names.distinct.take(4).toSeq
  }

  def removeOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == r)
  }
}
