package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** H4 `GraftExtensions` — registers the custom expressions as SQL
  * functions so `spark.sql("SELECT cosine_sim(a, b) ...")` works:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  */
object GraftExtensions {

  /** Register the same SQL functions on an existing session (the
    * extensions path below only applies at `SparkSession.builder()`
    * time).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.GraftShim.registerFunction
    registerFunction(spark, "cosine_sim", args => CosineSim(args(0), args(1)))
    registerFunction(spark, "jaccard_sim", args => JaccardSim(args(0), args(1)))
    registerFunction(spark, "simhash64", args => SimHash64(args(0)))
    registerFunction(spark, "minhash_sig", args =>
      MinHashSig(args(0), GraftExtensions.intLit(args(1), "minhash_sig")))
    registerFunction(spark, "rhp_sigs", args => RhpSigs(args(0),
      intLit(args(1), "rhp_sigs"), intLit(args(2), "rhp_sigs")))
    registerFunction(spark, "z_value", args => ZValue(args(0), args(1)))
    registerFunction(spark, "char_entropy", args => CharEntropy(args(0)))
    registerFunction(spark, "gram_upper",
      args => GramUpper(args(0)).toAggregateExpression())
    registerFunction(spark, "rolling_hash64", args => RollingHash64(args(0)))
    registerFunction(spark, "rolling_win_hashes", args =>
      RollingWinHashes(args(0), intLit(args(1), "rolling_win_hashes")))
    registerFunction(spark, "word_shingles", args =>
      WordShingles(args(0), intLit(args(1), "word_shingles")))
  }

  private[functions] def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  /** Enable the optimizer rewrites + planner strategies on a running
    * session: rank-filter → bounded-heap TopKPerGroup.
    */
  def registerOptimizations(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftShim.addStrategy(spark,
      graft.plans.GraftStrategies)
    org.apache.spark.sql.GraftShim.addOptimization(spark,
      graft.plans.RewriteRankFilterToTopK)
  }

  /** Undo [[registerOptimizations]] (specs use this for isolation). */
  def unregisterOptimizations(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftShim.removeOptimization(spark,
      graft.plans.RewriteRankFilterToTopK)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  import GraftExtensions.intLit

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[CosineSim]),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim", classOf[JaccardSim]),
      (args: Seq[Expression]) => JaccardSim(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", classOf[SimHash64]),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", classOf[MinHashSig]),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intLit(args(1), "minhash_sig"))))
    ext.injectFunction((FunctionIdentifier("rhp_sigs"),
      info("rhp_sigs", classOf[RhpSigs]),
      (args: Seq[Expression]) => RhpSigs(args(0),
        intLit(args(1), "rhp_sigs"), intLit(args(2), "rhp_sigs"))))
    ext.injectFunction((FunctionIdentifier("z_value"),
      info("z_value", classOf[ZValue]),
      (args: Seq[Expression]) => ZValue(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("char_entropy"),
      info("char_entropy", classOf[CharEntropy]),
      (args: Seq[Expression]) => CharEntropy(args(0))))
    ext.injectFunction((FunctionIdentifier("gram_upper"),
      info("gram_upper", classOf[GramUpper]),
      (args: Seq[Expression]) => GramUpper(args(0)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("rolling_hash64"),
      info("rolling_hash64", classOf[RollingHash64]),
      (args: Seq[Expression]) => RollingHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("rolling_win_hashes"),
      info("rolling_win_hashes", classOf[RollingWinHashes]),
      (args: Seq[Expression]) =>
        RollingWinHashes(args(0), intLit(args(1), "rolling_win_hashes"))))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", classOf[WordShingles]),
      (args: Seq[Expression]) =>
        WordShingles(args(0), intLit(args(1), "word_shingles"))))
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
  }
}
