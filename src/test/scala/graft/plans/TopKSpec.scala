package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  test("custom TopK matches the window row_number spelling exactly") {
    val viaPlan = TopKOps.topkPerGroup(spark, sfDir)
      .collect().map(_.toString).sorted
    val viaWindow = graft.operators.Windowed.rankTopN(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(viaPlan.nonEmpty)
    assert(viaPlan.toSeq == viaWindow.toSeq)
  }

  test("physical plan: partial top-k before the exchange, no full sort") {
    val p = TopKOps.topkPerGroup(spark, sfDir)
      .queryExecution.executedPlan.toString
    val partialIdx = p.lastIndexOf("+- TopK")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(partialIdx >= 0 && exchangeIdx >= 0)
    // plan prints top-down: the partial TopK sits BELOW the exchange
    assert(partialIdx > exchangeIdx,
      s"partial TopK must run map-side before the shuffle\n$p")
    // the only Sort allowed is the final presentation orderBy
    assert(p.linesIterator.count(_.contains("Sort [")) <= 1,
      s"bounded-heap top-k must not sort the data\n$p")
  }

  test("optimizer rule rewrites rank-filter windows into TopK automatically") {
    graft.functions.GraftExtensions.registerOptimizations(spark)
    try {
      // the plain window spelling (B9), untouched user code
      val df = graft.operators.Windowed.rankTopN(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("TopKPerGroup"),
        s"rank<=k filter over row_number window should rewrite\n$plan")
      assert(!plan.contains("Window "), "window should be gone")
      // and the rewrite preserves results exactly
      val rewritten = df.collect().map(_.toString).sorted.toSeq
      graft.functions.GraftExtensions.unregisterOptimizations(spark)
      val original = graft.operators.Windowed.rankTopN(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(rewritten == original)
    } finally graft.functions.GraftExtensions.unregisterOptimizations(spark)
  }

  test("rule leaves non-top-k windows alone") {
    graft.functions.GraftExtensions.registerOptimizations(spark)
    try {
      // running_sum has a window but no rank filter — must not rewrite
      val p = graft.operators.Windowed.runningSum(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("TopKPerGroup"))
    } finally graft.functions.GraftExtensions.unregisterOptimizations(spark)
  }

  test("k larger than any group returns whole groups, ranked") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 30.0), (2L, 20.0)).toDF("g", "v")
    val out = TopKOps.topK(df, Seq("g"), Seq("v" -> false), k = 5)
      .select("g", "v", "rank")
      .as[(Long, Double, Int)].collect().toSet
    assert(out == Set((1L, 30.0, 1), (1L, 10.0, 2), (2L, 20.0, 1)))
  }

  test("ties broken by the declared tiebreak column, rank is dense 1..k") {
    import spark.implicits._
    val df = Seq((1L, 5.0, "a"), (1L, 5.0, "b"), (1L, 5.0, "c"))
      .toDF("g", "v", "t")
    val out = TopKOps.topK(df, Seq("g"),
        Seq("v" -> false, "t" -> true), k = 2)
      .select("t", "rank").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("b", 2)))
  }
}
