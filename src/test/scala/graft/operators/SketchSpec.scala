package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SketchSpec extends SparkSpec {

  test("agg_hll_partial estimates within 5% of exact distinct counts") {
    val est = Relational.aggHllPartial(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: estimate $e too far from exact $n")
    }
  }

  test("merging daily HLL partials equals sketching the whole range") {
    import graft.functions.HllSketch._
    val ev = Tables(spark, sfDir, "events")
    val merged = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hllAgg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hllEstimate(hllMerge(col("sk"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev
      .groupBy(col("event_type"))
      .agg(hllEstimate(hllAgg(col("user_id"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // register max is associative ⇒ merged partials = the direct sketch
    assert(merged == direct)
  }

  test("agg_approx_distinct estimate is within 5% of exact per group") {
    val est = Relational.aggApproxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: estimate $e too far from exact $n")
    }
  }
}
