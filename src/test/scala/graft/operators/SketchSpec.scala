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

  test("hll_overlap tracks the exact audience intersection") {
    val r = Relational.hllOverlap(spark, sfDir).collect()(0)
    val users = Tables(spark, sfDir, "events")
      .filter(col("event_type").isin("view", "purchase"))
    val a = users.filter(col("event_type") === "view")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val b = users.filter(col("event_type") === "purchase")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val exact = (a & b).size
    val est = r.getAs[Long]("approx_overlap")
    // three ±1.6%-ish estimates compound through the subtraction; the
    // bound scales with the UNION size (the error base), not the
    // intersection
    val slack = math.max(5L, ((a | b).size * 0.08).toLong)
    assert(math.abs(est - exact) <= slack,
      s"overlap estimate $est vs exact $exact (slack $slack)")
    assert(r.getAs[Long]("approx_union") <=
      r.getAs[Long]("approx_a") + r.getAs[Long]("approx_b"))
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
