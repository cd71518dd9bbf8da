package graft


import org.apache.spark.sql.functions._

/** SURVEY §5's co-location claim, proven: bucketing both sides of a
  * recurring join key eliminates the join shuffle entirely. At 100 TB
  * this is the difference between re-shuffling the fact table on every
  * query and shuffling once at ingest.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero exchanges") {
    val orders = Tables(spark, sfDir, "orders")
    val lineitem = Tables(spark, sfDir, "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      // at sf0.001 the dim side would broadcast; force the shuffle-join
      // path the bucketing is there to eliminate at scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("v"))

      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBeforeAgg = plan.linesIterator
        .takeWhile(!_.contains("SortMergeJoin"))
        .count(_.contains("Exchange"))
      assert(plan.contains("SortMergeJoin"), plan)
      // the join itself must be exchange-free (bucket co-location);
      // only the tiny post-join agg may shuffle
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle\n$plan")

      // and it computes the same result as the unbucketed join
      val expected = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("v"))
        .collect().map(_.toString).sorted.toSeq
      assert(joined.collect().map(_.toString).sorted.toSeq == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
