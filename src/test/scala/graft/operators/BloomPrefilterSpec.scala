package graft.operators

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPrefilterSpec extends SparkSpec {

  test("bloom filter has no false negatives over inserted keys") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 37 % 100000)
    val df = keys.toDF("k")
    val bloom = df.agg(GraftShim.bloomFilterAgg(col("k"), 10000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val misses = df
      .filter(!GraftShim.bloomMightContain(lit(bloom), col("k")))
      .count()
    assert(misses == 0, s"bloom dropped $misses genuinely-present keys")
  }

  test("bloom prefilter prunes most non-matching rows") {
    import spark.implicits._
    // keys 0..99 in the filter; probe 0..9999 → ~99% should be pruned
    val dim = (0L until 100L).toDF("k")
    val bloom = dim.agg(GraftShim.bloomFilterAgg(col("k"), 100L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val kept = (0L until 10000L).toDF("k")
      .filter(GraftShim.bloomMightContain(lit(bloom), col("k")))
      .count()
    assert(kept >= 100, "must keep all true members")
    assert(kept < 500, s"false-positive rate too high: kept $kept of 10000")
  }

  test("join_bloom_prefilter equals the plain join (bloom is semantics-free)") {
    val withBloom = Relational.joinBloomPrefilter(spark, sfDir)
    val plain = graft.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(
        graft.Tables(spark, sfDir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 150000)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"))
    assert(withBloom.exceptAll(plain).isEmpty &&
      plain.exceptAll(withBloom).isEmpty)
  }
}
