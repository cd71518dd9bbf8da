package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining TPC-H query shapes (SURVEY.md §2.B), adapted to the
  * test schema: there is no `partsupp` table and no commit/receipt date
  * pair, so Q2/Q11/Q16/Q20 derive the part–supplier catalog from
  * lineitem history and Q12/Q21 define lateness as ship-lag against
  * `o_orderdate`. Every adaptation keeps the ORIGINAL query's plan
  * shape — correlated min (Q2), market-share ratio (Q8), per-nation
  * profit (Q9), scalar-threshold fraction (Q11), conditional class
  * counts (Q12), scalar-max view (Q15), excluded-supplier distinct
  * count (Q16), correlated avg (Q17), disjunctive predicate push
  * (Q19), chained semi joins (Q20), only-late-supplier logic (Q21),
  * anti join + scalar avg threshold (Q22) — because the plan shape,
  * not the literal predicate, is what exercises the optimizer.
  *
  * House rules: money math accumulates in decimal(18,4) (exact,
  * order-independent) and rounds before any ratio; every ordering has
  * a deterministic tie-break; dims broadcast; fact-side filters sit
  * directly on the scan so they reach PushedFilters.
  */
object TpchExtra {

  private def rev: org.apache.spark.sql.Column =
    (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")

  /** `q2_min_cost_supp` — TPC-H Q2 shape (correlated MIN subquery).
    * The part–supplier "catalog" is derived from lineitem history:
    * cost(part, supplier) = min observed unit price. For LARGE parts
    * of size 15 and suppliers in EUROPE, keep the supplier(s) hitting
    * the per-part minimum cost. The catalog build is one
    * (partkey, suppkey) shuffle; the correlated min is a window over
    * the already-aggregated catalog (no second scan); dims broadcast.
    */
  def q2MinCostSupp(spark: SparkSession, dir: String): DataFrame =
    q2MinCostSuppOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"), Tables(spark, dir, "region"), Tables(spark, dir, "part"))

  /** [[q2MinCostSupp]]'s kernel on caller lineitem/supplier/nation/region/part frames. */
  def q2MinCostSuppOf(li: DataFrame, sup: DataFrame, nation: DataFrame, region: DataFrame, partTbl: DataFrame): DataFrame = {
    val cat = li
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(round(min(col("l_extendedprice") / col("l_quantity")), 2)
        .as("cost"))
    val nat = nation
    val reg = region.filter(col("r_name") === "EUROPE")
    val part = partTbl
      .filter(col("p_size") <= 25 && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_name"))
    val euCat = cat
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val wMin = Window.partitionBy(col("l_partkey"))
    euCat
      .withColumn("min_cost", min(col("cost")).over(wMin))
      .filter(col("cost") === col("min_cost"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** `q8_market_share` — TPC-H Q8: NATION_0's share of ECONOMY-part
    * revenue delivered into AMERICA, by order year. Both nation roles
    * and the region broadcast; the share is a conditional-sum ratio
    * computed in one aggregation pass (numerator and denominator are
    * rounded before dividing so both engines divide identical cents).
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame =
    q8MarketShareOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"), Tables(spark, dir, "part"), Tables(spark, dir, "customer"), Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"), Tables(spark, dir, "region"))

  /** [[q8MarketShare]]'s kernel on caller lineitem/orders/part/customer/supplier/nation/region frames. */
  def q8MarketShareOf(li: DataFrame, orders: DataFrame, partTbl: DataFrame, cust: DataFrame, sup: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val part = partTbl
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val natC = nation
      .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
    val regA = region
      .filter(col("r_name") === "AMERICA")
    val natS = nation
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natC), col("c_nationkey") === col("c_nkey"))
      .join(broadcast(regA), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(natS), col("s_nationkey") === col("s_nkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_0", rev)
          .otherwise(lit(0).cast("decimal(18,4)"))), 2).cast("double")
          .as("nation_revenue"),
        round(sum(rev), 2).cast("double").as("total_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") / col("total_revenue"), 4))
      .orderBy(col("o_year"))
  }

  /** `q9_profit` — TPC-H Q9 shape: profit per supplier nation per
    * order year over 'red' parts. Without `ps_supplycost`, cost is
    * proxied as half the part's retail price per unit; profit stays a
    * decimal-exact expression per lineitem, summed then rounded. The
    * part filter prunes the fact stream via broadcast before the
    * orderkey shuffle.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame =
    q9ProfitOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"), Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"), Tables(spark, dir, "part"))

  /** [[q9Profit]]'s kernel on caller lineitem/orders/supplier/nation/part frames. */
  def q9ProfitOf(li: DataFrame, orders: DataFrame, sup: DataFrame, nation: DataFrame, partTbl: DataFrame): DataFrame = {
    val ord = orders
    val nat = nation
    val part = partTbl
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val profit = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)") -
      (col("p_retailprice") * lit(0.5) * col("l_quantity"))
        .cast("decimal(18,4)")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(profit), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** `q11_important_stock` — TPC-H Q11 shape (scalar-fraction
    * threshold): per-part revenue through EUROPE suppliers, keeping
    * parts above 0.1% of the region's total. (Region, not single
    * nation: the sf0.001 supplier table has 10 rows across 25
    * nations, so any one nation can be supplier-less.) The total is a
    * one-row broadcast (scalar subquery); both sides of the comparison
    * come from the same decimal-exact per-part frame, so the threshold
    * filter is engine-stable.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame =
    q11ImportantStockOf(Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"), Tables(spark, dir, "region"), Tables(spark, dir, "lineitem"))

  /** [[q11ImportantStock]]'s kernel on caller supplier/nation/region/lineitem frames. */
  def q11ImportantStockOf(sup: DataFrame, nation: DataFrame, region: DataFrame, li: DataFrame): DataFrame = {
    val nat = nation
      .join(broadcast(region
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val perPart = li
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(rev).as("value_d"))
    val total = perPart.agg(sum(col("value_d")).as("total_d"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_d").cast("double") >
        col("total_d").cast("double") * 0.001)
      .select(col("l_partkey").as("p_partkey"),
        round(col("value_d"), 2).cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** `q12_shipmode` — TPC-H Q12 shape: without `l_shipmode`, lineitems
    * class into ship-lag buckets (days between order and ship date);
    * per bucket, count critical- vs normal-priority orders. One
    * orderkey join, conditional counts in a single aggregation; the
    * 1996 ship-year filter sits on the fact scan.
    */
  def q12Shipmode(spark: SparkSession, dir: String): DataFrame =
    q12ShipmodeOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"))

  /** [[q12Shipmode]]'s kernel on caller lineitem/orders frames. */
  def q12ShipmodeOf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val ord = orders
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_mode",
        when(lag >= 60, "SLOW").when(lag >= 30, "MEDIUM").otherwise("FAST"))
      .groupBy(col("ship_mode"))
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_mode"))
  }

  /** `q15_top_supplier` — TPC-H Q15: revenue per supplier for Q1 1996
    * (the "revenue view"), then the supplier(s) matching the global
    * max. The max is a window over the already-aggregated per-supplier
    * frame — the scalar-subquery shape without a second scan — and
    * equality is tested on the rounded cents both engines agree on.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame =
    q15TopSupplierOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "supplier"))

  /** [[q15TopSupplier]]'s kernel on caller lineitem/supplier frames. */
  def q15TopSupplierOf(lineitem: DataFrame, sup: DataFrame): DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val perSupp = li.groupBy(col("l_suppkey"))
      .agg(round(sum(rev), 2).cast("double").as("total_revenue"))
    val maxRev = perSupp.agg(max(col("total_revenue")).as("max_rev"))
    perSupp.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** `q16_parts_supp` — TPC-H Q16 shape: distinct supplier counts per
    * (brand, type, size) for a filtered part family, excluding
    * deadbeat suppliers (negative balance — the "complaints" stand-in).
    * The part–supplier pairs come from lineitem; the exclusion list is
    * a broadcast anti join BEFORE the distinct aggregation so excluded
    * rows never shuffle.
    */
  def q16PartsSupp(spark: SparkSession, dir: String): DataFrame =
    q16PartsSuppOf(Tables(spark, dir, "part"), Tables(spark, dir, "supplier"), Tables(spark, dir, "lineitem"))

  /** [[q16PartsSupp]]'s kernel on caller part/supplier/lineitem frames. */
  def q16PartsSuppOf(partTbl: DataFrame, sup: DataFrame, li: DataFrame): DataFrame = {
    val part = partTbl
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSupp = sup
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    li
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** `q17_small_qty` — TPC-H Q17: revenue impact of small-quantity
    * orders for one brand, where "small" is relative to the part's own
    * average quantity (the correlated-avg shape). The per-part average
    * is computed once on the brand-pruned fact slice and joined back —
    * two passes over a 1/25 slice, not a correlated rescan per row.
    * Quantities are small integers so the 0.2·avg threshold is exact
    * in both engines.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame =
    q17SmallQtyOf(Tables(spark, dir, "part"), Tables(spark, dir, "lineitem"))

  /** [[q17SmallQty]]'s kernel on caller part/lineitem frames. */
  def q17SmallQtyOf(partTbl: DataFrame, lineitem: DataFrame): DataFrame = {
    val part = partTbl
      .filter(col("p_brand") === "Brand#2" && col("p_type") === "SMALL")
      .select(col("p_partkey"))
    val li = lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("p_partkey").as("a_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(broadcast(avgQty), col("p_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(18,4)")) / 7.0, 2)
          .cast("double").as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** `q19_disjunctive` — TPC-H Q19: three OR'd brand/size/quantity
    * branches, summed in one scan. The part dim broadcasts; the
    * disjunction evaluates post-join (it straddles both tables), but
    * each branch's fact-side quantity range unions into a scan-level
    * prefilter (qty ∈ [1, 30]) that does push down.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame =
    q19DisjunctiveOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "part"))

  /** [[q19Disjunctive]]'s kernel on caller lineitem/part frames. */
  def q19DisjunctiveOf(lineitem: DataFrame, partTbl: DataFrame): DataFrame = {
    val li = lineitem
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
    val part = partTbl
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val branch =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(
        round(sum(rev), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** `q20_potential_promo` — TPC-H Q20 shape (chained semi joins):
    * EUROPE suppliers who moved more than 25 units of any 'small'
    * part during 1996. (Region rather than one nation, and a 25-unit
    * bar: both keep the result non-degenerate at sf0.001's 10-supplier
    * table.) Qualifying (supplier, part) volumes reduce on the pruned
    * fact slice first; the supplier list is the DISTINCT of that —
    * each stage shrinks the stream before the next join, ending in a
    * semi join against the supplier dim.
    */
  def q20PotentialPromo(spark: SparkSession, dir: String): DataFrame =
    q20PotentialPromoOf(Tables(spark, dir, "part"), Tables(spark, dir, "lineitem"), Tables(spark, dir, "nation"), Tables(spark, dir, "region"), Tables(spark, dir, "supplier"))

  /** [[q20PotentialPromo]]'s kernel on caller part/lineitem/nation/region/supplier frames. */
  def q20PotentialPromoOf(partTbl: DataFrame, lineitem: DataFrame, nation: DataFrame, region: DataFrame, sup: DataFrame): DataFrame = {
    val part = partTbl
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val li = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val qualifying = li
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 25)
      .select(col("l_suppkey")).distinct()
    val nat = nation
      .join(broadcast(region
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    sup
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), round(col("s_acctbal"), 2).as("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** `q21_waiting` — TPC-H Q21 shape: suppliers who were the SOLE
    * late shipper on a multi-supplier finalized order ("late" = shipped
    * 60+ days after the order date, standing in for the missing
    * commit/receipt pair). Instead of Q21's EXISTS / NOT-EXISTS
    * double rescan of lineitem, one orderkey-grouped pass computes
    * (distinct suppliers, distinct late suppliers) per order, and late
    * lineitems join that summary — same semantics, one shuffle fewer.
    */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame =
    q21WaitingOf(Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"), Tables(spark, dir, "supplier"))

  /** [[q21Waiting]]'s kernel on caller orders/lineitem/supplier frames. */
  def q21WaitingOf(orders: DataFrame, lineitem: DataFrame, sup: DataFrame): DataFrame = {
    val ordF = orders
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val joined = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val perOrder = joined.groupBy(col("l_orderkey").as("po_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    joined.filter(col("is_late"))
      .join(perOrder, col("l_orderkey") === col("po_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** `q22_global_sales` — TPC-H Q22 shape: well-funded customers who
    * never placed an URGENT order, rolled up by nation (standing in
    * for the phone country code; "no urgent order" stands in for "no
    * order at all" because this dataset gives every customer at least
    * one order). The wealth threshold is a scalar broadcast computed
    * as an exact decimal sum over positive balances divided once in
    * double — identical in both engines — and the inactivity test is a
    * left anti join on the urgent-order key set.
    */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame =
    q22GlobalSalesOf(Tables(spark, dir, "customer"), Tables(spark, dir, "orders"))

  /** [[q22GlobalSales]]'s kernel on caller customer/orders frames. */
  def q22GlobalSalesOf(cust: DataFrame, orders: DataFrame): DataFrame = {
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_bal"))
    val ordKeys = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")), 2).cast("double")
          .as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supp" -> (q2MinCostSupp _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_profit" -> (q9Profit _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q12_shipmode" -> (q12Shipmode _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_parts_supp" -> (q16PartsSupp _),
    "q17_small_qty" -> (q17SmallQty _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q20_potential_promo" -> (q20PotentialPromo _),
    "q21_waiting" -> (q21Waiting _),
    "q22_global_sales" -> (q22GlobalSales _)
  )

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supp" ->
      """WITH cat AS (
        |  SELECT l_partkey, l_suppkey,
        |    round(min(l_extendedprice / l_quantity), 2) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |eu AS (
        |  SELECT c.l_partkey, c.cost, s.s_acctbal, s.s_name, n.n_name
        |  FROM cat c
        |  JOIN supplier s ON c.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |m AS (
        |  SELECT *, min(cost) OVER (PARTITION BY l_partkey) AS min_cost
        |  FROM eu)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
        |FROM m JOIN part ON l_partkey = p_partkey
        |WHERE cost = min_cost AND p_size <= 25 AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q8_market_share" ->
      """WITH flows AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT o_year,
        |  CAST(round(sum(CASE WHEN supp_nation = 'NATION_0' THEN volume
        |    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
        |    AS nation_revenue,
        |  CAST(round(sum(volume), 2) AS DOUBLE) AS total_revenue,
        |  round(CAST(round(sum(CASE WHEN supp_nation = 'NATION_0'
        |      THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
        |    / CAST(round(sum(volume), 2) AS DOUBLE), 4) AS mkt_share
        |FROM flows GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(round(sum(
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    - CAST(p_retailprice * 0.5 * l_quantity AS DECIMAL(18,4))), 2)
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_stock" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |      AS value_d
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey,
        |  CAST(round(value_d, 2) AS DOUBLE) AS value
        |FROM per_part
        |WHERE CAST(value_d AS DOUBLE) >
        |  (SELECT CAST(sum(value_d) AS DOUBLE) FROM per_part) * 0.001
        |ORDER BY value DESC, p_partkey""".stripMargin,
    "q12_shipmode" ->
      """SELECT CASE
        |    WHEN datediff('day', o_orderdate, l_shipdate) >= 60 THEN 'SLOW'
        |    WHEN datediff('day', o_orderdate, l_shipdate) >= 30 THEN 'MEDIUM'
        |    ELSE 'FAST' END AS ship_mode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY ship_mode""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_parts_supp" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#2' AND p_type = 'SMALL'),
        |avg_qty AS (
        |  SELECT l_partkey, avg(l_quantity) AS avg_qty
        |  FROM li GROUP BY l_partkey)
        |SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
        |    / 7.0, 2) AS DOUBLE) AS avg_yearly,
        |  count(*) AS n_small
        |FROM li JOIN avg_qty USING (l_partkey)
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 1 AND l_quantity <= 30 AND (
        |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q20_potential_promo" ->
      """SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 25)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting" ->
      """WITH joined AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_order AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
        |  FROM joined GROUP BY l_orderkey)
        |SELECT s_name, count(*) AS numwait
        |FROM (
        |  SELECT DISTINCT j.l_orderkey, j.l_suppkey
        |  FROM joined j JOIN per_order p USING (l_orderkey)
        |  WHERE j.is_late AND p.n_supp > 1 AND p.n_late = 1)
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    "q22_global_sales" ->
      """WITH thr AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS totacctbal
        |FROM customer, thr
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |      AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin
  )
}
