package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._

import graft.Tables

/** Column-API entry points for the custom top-k operator + the driver
  * query proving it against the same DuckDB oracle as the window-based
  * `win_rank_topn` (B9): identical semantics, bounded-heap physical plan.
  */
object TopKOps {

  /** Per-group top-k of `df`: rank 1..k per group in `orderBy` order
    * ((column-name, ascending?) pairs; ties must be broken by a unique
    * column for determinism, same as any rank-based operator).
    */
  def topK(df: DataFrame, groupBy: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    GraftShim.addStrategy(spark, GraftStrategies)
    val ordering = orderBy.map { case (c, asc) =>
      SortOrder(UnresolvedAttribute.quoted(c),
        if (asc) Ascending else Descending)
    }
    GraftShim.ofRows(spark, TopKPerGroup(
      groupBy.map(UnresolvedAttribute.quoted),
      ordering, k,
      TopKPerGroup.rankAttribute(rankName),
      GraftShim.logicalPlan(df)))
  }

  /** `topk_pergroup` — top-3 orders per customer by totalprice, via the
    * custom bounded-heap operator. Same oracle as `win_rank_topn`.
    */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame =
    topkPerGroupOf(Tables(spark, dir, "orders"))

  /** [[topkPerGroup]]'s kernel on any orders-shaped frame. */
  def topkPerGroupOf(orders: DataFrame): DataFrame =
    topK(orders,
      groupBy = Seq("o_custkey"),
      orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true),
      k = 3, rankName = "rank_in_cust")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("rank_in_cust"))
      .orderBy(col("o_custkey"), col("rank_in_cust"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_pergroup" -> (topkPerGroup _)
  )

  val oracle: Map[String, String] = Map(
    "topk_pergroup" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  rank_in_cust
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust
        |  FROM orders)
        |WHERE rank_in_cust <= 3
        |ORDER BY o_custkey, rank_in_cust""".stripMargin
  )
}
