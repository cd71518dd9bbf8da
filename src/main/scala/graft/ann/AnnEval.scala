package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E22 `ann_recall_eval` — retrieval QUALITY evaluation as a
  * first-class operator: per-query recall@k of the E2 LSH path against
  * the E1 exact top-k (the standard ANN acceptance metric, run as a
  * query instead of a spec assertion so a production index rollout can
  * gate on it). Both arms are the existing operators unchanged — each
  * reduces corpus-side to O(queries × k) before this operator ever
  * touches a row, so the eval itself is a tiny (q_id, neighbor_id)
  * join + per-query count, no corpus-scale work beyond what the arms
  * already do. At 100 TB the honest eval cost IS the two retrievals;
  * the comparison is free.
  *
  * Deterministic by construction (both arms rank on 6-dp-rounded
  * cosines with id tiebreaks), so the DuckDB oracle replays both arms
  * verbatim and joins them the same way.
  */
object AnnEval {

  def annRecallEval(spark: SparkSession, dir: String): DataFrame = {
    val exact = Ann.annTopK(spark, dir)
      .select(col("q_id"), col("neighbor_id"))
    val approx = Ann.annLsh(spark, dir)
      .select(col("q_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("q_id", "neighbor_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
      .select(col("q_id"), col("n_exact"), col("n_hits"),
        round(col("n_hits") / col("n_exact").cast("double"), 4).as("recall"))
      .orderBy(col("q_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_eval" -> (annRecallEval _))

  /** Both arms' oracles replayed verbatim as subqueries (a full
    * WITH…SELECT is a valid derived table in DuckDB), joined exactly
    * as the Spark side joins them.
    */
  val oracle: Map[String, String] = Map(
    "ann_recall_eval" ->
      s"""SELECT e.q_id,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_hits,
         |  round(sum(CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    / CAST(count(*) AS DOUBLE), 4) AS recall
         |FROM (${Ann.oracle("ann_topk")}) e
         |LEFT JOIN (${Ann.oracle("ann_lsh")}) a
         |  ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
         |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin)
}
