package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** E27 `emb_knn_graph` — the mutual k-nearest-neighbor graph over an
  * embedding column: the standard substrate for density-based corpus
  * clustering, SemDeDup-style pruning, and label propagation (an edge
  * (u, v) exists iff v is in u's top-k AND u is in v's top-k — the
  * mutuality filter is what strips hub vectors' one-directional
  * arms, which is why kNN-graph pipelines use it).
  *
  * Scale shape: this is the E1-style EXACT baseline — all-pairs
  * scoring with the corpus broadcast to one side, per-node top-k via
  * the rounded-rank window (never a global sort), then an equi
  * self-join of the O(n·k) top-k frame on the REVERSED (u, v) key to
  * keep mutual pairs. The corpus-quadratic scoring is the documented
  * tradeoff (same contract as D5 `dedup_embedding`); the 100 TB path
  * swaps the all-pairs stage for E10-cell-restricted candidates
  * (D9 `dedup_semantic`'s shape) and keeps everything downstream —
  * ranking, mutuality join, output — unchanged.
  */
object KnnGraph {

  val KnnK = 5 // neighbors per node

  /** Mutual-kNN edges (u < v) of a `(vec_id, embedding)` frame: both
    * directed ranks plus the (symmetric — same accumulation order on
    * both engines, so bit-equal) cosine.
    */
  private[ann] def mutualKnn(c0: DataFrame): DataFrame = {
    val c = c0.select(col("vec_id"), col("embedding"))
    val scored = c
      .join(broadcast(c.select(col("vec_id").as("v_id"),
        col("embedding").as("v_emb"))), col("vec_id") =!= col("v_id"))
      .withColumn("cos", cosineSim(col("embedding"), col("v_emb")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("cos"), 6).desc, col("v_id"))
    val topk = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
      .select(col("vec_id").as("u"), col("v_id").as("v"),
        col("rank"), col("cos"))
      // both sides of the mutuality join read this frame — O(n·k)
      // rows; without the checkpoint the quadratic scoring pass
      // re-executes per side (plan-verified: two BNLJ subtrees)
      .localCheckpoint()
    topk.as("a").join(topk.as("b"),
        col("a.u") === col("b.v") && col("a.v") === col("b.u") &&
          col("a.u") < col("a.v"))
      .select(col("a.u").as("u"), col("a.v").as("v"),
        col("a.rank").as("rank_uv"), col("b.rank").as("rank_vu"),
        round(col("a.cos"), 4).as("cos"))
  }

  def embKnnGraph(spark: SparkSession, dir: String): DataFrame =
    mutualKnn(Tables(spark, dir, "embeddings"))
      .orderBy(col("u"), col("v"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_knn_graph" -> (embKnnGraph _)
  )

  val oracle: Map[String, String] = Map(
    // the directed top-k replays with the ann_topk rounded-rank
    // window; mutuality is the same reversed-key self-join
    "emb_knn_graph" ->
      s"""WITH scored AS (SELECT a.vec_id AS u, b.vec_id AS v,
         |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
         |      CAST(b.embedding AS DOUBLE[])) AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.vec_id <> b.vec_id),
         |r AS (SELECT u, v, cos, row_number() OVER (PARTITION BY u
         |    ORDER BY round(cos, 6) DESC, v) AS rank FROM scored),
         |k AS (SELECT * FROM r WHERE rank <= $KnnK)
         |SELECT x.u, x.v, x.rank AS rank_uv, y.rank AS rank_vu,
         |  round(x.cos, 4) AS cos
         |FROM k x JOIN k y ON y.u = x.v AND y.v = x.u
         |WHERE x.u < x.v
         |ORDER BY x.u, x.v""".stripMargin
  )
}
