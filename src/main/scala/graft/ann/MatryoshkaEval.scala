package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dotF

/** E24 `emb_matryoshka_eval` — recall@k under embedding TRUNCATION:
  * exact top-k at prefix dims (8/16/32/64) scored against the full-dim
  * ground truth. This is the dimension-selection eval a
  * matryoshka-style embedding rollout gates on — "how much recall does
  * a 4× smaller index actually cost?" — and at 100 TB the answer
  * decides the index's at-rest bytes before anything is built. Each
  * truncated arm is the E1 broadcast-query scan over sliced vectors
  * (prefix slicing is free in the projection — no re-embedding); the
  * comparison after the arms is O(dims × queries × k).
  *
  * Deterministic end-to-end (6-dp-rounded cosines, id tiebreaks, the
  * zero-norm guard a short prefix can actually hit), so the oracle
  * replays every arm with sliced lists and joins identically.
  */
object MatryoshkaEval {

  val Dims: Seq[Int] = Seq(8, 16, 32, 64)

  /** E1's scan with both sides truncated to the first `d` dims. */
  private def topKAtDim(emb: DataFrame, d: Int): DataFrame = {
    val base = emb
      .select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding"))
    val c = base.withColumn("nrm", sqrt(dotF(col("embedding"), col("embedding"))))
    val q = base.filter(col("vec_id") < Ann.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("qn", sqrt(dotF(col("q_emb"), col("q_emb"))))
    Ann.poolTopK(
      c.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          when(col("nrm") * col("qn") === 0.0, 0.0)
            .otherwise(dotF(col("embedding"), col("q_emb")) /
              (col("nrm") * col("qn"))))
        .withColumn("cos_r", round(col("cos"), 6)),
      orderBy = Seq("cos_r" -> false, "vec_id" -> true),
      k = 5, rankName = "rank")
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
  }

  def embMatryoshkaEval(spark: SparkSession, dir: String): DataFrame =
    embMatryoshkaEvalOf(graft.Tables(spark, dir, "embeddings"))

  /** [[embMatryoshkaEval]]'s kernel on any embeddings-shaped frame. */
  def embMatryoshkaEvalOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // the ground truth is O(queries × k) rows BY CONSTRUCTION — collect
    // it once into a local frame, otherwise every union branch below
    // replays the full E1 corpus scan (plan-pinned in PlanSpec)
    val full = Ann.annTopKOf(emb)
      .select(col("q_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSeq.sortBy(identity)
      .toDF("q_id", "neighbor_id")
    Dims.map { d =>
      // the arm is ≤ queries × k rows by construction, but it sits
      // under a window so Catalyst can't see that — hint the broadcast
      val t = broadcast(topKAtDim(emb, d).withColumn("hit", lit(1)))
      full.join(t, Seq("q_id", "neighbor_id"), "left_outer")
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
        .select(lit(d).as("dim"), col("n_pairs"), col("n_hits"),
          round(col("n_hits") / col("n_pairs").cast("double"), 4).as("recall"))
    }.reduce(_.unionByName(_)).orderBy(col("dim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_matryoshka_eval" -> (embMatryoshkaEval _))

  /** One truncated-arm replay (sliced lists, zero-norm guard). */
  private def armSql(d: Int): String =
    s"""q$d AS (SELECT vec_id AS q_id, embedding[1:$d] AS q_emb
       |  FROM embeddings WHERE vec_id < ${Ann.NumQueries}),
       |s$d AS (SELECT q.q_id, e.vec_id,
       |    CASE WHEN list_dot_product(CAST(e.embedding[1:$d] AS DOUBLE[]),
       |        CAST(e.embedding[1:$d] AS DOUBLE[])) = 0
       |      OR list_dot_product(CAST(q.q_emb AS DOUBLE[]),
       |        CAST(q.q_emb AS DOUBLE[])) = 0 THEN 0.0
       |    ELSE list_cosine_similarity(CAST(e.embedding[1:$d] AS DOUBLE[]),
       |      CAST(q.q_emb AS DOUBLE[])) END AS cos
       |  FROM embeddings e CROSS JOIN q$d q WHERE e.vec_id <> q.q_id),
       |t$d AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY round(cos, 6) DESC, vec_id) AS rank FROM s$d)
       |  WHERE rank <= 5),
       |e$d AS (SELECT $d AS dim, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_hits,
       |    round(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |      / CAST(count(*) AS DOUBLE), 4) AS recall
       |  FROM ftop f LEFT JOIN t$d t
       |    ON t.q_id = f.q_id AND t.vec_id = f.neighbor_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "emb_matryoshka_eval" ->
      s"""WITH ftop AS (SELECT q_id, neighbor_id
         |  FROM (${Ann.oracle("ann_topk")})),
         |${Dims.map(armSql).mkString(",\n")}
         |${Dims.map(d => s"SELECT * FROM e$d").mkString(" UNION ALL ")}
         |ORDER BY dim""".stripMargin)
}
