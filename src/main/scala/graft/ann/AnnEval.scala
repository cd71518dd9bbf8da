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

  def annRecallEval(spark: SparkSession, dir: String): DataFrame =
    annRecallEvalOf(graft.Tables(spark, dir, "embeddings"))

  /** [[annRecallEval]]'s kernel on any embeddings-shaped frame. */
  def annRecallEvalOf(emb: DataFrame): DataFrame = {
    val exact = Ann.annTopKOf(emb)
      .select(col("q_id"), col("neighbor_id"))
    val approx = Ann.annLshOf(emb)
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

  val PostC = 20 // unfiltered candidate depth for the post-filter arm
  val FK = 5     // neighbors per query in both arms

  /** E26 `ann_filtered_eval` — FILTERED vector search evaluated as
    * data: the pre-filter vs post-filter trade every production vector
    * store faces ("top-k WHERE label = X"). The pre-filter arm applies
    * the predicate BEFORE ranking (exact — the predicate reaches the
    * scan, and at 100 TB prunes it); the post-filter arm ranks the
    * UNFILTERED corpus to depth [[PostC]] and filters afterwards — the
    * only option when the index can't see the predicate — losing any
    * same-label neighbor that didn't make the unfiltered head. The
    * per-query overlap quantifies exactly that loss. ONE scored scan
    * (corpus × broadcast queries) feeds both arms; everything after is
    * O(queries × k). Recall ships as floor-division basis points
    * (house integer-exactness rule). Both arms rank on 6-dp-rounded
    * cosine with vec_id tiebreak → bit-reproducible, oracle replays
    * both verbatim.
    */
  def annFilteredEval(spark: SparkSession, dir: String): DataFrame =
    annFilteredEvalOf(graft.Tables(spark, dir, "embeddings"))


  /** [[annFilteredEval]]'s kernel on any embeddings-shaped frame. */
  def annFilteredEvalOf(emb: DataFrame): DataFrame = {
    val c = emb
      .select(col("vec_id"), col("embedding"), col("label"))
    val q = c.filter(col("vec_id") < Ann.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", graft.functions.GraftFunctions
        .cosineSim(col("embedding"), col("q_emb")))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        col("cos"))
    val scoredR = scored.withColumn("cos_r", round(col("cos"), 6))
    val ord = Seq("cos_r" -> false, "vec_id" -> true)
    val pre = Ann.poolTopK(scoredR.filter(col("label") === col("q_label")),
      orderBy = ord, k = FK, rankName = "rk")
    val post = Ann.poolTopK(
      Ann.poolTopK(scoredR, orderBy = ord, k = PostC, rankName = "crk")
        .filter(col("label") === col("q_label")),
      orderBy = ord, k = FK, rankName = "rk")
    val np = post.groupBy(col("q_id")).agg(count(lit(1)).as("n_post"))
    pre.select(col("q_id"), col("q_label"), col("vec_id"))
      .join(post.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
        Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id"), col("q_label"))
      .agg(count(lit(1)).as("n_pre"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
      .join(np, Seq("q_id"), "left_outer")
      .select(col("q_id"), col("q_label"), col("n_pre"),
        coalesce(col("n_post"), lit(0L)).as("n_post"), col("n_overlap"),
        expr("n_overlap * 10000 div n_pre").as("recall_bp"))
      .orderBy(col("q_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_eval" -> (annRecallEval _),
    "ann_filtered_eval" -> (annFilteredEval _))

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
         |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin,
    "ann_filtered_eval" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb,
         |    label AS q_label
         |  FROM embeddings WHERE vec_id < ${Ann.NumQueries}),
         |scored AS (SELECT q.q_id, q.q_label, c.vec_id, c.label,
         |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
         |      CAST(q.q_emb AS DOUBLE[])) AS cos
         |  FROM embeddings c JOIN q ON c.vec_id <> q.q_id),
         |pre AS (SELECT * FROM (SELECT q_id, q_label, vec_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY round(cos, 6) DESC, vec_id) AS rk
         |  FROM scored WHERE label = q_label) WHERE rk <= $FK),
         |cand AS (SELECT * FROM (SELECT q_id, q_label, vec_id, label, cos,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY round(cos, 6) DESC, vec_id) AS crk
         |  FROM scored) WHERE crk <= $PostC),
         |post AS (SELECT * FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY round(cos, 6) DESC, vec_id) AS rk
         |  FROM cand WHERE label = q_label) WHERE rk <= $FK),
         |np AS (SELECT q_id, count(*) AS n_post FROM post GROUP BY q_id),
         |j AS (SELECT p.q_id, p.q_label, count(*) AS n_pre,
         |    sum(CASE WHEN o.vec_id IS NULL THEN 0 ELSE 1 END) AS n_overlap
         |  FROM pre p LEFT JOIN post o
         |    ON o.q_id = p.q_id AND o.vec_id = p.vec_id
         |  GROUP BY p.q_id, p.q_label)
         |SELECT j.q_id, j.q_label, CAST(j.n_pre AS BIGINT) AS n_pre,
         |  CAST(coalesce(np.n_post, 0) AS BIGINT) AS n_post,
         |  CAST(j.n_overlap AS BIGINT) AS n_overlap,
         |  CAST(j.n_overlap AS BIGINT) * 10000 // j.n_pre AS recall_bp
         |FROM j LEFT JOIN np USING (q_id) ORDER BY j.q_id""".stripMargin)
}
