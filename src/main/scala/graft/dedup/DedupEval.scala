package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D10 `dedup_lsh_eval` — banding-quality evaluation for the MinHash
  * LSH dedup, as data rather than a spec assertion (the dedup twin of
  * E22: band/row settings are THE knob a production dedup tunes, and
  * the tuning loop gates on exactly this report). Compares D3's
  * LSH-candidate pair set against D2's exhaustive inverted-index
  * ground truth at the same τ: recall measures pairs the banding never
  * collided (the only loss — both paths verify exact Jaccard, so
  * precision is 1.0 by construction, and the report proving that is
  * the point: a precision below 1 means the verify step broke).
  *
  * Cost shape: both arms are the existing operators unchanged; the
  * eval adds one (ia, ib)-keyed full-outer join over two already-small
  * pair sets and reduces to a single summary row.
  */
object DedupEval {

  def dedupLshEval(spark: SparkSession, dir: String): DataFrame = {
    val exact = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("ia"), col("ib"), lit(1).as("e"))
    val lsh = Dedup.dedupMinhashLsh(spark, dir)
      .select(col("ia"), col("ib"), lit(1).as("l"))
    exact.join(lsh, Seq("ia", "ib"), "full_outer")
      .agg(
        sum(coalesce(col("e"), lit(0))).cast("long").as("n_exact_pairs"),
        sum(coalesce(col("l"), lit(0))).cast("long").as("n_lsh_pairs"),
        sum(when(col("e") === 1 && col("l") === 1, 1).otherwise(0))
          .cast("long").as("n_hits"))
      .select(
        col("n_exact_pairs"), col("n_lsh_pairs"), col("n_hits"),
        (col("n_exact_pairs") - col("n_hits")).as("n_missed"),
        round(col("n_hits") / col("n_exact_pairs").cast("double"), 4)
          .as("recall"),
        round(col("n_hits") / col("n_lsh_pairs").cast("double"), 4)
          .as("precision"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_lsh_eval" -> (dedupLshEval _))

  /** Both arms' oracles replayed verbatim as derived tables, joined
    * and aggregated exactly as the Spark side.
    */
  val oracle: Map[String, String] = Map(
    "dedup_lsh_eval" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN e.ia IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_exact_pairs,
         |  CAST(sum(CASE WHEN l.ia IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_lsh_pairs,
         |  CAST(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  CAST(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
         |  round(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NOT NULL
         |      THEN 1 ELSE 0 END)
         |    / CAST(sum(CASE WHEN e.ia IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE), 4) AS recall,
         |  round(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NOT NULL
         |      THEN 1 ELSE 0 END)
         |    / CAST(sum(CASE WHEN l.ia IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE), 4) AS precision
         |FROM (${Dedup.oracle("dedup_ngram_jaccard")}) e
         |FULL JOIN (${Dedup.oracle("dedup_minhash_lsh")}) l
         |  ON e.ia = l.ia AND e.ib = l.ib""".stripMargin)
}
