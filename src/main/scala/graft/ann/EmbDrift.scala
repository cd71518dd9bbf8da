package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E32 `emb_drift_cells` — embedding-distribution drift between two
  * corpus slices, measured in a SHARED coarse-quantizer frame
  * (SURVEY.md §2.E): A33's PSI watches scalar value drift and C29
  * watches lexical drift; this is the same monitoring question asked
  * of the embedding space itself — "is today's intake occupying the
  * same regions of vector space as the store?" — the health check
  * that gates an index-reuse decision (E30's append maintenance
  * assigns new vectors against STORED centroids, which is only sound
  * while the new distribution still matches the one the quantizer was
  * trained on; a shifted cell is exactly where recall silently rots).
  *
  * Mechanics: the reference slice (`vec_id % DriftMod != 0`, the
  * house stand-in for "yesterday's store" — production swaps one
  * filter for a snapshot read) trains the E10/E3 coarse quantizer
  * (bounded trainCapFor sample, one Lloyd round); BOTH slices assign to
  * those frozen centroids; per cell the report carries slice counts,
  * exact basis-point shares, and the cell's PSI contribution over
  * Laplace-smoothed shares ((n+1)/(N+k) — integer-count rationals, so
  * empty cells stay defined; A32's discipline, round-6-guarded ln).
  *
  * Scale shape: training is sample-bounded (the corpus is read once),
  * assignment is one map pass against broadcast centroids, and ONE
  * map-side-combined shuffle collapses to the O(cells) frame — totals
  * ride a broadcast one-row crossJoin, never a corpus-wide window.
  * Output O(cells) rows regardless of corpus size.
  */
object EmbDrift {

  val DriftMod = 5 // reference slice: vec_id % DriftMod != 0

  def embDriftCells(spark: SparkSession, dir: String): DataFrame =
    embDriftCellsOf(graft.Tables(spark, dir, "embeddings"))

  /** [[embDriftCells]]'s kernel on caller embeddings frame. */
  def embDriftCellsOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val all = Ann.corpusOf(emb)
    val ref = all.filter(col("vec_id") % DriftMod =!= 0)
    val cents = Ann.refinedCentroids(spark, ref) // driver-local frame
    val k = cents.count() // LocalTableScan — no corpus job
    val cells = cents.select(col("cell_id"))
      .join(
        Ann.assignCells(all, cents)
          .withColumn("is_new",
            (col("vec_id") % DriftMod === 0).cast("long"))
          .groupBy(col("cell_id"))
          .agg(sum(lit(1L) - col("is_new")).as("n_ref"),
            sum(col("is_new")).as("n_new")),
        Seq("cell_id"), "left")
      .na.fill(0L, Seq("n_ref", "n_new"))
    val tot = cells.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_new")).as("t_new"))
    cells.crossJoin(broadcast(tot))
      .withColumn("share_ref_bp",
        expr("n_ref * 10000 div greatest(t_ref, 1)"))
      .withColumn("share_new_bp",
        expr("n_new * 10000 div greatest(t_new, 1)"))
      .withColumn("p",
        (col("n_ref") + lit(1.0)) / (col("t_ref") + lit(k.toDouble)))
      .withColumn("q",
        (col("n_new") + lit(1.0)) / (col("t_new") + lit(k.toDouble)))
      .withColumn("psi_cell",
        round((col("p") - col("q")) * log(col("p") / col("q")), 6))
      .select(col("cell_id"), col("n_ref"), col("n_new"),
        col("share_ref_bp"), col("share_new_bp"), col("psi_cell"))
      .orderBy(col("cell_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_drift_cells" -> (embDriftCells _)
  )

  val oracle: Map[String, String] = Map(
    // emb_drift_cells: train the quantizer on the reference slice
    // (the shared E3/E10 training replay), assign the FULL table to
    // the frozen centroids, then the A32 PSI kernel over the O(cells)
    // frame — Laplace (n+1)/(N+k) shares, round-6-guarded ln
    "emb_drift_cells" ->
      s"""WITH ref AS (SELECT * FROM embeddings
         |  WHERE vec_id % $DriftMod <> 0),
         |${Ann.ivfTrainOracleOver("ref")},
         |aa AS (SELECT e.vec_id, c.cell_id, row_number() OVER (
         |    PARTITION BY e.vec_id ORDER BY round(list_cosine_similarity(
         |      CAST(e.embedding AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])), 6)
         |      DESC, c.cell_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cell_id FROM aa WHERE rn = 1),
         |cnt AS (SELECT cell_id,
         |    CAST(sum(CASE WHEN vec_id % $DriftMod <> 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(sum(CASE WHEN vec_id % $DriftMod = 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_new
         |  FROM asg GROUP BY cell_id),
         |f AS (SELECT s.cell_id, coalesce(n_ref, 0) AS n_ref,
         |    coalesce(n_new, 0) AS n_new
         |  FROM (SELECT cell_id FROM cents) s
         |  LEFT JOIN cnt USING (cell_id)),
         |kk AS (SELECT count(*) AS k FROM cents),
         |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
         |    CAST(sum(n_new) AS BIGINT) AS t_new FROM f)
         |SELECT f.cell_id, f.n_ref, f.n_new,
         |  f.n_ref * 10000 // greatest(t_ref, 1) AS share_ref_bp,
         |  f.n_new * 10000 // greatest(t_new, 1) AS share_new_bp,
         |  round(((f.n_ref + 1.0) / (t_ref + k)
         |      - (f.n_new + 1.0) / (t_new + k))
         |    * ln(((f.n_ref + 1.0) / (t_ref + k))
         |      / ((f.n_new + 1.0) / (t_new + k))), 6) AS psi_cell
         |FROM f CROSS JOIN tot CROSS JOIN kk
         |ORDER BY f.cell_id""".stripMargin
  )
}
