package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Analytic.queries ++
      operators.CurationOps.queries ++
      operators.GraphMining.queries ++
      operators.TpchExtra.queries ++
      operators.Windowed.queries ++
      operators.EventOps.queries ++
      text.TextOps.queries ++
      text.Retrieval.queries ++
      text.CorpusQuality.queries ++
      etl.Etl.queries ++
      dedup.Dedup.queries ++
      dedup.DedupEval.queries ++
      ann.Ann.queries ++
      ann.KnnGraph.queries ++
      ann.AnnOpq.queries ++
      ann.IvfIndex.queries ++
      ann.PqIndex.queries ++
      ann.AnnEval.queries ++
      ann.MatryoshkaEval.queries ++
      ann.EmbPca.queries ++
      ann.EmbDrift.queries ++
      ann.IndexErasure.queries ++
      ann.Hybrid.queries ++
      multimodal.Multimodal.queries ++
      streaming.Streaming.queries ++
      plans.TopKOps.queries ++
      // r16 measurement probe (optimization-round brief §1 / r15
      // verdict item 3): the cheapest possible registered plan — a
      // one-row local Range projection, no table, no shuffle — timed
      // through the exact same bench path as every real query. Its
      // reported wall IS the per-query session floor (2× plan/optimize/
      // codegen/submit + clearCache) that other_sec multiplies across
      // the ~225-query tail; committing it makes the floor a standing,
      // trendable number instead of a per-round estimate.
      Map("bench_floor" -> ((spark: SparkSession, _: String) =>
        spark.range(1).select(
          org.apache.spark.sql.functions.lit(1).as("one"))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      operators.Analytic.oracle ++
      operators.CurationOps.oracle ++
      operators.GraphMining.oracle ++
      operators.TpchExtra.oracle ++
      operators.Windowed.oracle ++
      operators.EventOps.oracle ++
      text.TextOps.oracle ++
      text.Retrieval.oracle ++
      text.CorpusQuality.oracle ++
      etl.Etl.oracle ++
      dedup.Dedup.oracle ++
      dedup.DedupEval.oracle ++
      ann.Ann.oracle ++
      ann.KnnGraph.oracle ++
      ann.AnnOpq.oracle ++
      ann.IvfIndex.oracle ++
      ann.PqIndex.oracle ++
      ann.AnnEval.oracle ++
      ann.MatryoshkaEval.oracle ++
      ann.EmbPca.oracle ++
      ann.EmbDrift.oracle ++
      ann.IndexErasure.oracle ++
      ann.Hybrid.oracle ++
      multimodal.Multimodal.oracle ++
      streaming.Streaming.oracle ++
      plans.TopKOps.oracle ++
      Map("bench_floor" -> "SELECT CAST(1 AS INT) AS one")
}
