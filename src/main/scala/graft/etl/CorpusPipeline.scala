package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextOps

/** A16 `corpus_pipeline` — the complete LLM-training-corpus preparation
  * job, composed end-to-end from graft primitives (the training-data
  * analogue of [[DailyPipeline]]'s reference parity):
  *
  *   1. clean      — control chars → space, whitespace collapse (C7)
  *   2. quality    — token-count window + stopword-ratio gate (C2)
  *   3. exact dup  — one keeper per normalized-content fingerprint (D1)
  *   4. near dup   — 3-gram-Jaccard pairs → connected components →
  *                   one representative per cluster (D2 + D6)
  *   5. split      — deterministic md5 train/val/test bucketing (A15)
  *
  * and a per-split summary as the (tiny) output. Every stage is the
  * scale shape its standalone operator documents: map-only clean/gate,
  * one fingerprint shuffle, the inverted-index pair shuffle, and
  * dedup-sized component resolution — composing them adds no new
  * shuffle beyond the stages themselves.
  */
object CorpusPipeline {

  private val stopwords = Seq("the", "a", "or", "and", "of", "is", "to", "in")
  val MinTokens = 30
  val MaxTokens = 1000
  val MaxStopRatio = 0.6

  /** Stage 1: canonical cleanup + tokenization of a `text` column.
    * Works on batch and streaming frames alike (pure projection).
    */
  def cleaned(docs: DataFrame): DataFrame =
    docs
      .withColumn("clean",
        trim(regexp_replace(
          regexp_replace(col("text"), "[\\x00-\\x1F\\x7F]", " "),
          " +", " ")))
      .withColumn("toks", split(col("clean"), "\\s+"))
      .withColumn("n_tokens", size(col("toks")))

  /** Stage 2: token-window + stopword-ratio quality gate (pure filter,
    * batch- and streaming-safe).
    */
  def qualityGate(docs: DataFrame): DataFrame = {
    val inList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    docs
      .withColumn("n_stop",
        expr(s"size(filter(toks, t -> t IN $inList))"))
      .filter(col("n_tokens") >= MinTokens && col("n_tokens") <= MaxTokens &&
        col("n_stop") / col("n_tokens") <= MaxStopRatio)
  }

  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    // 1.–2. clean + quality gate
    val gated = qualityGate(cleaned(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text"))))

    // 3. exact dedup: keep min doc_id per content fingerprint
    val wfp = Window.partitionBy(col("fp"))
    val exactKept = gated
      .withColumn("fp", TextOps.fingerprint(col("clean")))
      .withColumn("keep_id", min(col("doc_id")).over(wfp))
      .filter(col("doc_id") === col("keep_id"))

    // 4. near-dup clusters among survivors: keep each cluster's rep
    val pairs = Dedup.ngramJaccardPairsOf(
      exactKept.select(col("doc_id"),
        TextOps.wordShingles(col("toks")).as("shingles")),
      materialize = false)
    val nonReps = Dedup.connectedComponents(
      pairs.select(col("ia").as("u"), col("ib").as("v")))
      .filter(col("node") =!= col("label"))
      .select(col("node").as("doc_id"))
    val survivors = exactKept.join(nonReps, Seq("doc_id"), "left_anti")

    // 5. deterministic split + summary
    survivors
      .withColumn("hx",
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2))
      .withColumn("split",
        when(col("hx") < "c0", "train")
          .when(col("hx") < "e0", "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        round(avg(length(col("clean"))), 4).as("avg_clean_len"))
      .orderBy(col("split"))
  }

  val oracleSql: String =
    """WITH RECURSIVE
      |c AS (SELECT doc_id, trim(regexp_replace(regexp_replace(text,
      |    '[\x00-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g')) AS clean
      |  FROM documents),
      |t AS (SELECT doc_id, clean,
      |    string_split_regex(clean, '\s+') AS toks FROM c),
      |q AS (SELECT doc_id, clean, toks, len(toks) AS n_tokens,
      |    len(list_filter(toks, x -> x IN
      |      ('the','a','or','and','of','is','to','in'))) AS n_stop
      |  FROM t),
      |g AS (SELECT * FROM q WHERE n_tokens BETWEEN 30 AND 1000
      |  AND n_stop * 1.0 / n_tokens <= 0.6),
      |f AS (SELECT *, md5(regexp_replace(lower(trim(clean)),
      |    '\s+', ' ', 'g')) AS fp FROM g),
      |ek AS (SELECT * FROM (SELECT *,
      |    min(doc_id) OVER (PARTITION BY fp) AS keep FROM f)
      |  WHERE doc_id = keep),
      |e0 AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(toks) >= 3
      |      THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |        for i in range(1, len(toks) - 1)]
      |      ELSE [] END)) AS gg FROM ek),
      |keepg AS (SELECT gg FROM e0 GROUP BY gg HAVING count(*) <= 50),
      |e AS (SELECT e0.* FROM e0 JOIN keepg USING (gg)),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM e GROUP BY doc_id),
      |p AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS n_common
      |  FROM e a JOIN e b ON a.gg = b.gg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |fz AS (SELECT ia, ib FROM p
      |  JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
      |  WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6)
      |    >= 0.5),
      |edges AS (SELECT ia AS u, ib AS v FROM fz
      |  UNION SELECT ib, ia FROM fz),
      |reach(u, r) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e2.u, reach.r FROM edges e2 JOIN reach ON reach.u = e2.v),
      |lab AS (SELECT u AS doc_id, min(r) AS lbl FROM reach GROUP BY u),
      |surv AS (SELECT ek.* FROM ek LEFT JOIN lab USING (doc_id)
      |  WHERE lab.lbl IS NULL OR lab.lbl = ek.doc_id),
      |h AS (SELECT doc_id, n_tokens, length(clean) AS clean_len,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hx FROM surv)
      |SELECT CASE WHEN hx < 'c0' THEN 'train'
      |    WHEN hx < 'e0' THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  round(avg(clean_len), 4) AS avg_clean_len
      |FROM h GROUP BY 1 ORDER BY split""".stripMargin
}
