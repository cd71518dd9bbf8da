package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** E9 `hybrid_rrf` — hybrid retrieval: a lexical arm (BM25 against the
  * fixed query terms) and a semantic arm (embedding cosine against a
  * fixed query vector) fused with Reciprocal Rank Fusion,
  * rrf(d) = Σ_arms 1/(k + rank_arm(d)) with the standard k = 60 — the
  * canonical RAG retrieval stack as one DataFrame plan.
  *
  * Scale shape: each arm reduces to its top-[[ArmN]] via
  * TakeOrderedAndProject (corpus-sized scan, driver-sized result), so
  * the fusion join and final rank run on 2×[[ArmN]] rows regardless of
  * corpus size. Ranks come from 6-dp-rounded scores with id tiebreaks,
  * and the RRF sum is written lexical-arm-first in both engines —
  * rank arithmetic on exact rationals, stable everywhere.
  */
object Hybrid {

  val RrfK = 60
  val ArmN = 50
  val FuseN = 20
  val QueryVec = 0L

  private def ranked(top: DataFrame, scoreCol: String, idCol: String,
      rankName: String): DataFrame = {
    val w = Window.orderBy(col(scoreCol).desc, col(idCol))
    top.withColumn(rankName, row_number().over(w))
      .select(col(idCol).as("doc_id"), col(rankName))
  }

  def hybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrfOf(Tables(spark, dir, "documents"),
      Tables(spark, dir, "embeddings"))

  /** [[hybridRrf]]'s kernel on caller documents/embeddings frames. */
  def hybridRrfOf(docs: DataFrame, emb: DataFrame): DataFrame = {
    val lexTop = graft.text.Retrieval
      .bm25ScoresOf(docs, graft.text.Retrieval.Bm25Terms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(ArmN)
    val lex = ranked(lexTop, "bm25", "doc_id", "lex_rank")

    val q = emb.filter(col("vec_id") === QueryVec)
      .select(col("embedding").as("q_emb"))
    val semTop = emb.filter(col("vec_id") =!= QueryVec)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(cosineSim(col("embedding"), col("q_emb")), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(ArmN)
      .select(col("vec_id"), col("cos"))
    val sem = ranked(semTop, "cos", "vec_id", "sem_rank")

    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(FuseN)
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"), col("rrf"))
  }

  /** E19 `hybrid_mmr` — the full RAG retrieval stack as one plan:
    * [[hybridRrf]]'s fused top-[[FuseN]] re-ranked by Maximal Marginal
    * Relevance, so the context window gets candidates that are both
    * RETRIEVED-relevant (lexical + semantic fusion) and mutually
    * diverse. Relevance enters the MMR score rank-normalized —
    * rel_µ = (FuseN + 1 − fused_rank) · 10⁶/FuseN — which puts it on
    * the same micro-unit scale as the pairwise cosines (raw RRF
    * scores live in [0, 2/61] and would be steamrolled by the
    * redundancy term); the selection is [[Ann.mmrGreedy]] verbatim,
    * so the greedy path replays in SQL through the same unrolled
    * steps as E17. Scale shape: both arms reduce corpus-side via
    * TakeOrderedAndProject before anything pairwise; the MMR pool is
    * FuseN rows.
    */
  def hybridMmr(spark: SparkSession, dir: String): DataFrame =
    hybridMmrOf(Tables(spark, dir, "documents"),
      Tables(spark, dir, "embeddings"))

  /** [[hybridMmr]]'s kernel on caller documents/embeddings frames. */
  def hybridMmrOf(docs: DataFrame, emb: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = emb.sparkSession
    import spark.implicits._
    val fused = hybridRrfOf(docs, emb)
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .persist(MEMORY_AND_DISK)
    val cand = emb
      .join(broadcast(fused.select(col("doc_id"), col("fused_rank"))),
        col("vec_id") === col("doc_id"))
      .select(lit(0L).as("q_id"), col("doc_id").as("cid"),
        ((lit(FuseN + 1) - col("fused_rank")).cast("long")
          * (1000000L / FuseN)).as("rel_u"),
        col("embedding"))
      .persist(MEMORY_AND_DISK)
    val pairs = cand.select(col("q_id"), col("cid").as("a_id"),
        col("embedding").as("a_emb"))
      .join(cand.select(col("q_id"), col("cid").as("b_id"),
        col("embedding").as("b_emb")), Seq("q_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("q_id"), col("a_id"), col("b_id"),
        round(round(cosineSim(col("a_emb"), col("b_emb")), 6) * 1e6, 0)
          .cast("long").as("sim_u"))
    Ann.mmrGreedy(
        cand.select(col("q_id"), col("cid"), col("rel_u"))
          .as[(Long, Long, Long)],
        pairs.as[(Long, Long, Long, Long)])
      .join(fused.select(col("doc_id"), col("fused_rank"), col("rrf")),
        col("cid") === col("doc_id"))
      .select(col("rank"), col("doc_id"), col("fused_rank"), col("rrf"),
        (col("score_u") / lit(1e7)).as("mmr_score"))
      .orderBy(col("rank"))
  }

  /** The multi-query RAG workload: each query is (id, lexical terms)
    * with its embedding = the same-id corpus vector. STATIC, so every
    * lexical arm keeps the literal-order pivot sum that makes BM25
    * doubles reproducible (see `bm25ScoresFor`).
    */
  val MultiQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join", "vector"),
    1L -> Seq("table", "row", "data"),
    2L -> Seq("key", "query", "stream"))

  /** E20 `hybrid_mmr_multi` — E19 generalized to a QUERY SET: one
    * lexical arm per query (each a static-pivot BM25 against its own
    * terms, reduced to top-[[ArmN]] corpus-side), ONE broadcast
    * semantic scan serving all queries, per-query RRF fusion, and the
    * shared q_id-keyed [[Ann.mmrGreedy]] diversifying every query's
    * pool in a single cogroup. This is the shape a production RAG
    * batch runs: Q queries amortize one corpus scan per arm kind, and
    * everything after the arms is O(Q × FuseN).
    */
  def hybridMmrMulti(spark: SparkSession, dir: String): DataFrame =
    hybridMmrMultiOf(Tables(spark, dir, "documents"),
      Tables(spark, dir, "embeddings"))

  /** [[hybridMmrMulti]]'s kernel on caller documents/embeddings
    * frames.
    */
  def hybridMmrMultiOf(docs: DataFrame, emb0: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = emb0.sparkSession
    import spark.implicits._
    // ONE tokenize pass serves every lexical arm: bm25PerDoc builds
    // the per-doc (dl, tf_t) frame over the UNION of all queries'
    // terms, and each arm scores off that checkpointed frame —
    // per-term BM25 is a pure function of (tf, dl, df, N, avgdl), so
    // the scores are bit-identical to per-query builds (the r15
    // baseline measured the old 3-independent-builds spelling as ~9
    // corpus scans ≈ the query's whole wall; guide §1.2).
    val allTerms = MultiQueries.flatMap(_._2).distinct
    val perDoc = graft.text.Retrieval.bm25PerDoc(docs, allTerms)
    val lex = MultiQueries.map { case (qid, terms) =>
      graft.text.Retrieval.bm25FromPerDoc(perDoc, allTerms, terms)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(ArmN)
        .withColumn("lex_rank", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select(lit(qid).as("q_id"), col("doc_id"), col("lex_rank"))
    }.reduce(_ unionByName _)
    val emb = emb0
    val q = emb.filter(col("vec_id").isin(MultiQueries.map(_._1): _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val sem = Ann.poolTopK(
      emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          round(cosineSim(col("embedding"), col("q_emb")), 6)),
      orderBy = Seq("cos" -> false, "vec_id" -> true),
      k = ArmN, rankName = "sem_rank")
      .select(col("q_id"), col("vec_id").as("doc_id"), col("sem_rank"))
    val wFuse = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    val fused = lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)), 6))
      .withColumn("fused_rank", row_number().over(wFuse))
      .filter(col("fused_rank") <= FuseN)
      .persist(MEMORY_AND_DISK)
    val cand = emb
      .join(broadcast(fused.select(col("q_id"), col("doc_id"),
        col("fused_rank"))), col("vec_id") === col("doc_id"))
      .select(col("q_id"), col("doc_id").as("cid"),
        ((lit(FuseN + 1) - col("fused_rank")).cast("long")
          * (1000000L / FuseN)).as("rel_u"),
        col("embedding"))
      .persist(MEMORY_AND_DISK)
    val pairs = cand.select(col("q_id"), col("cid").as("a_id"),
        col("embedding").as("a_emb"))
      .join(cand.select(col("q_id"), col("cid").as("b_id"),
        col("embedding").as("b_emb")), Seq("q_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("q_id"), col("a_id"), col("b_id"),
        round(round(cosineSim(col("a_emb"), col("b_emb")), 6) * 1e6, 0)
          .cast("long").as("sim_u"))
    Ann.mmrGreedy(
        cand.select(col("q_id"), col("cid"), col("rel_u"))
          .as[(Long, Long, Long)],
        pairs.as[(Long, Long, Long, Long)])
      .withColumnRenamed("cid", "doc_id")
      .join(fused.select(col("q_id"), col("doc_id"), col("fused_rank"),
        col("rrf")), Seq("q_id", "doc_id"))
      .select(col("q_id"), col("rank"), col("doc_id"), col("fused_rank"),
        col("rrf"), (col("score_u") / lit(1e7)).as("mmr_score"))
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_rrf" -> (hybridRrf _),
    "hybrid_mmr" -> (hybridMmr _),
    "hybrid_mmr_multi" -> (hybridMmrMulti _)
  )

  /** Shared CTE prefix (both arms, ranked) ending at `lex` / `sem`. */
  private val rrfOracleCommon: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks
      |  WHERE term IN ('spark', 'join', 'vector') GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |term_s AS (
      |  SELECT t.doc_id, t.term,
      |    ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2 /
      |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
      |  FROM tf t JOIN df USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN stats),
      |bm25 AS (
      |  SELECT doc_id,
      |    round(coalesce(max(CASE WHEN term = 'spark' THEN s END), 0)
      |      + coalesce(max(CASE WHEN term = 'join' THEN s END), 0)
      |      + coalesce(max(CASE WHEN term = 'vector' THEN s END), 0), 6)
      |      AS bm25
      |  FROM term_s GROUP BY doc_id),
      |lex_top AS (
      |  SELECT doc_id, bm25 FROM bm25
      |  ORDER BY bm25 DESC, doc_id LIMIT 50),
      |lex AS (
      |  SELECT doc_id, row_number() OVER (
      |    ORDER BY bm25 DESC, doc_id) AS lex_rank
      |  FROM lex_top),
      |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
      |sem_top AS (
      |  SELECT vec_id,
      |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
      |      CAST(q_emb AS DOUBLE[])), 6) AS cos
      |  FROM embeddings CROSS JOIN qv WHERE vec_id <> 0
      |  ORDER BY cos DESC, vec_id LIMIT 50),
      |sem AS (
      |  SELECT vec_id AS doc_id, row_number() OVER (
      |    ORDER BY cos DESC, vec_id) AS sem_rank
      |  FROM sem_top)""".stripMargin

  private val rrfFuseSelect: String =
    """SELECT doc_id, lex_rank, sem_rank,
      |  round(coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 0)
      |    + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem_rank), 0), 6) AS rrf
      |FROM lex FULL JOIN sem USING (doc_id)
      |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  /** One query's lexical pivot over the shared `ts` per-(doc, term)
    * score CTE — literal term order, as the engine side.
    */
  private def lexPivotSql(qid: Long, terms: Seq[String]): String = {
    val sums = terms.map(t =>
      s"coalesce(max(CASE WHEN term = '$t' THEN s END), 0)")
      .mkString("\n      + ")
    s"""SELECT CAST($qid AS BIGINT) AS q_id, doc_id,
       |    round($sums, 6) AS bm25
       |  FROM ts GROUP BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "hybrid_rrf" -> s"$rrfOracleCommon\n$rrfFuseSelect",
    // hybrid_mmr_multi: per-query lexical pivots over one shared
    // term-score CTE, one semantic scan for all queries, per-q_id RRF
    // windows, then E17's unrolled greedy steps (q_id-generic)
    "hybrid_mmr_multi" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(string_split_regex(trim(text), '\\s+')) AS term
         |  FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN (${MultiQueries.flatMap(_._2).distinct
        .map(t => s"'$t'").mkString(", ")}) GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |ts AS (
         |  SELECT t.doc_id, t.term,
         |    ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2 /
         |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
         |  FROM tf t JOIN df USING (term) JOIN dl USING (doc_id)
         |  CROSS JOIN stats),
         |lexall AS (${MultiQueries.map { case (qid, terms) =>
        lexPivotSql(qid, terms) }.mkString("\n  UNION ALL\n  ")}),
         |lexr AS (SELECT q_id, doc_id, rn AS lex_rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY bm25 DESC, doc_id) AS rn FROM lexall)
         |  WHERE rn <= $ArmN),
         |semc AS (SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |      CAST(q.embedding AS DOUBLE[])), 6) AS cos
         |  FROM embeddings e JOIN embeddings q
         |    ON q.vec_id IN (${MultiQueries.map(_._1).mkString(", ")})
         |    AND e.vec_id <> q.vec_id),
         |semr AS (SELECT q_id, doc_id, rn AS sem_rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, doc_id) AS rn FROM semc)
         |  WHERE rn <= $ArmN),
         |fall AS (SELECT coalesce(l.q_id, s.q_id) AS q_id,
         |    coalesce(l.doc_id, s.doc_id) AS doc_id,
         |    l.lex_rank, s.sem_rank
         |  FROM lexr l FULL JOIN semr s
         |    ON l.q_id = s.q_id AND l.doc_id = s.doc_id),
         |fr0 AS (SELECT q_id, doc_id, lex_rank, sem_rank,
         |    round(coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + lex_rank), 0)
         |      + coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + sem_rank), 0),
         |      6) AS rrf
         |  FROM fall),
         |fr AS (SELECT q_id, doc_id, rrf, rn AS fused_rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY rrf DESC, doc_id) AS rn FROM fr0)
         |  WHERE rn <= $FuseN),
         |cand AS (SELECT f.q_id, f.doc_id AS cid,
         |    CAST(($FuseN + 1 - f.fused_rank) * ${1000000L / FuseN}
         |      AS BIGINT) AS rel_u, e.embedding
         |  FROM fr f JOIN embeddings e ON e.vec_id = f.doc_id),
         |pairs AS (SELECT a.q_id, a.cid AS a_id, b.cid AS b_id,
         |    CAST(round(round(list_cosine_similarity(
         |        CAST(a.embedding AS DOUBLE[]),
         |        CAST(b.embedding AS DOUBLE[])), 6) * 1000000, 0)
         |      AS BIGINT) AS sim_u
         |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.cid <> b.cid),
         |sel1 AS (SELECT q_id, cid, score_u, 1 AS rank FROM (SELECT q_id,
         |    cid, 7 * rel_u AS score_u, row_number() OVER (
         |      PARTITION BY q_id ORDER BY 7 * rel_u DESC, cid)
         |      AS rn FROM cand)
         |  WHERE rn = 1),
         |${Ann.mmrOracleSteps}
         |allsel AS (${(1 to Ann.MmrK).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")})
         |SELECT s.q_id, s.rank, s.cid AS doc_id, f.fused_rank, f.rrf,
         |  s.score_u / 10000000.0 AS mmr_score
         |FROM allsel s JOIN fr f ON f.q_id = s.q_id AND f.doc_id = s.cid
         |ORDER BY s.q_id, s.rank""".stripMargin,
    // hybrid_mmr: the rrf oracle as a CTE, rank-normalized micro-unit
    // relevance, then E17's unrolled greedy steps verbatim (same
    // cand/pairs/sel CTE contract)
    "hybrid_mmr" ->
      s"""$rrfOracleCommon,
         |fused AS ($rrfFuseSelect),
         |fr AS (SELECT doc_id, rrf, row_number() OVER (
         |    ORDER BY rrf DESC, doc_id) AS fused_rank FROM fused),
         |cand AS (SELECT CAST(0 AS BIGINT) AS q_id, f.doc_id AS cid,
         |    CAST(($FuseN + 1 - f.fused_rank) * ${1000000L / FuseN}
         |      AS BIGINT) AS rel_u, e.embedding
         |  FROM fr f JOIN embeddings e ON e.vec_id = f.doc_id),
         |pairs AS (SELECT a.q_id, a.cid AS a_id, b.cid AS b_id,
         |    CAST(round(round(list_cosine_similarity(
         |        CAST(a.embedding AS DOUBLE[]),
         |        CAST(b.embedding AS DOUBLE[])), 6) * 1000000, 0)
         |      AS BIGINT) AS sim_u
         |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.cid <> b.cid),
         |sel1 AS (SELECT q_id, cid, score_u, 1 AS rank FROM (SELECT q_id,
         |    cid, 7 * rel_u AS score_u, row_number() OVER (
         |      PARTITION BY q_id ORDER BY 7 * rel_u DESC, cid)
         |      AS rn FROM cand)
         |  WHERE rn = 1),
         |${Ann.mmrOracleSteps}
         |allsel AS (${(1 to Ann.MmrK).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")})
         |SELECT s.rank, s.cid AS doc_id, f.fused_rank, f.rrf,
         |  s.score_u / 10000000.0 AS mmr_score
         |FROM allsel s JOIN fr f ON f.doc_id = s.cid
         |ORDER BY s.rank""".stripMargin
  )
}
