package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval-style scoring over the corpus (SURVEY.md §2.C): TF-IDF
  * term salience, BM25 relevance ranking, and BPE merge-pair counting —
  * the lexical half of a training-data curation stack (the embedding
  * half lives in `graft.ann`).
  *
  * Scale notes: all three are explode → count → join pipelines whose
  * shuffles carry pre-aggregated (term/pair, partial-count) rows, never
  * raw token occurrences — map-side combine collapses each partition's
  * occurrences before the exchange. Corpus-level scalars (N, avgdl) are
  * one-row broadcasts. Double scoring expressions are written in ONE
  * fixed evaluation order (per-term pivot, then a literal a+b+c sum) so
  * the same IEEE result comes out of any partitioning — and out of the
  * DuckDB oracle.
  */
object Retrieval {

  private def toks: Column = split(trim(col("text")), "\\s+")

  /** C15 `text_tfidf` — top-3 TF-IDF terms per document with smoothed
    * IDF ln((N+1)/(df+1)). The tf frame is the only corpus-sized
    * shuffle; df joins back on the term key and N rides a one-row
    * broadcast. Scores are rounded to 6 decimals BEFORE ranking so the
    * rank order (score desc, term) is engine-stable.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame =
    textTfidfOf(Tables(spark, dir, "documents"))

  /** [[textTfidf]]'s kernel on caller documents frame. */
  def textTfidfOf(docs0: DataFrame): DataFrame = {
    val spark = docs0.sparkSession
    // the corpus ships as one file at test SFs → one scan split; spread
    // so the explode/count hot loop uses every core (same trade as the
    // ANN spread paths — worth it when per-row work dominates the one
    // small shuffle; a multi-file 100 TB corpus splits naturally)
    val docs = docs0
      .repartition(spark.sparkContext.defaultParallelism)
    // checkpoint the (doc, term, tf) frame: it feeds BOTH the df
    // aggregation and the scoring join, and the two subtrees prune
    // different columns so Spark plans two separate exchanges — the
    // r15 baseline measured the explode+count pass running twice
    // (~0.9 s each). Serialized storage per the r14 house rule; the
    // frame is the distinct (doc, term) surface both consumers need
    // anyway, far below the raw token explode.
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** The BM25 query terms (fixed, so the per-term pivot below has a
    * static column set) and the standard free parameters.
    */
  val Bm25Terms = Seq("spark", "join", "vector")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** C16 `bm25_rank` — BM25 relevance of every document against a fixed
    * query, top 20. idf = ln(1 + (N - df + 0.5)/(df + 0.5)); the length
    * normalizer uses the corpus mean document length (one-row broadcast
    * with N). Per-(doc, term) scores pivot into one column per query
    * term and sum in LITERAL term order — double addition is not
    * associative, so a fixed-order sum is what makes the score
    * reproducible across partitionings and engines.
    */
  def bm25Rank(spark: SparkSession, dir: String): DataFrame =
    bm25RankOf(Tables(spark, dir, "documents"))

  /** [[bm25Rank]]'s kernel on any (doc_id, text) frame. */
  def bm25RankOf(docs: DataFrame): DataFrame =
    bm25ScoresOf(docs, Bm25Terms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  /** Full per-document BM25 score frame (no ordering / limit) — shared
    * by [[bm25Rank]] and the hybrid RRF fusion in `graft.ann.Hybrid`.
    */
  def bm25Scores(spark: SparkSession, dir: String): DataFrame =
    bm25ScoresOf(Tables(spark, dir, "documents"), Bm25Terms)

  /** [[bm25Scores]] for ANY static term set (the multi-query hybrid
    * builds one arm per query's terms). The term list must be known at
    * plan-build time: the per-term pivot + literal-order sum is what
    * keeps the double addition reproducible across engines.
    */
  def bm25ScoresFor(spark: SparkSession, dir: String,
      terms: Seq[String]): DataFrame =
    bm25ScoresOf(Tables(spark, dir, "documents"), terms)

  /** [[bm25ScoresFor]]'s kernel on any (doc_id, text) frame. */
  def bm25ScoresOf(docs: DataFrame, terms: Seq[String]): DataFrame =
    bm25FromPerDoc(bm25PerDoc(docs, terms), terms, terms)

  /** ONE corpus pass for everything BM25 needs: per-document length
    * and per-literal-term tf land in a single map-side-combined
    * aggregation, then the corpus scalars (N, avgdl, per-term df)
    * reduce off that doc-sized frame. The r15 baseline measured the
    * old three-subtree spelling (dl, tf, and the dl join each
    * re-scanning + re-tokenizing the corpus, ~400 ms per scan at
    * sf0.1, ×3 queries in the multi arm) as hybrid_mmr_multi's whole
    * wall (guide §1.2: fix the algorithm's pass count first). The
    * checkpointed frame is O(docs × |terms|) longs — the natural
    * sample-slice shape at 100 TB, far below the exploded token frame
    * the old dl aggregation shuffled.
    */
  private[graft] def bm25PerDoc(docs: DataFrame,
      terms: Seq[String]): DataFrame = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$i") }
    val perDoc = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = perDoc.agg(count(lit(1)).as("n"),
      avg(col("dl")).as("avgdl") +: dfCols: _*)
    perDoc.crossJoin(broadcast(stats))
  }

  /** Per-document BM25 over `queryTerms` ⊆ `allTerms`, reading the
    * [[bm25PerDoc]] frame built for `allTerms`. Each term's score is a
    * pure function of (tf, dl, df, n, avgdl) — none depend on which
    * OTHER terms ride in the frame — and the final sum stays in
    * literal `queryTerms` order, so the result is bit-identical to a
    * dedicated single-query build (the multi-query hybrid arm shares
    * one corpus pass across all its queries on exactly this argument).
    */
  private[graft] def bm25FromPerDoc(perDoc: DataFrame,
      allTerms: Seq[String], queryTerms: Seq[String]): DataFrame = {
    // r16 (r15 ADVICE): literal term lists must be duplicate-free and
    // ⊆ allTerms — a repeated query term would count per occurrence in
    // n_terms where the old matched-rows spelling counted it once, and
    // a term outside allTerms would resolve to a phantom tf_-1 column.
    // Every current caller passes distinct subsets; fail loudly if a
    // future one doesn't. Index resolution via a Map, not indexOf.
    require(queryTerms.distinct == queryTerms,
      s"bm25FromPerDoc: duplicate query terms in $queryTerms")
    val idx = allTerms.zipWithIndex.toMap
    require(queryTerms.forall(idx.contains),
      s"bm25FromPerDoc: query terms not in the perDoc frame: " +
        queryTerms.filterNot(idx.contains).mkString(", "))
    def tfCol(t: String) = col(s"tf_${idx(t)}")
    def dfCol(t: String) = col(s"df_${idx(t)}")
    // per-term score, written in the OLD termScore expression's exact
    // evaluation order so the IEEE doubles reproduce
    val perTerm = queryTerms.map { t =>
      when(tfCol(t) > 0,
        log(lit(1) + (col("n") - dfCol(t) + 0.5) / (dfCol(t) + 0.5)) *
          tfCol(t) * (Bm25K1 + 1) /
          (tfCol(t) + lit(Bm25K1) *
            (lit(1 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    val nTerms = queryTerms.map(t =>
      when(tfCol(t) > 0, 1L).otherwise(0L)).reduceLeft(_ + _)
    perDoc
      .filter(queryTerms.map(t => tfCol(t) > 0).reduceLeft(_ || _))
      .select(col("doc_id"),
        round(perTerm.reduceLeft(_ + _), 6).as("bm25"),
        nTerms.as("n_terms"))
  }

  /** C17 `vocab_bpe_pairs` — adjacent character-pair frequencies inside
    * whitespace tokens: the count a BPE trainer's first merge iteration
    * maximizes. Position-range explode (sequence + substring) keeps the
    * pair extraction in whole-stage codegen; the (pair, partial-count)
    * shuffle is vocabulary-sized, not corpus-sized, and the top 30 is a
    * TakeOrderedAndProject, not a full sort.
    */
  def vocabBpePairs(spark: SparkSession, dir: String): DataFrame =
    vocabBpePairsOf(Tables(spark, dir, "documents"))


  /** [[vocabBpePairs]]'s kernel on any documents-shaped frame. */
  def vocabBpePairsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(col("doc_id"), col("tok"),
        explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
      .select(col("doc_id"),
        col("tok").substr(col("i"), lit(2)).as("pair"))
      .groupBy(col("pair"))
      .agg(
        count(lit(1)).as("pair_freq"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("pair_freq").desc, col("pair"))
      .limit(30)

  /** Vocabulary size for [[tokenizeIds]] — deliberately smaller than
    * the synthetic corpus's distinct-token count so the OOV path is
    * actually exercised.
    */
  val TokVocab = 20

  /** C18 `tokenize_ids` — the encode step in front of LLM training:
    * text → token-id sequence against a frequency-ranked vocabulary
    * (id = rank, OOV → [[TokVocab]]). The vocab is aggregated once
    * (vocabulary-sized shuffle), ranked on the driver-sized head, and
    * broadcast; encoding is then a map-only broadcast join. Per-doc
    * output is (token count, OOV count, md5 of the comma-joined id
    * sequence) — the fingerprint pins the FULL ordered sequence in the
    * compare without hauling every id row through the gate.
    */
  def tokenizeIds(spark: SparkSession, dir: String): DataFrame =
    tokenizeIdsOf(Tables(spark, dir, "documents"))


  /** [[tokenizeIds]]'s kernel on any documents-shaped frame. */
  def tokenizeIdsOf(docs: DataFrame): DataFrame = {
    val tokPos = docs.select(col("doc_id"),
      posexplode(toks).as(Seq("pos", "tok")))
    val vocab = tokPos.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(TokVocab)
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))) - 1)
      .select(col("tok"), col("id"))
    tokPos
      .join(broadcast(vocab), Seq("tok"), "left")
      .withColumn("tid", coalesce(col("id"), lit(TokVocab)))
      .withColumn("oov", when(col("id").isNull, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("oov")).as("n_oov"),
        md5(concat_ws(",",
          expr("transform(array_sort(collect_list(struct(pos, tid)))," +
            " x -> cast(x.tid as string))")).cast("binary")).as("ids_fp"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tfidf" -> (textTfidf _),
    "bm25_rank" -> (bm25Rank _),
    "vocab_bpe_pairs" -> (vocabBpePairs _),
    "tokenize_ids" -> (tokenizeIds _)
  )

  val oracle: Map[String, String] = Map(
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf,
        |    round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, tfidf, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rk
        |  FROM scored) s
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "bm25_rank" ->
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
        |  CROSS JOIN stats)
        |SELECT doc_id,
        |  round(coalesce(max(CASE WHEN term = 'spark' THEN s END), 0)
        |    + coalesce(max(CASE WHEN term = 'join' THEN s END), 0)
        |    + coalesce(max(CASE WHEN term = 'vector' THEN s END), 0), 6)
        |    AS bm25,
        |  count(*) AS n_terms
        |FROM term_s GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "tokenize_ids" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    toklist[CAST(i AS INT)] AS tok
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(text), '\s+') AS toklist
        |        FROM documents),
        |  unnest(range(1, len(toklist) + 1)) AS t(i)),
        |vocab AS (
        |  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) - 1 AS id
        |  FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
        |  ORDER BY cnt DESC, tok LIMIT 20),
        |enc AS (
        |  SELECT t.doc_id, t.pos, coalesce(v.id, 20) AS id,
        |    CASE WHEN v.id IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM toks t LEFT JOIN vocab v USING (tok))
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_fp
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "vocab_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id, substring(tok, CAST(i AS INT), 2) AS pair
        |  FROM toks, unnest(range(1, length(tok))) AS t(i)
        |  WHERE length(tok) >= 2)
        |SELECT pair, count(*) AS pair_freq,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM pairs GROUP BY 1
        |ORDER BY pair_freq DESC, pair LIMIT 30""".stripMargin
  )
}
