package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level quality and composition operators for training-data
  * pipelines (SURVEY.md §2.C additions): repetition gates, a unigram
  * language-model perplexity signal, and temperature-weighted mixture
  * computation. These are the filters/reports that run over the WHOLE
  * corpus right before sampling, so every plan here is either map-only
  * per document or aggregates to a frame whose size is bounded by the
  * vocabulary / source count, never by the document count.
  */
object CorpusQuality {

  private def toks: Column = split(trim(col("text")), "\\s+")

  /** `text_repetition` — repetition-based quality signals (the
    * Gopher-rule family): duplicate-token fraction, most-common-token
    * count, top-bigram fraction. All three are computed MAP-ONLY: the
    * per-doc top token/bigram is the longest run in the doc's own
    * sorted token/bigram array via an in-row `aggregate` fold (HOFs
    * are fine in a projection — only Generate fan-out makes them hot;
    * see word_shingles), so the corpus pass has zero shuffle and the
    * flag thresholds compare exact integers, never engine-rounded
    * floats.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    textRepetitionOf(Tables(spark, dir, "documents"))


  /** [[textRepetition]]'s kernel on any documents-shaped frame. */
  def textRepetitionOf(docs: DataFrame): DataFrame = {
    // longest run of equal adjacent elements in a sorted string array
    def maxRun(arr: String): String =
      s"""aggregate($arr,
         |  named_struct('prev', cast(null as string),
         |    'run', cast(0 as bigint), 'best', cast(0 as bigint)),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run', CASE WHEN x <=> acc.prev
         |      THEN acc.run + 1 ELSE cast(1 as bigint) END,
         |    'best', greatest(acc.best, CASE WHEN x <=> acc.prev
         |      THEN acc.run + 1 ELSE cast(1 as bigint) END)),
         |  acc -> acc.best)""".stripMargin
    docs
      .withColumn("w", toks)
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_distinct",
        size(array_distinct(col("w"))).cast("long"))
      .withColumn("top_token_n", expr(maxRun("array_sort(w)")))
      .withColumn("bigrams", expr(
        """CASE WHEN size(w) >= 2
          |  THEN transform(sequence(1, size(w) - 1),
          |    i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
          |  ELSE array() END""".stripMargin))
      .withColumn("top_bigram_n", expr(maxRun("array_sort(bigrams)")))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        round((col("n_tokens") - col("n_distinct")) * 1.0 / col("n_tokens"), 4)
          .as("dup_token_frac"),
        col("top_token_n"),
        col("top_bigram_n"),
        // integer-exact flags: frac > threshold spelled as cross-mults
        (((col("n_tokens") - col("n_distinct")) * 10 > col("n_tokens") * 3) ||
          (col("top_bigram_n") * 10 > (col("n_tokens") - 1) * 2))
          .cast("int").as("is_repetitive"))
      .orderBy(col("doc_id"))
  }

  /** `text_ngram_lm` — unigram language-model score per document: the
    * corpus's own token frequencies as the model, each doc scored by
    * mean −log2 P(token) (bits/token; e.g. the KenLM-style perplexity
    * gate with the model reduced to unigrams). Two passes: the
    * vocabulary aggregation (shuffle keyed on token, map-side
    * combine), then per-(doc, token) counts join the vocab on token —
    * join input is DISTINCT (doc, token) pairs, not raw occurrences,
    * and the per-doc score is the count-weighted mean. The one-row
    * corpus total rides in via crossJoin (no unpartitioned window).
    */
  def textNgramLm(spark: SparkSession, dir: String): DataFrame =
    textNgramLmOf(Tables(spark, dir, "documents"))


  /** [[textNgramLm]]'s kernel on any documents-shaped frame. */
  def textNgramLmOf(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(toks).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val perDoc = tok.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    perDoc
      .join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        round(
          sum(col("c") * -log2(col("cnt") * lit(1.0) / col("total"))) /
            sum(col("c")), 4).as("bits_per_token"))
      .orderBy(col("doc_id"))
  }

  /** `text_bigram_lm` — bigram language-model score per document
    * (one step up from [[textNgramLm]]'s unigram model, the shape real
    * perplexity gates use): P(w|prev) Laplace-smoothed over the
    * corpus's own bigram counts, each doc scored by mean
    * −log2 P(w_i | w_{i−1}) over its token transitions. The model
    * tables (bigram counts, prev-token totals, vocab size) come from
    * one exploded pass; docs join the model on the bigram key with
    * DISTINCT per-doc transition counts, so the join input is bounded
    * by distinct transitions, not raw tokens. All probabilities are
    * ratios of exact integer counts — the only doubles are the final
    * log/mean, guarded by the 4-dp round.
    */
  def textBigramLm(spark: SparkSession, dir: String): DataFrame =
    textBigramLmOf(Tables(spark, dir, "documents"))

  /** [[textBigramLm]]'s kernel on caller documents frame. */
  def textBigramLmOf(docs0: DataFrame): DataFrame = {
    val spark = docs0.sparkSession
    // single-file corpus arrives as one scan split; spread BEFORE the
    // exploded transition passes so the three Generate stages (model
    // counts + per-doc counts) run on every core, not one — the same
    // trade as heavy_hitters / text_tfidf. Both exploded subtrees hang
    // off the SAME exchange, so ReusedExchange keeps it to one scan.
    val docs = docs0
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("w", toks)
      .filter(size(col("w")) >= 2)
    val trans = docs
      .select(col("doc_id"), col("w"),
        explode(expr(
          """transform(sequence(1, size(w) - 1),
            |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"""
            .stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg"))
    val bgCounts = trans.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
      .withColumn("prev", substring_index(col("bg"), " ", 1))
    val prevCounts = bgCounts.groupBy(col("prev"))
      .agg(sum(col("c_bg")).as("c_prev"))
    val vocabSize = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(explode(toks).as("tok")).agg(
        countDistinct(col("tok")).as("v"))
    val perDoc = trans.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
    perDoc
      .join(bgCounts, Seq("bg"))
      .join(prevCounts, Seq("prev"))
      .crossJoin(broadcast(vocabSize))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_transitions"),
        round(
          sum(col("c") * -log2((col("c_bg") + lit(1.0)) /
            (col("c_prev") + col("v")))) / sum(col("c")), 4)
          .as("bits_per_transition"))
      .orderBy(col("doc_id"))
  }

  val CurriculumPhases = 4 // training phases (easy → hard)

  /** `corpus_curriculum` — curriculum ordering of the corpus: split
    * documents into [[CurriculumPhases]] length-ordered training
    * phases (the short-to-long schedule sequence-length curricula
    * use), each phase reported with its doc/token budget and the md5
    * fingerprint of its exact member set — the artifact a training
    * run schedules from.
    *
    * The global order is computed WITHOUT a global sort (B63's rule
    * spelled for phase assignment): one map-side-combined groupBy
    * collapses the corpus to the O(distinct lengths) bucket frame,
    * the running count windows over THAT tiny frame, and each
    * bucket's phase is ⌊P·cum_before/n⌋ — docs join their bucket's
    * phase via a broadcast of the bucket table. Ties (docs of equal
    * length straddling a boundary) land in the lower phase as a
    * bucket, so the assignment is deterministic and engine-exact
    * (pure integer arithmetic); phase sizes are balanced up to
    * bucket granularity.
    */
  def corpusCurriculum(spark: SparkSession, dir: String): DataFrame =
    corpusCurriculumOf(Tables(spark, dir, "documents"))


  /** [[corpusCurriculum]]'s kernel on any documents-shaped frame. */
  def corpusCurriculumOf(docs: DataFrame): DataFrame =
    curriculum(docs)

  /** [[corpusCurriculum]]'s kernel on any documents-shaped frame. */
  private[text] def curriculum(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
    val buckets = d.groupBy(col("n_tokens")).agg(count(lit(1)).as("cnt"))
    val wb = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tot = buckets.agg(sum(col("cnt")).as("n_total"))
    val phased = buckets
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(wb), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("phase",
        expr(s"cum_before * $CurriculumPhases div n_total"))
      .select(col("n_tokens"), col("phase"))
    d.join(broadcast(phased), Seq("n_tokens"))
      .groupBy(col("phase"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_total"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
          _.cast("string")), ",").cast("binary")).as("docs_fp"))
      .orderBy(col("phase"))
  }

  /** `corpus_mix` — training-mixture computation: per-source token
    * counts reweighted by temperature sampling (w ∝ tokens^α, α=0.7 —
    * the multilingual/multi-domain rebalancing rule), with the
    * expected per-source epoch count at a fixed token budget. The
    * corpus pass is one map-side-combined aggregation to an O(sources)
    * frame; everything after (total, weights, epochs) is arithmetic on
    * that tiny frame with the total as a one-row broadcast.
    */
  def corpusMix(spark: SparkSession, dir: String): DataFrame =
    corpusMixOf(Tables(spark, dir, "documents"))


  /** [[corpusMix]]'s kernel on any documents-shaped frame. */
  def corpusMixOf(docs: DataFrame): DataFrame = {
    val Budget = 1000000L // sampled-token budget per mixture epoch
    val perSource = docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks)).cast("long").as("n_tokens"))
      .withColumn("w_raw", pow(col("n_tokens").cast("double"), 0.7))
    val total = perSource.agg(sum(col("w_raw")).as("w_total"))
    perSource
      .crossJoin(broadcast(total))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("w_raw") / col("w_total"), 6).as("weight"),
        round(col("w_raw") / col("w_total") * Budget / col("n_tokens"), 4)
          .as("epochs_at_budget"))
      .orderBy(col("source"))
  }

  /** `corpus_sample` — APPLY the [[corpusMix]] mixture: per-source
    * keep-rates p = min(1, w·B / tokens) become deterministic per-doc
    * hash thresholds (first 4 hex digits of md5(doc_id) as a uniform
    * 16-bit draw, kept iff draw < ⌊p·65536⌋ — the same
    * no-RNG-state, bit-reproducible sampling contract as the split /
    * shuffle operators, so the sampled corpus is identical on any
    * engine, any partitioning, any run). Map-only over the corpus once
    * rates are known; rates come from the O(sources) frame broadcast
    * back. Reports per-source achieved vs target rates.
    */
  def corpusSample(spark: SparkSession, dir: String): DataFrame =
    corpusSampleOf(Tables(spark, dir, "documents"))

  /** [[corpusSample]]'s kernel on caller documents frame. */
  def corpusSampleOf(docs: DataFrame): DataFrame = {
    val Budget = 1000000L
    val perSource = docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks)).cast("long").as("n_tokens"))
      .withColumn("w_raw", pow(col("n_tokens").cast("double"), 0.7))
    val total = perSource.agg(sum(col("w_raw")).as("w_total"))
    val rates = perSource.crossJoin(broadcast(total))
      .withColumn("thresh", floor(
        least(col("w_raw") / col("w_total") * Budget / col("n_tokens"),
          lit(1.0)) * 65536).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("thresh"))
    docs
      .withColumn("draw", conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long"))
      .withColumn("n_doc_tokens", size(toks).cast("long"))
      .join(broadcast(rates), Seq("source"))
      .groupBy(col("source"))
      .agg(
        first(col("thresh")).as("thresh"),
        first(col("n_docs")).as("n_docs"),
        sum((col("draw") < col("thresh")).cast("long")).as("n_kept"),
        sum(when(col("draw") < col("thresh"), col("n_doc_tokens"))
          .otherwise(0L)).as("kept_tokens"))
      .select(
        col("source"), col("n_docs"), col("n_kept"), col("kept_tokens"),
        round(col("thresh") / 65536.0, 6).as("target_rate"),
        round(col("n_kept") * 1.0 / col("n_docs"), 4).as("achieved_rate"))
      .orderBy(col("source"))
  }

  val ChunkTokens = 64 // chunk width
  val ChunkStride = 48 // stride (64 − 48 = 16-token overlap)

  /** `text_chunks` — overlapping context-window chunking (RAG indexing
    * / long-doc training prep): each doc splits into
    * [[ChunkTokens]]-token windows advancing by [[ChunkStride]], so
    * consecutive chunks share a 16-token overlap and no boundary
    * sentence is ever lost to a cut. Map-only explode per doc — chunk
    * count, ids, text hashes and exact token spans are all derived
    * per-row, and the fan-out is len/stride ≈ 1.3×, not quadratic.
    * Emits (chunk_id, span, n_tokens, md5) — the frame an embedding or
    * index job consumes next.
    */
  def textChunks(spark: SparkSession, dir: String): DataFrame =
    textChunksOf(Tables(spark, dir, "documents"))


  /** [[textChunks]]'s kernel on any documents-shaped frame. */
  def textChunksOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", toks)
      .withColumn("n", size(col("w")))
      .withColumn("chunk_id", explode(expr(
        s"""sequence(0, int(greatest(ceil((n - $ChunkTokens)
           |  / cast($ChunkStride as double)), 0)))""".stripMargin)))
      .select(
        col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkStride + 1).as("tok_start"),
        least(col("chunk_id") * ChunkStride + ChunkTokens, col("n"))
          .as("tok_end"),
        expr(s"""size(slice(w, chunk_id * $ChunkStride + 1, $ChunkTokens))""")
          .cast("long").as("n_tokens"),
        md5(expr(
          s"array_join(slice(w, chunk_id * $ChunkStride + 1, $ChunkTokens), ' ')"))
          .as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val BpeIters = 3

  /** `bpe_train` — BPE tokenizer training, the real iterative loop
    * (vocab_bpe_pairs computes one round's counts; this RUNS the
    * merges): classic BPE over the word-frequency table — each word a
    * space-separated char sequence, each round counts adjacent-pair
    * frequencies (weighted by word freq), picks the argmax (count
    * desc, pair asc — integer counts, so the choice is exact on any
    * engine), and rewrites sequences with the merged symbol. The
    * corpus is touched ONCE (word-freq aggregation, the standard BPE
    * preprocessing); rounds run over the O(vocab) frequency table with
    * only the chosen pair driver-materialized per round (one row — the
    * k-means pattern again). Emits the merge table: the artifact a
    * tokenizer ships.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrainOf(Tables(spark, dir, "documents"))

  /** [[bpeTrain]]'s kernel on any (doc_id, text) frame. */
  def bpeTrainOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, _) = bpeLearn(spark, bpeWordsOf(docs))
    merges.toDF("iteration", "merged_pair", "pair_count")
      .orderBy(col("iteration"))
  }

  /** The C24 preprocessing frame: corpus word frequencies with each
    * word exploded to a space-separated char sequence — BPE's working
    * state. One corpus scan; O(vocab) rows after.
    */
  private def bpeWords(spark: SparkSession, dir: String): DataFrame =
    bpeWordsOf(Tables(spark, dir, "documents"))

  /** [[bpeWords]] on any (doc_id, text) frame. */
  private[text] def bpeWordsOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("seq", expr(
        """array_join(transform(sequence(1, char_length(w)),
          |  i -> substring(w, i, 1)), ' ')""".stripMargin))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The C24 merge LOOP, factored so training (C24 reports the merge
    * table) and encoding (C38 applies it) share one code path: runs
    * [[BpeIters]] rounds over the word frame, returning the merge
    * table AND the fully-rewritten word frame — word → final symbol
    * sequence, which IS the encode dictionary a tokenizer ships.
    */
  private[text] def bpeLearn(spark: SparkSession, words0: DataFrame)
      : (Seq[(Int, String, Long)], DataFrame) = {
    val (merges, stages) = bpeLearnStages(spark, words0)
    (merges, stages.last)
  }

  /** [[bpeLearn]] with every intermediate kept: `stages(k-1)` is the
    * word frame after k merge rounds — the per-budget dictionaries
    * C43's vocab sweep scores without re-running the loop.
    */
  private[text] def bpeLearnStages(spark: SparkSession, words0: DataFrame)
      : (Seq[(Int, String, Long)], Seq[DataFrame]) = {
    import spark.implicits._
    var words = words0
    val pairsOf = expr(
      """CASE WHEN size(split(seq, ' ')) >= 2
        |  THEN transform(sequence(1, size(split(seq, ' ')) - 1),
        |    i -> concat(element_at(split(seq, ' '), i), ' ',
        |      element_at(split(seq, ' '), i + 1)))
        |  ELSE array() END""".stripMargin)
    val merges = Seq.newBuilder[(Int, String, Long)]
    val stages = Seq.newBuilder[DataFrame]
    for (k <- 1 to BpeIters) {
      val top = words
        .select(col("freq"), explode(pairsOf).as("pr"))
        .groupBy(col("pr")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pr")).limit(1)
        .as[(String, Long)].collect()(0)
      merges += ((k, top._1, top._2))
      // Boundary-anchored rewrite: a bare replace(seq, 'x y', 'xy')
      // can merge across symbol boundaries once multi-char symbols
      // exist (symbol 'ax' + 'y' would match 'x y'). Widening every
      // separator to TWO spaces and anchoring the pattern with one
      // space on each side makes each match consume only half of each
      // boundary, so adjacent occurrences ('x y x y') still all merge
      // — exactly the left-to-right non-overlapping rewrite real BPE
      // does. The oracle mirrors the same spelling.
      val esc = (s: String) => s.replace("'", "\\'")
      val pat = esc(top._1.replace(" ", "  "))
      val sym = esc(top._1.replace(" ", ""))
      words = words.withColumn("seq", expr(
        s"trim(replace(replace(concat(' ', replace(seq, ' ', '  '), ' '), " +
          s"' $pat ', ' $sym '), '  ', ' '))"))
      stages += words
    }
    (merges.result(), stages.result())
  }

  /** C38 `bpe_encode` — APPLY the learned merge table to the corpus:
    * the actual tokenizer step a training pipeline hands its
    * dataloader (C24 trains the merges, C18 ranks ids; this one turns
    * text into the post-merge symbol stream). The dictionary is the
    * loop's rewritten word frame — word → final symbol sequence — so
    * encoding a document is a per-token dictionary lookup, NOT a
    * per-document rewrite: the merge closure is applied once per
    * DISTINCT word on the O(vocab) frame, and the corpus-sized pass is
    * a broadcast-join projection (a shipped tokenizer dictionary is a
    * bounded artifact — ~50k entries in production — so the broadcast
    * holds at any corpus size; the train-side vocab stand-in here is
    * corpus-derived but the plan is the same either way).
    *
    * Per doc: word count, char count, post-merge symbol count (chars −
    * symbols = merge applications landed), and the md5 fingerprint of
    * the FULL ordered symbol stream (C18's trick: pins the entire
    * encoded sequence through the gate without hauling every symbol
    * row). Spec replays the whole train+encode chain against an
    * independent plain-Scala BPE and pins the merge-table round-trip.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodeOf(Tables(spark, dir, "documents"))

  /** [[bpeEncode]]'s kernel on caller documents frame. */
  def bpeEncodeOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    bpeEncodeDocs(spark, docs)
  }

  /** Full train+encode chain on any (doc_id, text) frame. */
  private[text] def bpeEncodeDocs(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    val (_, dict) = bpeLearn(spark, bpeWordsOf(docs))
    bpeEncodeWith(docs, dict)
  }

  /** [[bpeEncode]]'s corpus pass against any (w, seq) dictionary. */
  private[text] def bpeEncodeWith(docs: DataFrame,
      dict: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "w")))
      .join(broadcast(dict.select(col("w"), col("seq"))), Seq("w"))
      .withColumn("nsym", size(split(col("seq"), " ")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(char_length(col("w")).cast("long")).as("n_chars"),
        sum(col("nsym")).as("n_symbols"),
        md5(concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, seq)))," +
            " x -> x.seq)")).cast("binary")).as("enc_fp"))
      .orderBy(col("doc_id"))

  /** C40 `tokenize_fertility` — per-language fertility of the learned
    * tokenizer: symbols-per-word and chars-per-symbol under C24's
    * merge table, rolled up by language (THE standard tokenizer-eval
    * metric — a shared vocab trained on a mixed corpus over-merges
    * the dominant language and shreds the rest, so fertility decides
    * how vocab capacity is allocated across languages and which
    * language's text silently costs 2× the sequence length at
    * training time; C37 evals the langid model, D10 the LSH banding —
    * this is the eval-as-data row for the tokenizer). Same
    * train-once/encode-by-dictionary plan as C38: the merge closure
    * runs on the O(vocab) word frame, the corpus pass is one
    * broadcast-dictionary join, then ONE map-side-combined shuffle to
    * the O(languages) frame; ratios ship as exact floor-division
    * basis points (the C26 rule). Spec plants a merge-friendly and a
    * merge-hostile language and pins the fertility gap plus exact
    * hand-computed counts.
    */
  def tokenizeFertility(spark: SparkSession, dir: String): DataFrame =
    tokenizeFertilityOf(Tables(spark, dir, "documents"))

  /** [[tokenizeFertility]]'s kernel on caller documents frame. */
  def tokenizeFertilityOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    tokenizeFertilityDocs(spark, docs)
  }

  /** [[tokenizeFertility]]'s chain on any (doc_id, text, lang) frame. */
  private[text] def tokenizeFertilityDocs(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    val (_, dict) = bpeLearn(spark, bpeWordsOf(docs))
    docs
      .select(col("lang"), col("doc_id"), explode(toks).as("w"))
      .join(broadcast(dict.select(col("w"), col("seq"))), Seq("w"))
      .withColumn("nsym", size(split(col("seq"), " ")).cast("long"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(char_length(col("w")).cast("long")).as("n_chars"),
        sum(col("nsym")).as("n_symbols"))
      .withColumn("fertility_bp",
        expr("n_symbols * 10000 div n_words"))
      .withColumn("chars_per_sym_bp",
        expr("n_chars * 10000 div n_symbols"))
      .orderBy(col("lang"))
  }

  /** C43 `bpe_vocab_sweep` — the vocab-capacity CURVE: C40's
    * per-language fertility at EVERY merge budget 1..[[BpeIters]]
    * (D17/D18's tuning-sweep pattern applied to the tokenizer — vocab
    * size is the one knob a tokenizer turns, trading merge-table
    * capacity against sequence length, and this table is what that
    * decision reads: where each language's fertility curve flattens
    * is where additional vocab stops paying for that language).
    *
    * ONE scoring pass: the corpus collapses once to the O(langs ×
    * vocab) per-(lang, word) count frame — word/char masses are
    * BUDGET-INDEPENDENT, only the symbol count moves — and each
    * budget point is then a broadcast join of that frame against the
    * loop's stage-k dictionary (O(vocab) rows each) + one rollup; the
    * corpus is never re-touched per point, exactly D18's
    * sufficient-statistic discipline. Ratios in exact floor-division
    * basis points (the C26 rule). Oracle reuses the unrolled
    * `bpeRoundOracle` chain with one fertility rollup per stage.
    */
  def bpeVocabSweep(spark: SparkSession, dir: String): DataFrame =
    bpeVocabSweepOf(Tables(spark, dir, "documents"))

  /** [[bpeVocabSweep]]'s kernel on caller documents frame. */
  def bpeVocabSweepOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    bpeVocabSweepDocs(spark, docs)
  }

  /** [[bpeVocabSweep]]'s chain on any (doc_id, text, lang) frame. */
  private[text] def bpeVocabSweepDocs(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    val (_, stages) = bpeLearnStages(spark, bpeWordsOf(docs))
    val lw = docs
      .select(col("lang"), explode(toks).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("n_w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perBudget = stages.zipWithIndex.map { case (dict, i) =>
      lw.join(broadcast(dict.select(col("w"), col("seq"))), Seq("w"))
        .withColumn("nsym", size(split(col("seq"), " ")).cast("long"))
        .groupBy(col("lang"))
        .agg(sum(col("n_w")).as("n_words"),
          sum(col("n_w") * char_length(col("w")).cast("long"))
            .as("n_chars"),
          sum(col("n_w") * col("nsym")).as("n_symbols"))
        .withColumn("n_merges", lit(i + 1))
    }
    perBudget.reduce(_.unionByName(_))
      .withColumn("fertility_bp", expr("n_symbols * 10000 div n_words"))
      .withColumn("chars_per_sym_bp",
        expr("n_chars * 10000 div n_symbols"))
      .select(col("n_merges"), col("lang"), col("n_words"),
        col("n_chars"), col("n_symbols"), col("fertility_bp"),
        col("chars_per_sym_bp"))
      .orderBy(col("n_merges"), col("lang"))
  }

  val GrowthBuckets = 10 // prefix checkpoints for the growth curve

  /** C42 `vocab_growth` — the Heaps-law vocabulary growth curve:
    * cumulative distinct tokens vs cumulative token mass at
    * [[GrowthBuckets]] prefix checkpoints of the corpus in doc_id
    * order (the corpus-diversity diagnostic: a healthy crawl keeps
    * minting new vocabulary roughly as n^β, a flattening curve says
    * the incoming data is re-treading what the corpus already has —
    * the macro signal that D11/C39 explain per source — and the
    * type-token ratio trend feeds the same mixture decisions as C21).
    *
    * Scale shape — NO global sort anywhere: checkpoints are the
    * equal-width doc_id value grid off one broadcast min/max row (the
    * A32 span trick; prefix-by-value ≡ prefix-by-order for the ranked
    * ingest ids a pipeline assigns, and stays exact integer
    * arithmetic at any id density), a token's first-occurrence
    * checkpoint is min(doc_id)'s bucket off ONE token-keyed
    * map-side-combined shuffle, per-bucket doc/token masses are one
    * doc-level aggregation, and every cumulative window runs over the
    * O([[GrowthBuckets]]) spine (B63's rule). Output: one row per
    * checkpoint with cumulative docs / tokens / distinct tokens, the
    * decile's newly-minted distinct count, and the exact basis-point
    * type-token ratio.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    vocabGrowthOf(Tables(spark, dir, "documents"))

  /** [[vocabGrowth]]'s kernel on caller documents frame. */
  def vocabGrowthOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    vocabGrowthOf(spark, docs)
  }

  /** [[vocabGrowth]]'s kernel on any (doc_id, text) frame. */
  private[text] def vocabGrowthOf(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    val b = GrowthBuckets
    val span = docs.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi"))
    def bucketOf(name: String): Column =
      expr(s"($name - lo) * $b div (hi - lo + 1)") + 1
    val d = docs
      .select(col("doc_id"), size(TextOps.tokens(col("text")))
        .cast("long").as("n_toks"))
      .crossJoin(broadcast(span))
      .withColumn("bkt", bucketOf("doc_id"))
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val firsts = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tk"))
      .groupBy(col("tk")).agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(span))
      .withColumn("bkt", bucketOf("first_doc"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("new_distinct"))
    val spine = spark.range(1, b + 1)
      .select(col("id").as("bkt"))
    val w = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(d, Seq("bkt"), "left")
      .join(firsts, Seq("bkt"), "left")
      .na.fill(0L, Seq("n_docs", "n_tokens", "new_distinct"))
      .withColumn("n_docs_cum", sum(col("n_docs")).over(w))
      .withColumn("n_tokens_cum", sum(col("n_tokens")).over(w))
      .withColumn("n_distinct_cum", sum(col("new_distinct")).over(w))
      .withColumn("ttr_bp",
        expr("n_distinct_cum * 10000 div greatest(n_tokens_cum, 1)"))
      .select(col("bkt").as("checkpoint"), col("n_docs_cum"),
        col("n_tokens_cum"), col("new_distinct"), col("n_distinct_cum"),
        col("ttr_bp"))
      .orderBy(col("checkpoint"))
  }

  val QcDim = 1024     // hashed bag-of-words feature buckets
  val QcMult = 2654435761L // Knuth multiplicative hash spreads bucket→weight
  val QcMod = 1997L    // prime weight lattice: w ∈ [−998, 998] ⊂ ℤ
  val QcHalf = 998L
  val QcScale = 250.0  // logit scale: score_int / (n_tokens · QcScale)

  /** `quality_classifier` — model-based quality gate, the fasttext-
    * style linear classifier every production corpus pipeline runs
    * after the rule-based gates (CCNet/LLaMA-shape: hashed bag-of-words
    * features × a trained weight vector → sigmoid keep-probability).
    * Features are [[QcDim]]-bucket hashed token counts; the "trained"
    * weight vector is a deterministic lattice w(b) = (b·[[QcMult]] mod
    * [[QcMod]]) − [[QcHalf]] standing in for real learned weights (no
    * trainable deps in this environment) — the plumbing is exactly what
    * a real model needs: at scale the weight array is a broadcast
    * O(QcDim) lookup, and here it collapses into the expression itself.
    *
    * Scale shape: ZERO shuffle — the per-doc logit is an in-row
    * `aggregate` fold over the token array (integer accumulation, so
    * the score is exact and order-independent: no float-sum
    * partitioning leak), and the keep flag compares the INTEGER logit
    * numerator against 0 (sigmoid ≥ 0.5 ⟺ score_int ≥ 0), so the
    * gate can never flip on engine rounding. The only doubles are the
    * reported logit/sigmoid, guarded by 6/4-dp rounds.
    */
  /** The classifier's integer logit numerator over a `toks` array
    * column — a pure projection, so the batch query and the streaming
    * intake ([[graft.streaming.CorpusStream]]) share one scoring path.
    */
  def classifierScoreInt: Column = expr(
    s"""aggregate(toks, CAST(0 AS BIGINT), (acc, t) ->
       |  acc + (((CAST(conv(substring(md5(CAST(t AS BINARY)), 1, 4),
       |    16, 10) AS BIGINT) % $QcDim) * $QcMult) % $QcMod
       |    - $QcHalf))""".stripMargin)

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierOf(Tables(spark, dir, "documents"))


  /** [[qualityClassifier]]'s kernel on any documents-shaped frame. */
  def qualityClassifierOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", toks)
      .withColumn("score_int", classifierScoreInt)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("logit_raw",
        col("score_int") / (col("n_tokens") * lit(QcScale)))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("score_int"),
        // micro-unit FLOOR, not round(…, 6): the logit is the rational
        // score_int/(250·n_tokens), and at sf1 the full-registry gate
        // caught three docs landing EXACTLY on a round-half boundary
        // (e.g. 16589/16000 = 1.0368125 → HALF_UP 1.036813 vs DuckDB's
        // half-even 1.036812) — the §5 determinism lane: floor of the
        // same IEEE double is engine-exact where round is not
        floor(col("score_int") * lit(1000000L) /
          (col("n_tokens") * lit(QcScale))).cast("long")
          .as("logit_micro"),
        round(lit(1.0) / (lit(1.0) + exp(-col("logit_raw"))), 4)
          .as("score"),
        (col("score_int") >= 0).cast("int").as("keep"))
      .orderBy(col("doc_id"))

  /** C32 `corpus_budget` — EXACT token-budget selection per source (the
    * cut step after C21 computes weights and C22 applies keep-RATES: a
    * rate hits a budget only in expectation; this hits it exactly):
    * each source's budget is its tokens^0.7 temperature share of a
    * global budget, docs are taken in deterministic md5(doc_id) order
    * while the source's RUNNING token total stays within budget.
    * One shuffle (the per-source window cumsum) + the O(sources)
    * budget frame broadcast back; selection identity is pinned by md5
    * of the ordered kept-id list, so two engines can't silently agree
    * on counts while picking different documents. The per-source sort
    * is the operator's scale cost — skew-bounded by the largest
    * source; a dominant source range-partitions on the same draw
    * column.
    */
  def corpusBudget(spark: SparkSession, dir: String): DataFrame =
    corpusBudgetOf(Tables(spark, dir, "documents"))

  /** [[corpusBudget]]'s kernel on caller documents frame. */
  def corpusBudgetOf(docs0: DataFrame): DataFrame = {
    val spark = docs0.sparkSession
    val Budget = 500000L // global token budget across sources
    val docs = docs0
      .withColumn("n_doc_tokens", size(toks).cast("long"))
      .withColumn("draw", conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long"))
      .select(col("doc_id"), col("source"), col("n_doc_tokens"), col("draw"))
    // The per-source frame is O(sources) — driver-sized by definition —
    // so collect it ONCE and finish the share arithmetic locally: the
    // declarative perSource→total crossJoin spelling makes Catalyst
    // re-execute the whole scan+agg subtree for the broadcast side,
    // i.e. two extra corpus scans for a two-double computation.
    import spark.implicits._
    val ps = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_doc_tokens")).as("n_tokens"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val wTotal = ps.map(p => math.pow(p._3.toDouble, 0.7)).sum
    val budgets = ps.map { case (src, nDocs, nTokens) =>
      (src, nDocs,
        math.floor(math.pow(nTokens.toDouble, 0.7) / wTotal * Budget).toLong)
    }.toDF("source", "n_docs", "budget_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("draw"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.join(broadcast(budgets), Seq("source"))
      .withColumn("cum", sum(col("n_doc_tokens")).over(w))
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy(col("source"))
      .agg(
        first(col("n_docs")).as("n_docs"),
        first(col("budget_tokens")).as("budget_tokens"),
        count(lit(1)).as("n_selected"),
        sum(col("n_doc_tokens")).as("selected_tokens"),
        expr("""md5(cast(array_join(transform(
          array_sort(collect_list(struct(draw, doc_id))),
          x -> cast(x.doc_id as string)), ',') as binary))""").as("sel_fp"))
      .select(col("source"), col("n_docs"), col("budget_tokens"),
        col("n_selected"), col("selected_tokens"),
        round(col("selected_tokens") / col("budget_tokens").cast("double"), 4)
          .as("fill"),
        col("sel_fp"))
      .orderBy(col("source"))
  }

  val DsirBuckets = 256L // hashed n-gram feature space size

  /** C34 `corpus_dsir` — Data Selection via Importance Resampling
    * weights (Xie et al. 2023's recipe for steering a raw corpus
    * toward a target distribution — the selection method one up from
    * C27's absolute quality score: DSIR scores how TARGET-LIKE a doc
    * is, not how clean): unigram features hash into [[DsirBuckets]]
    * buckets (md5 — the house cross-engine hash), bucket bag-of-words
    * models are estimated for the target slice (English docs here)
    * and the full corpus with add-one smoothing, and each document's
    * importance is its tokens' summed log-likelihood ratio
    * ln p̂_target(b) − ln p̂_raw(b). Two map-side-combined shuffles
    * (the O(buckets) stats frame, then the per-doc sum); the stats
    * frame broadcasts at 2·[[DsirBuckets]] rows no matter the corpus
    * size — hashing is exactly what makes DSIR 100 TB-viable vs a
    * full-vocab LM. Cross-engine exact: counts and the smoothed
    * numerators/denominators are BIGINT (products < 2⁵³ by
    * construction at any bucket count this SF reaches), ln rides on
    * identical integer-derived doubles (C29's precedent), and the
    * per-doc sum of ~10² like-magnitude terms rounds at 4 dp far
    * above float noise.
    */
  def corpusDsir(spark: SparkSession, dir: String): DataFrame =
    corpusDsirOf(Tables(spark, dir, "documents"))


  /** [[corpusDsir]]'s kernel on any documents-shaped frame. */
  def corpusDsirOf(docs: DataFrame): DataFrame =
    dsirWeights(docs)

  /** [[corpusDsir]]'s kernel on any documents frame. */
  private[text] def dsirWeights(documents: DataFrame): DataFrame = {
    // checkpoint the bucketed token frame: it feeds BOTH the bucket
    // stats and the per-doc scoring join, and uncached each consumer
    // re-ran the tokenize + per-token md5 pass (the r15 baseline's
    // three ~0.5-0.9 s scan stages). `tok` is dropped before the
    // checkpoint — only (doc_id, lang, bkt) rides. Serialized storage
    // per the r14 house rule (guide §1.2 / §5).
    val toksB = documents
      .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
      .withColumn("bkt",
        conv(substring(md5(col("tok").cast("binary")), 1, 2), 16, 10)
          .cast("long"))
      .select(col("doc_id"), col("lang"), col("bkt"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val stats = toksB.groupBy(col("bkt"))
      .agg(count(lit(1)).as("c_all"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_en"))
    val tot = stats.agg(sum(col("c_all")).as("t_all"),
      sum(col("c_en")).as("t_en"))
    val rated = stats.crossJoin(broadcast(tot))
      .select(col("bkt"),
        (log((col("c_en") + 1) * (col("t_all") + DsirBuckets)) -
          log((col("c_all") + 1) * (col("t_en") + DsirBuckets)))
          .as("llr"))
    toksB.join(broadcast(rated), "bkt")
      .groupBy(col("doc_id"))
      .agg(first(col("lang")).as("lang"),
        count(lit(1)).as("n_tokens"),
        // + 0.0 canonicalizes IEEE signed zero: a float llr sum within
        // 1e-4 of zero can round to -0.0 on one engine and +0.0 on the
        // other (summation order flips the sign bit of a ~1e-9 value),
        // and the gate's repr-compare distinguishes them (r10, sf0.1)
        (round(sum(col("llr")), 4) + lit(0.0)).as("dsir_logw"))
      .orderBy(col("doc_id"))
  }

  val DsirSelectN = 100L // resampled corpus size

  /** C35 `corpus_dsir_select` — the RESAMPLING half of DSIR (C34
    * computes importance weights; selecting WITH them is a weighted
    * sample without replacement, which naive threshold-cutting gets
    * wrong — it just takes the most target-like docs and collapses
    * diversity): Gumbel-top-k — add an independent Gumbel draw
    * −ln(−ln u) to each log-weight and take the top
    * [[DsirSelectN]] keys, which IS an exact weighted sample without
    * replacement (the Gumbel-max trick). The uniform is the seeded
    * md5-u16 draw (house no-RNG contract → reproducible, replayable);
    * ranking uses the 6-dp-rounded key with doc_id tiebreak (the E1
    * rank-stability rule) and the head lands on
    * TakeOrderedAndProject — no global sort of the corpus. Weight
    * base is the 4-dp ROUNDED C34 weight, so the float chain
    * (rounded w + exact-input Gumbel) is bit-identical cross-engine.
    */
  def corpusDsirSelect(spark: SparkSession, dir: String): DataFrame =
    corpusDsirSelectOf(Tables(spark, dir, "documents"))


  /** [[corpusDsirSelect]]'s kernel on any documents-shaped frame. */
  def corpusDsirSelectOf(docs: DataFrame): DataFrame = {
    val u = (conv(substring(md5(concat(lit("g:"),
      col("doc_id").cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("double") + lit(0.5)) / lit(65536.0)
    dsirWeights(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("key",
        col("dsir_logw") - log(-log(u)))
      .orderBy(round(col("key"), 6).desc, col("doc_id"))
      .limit(DsirSelectN.toInt)
      .select(col("doc_id"), col("lang"), col("source"),
        col("dsir_logw"), round(col("key"), 4).as("sel_key"))
      .orderBy(col("doc_id"))
  }

  /** C39 `corpus_novelty` — what each source UNIQUELY contributes:
    * per source, its distinct word-3-gram count and how many of those
    * shingles appear in NO other source, as an exact basis-point
    * uniqueness rate (C21 weighs sources by token MASS and C29 by
    * lexical drift; acquisition/renewal decisions hinge on marginal
    * CONTENT — a source whose shingles all exist elsewhere adds
    * volume, not coverage, and is the first candidate to drop when
    * the compute budget tightens). Mechanics: distinct (source,
    * shingle) pairs — shingles enter the wide shuffle as 8-byte
    * xxhash64 values, not ~25-byte strings (D2's discipline;
    * set-cardinality semantics unchanged, and the oracle counts
    * LITERAL shingle strings so the green gate certifies the hashing
    * collision-free on the corpus); one window over the shingle key
    * counts carrying sources, then everything collapses to the
    * O(sources) frame. No stage holds doc pairs or a per-doc
    * explosion beyond the one shingle pass.
    */
  def corpusNovelty(spark: SparkSession, dir: String): DataFrame =
    corpusNoveltyOf(Tables(spark, dir, "documents"))


  /** [[corpusNovelty]]'s kernel on any documents-shaped frame. */
  def corpusNoveltyOf(docs: DataFrame): DataFrame =
    noveltyOf(docs)

  /** [[corpusNovelty]]'s kernel on any (source, text) frame. */
  private[text] def noveltyOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("source"),
        explode(TextOps.wordShingles(TextOps.tokens(col("text"))))
          .as("gs"))
      .select(col("source"), xxhash64(col("gs")).as("g"))
      .distinct()
    val nd = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    sh.withColumn("n_sources", count(lit(1)).over(wg))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L))
          .as("n_unique"))
      .join(nd, Seq("source"))
      .withColumn("unique_bp", expr("n_unique * 10000 div n_shingles"))
      .select(col("source"), col("n_docs"), col("n_shingles"),
        col("n_unique"), col("unique_bp"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_growth" -> (vocabGrowth _),
    "tokenize_fertility" -> (tokenizeFertility _),
    "bpe_vocab_sweep" -> (bpeVocabSweep _),
    "corpus_novelty" -> (corpusNovelty _),
    "corpus_curriculum" -> (corpusCurriculum _),
    "corpus_dsir_select" -> (corpusDsirSelect _),
    "corpus_dsir" -> (corpusDsir _),
    "corpus_budget" -> (corpusBudget _),
    "quality_classifier" -> (qualityClassifier _),
    "bpe_train" -> (bpeTrain _),
    "bpe_encode" -> (bpeEncode _),
    "text_chunks" -> (textChunks _),
    "text_repetition" -> (textRepetition _),
    "text_ngram_lm" -> (textNgramLm _),
    "text_bigram_lm" -> (textBigramLm _),
    "corpus_mix" -> (corpusMix _),
    "corpus_sample" -> (corpusSample _)
  )

  /** One unrolled BPE round for the oracle: pair counts over `in`,
    * argmax to `t`, rewritten sequences to `out`.
    */
  private def bpeRoundOracle(in: String, t: String, out: String): String =
    s"""p_$t AS (SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(CASE WHEN len(s) >= 2
       |      THEN [s[i] || ' ' || s[i+1] for i in range(1, len(s))]
       |      ELSE [] END) AS pr
       |    FROM (SELECT freq, string_split(seq, ' ') AS s FROM $in))
       |  GROUP BY pr),
       |$t AS (SELECT pr, cnt FROM p_$t ORDER BY cnt DESC, pr LIMIT 1),
       |$out AS (SELECT v.w, v.freq,
       |    trim(replace(replace(' ' || replace(v.seq, ' ', '  ') || ' ',
       |      ' ' || replace($t.pr, ' ', '  ') || ' ',
       |      ' ' || replace($t.pr, ' ', '') || ' '), '  ', ' ')) AS seq
       |  FROM $in v CROSS JOIN $t)""".stripMargin

  /** Shared DSIR CTE chain: per-doc weights in `w`. The 2-hex-digit
    * md5 bucket replays via the strpos digit decode; smoothed counts
    * are BIGINT so both engines feed ln identical doubles.
    */
  private val dsirCte: String =
    s"""WITH t AS (SELECT doc_id, lang,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |b AS (SELECT doc_id, lang,
       |    CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1)
       |      * 16
       |      + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
       |      AS BIGINT) AS bkt
       |  FROM t),
       |s AS (SELECT bkt, CAST(count(*) AS BIGINT) AS c_all,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c_en
       |  FROM b GROUP BY 1),
       |tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS t_all,
       |    CAST(sum(c_en) AS BIGINT) AS t_en FROM s),
       |r AS (SELECT bkt,
       |    ln((c_en + 1) * (t_all + $DsirBuckets))
       |      - ln((c_all + 1) * (t_en + $DsirBuckets)) AS llr
       |  FROM s CROSS JOIN tot),
       |w AS (SELECT b.doc_id, any_value(b.lang) AS lang,
       |    CAST(count(*) AS BIGINT) AS n_tokens,
       |    round(sum(r.llr), 4) + 0.0 AS dsir_logw
       |  FROM b JOIN r USING (bkt)
       |  GROUP BY b.doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    // corpus_novelty: LITERAL shingle strings (Spark shuffles xxhash64
    // values — the gate certifies the hashing collision-free, D2's
    // set-equality argument)
    "corpus_novelty" ->
      """WITH t AS (SELECT source,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g0 AS (SELECT source, w, unnest(range(1, len(w) - 1)) AS i
        |  FROM t WHERE len(w) >= 3),
        |sh AS (SELECT DISTINCT source,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gs
        |  FROM g0),
        |deg AS (SELECT gs, count(*) AS n_sources FROM sh GROUP BY gs),
        |nd AS (SELECT source, count(*) AS n_docs FROM documents
        |  GROUP BY source),
        |r AS (SELECT s.source, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN d.n_sources = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_unique
        |  FROM sh s JOIN deg d USING (gs) GROUP BY s.source)
        |SELECT r.source, nd.n_docs, r.n_shingles, r.n_unique,
        |  n_unique * 10000 // n_shingles AS unique_bp
        |FROM r JOIN nd USING (source) ORDER BY r.source""".stripMargin,
    "corpus_dsir" ->
      s"""$dsirCte
         |SELECT doc_id, lang, n_tokens, dsir_logw
         |FROM w ORDER BY doc_id""".stripMargin,
    // corpus_dsir_select: the Gumbel draw rides the seeded u16 of
    // 'g:'||doc_id, so −ln(−ln u) sees identical doubles both sides
    "corpus_dsir_select" ->
      s"""$dsirCte,
         |sel AS (SELECT w.doc_id, w.lang, d.source, w.dsir_logw,
         |    w.dsir_logw - ln(-ln(
         |      (CAST((strpos('0123456789abcdef', substr(
         |          md5('g:' || CAST(w.doc_id AS VARCHAR)), 1, 1)) - 1)
         |        * 4096
         |        + (strpos('0123456789abcdef', substr(
         |          md5('g:' || CAST(w.doc_id AS VARCHAR)), 2, 1)) - 1)
         |        * 256
         |        + (strpos('0123456789abcdef', substr(
         |          md5('g:' || CAST(w.doc_id AS VARCHAR)), 3, 1)) - 1)
         |        * 16
         |        + (strpos('0123456789abcdef', substr(
         |          md5('g:' || CAST(w.doc_id AS VARCHAR)), 4, 1)) - 1)
         |        AS DOUBLE) + 0.5) / 65536.0)) AS key
         |  FROM w JOIN documents d USING (doc_id))
         |SELECT doc_id, lang, source, dsir_logw,
         |  round(key, 4) AS sel_key
         |FROM (SELECT * FROM sel
         |  ORDER BY round(key, 6) DESC, doc_id LIMIT $DsirSelectN)
         |ORDER BY doc_id""".stripMargin,
    // corpus_curriculum: bucket-collapsed phase assignment (pure
    // integer floor division), per-phase member fingerprint as the
    // ordered string_agg md5 (the emb_cluster_sample identity pin)
    "corpus_curriculum" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |b AS (SELECT n_tokens, CAST(count(*) AS BIGINT) AS cnt
         |  FROM d GROUP BY 1),
         |cb AS (SELECT n_tokens, CAST(coalesce(sum(cnt) OVER (
         |    ORDER BY n_tokens ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM b),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM b),
         |ph AS (SELECT n_tokens,
         |    cum_before * $CurriculumPhases // n_total AS phase
         |  FROM cb CROSS JOIN tot)
         |SELECT ph.phase, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens_total,
         |  CAST(min(d.n_tokens) AS BIGINT) AS min_tokens,
         |  CAST(max(d.n_tokens) AS BIGINT) AS max_tokens,
         |  md5(string_agg(CAST(d.doc_id AS VARCHAR), ','
         |    ORDER BY d.doc_id)) AS docs_fp
         |FROM d JOIN ph USING (n_tokens)
         |GROUP BY ph.phase ORDER BY ph.phase""".stripMargin,
    // corpus_budget: same temperature-share kernel as corpus_mix, same
    // md5 4-hex-digit draw decode as corpus_sample; the greedy cut is
    // an integer window cumsum so the boundary is engine-exact, and
    // sel_fp replays as an ORDER BY string_agg over the same
    // (draw, doc_id) order
    "corpus_budget" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.7) AS w_raw FROM s),
        |tot AS (SELECT sum(w_raw) AS w_total FROM w),
        |b AS (SELECT source, n_docs,
        |    CAST(floor(w_raw / w_total * 500000) AS BIGINT) AS budget_tokens
        |  FROM w CROSS JOIN tot),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_doc_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |v AS (SELECT doc_id, source, n_doc_tokens,
        |    CAST((strpos('0123456789abcdef', substr(h,1,1)) - 1) * 4096
        |      + (strpos('0123456789abcdef', substr(h,2,1)) - 1) * 256
        |      + (strpos('0123456789abcdef', substr(h,3,1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(h,4,1)) - 1) AS BIGINT)
        |      AS draw
        |  FROM d),
        |c AS (SELECT *, sum(n_doc_tokens) OVER (PARTITION BY source
        |    ORDER BY draw, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM v),
        |sel AS (SELECT c.doc_id, c.source, c.n_doc_tokens, c.draw,
        |    b.n_docs, b.budget_tokens
        |  FROM c JOIN b USING (source) WHERE cum <= budget_tokens)
        |SELECT source, n_docs, budget_tokens,
        |  CAST(count(*) AS BIGINT) AS n_selected,
        |  CAST(sum(n_doc_tokens) AS BIGINT) AS selected_tokens,
        |  round(sum(n_doc_tokens) / CAST(budget_tokens AS DOUBLE), 4)
        |    AS fill,
        |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY draw, doc_id))
        |    AS sel_fp
        |FROM sel GROUP BY source, n_docs, budget_tokens
        |ORDER BY source""".stripMargin,
    "text_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w,
        |    len(string_split_regex(trim(text), '\s+')) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, w, n,
        |    unnest(range(0,
        |      CAST(greatest(ceil((n - 64) / 48.0), 0) AS BIGINT) + 1))
        |      AS chunk_id
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |  chunk_id * 48 + 1 AS tok_start,
        |  least(chunk_id * 48 + 64, n) AS tok_end,
        |  CAST(len(w[chunk_id*48+1 : chunk_id*48+64]) AS BIGINT)
        |    AS n_tokens,
        |  md5(array_to_string(w[chunk_id*48+1 : chunk_id*48+64], ' '))
        |    AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // bpe_train: 3 unrolled merge rounds; integer pair counts with a
    // lexicographic tie-break make every argmax engine-exact, and
    // replace() is literal left-to-right in both engines
    "bpe_train" ->
      s"""WITH words AS (SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  GROUP BY w),
         |w0 AS (SELECT w, freq,
         |    array_to_string([w[i] for i in range(1, len(w) + 1)], ' ')
         |      AS seq
         |  FROM words),
         |${bpeRoundOracle("w0", "t1", "w1")},
         |${bpeRoundOracle("w1", "t2", "w2")},
         |${bpeRoundOracle("w2", "t3", "w3")}
         |SELECT * FROM (
         |  SELECT 1 AS iteration, pr AS merged_pair, cnt AS pair_count
         |  FROM t1
         |  UNION ALL SELECT 2, pr, cnt FROM t2
         |  UNION ALL SELECT 3, pr, cnt FROM t3)
         |ORDER BY iteration""".stripMargin,
    // bpe_encode: the same 3 unrolled merge rounds, then every doc
    // token joins its fully-rewritten dictionary entry; the ordered
    // string_agg md5 pins the complete encoded symbol stream
    // vocab_growth: same value-grid prefix buckets (integer floor
    // div off one min/max row), token first-occurrence by min doc_id,
    // cumulative windows over the 10-row spine
    "vocab_growth" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |span AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
         |  FROM documents),
         |d AS (SELECT (doc_id - lo) * $GrowthBuckets // (hi - lo + 1) + 1
         |      AS bkt,
         |    count(*) AS n_docs,
         |    CAST(sum(len(w)) AS BIGINT) AS n_tokens
         |  FROM t CROSS JOIN span GROUP BY 1),
         |fo AS (SELECT tk, min(doc_id) AS first_doc FROM (
         |    SELECT doc_id, unnest(w) AS tk FROM t) GROUP BY tk),
         |fs AS (SELECT
         |    (first_doc - lo) * $GrowthBuckets // (hi - lo + 1) + 1
         |      AS bkt,
         |    count(*) AS new_distinct
         |  FROM fo CROSS JOIN span GROUP BY 1),
         |spine AS (SELECT CAST(unnest(range(1, $GrowthBuckets + 1))
         |    AS BIGINT) AS checkpoint),
         |f AS (SELECT s.checkpoint,
         |    coalesce(d.n_docs, 0) AS n_docs,
         |    coalesce(d.n_tokens, 0) AS n_tokens,
         |    coalesce(fs.new_distinct, 0) AS new_distinct
         |  FROM spine s LEFT JOIN d ON d.bkt = s.checkpoint
         |  LEFT JOIN fs ON fs.bkt = s.checkpoint)
         |SELECT checkpoint,
         |  CAST(sum(n_docs) OVER wc AS BIGINT) AS n_docs_cum,
         |  CAST(sum(n_tokens) OVER wc AS BIGINT) AS n_tokens_cum,
         |  CAST(new_distinct AS BIGINT) AS new_distinct,
         |  CAST(sum(new_distinct) OVER wc AS BIGINT) AS n_distinct_cum,
         |  CAST(sum(new_distinct) OVER wc AS BIGINT) * 10000
         |    // greatest(CAST(sum(n_tokens) OVER wc AS BIGINT), 1)
         |    AS ttr_bp
         |FROM f
         |WINDOW wc AS (ORDER BY checkpoint
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY checkpoint""".stripMargin,
    // bpe_vocab_sweep: the same unrolled merge chain, one per-language
    // fertility rollup per merge budget off the (lang, word) counts
    "bpe_vocab_sweep" ->
      s"""WITH words AS (SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  GROUP BY w),
         |w0 AS (SELECT w, freq,
         |    array_to_string([w[i] for i in range(1, len(w) + 1)], ' ')
         |      AS seq
         |  FROM words),
         |${bpeRoundOracle("w0", "t1", "w1")},
         |${bpeRoundOracle("w1", "t2", "w2")},
         |${bpeRoundOracle("w2", "t3", "w3")},
         |lw AS (SELECT lang, w, count(*) AS n_w FROM (
         |    SELECT lang,
         |      unnest(string_split_regex(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  GROUP BY lang, w),
         |r AS (${(1 to BpeIters).map(k =>
           s"""SELECT $k AS n_merges, l.lang,
              |    CAST(sum(l.n_w) AS BIGINT) AS n_words,
              |    CAST(sum(l.n_w * length(l.w)) AS BIGINT) AS n_chars,
              |    CAST(sum(l.n_w * len(string_split(d.seq, ' ')))
              |      AS BIGINT) AS n_symbols
              |  FROM lw l JOIN w$k d ON l.w = d.w
              |  GROUP BY l.lang""".stripMargin)
           .mkString("\n  UNION ALL\n")})
         |SELECT n_merges, lang, n_words, n_chars, n_symbols,
         |  n_symbols * 10000 // n_words AS fertility_bp,
         |  n_chars * 10000 // n_symbols AS chars_per_sym_bp
         |FROM r ORDER BY n_merges, lang""".stripMargin,
    // tokenize_fertility: the same 3 unrolled merge rounds and
    // dictionary join as bpe_encode, rolled up per language in exact
    // floor-division basis points
    "tokenize_fertility" ->
      s"""WITH words AS (SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  GROUP BY w),
         |w0 AS (SELECT w, freq,
         |    array_to_string([w[i] for i in range(1, len(w) + 1)], ' ')
         |      AS seq
         |  FROM words),
         |${bpeRoundOracle("w0", "t1", "w1")},
         |${bpeRoundOracle("w1", "t2", "w2")},
         |${bpeRoundOracle("w2", "t3", "w3")},
         |toks AS (SELECT lang, doc_id, unnest(
         |    string_split_regex(trim(text), '\\s+')) AS tok
         |  FROM documents),
         |enc AS (SELECT t.lang, t.doc_id, d.w, d.seq
         |  FROM toks t JOIN w3 d ON t.tok = d.w),
         |r AS (SELECT lang, count(DISTINCT doc_id) AS n_docs,
         |    count(*) AS n_words,
         |    CAST(sum(length(w)) AS BIGINT) AS n_chars,
         |    CAST(sum(len(string_split(seq, ' '))) AS BIGINT)
         |      AS n_symbols
         |  FROM enc GROUP BY lang)
         |SELECT lang, n_docs, n_words, n_chars, n_symbols,
         |  n_symbols * 10000 // n_words AS fertility_bp,
         |  n_chars * 10000 // n_symbols AS chars_per_sym_bp
         |FROM r ORDER BY lang""".stripMargin,
    "bpe_encode" ->
      s"""WITH words AS (SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  GROUP BY w),
         |w0 AS (SELECT w, freq,
         |    array_to_string([w[i] for i in range(1, len(w) + 1)], ' ')
         |      AS seq
         |  FROM words),
         |${bpeRoundOracle("w0", "t1", "w1")},
         |${bpeRoundOracle("w1", "t2", "w2")},
         |${bpeRoundOracle("w2", "t3", "w3")},
         |toks AS (SELECT doc_id, CAST(i AS INT) AS pos,
         |    toklist[CAST(i AS INT)] AS tok
         |  FROM (SELECT doc_id,
         |          string_split_regex(trim(text), '\\s+') AS toklist
         |        FROM documents),
         |  unnest(range(1, len(toklist) + 1)) AS t(i)),
         |enc AS (SELECT t.doc_id, t.pos, d.w, d.seq
         |  FROM toks t JOIN w3 d ON t.tok = d.w)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
         |  CAST(sum(len(string_split(seq, ' '))) AS BIGINT) AS n_symbols,
         |  md5(string_agg(seq, ' ' ORDER BY pos)) AS enc_fp
         |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the relational spelling (unnest + group + max) of the same
    // per-doc top token/bigram the Spark side reads off a sorted-array
    // run fold — different algorithm, same exact integers
    "text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
        |  FROM t),
        |tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
        |tc0 AS (SELECT doc_id, tk, count(*) AS c FROM tok
        |  GROUP BY doc_id, tk),
        |tc AS (SELECT doc_id, max(c) AS top_token_n FROM tc0
        |  GROUP BY doc_id),
        |bidx AS (SELECT doc_id, w,
        |    unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM t WHERE len(w) >= 2),
        |bg0 AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bg FROM bidx),
        |bgc0 AS (SELECT doc_id, bg, count(*) AS c FROM bg0
        |  GROUP BY doc_id, bg),
        |bgc AS (SELECT doc_id, max(c) AS top_bigram_n FROM bgc0
        |  GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |  round((b.n_tokens - b.n_distinct) * 1.0 / b.n_tokens, 4)
        |    AS dup_token_frac,
        |  tc.top_token_n,
        |  coalesce(bgc.top_bigram_n, 0) AS top_bigram_n,
        |  CAST(((b.n_tokens - b.n_distinct) * 10 > b.n_tokens * 3)
        |    OR (coalesce(bgc.top_bigram_n, 0) * 10 > (b.n_tokens - 1) * 2)
        |    AS INT) AS is_repetitive
        |FROM base b JOIN tc USING (doc_id) LEFT JOIN bgc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_bigram_lm" ->
      """WITH d AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE len(string_split_regex(trim(text), '\s+'))
        |    >= 2),
        |idx AS (SELECT doc_id, w,
        |    unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM d),
        |tr AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bg FROM idx),
        |bgc AS (SELECT bg, count(*) AS c_bg,
        |    string_split(bg, ' ')[1] AS prev
        |  FROM tr GROUP BY bg),
        |pc AS (SELECT prev, sum(c_bg) AS c_prev FROM bgc GROUP BY prev),
        |vs AS (SELECT count(DISTINCT tok) AS v FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents)),
        |pd AS (SELECT doc_id, bg, count(*) AS c FROM tr
        |  GROUP BY doc_id, bg)
        |SELECT pd.doc_id,
        |  CAST(sum(pd.c) AS BIGINT) AS n_transitions,
        |  round(sum(pd.c * -log2((b.c_bg + 1.0) / (p.c_prev + vs.v)))
        |    / sum(pd.c), 4) AS bits_per_transition
        |FROM pd JOIN bgc b USING (bg) JOIN pc p ON p.prev = b.prev
        |CROSS JOIN vs
        |GROUP BY pd.doc_id ORDER BY pd.doc_id""".stripMargin,
    "text_ngram_lm" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS total FROM vocab),
        |pd AS (SELECT doc_id, tok, count(*) AS c FROM t
        |  GROUP BY doc_id, tok)
        |SELECT pd.doc_id,
        |  CAST(sum(pd.c) AS BIGINT) AS n_tokens,
        |  round(sum(pd.c * -log2(v.cnt * 1.0 / tot.total)) / sum(pd.c), 4)
        |    AS bits_per_token
        |FROM pd JOIN vocab v USING (tok) CROSS JOIN tot
        |GROUP BY pd.doc_id ORDER BY pd.doc_id""".stripMargin,
    // corpus_sample: the 4-hex-digit uniform draw replays via strpos
    // digit decode (md5 is lowercase hex in both engines)
    "corpus_sample" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.7) AS w_raw FROM s),
        |tot AS (SELECT sum(w_raw) AS w_total FROM w),
        |r AS (SELECT source, n_docs, n_tokens,
        |    CAST(floor(least(w_raw / w_total * 1000000 / n_tokens, 1.0)
        |      * 65536) AS BIGINT) AS thresh
        |  FROM w CROSS JOIN tot),
        |d AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_doc_tokens
        |  FROM documents),
        |v AS (SELECT source, n_doc_tokens,
        |    CAST((strpos('0123456789abcdef', substr(h,1,1)) - 1) * 4096
        |      + (strpos('0123456789abcdef', substr(h,2,1)) - 1) * 256
        |      + (strpos('0123456789abcdef', substr(h,3,1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(h,4,1)) - 1) AS BIGINT)
        |      AS draw
        |  FROM d)
        |SELECT v.source, r.n_docs,
        |  CAST(sum(CASE WHEN draw < thresh THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN draw < thresh THEN n_doc_tokens ELSE 0 END)
        |    AS BIGINT) AS kept_tokens,
        |  round(r.thresh / 65536.0, 6) AS target_rate,
        |  round(sum(CASE WHEN draw < thresh THEN 1 ELSE 0 END) * 1.0
        |    / r.n_docs, 4) AS achieved_rate
        |FROM v JOIN r USING (source)
        |GROUP BY v.source, r.n_docs, r.thresh
        |ORDER BY v.source""".stripMargin,
    // quality_classifier: the 4-hex-digit md5 bucket replays via the
    // same strpos digit decode as corpus_sample; the weight lattice and
    // score are pure BIGINT arithmetic, so list_sum is order-free-exact
    "quality_classifier" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(list_sum([
        |      ((((strpos('0123456789abcdef', substr(md5(tok),1,1)) - 1)
        |          * 4096
        |        + (strpos('0123456789abcdef', substr(md5(tok),2,1)) - 1)
        |          * 256
        |        + (strpos('0123456789abcdef', substr(md5(tok),3,1)) - 1)
        |          * 16
        |        + (strpos('0123456789abcdef', substr(md5(tok),4,1)) - 1))
        |        % 1024) * 2654435761) % 1997 - 998
        |      for tok in toks]) AS BIGINT) AS score_int
        |  FROM t)
        |SELECT doc_id, n_tokens, score_int,
        |  CAST(floor(score_int * 1000000 / (n_tokens * 250.0)) AS BIGINT)
        |    AS logit_micro,
        |  round(1.0 / (1.0 + exp(-(score_int / (n_tokens * 250.0)))), 4)
        |    AS score,
        |  CASE WHEN score_int >= 0 THEN 1 ELSE 0 END AS keep
        |FROM b ORDER BY doc_id""".stripMargin,
    "corpus_mix" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.7) AS w_raw FROM s),
        |tot AS (SELECT sum(w_raw) AS w_total FROM w)
        |SELECT source, n_docs, n_tokens,
        |  round(w_raw / w_total, 6) AS weight,
        |  round(w_raw / w_total * 1000000 / n_tokens, 4) AS epochs_at_budget
        |FROM w CROSS JOIN tot ORDER BY source""".stripMargin
  )
}
