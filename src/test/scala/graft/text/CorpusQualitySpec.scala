package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusQualitySpec extends SparkSpec {

  test("corpus_curriculum: planted lengths split into balanced " +
      "length-ordered phases with exact member fingerprints") {
    import spark.implicits._
    // 8 docs, token counts 1..8 → 4 phases of exactly 2 docs,
    // boundaries on the bucket cumulative (cum_before·P div n)
    val docs = (1 to 8).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusQuality.curriculum(docs).collect()
    assert(out.length == 4)
    out.zipWithIndex.foreach { case (r, p) =>
      assert(r.getAs[Long]("phase") == p)
      assert(r.getAs[Long]("n_docs") == 2)
      val lo = 2 * p + 1
      assert(r.getAs[Long]("min_tokens") == lo)
      assert(r.getAs[Long]("max_tokens") == lo + 1)
      assert(r.getAs[Long]("n_tokens_total") == 2L * lo + 1)
      // fingerprint pins the exact member set: md5 of "id,id"
      val exp = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$lo,${lo + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("docs_fp") == exp)
    }
  }

  test("corpus_curriculum: sf corpus — phases conserve docs/tokens and " +
      "length ranges are disjoint and ordered") {
    val rows = CorpusQuality.corpusCurriculum(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= CorpusQuality.CurriculumPhases)
    val d = graft.Tables(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == d.count())
    val ranges = rows.sortBy(_.getAs[Long]("phase"))
      .map(r => (r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens")))
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("text_repetition: counts nest and flags agree with the fractions") {
    val rows = CorpusQuality.textRepetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val d = r.getAs[Long]("n_distinct")
      val tt = r.getAs[Long]("top_token_n")
      val tb = r.getAs[Long]("top_bigram_n")
      assert(d >= 1 && d <= n)
      assert(tt >= 1 && tt <= n - d + 1, s"top token run $tt impossible")
      assert(tb >= 0 && (n < 2 || tb <= n - 1))
      val frac = r.getAs[Double]("dup_token_frac")
      assert(frac >= 0.0 && frac < 1.0)
      val flag = r.getAs[Int]("is_repetitive")
      val expect = ((n - d) * 10 > n * 3) || (tb * 10 > (n - 1) * 2)
      assert(flag == (if (expect) 1 else 0))
    }
  }

  test("text_repetition: top_token_n equals the exact per-doc mode count") {
    val df = CorpusQuality.textRepetition(spark, sfDir)
      .select("doc_id", "top_token_n")
    val exact = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(max("count").as("expect"))
    val bad = df.join(exact, "doc_id")
      .filter(col("top_token_n") =!= col("expect")).count()
    assert(bad == 0, "sorted-run fold disagrees with groupBy mode count")
  }

  test("text_ngram_lm: bits positive, bounded by log2(corpus), n matches") {
    val lm = CorpusQuality.textNgramLm(spark, sfDir).collect()
    assert(lm.nonEmpty)
    val totalToks = graft.Tables(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("t")).count()
    val bound = math.log(totalToks.toDouble) / math.log(2.0) + 1e-9
    lm.foreach { r =>
      val b = r.getAs[Double]("bits_per_token")
      // every token occurs ≥ once in its own doc, so P ≥ 1/total
      assert(b > 0.0 && b <= bound, s"bits/token $b outside (0, $bound]")
    }
  }

  test("text_chunks: full coverage with overlap, no token lost to a cut") {
    val rows = CorpusQuality.textChunks(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val lens = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (doc, cs) =>
      val n = lens(doc)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_id"))
      assert(sorted.head.getAs[Int]("tok_start") == 1)
      assert(sorted.last.getAs[Int]("tok_end") == n,
        s"doc $doc: last chunk must reach token $n")
      // consecutive chunks overlap (stride < width) and never skip
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("tok_start") <= a.getAs[Int]("tok_end") + 1)
        case _ => ()
      }
      sorted.foreach { c =>
        assert(c.getAs[Long]("n_tokens") ==
          c.getAs[Int]("tok_end") - c.getAs[Int]("tok_start") + 1)
      }
    }
  }

  test("bpe_train: 3 deterministic merges, round 1 = the global top pair") {
    val a = CorpusQuality.bpeTrain(spark, sfDir).collect()
    val b = CorpusQuality.bpeTrain(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.getAs[Int]("iteration")).toSeq == Seq(1, 2, 3))
    val pairs = a.map(_.getAs[String]("merged_pair"))
    assert(pairs.distinct.length == 3, "a pair must not merge twice")
    pairs.foreach(p => assert(p.count(_ == ' ') == 1))
    a.foreach(r => assert(r.getAs[Long]("pair_count") > 0))
    // round 1 sees the unmerged corpus: its count must equal the top
    // char-pair frequency that vocab_bpe_pairs reports
    val top = graft.text.Retrieval.vocabBpePairs(spark, sfDir)
      .collect()(0).getAs[Long]("pair_freq")
    assert(a(0).getAs[Long]("pair_count") == top,
      "round-1 merge count must match the corpus top pair frequency")
  }

  test("bpe_encode matches an independent plain-Scala BPE end-to-end " +
      "(train 3 merges, left-to-right non-overlapping apply, encode)") {
    import spark.implicits._
    // corpus chosen so merges CHAIN (round 2 merges a round-1 symbol)
    val texts = Seq(
      "aaab aaab aaab banana banana",
      "aaab cab cab banana",
      "dab aaab banana cab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    // ---- independent reference BPE (lists of symbols, no SQL) ----
    val freq = texts.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    var seqs: Map[String, Vector[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toVector).toMap
    def applyMerge(s: Vector[String], p: (String, String)): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == p._1 && s(i + 1) == p._2) {
          out += (p._1 + p._2); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    var refMerges = Vector.empty[(String, Long)]
    for (_ <- 1 to CorpusQuality.BpeIters) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) =
          counts.getOrElse((s(i), s(i + 1)), 0L) + freq(w)
      val (bp, bc) = counts.toSeq
        .map { case (p, c) => (p._1 + " " + p._2, c) }
        .minBy { case (p, c) => (-c, p) }
      val pair = bp.split(" ") match { case Array(a, b) => (a, b) }
      refMerges :+= ((bp, bc))
      seqs = seqs.map { case (w, s) => w -> applyMerge(s, pair) }
    }
    def refEncode(t: String): Vector[String] =
      t.trim.split("\\s+").toVector.flatMap(seqs)
    // ---- compare the merge table (round-trip) ----
    val trained = CorpusQuality.bpeLearn(spark,
      CorpusQuality.bpeWordsOf(docs))._1
    assert(trained.map(m => (m._2, m._3)) == refMerges.toSeq,
      s"merge tables differ: $trained vs $refMerges")
    // ---- compare the encoded streams ----
    val got = CorpusQuality.bpeEncodeDocs(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val enc = refEncode(t)
      val row = got(i.toLong)
      assert(row.getAs[Long]("n_words") == t.split("\\s+").length)
      assert(row.getAs[Long]("n_chars") == t.split("\\s+").map(_.length).sum)
      assert(row.getAs[Long]("n_symbols") == enc.length,
        s"doc $i: symbol count ${row.getAs[Long]("n_symbols")} vs ${enc.length}")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(enc.mkString(" ").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(row.getAs[String]("enc_fp") == fp,
        s"doc $i: encoded stream fingerprint mismatch")
    }
    // merges actually landed: fewer symbols than chars somewhere
    assert(got.values.exists(r =>
      r.getAs[Long]("n_symbols") < r.getAs[Long]("n_chars")))
  }

  test("bpe_vocab_sweep: per-budget fertility is monotone non-" +
      "increasing, budget-3 row equals tokenize_fertility, and a " +
      "planted merge-hostile language's curve stays flat") {
    import spark.implicits._
    // lang 'aa' is merge-friendly (one repeated word — every merge
    // lands in it); 'zz' shares NO pairs with the winners, so its
    // fertility must not move across budgets
    val docs = Seq(
      (0L, "aaab aaab aaab aaab", "aa"),
      (1L, "aaab aaab cab", "aa"),
      (2L, "xy yx xy", "zz")
    ).toDF("doc_id", "text", "lang")
    val out = CorpusQuality.bpeVocabSweepDocs(spark, docs).collect()
      .map(r => (r.getAs[Int]("n_merges"), r.getAs[String]("lang")) -> r)
      .toMap
    assert(out.size == CorpusQuality.BpeIters * 2)
    // word/char masses are budget-independent
    for (lang <- Seq("aa", "zz"); k <- 2 to CorpusQuality.BpeIters) {
      assert(out((k, lang)).getAs[Long]("n_words") ==
        out((1, lang)).getAs[Long]("n_words"))
      assert(out((k, lang)).getAs[Long]("n_chars") ==
        out((1, lang)).getAs[Long]("n_chars"))
    }
    // fertility never increases with budget; strictly drops for 'aa'
    for (lang <- Seq("aa", "zz"); k <- 2 to CorpusQuality.BpeIters)
      assert(out((k, lang)).getAs[Long]("fertility_bp") <=
        out((k - 1, lang)).getAs[Long]("fertility_bp"))
    assert(out((CorpusQuality.BpeIters, "aa")).getAs[Long]("fertility_bp")
      < out((1, "aa")).getAs[Long]("fertility_bp"))
    // merge-hostile 'zz': no merge ever touches it
    for (k <- 1 to CorpusQuality.BpeIters)
      assert(out((k, "zz")).getAs[Long]("n_symbols") ==
        out((k, "zz")).getAs[Long]("n_chars"))
    // the last sweep point IS tokenize_fertility's rollup
    val fert = CorpusQuality.tokenizeFertilityDocs(spark, docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    for (lang <- Seq("aa", "zz")) {
      val s = out((CorpusQuality.BpeIters, lang))
      assert(s.getAs[Long]("n_symbols") ==
        fert(lang).getAs[Long]("n_symbols"))
      assert(s.getAs[Long]("fertility_bp") ==
        fert(lang).getAs[Long]("fertility_bp"))
      assert(s.getAs[Long]("chars_per_sym_bp") ==
        fert(lang).getAs[Long]("chars_per_sym_bp"))
    }
  }

  test("text_bigram_lm: transitions = tokens−1, bits positive/bounded") {
    val lm = CorpusQuality.textBigramLm(spark, sfDir)
    val toks = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        (size(split(trim(col("text")), "\\s+")) - 1).cast("long").as("t1"))
    val bad = lm.join(toks, "doc_id")
      .filter(col("n_transitions") =!= col("t1")).count()
    assert(bad == 0, "every adjacent token pair must be scored once")
    lm.collect().foreach { r =>
      val b = r.getAs[Double]("bits_per_transition")
      assert(b > 0.0 && b < 64.0, s"bits/transition $b out of range")
    }
  }

  test("corpus_sample: deterministic, counts nest, rates consistent") {
    val a = CorpusQuality.corpusSample(spark, sfDir).collect()
    val b = CorpusQuality.corpusSample(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "hash sampling must be bit-reproducible across runs")
    a.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val k = r.getAs[Long]("n_kept")
      assert(k >= 0 && k <= n)
      val t = r.getAs[Double]("target_rate")
      assert(t > 0.0 && t <= 1.0)
      // 16-bit uniform draw: achieved tracks target within binomial
      // noise (generous bound for the small per-source doc counts)
      val ach = r.getAs[Double]("achieved_rate")
      assert(math.abs(ach - t) <= 3.0 * math.sqrt(t * (1 - t) / n) + 0.2,
        s"achieved $ach vs target $t over $n docs")
    }
  }

  test("corpus_mix: weights form a distribution, epochs = w*B/n") {
    val rows = CorpusQuality.corpusMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      val n = r.getAs[Long]("n_tokens")
      val e = r.getAs[Double]("epochs_at_budget")
      assert(w > 0.0 && w < 1.0)
      assert(math.abs(e - w * 1000000.0 / n) < 1e-2)
    }
    // temperature α < 1 flattens: small sources get MORE than their
    // token share, large sources less
    val toks = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val smallest = rows.minBy(_.getAs[Long]("n_tokens"))
    val largest = rows.maxBy(_.getAs[Long]("n_tokens"))
    assert(smallest.getAs[Double]("weight") >=
      smallest.getAs[Long]("n_tokens") / toks - 1e-9)
    assert(largest.getAs[Double]("weight") <=
      largest.getAs[Long]("n_tokens") / toks + 1e-9)
  }

  test("quality_classifier: integer score replays per-token, gate exact") {
    val rows = CorpusQuality.qualityClassifier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // replay the hashed-BoW linear model in plain Scala for a sample
    def weight(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 4)
      val b = java.lang.Long.parseLong(hex, 16) % CorpusQuality.QcDim
      (b * CorpusQuality.QcMult) % CorpusQuality.QcMod - CorpusQuality.QcHalf
    }
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.take(25).foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).trim.split("\\s+")
      val expect = toks.map(weight).sum
      assert(r.getAs[Long]("score_int") == expect,
        s"doc ${r.getAs[Long]("doc_id")}: fold disagrees with replay")
      assert(r.getAs[Long]("n_tokens") == toks.length)
      // the gate is the INTEGER sign, immune to float rounding
      assert(r.getAs[Int]("keep") == (if (expect >= 0) 1 else 0))
      val logitMicro = r.getAs[Long]("logit_micro")
      assert(logitMicro ==
        math.floor(expect * 1000000L / (toks.length * 250.0)).toLong,
        s"doc ${r.getAs[Long]("doc_id")}: logit_micro floor replay")
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 1.0)
      assert((s >= 0.5) == (expect >= 0) || math.abs(s - 0.5) < 1e-9)
    }
  }

  test("quality_classifier: map-only — the sole exchange is the sort") {
    val p = CorpusQuality.qualityClassifier(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val n = p.sliding("+- Exchange".length).count(_ == "+- Exchange")
    assert(n <= 1, s"classifier must not shuffle tokens, got $n exchanges")
  }

  test("corpus_dsir: target-exclusive vocabulary scores positive, " +
      "raw-exclusive negative, and identical docs tie exactly") {
    import spark.implicits._
    // en docs use only 'x', de docs only 'y' (md5 buckets 157 ≠ 65):
    // bucket x is pure-target → llr > 0; bucket y target-absent → < 0
    val docs = Seq(
      (1L, "x x x", "en"), (2L, "x x x", "en"),
      (3L, "y y y", "de"), (4L, "y y y", "de"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusQuality.dsirWeights(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("dsir_logw"))).toMap
    assert(out.values.forall(_._1 == 3L))
    // hand model: t_en=6, t_all=12; x: (c_en,c_all)=(6,6), y: (0,6)
    val llrX = math.log(7.0 * 268) - math.log(7.0 * 262)
    val llrY = math.log(1.0 * 268) - math.log(7.0 * 262)
    assert(math.abs(out(1L)._2 - 3 * llrX) < 1e-3)
    assert(math.abs(out(3L)._2 - 3 * llrY) < 1e-3)
    assert(out(1L) == out(2L) && out(3L) == out(4L))
    assert(out(1L)._2 > 0 && out(3L)._2 < 0)
  }

  test("corpus_dsir_select: Gumbel-top-k replays locally from the C34 " +
      "weights — the selected id set matches exactly") {
    val weights = CorpusQuality.corpusDsir(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_logw"))
    def u16(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
    }
    val keys = weights.map { case (id, w) =>
      val u = (u16(s"g:$id") + 0.5) / 65536.0
      id -> (w - math.log(-math.log(u)))
    }
    val expect = keys.sortBy { case (id, k) =>
      (-BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP), id)
    }.take(CorpusQuality.DsirSelectN.toInt).map(_._1).toSet
    val got = CorpusQuality.corpusDsirSelect(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expect && got.size == CorpusQuality.DsirSelectN)
  }

  test("corpus_dsir_select: resampling shifts the mix toward the " +
      "target slice without collapsing to it") {
    val sel = CorpusQuality.corpusDsirSelect(spark, sfDir).collect()
    val all = graft.Tables(spark, sfDir, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enShareAll = all("en").toDouble / all.values.sum
    val enShareSel = sel.count(_.getAs[String]("lang") == "en").toDouble /
      sel.length
    // target-likeness raises the en share; Gumbel noise keeps others
    assert(enShareSel > enShareAll, s"$enShareSel !> $enShareAll")
    assert(sel.exists(_.getAs[String]("lang") != "en"),
      "weighted sampling must not degenerate to a hard top-w cut")
  }

  test("corpus_dsir: sf corpus — English docs dominate the top of the " +
      "importance ranking and every doc gets a finite weight") {
    val rows = CorpusQuality.corpusDsir(spark, sfDir).collect()
    val nDocs = graft.Tables(spark, sfDir, "documents").count()
    assert(rows.length == nDocs)
    assert(rows.forall(r => !r.getAs[Double]("dsir_logw").isNaN))
    // the target slice should, on average, outrank the rest
    val (en, other) = rows.partition(_.getAs[String]("lang") == "en")
    val avg = (xs: Array[org.apache.spark.sql.Row]) =>
      xs.map(_.getAs[Double]("dsir_logw")).sum / xs.length
    assert(avg(en) > avg(other),
      s"en avg ${avg(en)} must exceed non-en ${avg(other)}")
  }

  test("corpus_novelty: per-source distinct and unique shingle counts " +
      "are exact — cross-doc repeats collapse, shared shingles are " +
      "not unique, rates in basis points") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1 t2 t3 t4", "a"), // a: {t1t2t3, t2t3t4}
      (3L, "t2 t3 t4 t5", "a"), // a adds {t3t4t5}; t2t3t4 collapses
      (2L, "t1 t2 t3 x1", "b")  // b: {t1t2t3 (shared with a), t2t3x1}
    ).toDF("doc_id", "text", "source")
    val out = CorpusQuality.noveltyOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("a").getAs[Long]("n_docs") == 2)
    assert(out("a").getAs[Long]("n_shingles") == 3)
    assert(out("a").getAs[Long]("n_unique") == 2) // t2t3t4, t3t4t5
    assert(out("a").getAs[Long]("unique_bp") == 6666)
    assert(out("b").getAs[Long]("n_docs") == 1)
    assert(out("b").getAs[Long]("n_shingles") == 2)
    assert(out("b").getAs[Long]("n_unique") == 1) // t2t3x1
    assert(out("b").getAs[Long]("unique_bp") == 5000)
  }

  test("tokenize_fertility: the merge-friendly language compresses to " +
      "1 symbol/word while the merge-hostile one stays shredded — " +
      "exact per-language counts") {
    import spark.implicits._
    // lang aa: one high-freq word 'abab' -> rounds 1-2 merge it fully
    // ('a b'x24 -> 'ab ab', then 'ab ab' -> 'abab'); lang bb: four
    // singleton words of distinct chars -> only round 3's tie-break
    // merge ('j k', lexicographically first) lands, on one word
    val docs = Seq(
      (1L, "abab abab abab abab", "aa"),
      (2L, "abab abab abab abab", "aa"),
      (3L, "abab abab abab abab", "aa"),
      (4L, "qrst uvwx", "bb"),
      (5L, "mnop jklh", "bb")
    ).toDF("doc_id", "text", "lang")
    val out = CorpusQuality.tokenizeFertilityDocs(spark, docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val aa = out("aa")
    assert(aa.getAs[Long]("n_docs") == 3 && aa.getAs[Long]("n_words") == 12)
    assert(aa.getAs[Long]("n_chars") == 48)
    assert(aa.getAs[Long]("n_symbols") == 12, "abab must fully merge")
    assert(aa.getAs[Long]("fertility_bp") == 10000)
    assert(aa.getAs[Long]("chars_per_sym_bp") == 40000)
    val bb = out("bb")
    assert(bb.getAs[Long]("n_docs") == 2 && bb.getAs[Long]("n_words") == 4)
    assert(bb.getAs[Long]("n_chars") == 16)
    assert(bb.getAs[Long]("n_symbols") == 15, "only 'j k' merges in bb")
    assert(bb.getAs[Long]("fertility_bp") == 37500)
    assert(bb.getAs[Long]("chars_per_sym_bp") == 16L * 10000 / 15)
    assert(aa.getAs[Long]("fertility_bp") < bb.getAs[Long]("fertility_bp"),
      "the dominant merge-friendly language must show lower fertility")
  }

  test("vocab_growth: value-grid prefixes accumulate exactly — " +
      "first occurrences mint once, empty checkpoints carry, the " +
      "last row conserves corpus totals") {
    import spark.implicits._
    // doc_ids 0..3 on a 10-bucket grid -> buckets 1, 3, 6, 8
    val docs = Seq(
      (0L, "a b"),     // mints a, b
      (1L, "b c"),     // mints c
      (2L, "a b c"),   // mints nothing
      (3L, "d d d")    // mints d
    ).toDF("doc_id", "text")
    val out = CorpusQuality.vocabGrowthOf(spark, docs).collect()
      .map(r => r.getAs[Long]("checkpoint") -> r).toMap
    assert(out.size == CorpusQuality.GrowthBuckets)
    assert(out(1L).getAs[Long]("new_distinct") == 2)
    assert(out(1L).getAs[Long]("ttr_bp") == 10000) // 2 distinct / 2 toks
    assert(out(2L).getAs[Long]("n_docs_cum") == 1, "empty bucket carries")
    assert(out(3L).getAs[Long]("new_distinct") == 1)
    assert(out(6L).getAs[Long]("new_distinct") == 0)
    assert(out(8L).getAs[Long]("new_distinct") == 1)
    val last = out(10L)
    assert(last.getAs[Long]("n_docs_cum") == 4)
    assert(last.getAs[Long]("n_tokens_cum") == 10)
    assert(last.getAs[Long]("n_distinct_cum") == 4)
    assert(last.getAs[Long]("ttr_bp") == 4000)
    // monotone non-decreasing cumulatives
    val cums = (1 to 10).map(k => out(k.toLong).getAs[Long]("n_distinct_cum"))
    assert(cums == cums.sorted)
  }
}
