package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("ia").cast("long"), col("ib").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("decontaminate_fuzzy catches a planted paraphrase that the " +
      "production 13-gram exact gate provably misses") {
    import spark.implicits._
    import graft.text.TextOps
    // bench doc 20: 130 distinct tokens; corpus doc 21: the same with
    // every 13th token substituted (10 edits) — intact runs are 12
    // tokens, so NO 13-gram survives (the prod-scale exact gate is
    // blind), while 3-gram-shingle Jaccard stays 100/156 ≈ 0.64 ≥ τ.
    val base = (0 until 130).map(i => s"t$i")
    val para = base.zipWithIndex.map { case (t, i) =>
      if (i % 13 == 12) s"e$i" else t }
    def grams(ts: Seq[String], n: Int): Set[String] =
      ts.sliding(n).map(_.mkString(" ")).toSet
    assert(grams(base, 13).intersect(grams(para, 13)).isEmpty,
      "planted paraphrase must defeat the 13-gram exact gate")
    val shared = grams(base, 3).intersect(grams(para, 3)).size
    val expJ = shared.toDouble /
      (grams(base, 3).size + grams(para, 3).size - shared)
    assert(expJ >= Dedup.FuzzyContamTau, s"planted jaccard $expJ")
    val docs = Seq(
      (20L, base.mkString(" ")), // bench (id % 20 == 0)
      (40L, (0 until 60).map(i => s"clean$i").mkString(" ")), // bench
      (21L, para.mkString(" ")), // the paraphrase, in the corpus
      (22L, (0 until 60).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("shingles", TextOps.wordShingles(col("toks")))
    val out = Dedup.decontaminateFuzzyDocs(docs).collect()
      .map(r => r.getAs[Long]("bench_id") ->
        ((r.getAs[Long]("n_contam_docs"), r.getAs[Double]("max_jaccard"))))
      .toMap
    assert(out.keySet == Set(20L, 40L)) // one row per bench doc
    assert(out(20L)._1 == 1L, s"paraphrase not flagged: ${out(20L)}")
    assert(math.abs(out(20L)._2 - math.rint(expJ * 10000) / 10000) < 1e-9)
    assert(out(40L) == ((0L, 0.0)), "clean bench doc wrongly flagged")
  }

  test("minhash LSH finds every exact-jaccard pair (recall = 1 on testdata)") {
    val exact = pairs(Dedup.dedupNgramJaccard(spark, sfDir))
    val lsh = pairs(Dedup.dedupMinhashLsh(spark, sfDir))
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert((exact -- lsh).isEmpty,
      s"missed pairs: ${(exact -- lsh).take(5)}")
    // verification step keeps precision exact too: every emitted pair
    // really has jaccard >= 0.5
    assert((lsh -- exact).isEmpty)
  }

  test("simhash pairs have tiny hamming and high token overlap") {
    val sh = Dedup.dedupSimhash(spark, sfDir)
    val rows = sh.collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Number]("hamming").longValue <= Dedup.SimhashMaxHamming))
    // simhash is bag-of-words (order-insensitive), so compare flagged
    // pairs on token-set jaccard, not the order-sensitive 3-gram one
    val toks = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(graft.text.TextOps.tokens(col("text"))).as("t"))
    val checked = sh
      .join(toks.select(col("doc_id").as("ia"), col("t").as("ta")), "ia")
      .join(toks.select(col("doc_id").as("ib"), col("t").as("tb")), "ib")
      .withColumn("tok_jac",
        graft.functions.GraftFunctions.jaccardSim(col("ta"), col("tb")))
      .collect()
    checked.foreach { r =>
      val j = r.getAs[Double]("tok_jac")
      assert(j >= 0.5, s"pair (${r.getAs[Long]("ia")}, ${r.getAs[Long]("ib")}) " +
        s"flagged by simhash but token jaccard only $j")
    }
  }

  test("embedding LSH: recall 1.0 on planted near-duplicate vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat) // cos ≈ 0.999
    val base = (0L until 100L).map(i => (i, vec()))
    val dups = base.take(10).map { case (i, v) => (1000L + i, jitter(v)) }
    val em = (base ++ dups).toDF("vec_id", "embedding")

    val got = pairs(Dedup.embeddingLshPairs(em, 0.9))
    val want = base.take(10).map { case (i, _) => (i, 1000L + i) }.toSet
    assert((want -- got).isEmpty, s"missed planted dups: ${want -- got}")
    // precision: verify step guarantees cos >= 0.9 on every pair
    Dedup.embeddingLshPairs(em, 0.9).collect()
      .foreach(r => assert(r.getAs[Double]("cos") >= 0.9))
  }

  test("connectedComponents resolves transitive chains to min-id labels") {
    import spark.implicits._
    // two components: a chain 1-2-3-4 (1~3 never directly linked) and a
    // pair 10-11; plus a self-contained triangle 20-21-22
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (11L, 10L),
      (20L, 21L), (21L, 22L), (22L, 20L)
    ).toDF("u", "v")
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    // driver union-find path (the normal dedup-sized case)
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // distributed label-propagation path (forced) must agree exactly
    val gotDist = Dedup.connectedComponents(edges, driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotDist == want)
  }

  test("CC: driverMaxEdges = 0 honors the forcing contract on an " +
      "EMPTY graph (r14 ADVICE) — distributed arm, empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    // both arms return no labels; the forced distributed arm must not
    // fall back to the driver via the tier1.isEmpty disjunct
    assert(Dedup.connectedComponents(empty).count() == 0L)
    assert(Dedup.connectedComponents(empty, driverMaxEdges = 0L)
      .count() == 0L)
  }

  test("CC: checkpoint-every-k cadence (r15 §9g knob) is result-" +
      "invariant — k in {1, 2, 4} agree on chains, stars and random " +
      "graphs, including a long path that outlives one cadence window") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // a 33-node path (worst diameter for the propagate+jump loop),
    // a star, and a random graph
    val path = (1L until 33L).map(i => (i, i + 1)).toDF("u", "v")
    val star = (2L to 12L).map(i => (1L, i)).toDF("u", "v")
    val rand = Seq.fill(120)(
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (u, v) => u != v }.toDF("u", "v")
    for (edges <- Seq(path, star, rand)) {
      val base = Dedup.connectedComponents(edges, driverMaxEdges = 0L,
        checkpointEvery = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      for (k <- Seq(2, 4)) {
        val got = Dedup.connectedComponents(edges, driverMaxEdges = 0L,
          checkpointEvery = k)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == base, s"cadence k=$k changed CC labels")
      }
    }
  }

  test("CC: driver union-find and distributed label-prop agree on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (u, v) => u != v }
        .toDF("u", "v")
      val uf = Dedup.connectedComponents(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val lp = Dedup.connectedComponents(edges, driverMaxEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(uf == lp, s"trial $trial: paths disagree")
      // labels are canonical: every label is the min node of its class
      uf.groupBy(_._2).foreach { case (label, members) =>
        assert(members.keys.min == label)
      }
    }
  }

  test("dedup_clusters groups chained near-dups into one cluster") {
    val out = Dedup.dedupClusters(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size")))
    assert(out.nonEmpty, "testdata should contain near-dup pairs")
    // cluster id is always the min doc_id of its members
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid)
      assert(members.forall(_._3 == members.size))
    }
    // every jaccard pair must land in the same cluster (transitivity)
    val cluster = out.map(t => t._1 -> t._2).toMap
    pairs(Dedup.dedupNgramJaccard(spark, sfDir)).foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("dedup_exact marks genuine exact duplicates") {
    import spark.implicits._
    // operator runs on testdata via the oracle; here prove semantics on
    // planted dups (testdata has no exact dups)
    val docs = Seq(
      (1L, "Hello   World", "en", "s", 11L),
      (2L, "hello world", "en", "s", 11L), // same after normalization
      (3L, "different", "en", "s", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("__docs")
    val fp = graft.text.TextOps.fingerprint(col("text"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val out = docs.withColumn("fp", fp)
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keep_id")).cast("int"))
      .select("doc_id", "is_dup").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("dedup_segments: counts conserve and fractions bound") {
    val rows = Dedup.dedupSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_segments")
      val d = r.getAs[Long]("n_dup_segments")
      val f = r.getAs[Double]("kept_frac")
      assert(n >= 1 && d >= 0 && d <= n)
      assert(f > 0.0 || d == n)
      assert(math.abs(f - (n - d).toDouble / n) < 1e-4)
    }
    // exactly ceil(tokens/16) segments per doc, corpus-wide
    val segs = rows.map(_.getAs[Long]("n_segments")).sum
    val expect = graft.Tables(spark, sfDir, "documents")
      .select(ceil(size(split(trim(col("text")), "\\s+")) / 16.0).as("s"))
      .agg(sum(col("s"))).collect()(0).getLong(0)
    assert(segs == expect, s"segment fan-out $segs != $expect")
    // at least one corpus-wide duplicated segment exists in testdata
    // (short docs over a small vocab), so the operator's dup path runs
    assert(rows.map(_.getAs[Long]("n_dup_segments")).sum > 0)
  }

  test("dedup_by_source: rollup conserves D1's doc and dup totals, " +
      "rates stay in [0, 10000]") {
    import org.apache.spark.sql.functions.col
    val rows = Dedup.dedupBySource(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = Dedup.dedupExact(spark, sfDir)
    val totalDocs = exact.count()
    val totalDups = exact.agg(
      org.apache.spark.sql.functions.sum(col("is_dup"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs,
      "per-source docs must partition the corpus")
    assert(rows.map(_.getAs[Long]("n_dups")).sum == totalDups,
      "per-source dups must conserve the D1 dup count")
    rows.foreach { r =>
      val bp = r.getAs[Long]("dup_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(bp == r.getAs[Long]("n_dups") * 10000 / r.getAs[Long]("n_docs"))
    }
  }

  test("dedup_substring catches a SHIFTED 31-token overlap that " +
      "D7's aligned segments provably miss") {
    import spark.implicits._
    // doc 1: 60 distinct tokens; doc 2: 5 junk tokens then doc 1's
    // tokens 19..49 — a 31-token shared run at relative shift -14,
    // which is ≢ 0 (mod 16), so NO aligned 16-token segment can line up
    val a = (0 until 60).map(i => s"a$i")
    val b = (1 to 5).map(i => s"zz$i") ++ a.slice(19, 50)
    def alignedSegs(ts: Seq[String]): Set[String] =
      ts.grouped(Dedup.SegTokens).map(_.mkString(" ")).toSet
    assert(alignedSegs(a).intersect(alignedSegs(b)).isEmpty,
      "planted shift must defeat aligned segmentation (D7)")
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // windows of width 16 inside the shared run: starts 19..34 in doc 1
    // (16 windows covering tokens [19, 50)), starts 5..20 in doc 2
    // (covering [5, 36)) — interval union = the full 31-token run
    assert(out(1L).getAs[Long]("n_tokens") == 60)
    assert(out(1L).getAs[Long]("n_windows") == 45)
    assert(out(1L).getAs[Long]("n_dup_windows") == 16)
    assert(out(1L).getAs[Long]("dup_tokens") == 31)
    assert(out(1L).getAs[Long]("dup_pm") == 31000 / 60)
    assert(out(2L).getAs[Long]("n_tokens") == 36)
    assert(out(2L).getAs[Long]("n_windows") == 21)
    assert(out(2L).getAs[Long]("n_dup_windows") == 16)
    assert(out(2L).getAs[Long]("dup_tokens") == 31)
  }

  test("dedup_substring_pairs: shared-span pair surfaces with its " +
      "exact window count; boilerplate over the df-cap contributes " +
      "no pairs; intra-doc repeats collapse") {
    import spark.implicits._
    val a = (0 until 60).map(i => s"a$i")
    val boiler = (0 until 16).map(i => s"bp$i") // one shared window
    // docs 1/2: the D12 shifted 31-token overlap -> 16 shared windows;
    // docs 100.. all share the SAME boilerplate window (group size 20
    // > SubPairCap) -> no pairs from it; doc 3 repeats a window of
    // doc 1 TWICE -> still counts once (distinct-window collapse)
    val docs = (Seq(
      (1L, a.mkString(" ")),
      (2L, ((1 to 5).map(i => s"zz$i") ++ a.slice(19, 50)).mkString(" ")),
      (3L, (a.slice(0, 16) ++ Seq("x1") ++ a.slice(0, 16)).mkString(" "))
    ) ++ (100L until 120L).map(k =>
      (k, (boiler ++ Seq(s"u$k")).mkString(" ")))
    ).toDF("doc_id", "text")
    val out = Dedup.substringPairs(docs).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Long]("n_shared_windows")).toMap
    // expected: (1,2) share the 16 run windows; (1,3) share exactly
    // the window a0..a15 (doc 3's two copies collapse to one row);
    // (2,3) share nothing >= 16 tokens; boilerplate docs pair nowhere
    assert(out.keySet == Set((1L, 2L), (1L, 3L)), s"got ${out.keySet}")
    assert(out((1L, 2L)) == 16)
    assert(out((1L, 3L)) == 1)
  }

  test("dedup_substring_clusters: transitive copies group (A~B, B~C " +
      "=> one cluster) and sub-threshold pairs stay out") {
    import spark.implicits._
    val runX = (0 until 26).map(i => s"x$i") // 11 shared windows
    val runY = (0 until 26).map(i => s"y$i")
    val run18 = (0 until 18).map(i => s"s$i") // 3 windows < threshold 4
    val docs = Seq(
      (1L, (runX ++ (0 until 10).map(i => s"pa$i")).mkString(" ")),
      (2L, (runX ++ Seq("q1") ++ runY).mkString(" ")),
      (3L, (runY ++ (0 until 10).map(i => s"pc$i")).mkString(" ")),
      (8L, (run18 ++ (0 until 10).map(i => s"pd$i")).mkString(" ")),
      (9L, ((0 until 10).map(i => s"pe$i") ++ run18).mkString(" ")))
      .toDF("doc_id", "text")
    // sanity: A and C share no window; A-B and B-C share 11 each;
    // D-E share exactly 3 (below the 4-window edge threshold)
    val pf = Dedup.substringPairFrame(docs).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Long]("n_shared_windows")).toMap
    assert(pf((1L, 2L)) == 11 && pf((2L, 3L)) == 11)
    assert(pf((8L, 9L)) == 3 && !pf.contains((1L, 3L)))
    val out = Dedup.substringClusters(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L),
      s"only the transitive copy group clusters, got ${out.keySet}")
    assert(out.values.toSet == Set((1L, 3L)),
      "one cluster, canonical min-id label 1, size 3")
  }

  test("dedup_incremental: intake docs score against the store only — " +
      "store-internal dups never flag, exact copies set the flag, " +
      "partial overlaps get interval-union coverage") {
    import spark.implicits._
    val run = (0 until 40).map(i => s"k$i")
    val docs = Seq(
      // store (doc_id % 5 != 0)
      (1L, run.mkString(" ")),                       // store original
      (2L, run.mkString(" ")),                       // store-internal dup
      (3L, (0 until 30).map(i => s"s$i").mkString(" ")),
      // intake (doc_id % 5 == 0)
      (5L, run.mkString(" ")),                       // exact copy of store
      (10L, ((1 to 4).map(i => s"j$i") ++ run.slice(10, 34))
        .mkString(" ")),                             // 24-token shifted span
      (15L, (0 until 25).map(i => s"f$i").mkString(" ")) // fresh
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(5L, 10L, 15L),
      "only intake docs report — the store is never re-deduped")
    // doc 5: full coverage + exact flag
    assert(out(5L).getAs[Int]("exact_dup") == 1)
    assert(out(5L).getAs[Long]("n_hit_windows") == 25) // 40 - 16 + 1
    assert(out(5L).getAs[Long]("dup_tokens") == 40)
    assert(out(5L).getAs[Long]("dup_pm") == 1000)
    // doc 10: 24 shared tokens at offset 4 → windows at pos 4..12 hit
    // (9 windows, union covers [4, 28) = 24 tokens); not exact
    assert(out(10L).getAs[Int]("exact_dup") == 0)
    assert(out(10L).getAs[Long]("n_hit_windows") == 9)
    assert(out(10L).getAs[Long]("dup_tokens") == 24)
    assert(out(10L).getAs[Long]("dup_pm") == 24000 / 28)
    // doc 15: fresh
    assert(out(15L).getAs[Long]("n_hit_windows") == 0)
    assert(out(15L).getAs[Long]("dup_tokens") == 0)
    assert(out(15L).getAs[Int]("exact_dup") == 0)
  }

  test("dedup_hot_spans: the hottest window surfaces with exact " +
      "occurrence/doc counts and its literal text; singletons stay out") {
    import spark.implicits._
    val boiler = (0 until 16).map(i => s"bp$i")
    val docs = (Seq(
      (1L, (boiler ++ Seq("t1") ++ boiler).mkString(" ")), // 2 occurrences
      (2L, (boiler ++ Seq("t2")).mkString(" ")),
      (3L, (0 until 20).map(i => s"solo$i").mkString(" ")) // no dups
    )).toDF("doc_id", "text")
    val out = Dedup.hotSpans(docs).collect()
    // doc 1 contributes the boilerplate window twice (pos 0 and 17),
    // doc 2 once → 3 occurrences across 2 docs; every window of doc 3
    // and the bridge windows of doc 1 are singletons
    assert(out.length == 1, s"got ${out.length} rows")
    assert(out.head.getAs[String]("win") == boiler.mkString(" "))
    assert(out.head.getAs[Long]("n_occurrences") == 3)
    assert(out.head.getAs[Long]("n_docs") == 2)
  }

  test("dedup_substring: intra-doc repetition counts, full coverage " +
      "when a 20-token run repeats back-to-back") {
    import spark.implicits._
    val run = (0 until 20).map(i => s"r$i")
    val docs = Seq(
      (1L, (run ++ run).mkString(" ")), // 40 tokens, period 20
      (2L, (0 until 30).map(i => s"u$i").mkString(" "))) // control
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // equal windows: starts 0..4 ≡ starts 20..24 (the only pairs whose
    // 16 tokens stay inside one period image) → 10 dup windows whose
    // union [0,20) ∪ [20,40) covers the whole doc
    assert(out(1L).getAs[Long]("n_dup_windows") == 10)
    assert(out(1L).getAs[Long]("dup_tokens") == 40)
    assert(out(1L).getAs[Long]("dup_pm") == 1000)
    assert(out(2L).getAs[Long]("n_dup_windows") == 0)
    assert(out(2L).getAs[Long]("dup_tokens") == 0)
  }

  test("dedup_embedding size gate: the key runs the exact arm at test " +
      "SF; the forced above-bound arm is a same-τ cell-restricted " +
      "subset with no corpus-sized nested-loop broadcast") {
    val em = graft.Tables(spark, sfDir, "embeddings")
    val exact = pairs(Dedup.dedupEmbeddingExact(em))
    val viaKey = pairs(Dedup.dedupEmbedding(spark, sfDir))
    assert(exact.nonEmpty && viaKey == exact,
      "below the bound the gated key must BE the exact arm")
    // exactMax = 0 forces the above-bound (cell-restricted) arm on the
    // same corpus: same τ rule, so every emitted pair is an exact pair
    // (precision 1); recall is bounded by cell splits — nonempty here
    // because the operating τ flags same-cell mates at this SF
    val forced = pairs(Dedup.dedupEmbeddingGated(spark, em, exactMax = 0L))
    assert((forced -- exact).isEmpty,
      s"above-bound arm emitted non-pairs: ${(forced -- exact).take(5)}")
    assert(forced.nonEmpty)
    // the above-bound plan never nested-loop-broadcasts anything
    // corpus-derived: the only BNLJ build sides are the driver-local
    // trained centroid frames (the KnnGraphSpec E27b assertion, applied
    // to D5's scale arm)
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = graft.ann.Ann.cellCosPairs(spark, em, Dedup.EmbDupTau)
      .queryExecution.sparkPlan
    plan.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      val build = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      val leaves = build.collectLeaves()
      assert(leaves.nonEmpty &&
        leaves.forall(_.isInstanceOf[LocalTableScanExec]),
        s"corpus-sized broadcast side in BNLJ:\n$build")
    }
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
  }
}
