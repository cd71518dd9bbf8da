package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnSpec extends SparkSpec {

  private def neighbors(df: DataFrame): Map[Long, Seq[Long]] =
    df.select(col("q_id").cast("long"), col("neighbor_id").cast("long"),
        col("rank"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getLong(1)).toSeq
      }

  lazy val exact: Map[Long, Seq[Long]] = neighbors(Ann.annTopK(spark, sfDir))

  test("ann_topk returns k ranked neighbors per query, self excluded") {
    assert(exact.size == Ann.NumQueries ||
      exact.size == exact.keySet.size) // all queries present
    exact.foreach { case (q, ns) =>
      assert(ns.size == Ann.K)
      assert(!ns.contains(q), s"query $q returned itself")
      assert(ns.distinct.size == ns.size)
    }
  }

  private def recallAtK(approx: Map[Long, Seq[Long]]): Double = {
    val hits = exact.map { case (q, ns) =>
      approx.getOrElse(q, Seq.empty).count(ns.toSet).toDouble / ns.size
    }
    hits.sum / hits.size
  }

  test("ann_lsh recall@5 vs exact is usable") {
    val r = recallAtK(neighbors(Ann.annLsh(spark, sfDir)))
    info(s"ann_lsh recall@5 = $r")
    assert(r >= 0.3, s"LSH recall too low: $r")
  }

  test("ann_ivf recall@5 vs exact is usable") {
    val r = recallAtK(neighbors(Ann.annIvf(spark, sfDir)))
    info(s"ann_ivf recall@5 = $r")
    assert(r >= 0.3, s"IVF recall too low: $r")
  }

  test("ann_ivfq residual rerank recalls at least what plain IVF does") {
    val ivf = recallAtK(neighbors(Ann.annIvf(spark, sfDir)))
    val ivfq = recallAtK(neighbors(Ann.annIvfQ(spark, sfDir)))
    info(s"ann_ivf recall@5 = $ivf, ann_ivfq recall@5 = $ivfq")
    // same probed candidate set; int8 residual scoring only picks WHICH
    // 50 reach the exact re-rank, and 50 ≫ 5 absorbs the quantization
    // error — so the ADC path must not lose recall vs plain IVF
    assert(ivfq >= ivf - 1e-9, s"residual path lost recall: $ivfq < $ivf")
    assert(ivfq >= 0.3)
  }

  test("ann_pq_balanced: permutation is valid, balanced by " +
      "construction, and recall holds the PQ floor") {
    val c = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val perm = Ann.balancedPerm(c)
    assert(perm.sorted == (0 until Ann.Dim), "must be a permutation")
    assert(perm == Ann.balancedPerm(c), "must be deterministic")
    // balance law for rank-round-robin over desc-sorted values:
    // max subspace variance sum − min ≤ the single largest variance
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val withQ = c.withColumn("q", expr(
      "transform(embedding, x -> cast(floor(cast(x as double) * 1e6) as bigint))"))
    val aggs = count(lit(1)).cast(dec).as("n") +:
      ((0 until Ann.Dim).map(i =>
        sum(col("q").getItem(i).cast(dec)).as(s"s$i")) ++
       (0 until Ann.Dim).map(i =>
         sum((col("q").getItem(i) * col("q").getItem(i)).cast(dec))
           .as(s"ss$i")))
    val row = withQ.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = BigInt(row.getDecimal(0).toBigInteger)
    val v = (0 until Ann.Dim).map { i =>
      val s = BigInt(row.getDecimal(1 + i).toBigInteger)
      val ss = BigInt(row.getDecimal(1 + Ann.Dim + i).toBigInteger)
      n * ss - s * s
    }
    val subSums = perm.grouped(Ann.Dim / Ann.PqM).toSeq
      .map(_.map(v).sum)
    assert(subSums.max - subSums.min <= v.max,
      s"balance law violated: spread ${subSums.max - subSums.min}")
    val rPq = recallAtK(neighbors(Ann.annPq(spark, sfDir)))
    val rBal = recallAtK(neighbors(Ann.annPqBalanced(spark, sfDir)))
    info(s"ann_pq recall@5 = $rPq, ann_pq_balanced recall@5 = $rBal")
    assert(rBal >= 0.3, s"balanced-PQ recall too low: $rBal")
  }

  test("ann_ivfpq recalls at least what plain IVF does") {
    val ivf = recallAtK(neighbors(Ann.annIvf(spark, sfDir)))
    val ivfpq = recallAtK(neighbors(Ann.annIvfPq(spark, sfDir)))
    info(s"ann_ivf recall@5 = $ivf, ann_ivfpq recall@5 = $ivfpq")
    // identical probed candidate set (same coarse quantizer, same
    // multi-probe rule); the residual-PQ ADC score only picks WHICH 50
    // reach the exact re-rank, and 50 ≫ 5 absorbs quantization error
    assert(ivfpq >= ivf - 1e-9, s"IVF-PQ path lost recall: $ivfpq < $ivf")
    assert(ivfpq >= 0.3)
  }

  test("ann_pq recall@5 vs exact is usable (ADC + rerank covers)") {
    val r = recallAtK(neighbors(Ann.annPq(spark, sfDir)))
    info(s"ann_pq recall@5 = $r")
    // 50-candidate exact re-rank absorbs most codebook quantization
    // error; near-random embeddings are PQ's hardest case, so the bar
    // sits at "clearly better than chance", same as LSH/IVF
    assert(r >= 0.3, s"PQ recall too low: $r")
  }

  test("pq codebook: m*k entries, trained centroids differ from seeds") {
    val c = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cb = Ann.pqCodebook(spark, c).collect()
    // every (sub, code) cell non-empty on this data; codebook is tiny
    assert(cb.length <= Ann.PqM * Ann.PqK)
    assert(cb.map(r => (r.getInt(0), r.getInt(1))).distinct.length == cb.length)
    cb.foreach(r => assert(r.getSeq[Float](2).length == Ann.PqSub))
    // Lloyd refinement moved the centroids: no trained centroid should
    // exactly equal a raw corpus subvector (means of >1 members)
    val subs = cb.map(_.getInt(0)).distinct
    assert(subs.length == Ann.PqM)
  }

  test("pq codes: every corpus vector encodes to m in-range codes") {
    val c = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cb = Ann.pqCodebook(spark, c)
    val codes = Ann.assignCodes(
      c.withColumn("svs", expr(
        s"transform(sequence(0, ${Ann.PqM - 1}), s -> slice(embedding, s * ${Ann.PqSub} + 1, ${Ann.PqSub}))"))
        .select(col("vec_id"), posexplode(col("svs")).as(Seq("sub", "sv"))),
      cb)
    val n = c.count()
    assert(codes.count() == n * Ann.PqM)
    val bad = codes.filter(col("code") < 0 || col("code") >= Ann.PqK).count()
    assert(bad == 0)
  }

  test("quantizer training sample: bounded, deterministic, vacuous under cap") {
    import spark.implicits._
    val c = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val th = Ann.sampleThresh(c)
    val tr = c.filter(Ann.sampleDraw < lit(th))
    val n = c.count()
    val kept = tr.count()
    val cap = Ann.trainCapFor(n)
    info(s"corpus $n, thresh $th, sampled $kept (cap $cap)")
    // binomial around cap: the sample is BOUNDED — never a corpus-scale
    // fraction once n exceeds the cap — and never empty
    assert(kept > 0)
    if (n > cap) {
      assert(th < 65536, "sampling must bite when the corpus exceeds the cap")
      assert(kept <= cap * 3 / 2, s"sample $kept far above cap")
    }
    // deterministic: the same filter re-evaluated selects the same ids
    val a = tr.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = c.filter(Ann.sampleDraw < lit(th))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // a corpus at-or-under the cap trains on every vector (thresh tops
    // out at 65536, above any 16-bit draw)
    val small = (0L until 50L).map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Ann.sampleThresh(small) == 65536L)
    assert(small.filter(Ann.sampleDraw < lit(65536L)).count() == 50L)
  }

  test("derived training cap: clamp(⌈8√n⌉, 256, 2²⁰) at the edges, " +
      "and thresh non-increasing at EVERY n (the one-pass prune's proof)") {
    // floor regime: every shipped test SF stays where the gate has
    // always verified it (n=500 → 256), and 8·32 = 256 makes n=1024
    // the exact last floor point
    assert(Ann.derivedTrainCap(1) == 256L)
    assert(Ann.derivedTrainCap(500) == 256L)
    assert(Ann.derivedTrainCap(1024) == 256L)
    assert(Ann.derivedTrainCap(1025) == 257L) // ⌈8·√1025⌉
    assert(Ann.derivedTrainCap(2000) == 358L) // sf0.1
    assert(Ann.derivedTrainCap(20000) == 1132L) // the 10× probe corpus
    assert(Ann.derivedTrainCap(1000000000L) == 252983L) // ≈ the 10⁵ design point
    // ceiling binds past ~1.7·10¹⁰ vectors
    assert(Ann.derivedTrainCap(20000000000L) == (1L << 20))
    assert(Ann.derivedTrainCap(Long.MaxValue / 4) == (1L << 20))
    // thresh monotone non-increasing in n — threshFor's prune-safety
    // rides on it. EXHAUSTIVE over the floor-to-√n transition (a ⌈·⌉
    // inside the rate broke exactly this, right past perfect squares)
    // plus a sparse tail across both clamp boundaries
    var prev = Ann.threshFor(1)
    (2L to 70000L).foreach { n =>
      val t = Ann.threshFor(n)
      assert(t <= prev, s"thresh increased at n=$n: $prev -> $t")
      prev = t
    }
    val tail = Seq(70000L, 1000000L, 123456789L, 17179869183L,
      17179869184L, 17179869185L, 1L << 40, Long.MaxValue / 4)
    tail.sliding(2).foreach { case Seq(a, b) =>
      assert(Ann.threshFor(a) >= Ann.threshFor(b),
        s"thresh not non-increasing between $a and $b")
      assert(Ann.derivedTrainCap(a) <= Ann.derivedTrainCap(b),
        s"cap not monotone between $a and $b")
    }
    // no override in the test JVM: derived IS the cap in force
    assert(Ann.TrainCapOverride.isEmpty &&
      Ann.trainCapFor(2000) == Ann.derivedTrainCap(2000))
  }

  test("ivf multi-probe stays within [IvfProbes, IvfMaxProbes] per query") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val centroids = (0L until 20L).map(i => (i, vec()))
      .toDF("cell_id", "c_emb")
    val queries = (0L until 30L).map(i => (i, vec()))
      .toDF("q_id", "q_emb")
    val counts = Ann.probeCells(queries, centroids)
      .groupBy("q_id").count().collect().map(_.getLong(1))
    assert(counts.length == 30) // every query probes something
    assert(counts.forall(c => c >= Ann.IvfProbes && c <= Ann.IvfMaxProbes),
      s"probe counts out of bounds: ${counts.mkString(",")}")
    // random centroids rarely tie within the margin, so most queries
    // should stay at the cheap floor — the point of adaptive probing
    val atFloor = counts.count(_ == Ann.IvfProbes)
    info(s"queries at probe floor: $atFloor/30")
    assert(atFloor >= 15, "margin expansion fired for most queries")
  }

  test("ann_bq recall@5 vs exact is usable (128-deep rerank covers)") {
    val r = recallAtK(neighbors(Ann.annBq(spark, sfDir)))
    info(s"ann_bq recall@5 = $r")
    // 1-bit codes are the coarsest signal in the ladder; the 128-deep
    // exact rerank is what carries recall
    assert(r >= 0.3, s"binary-quantization recall too low: $r")
  }

  test("ann_bq sign codes replay per-vector, words stay in u32 range") {
    import spark.implicits._
    val packed = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        expr("""aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) ->
          acc + CASE WHEN embedding[i] > 0
            THEN shiftleft(CAST(1 AS BIGINT), i)
            ELSE CAST(0 AS BIGINT) END)""").as("lo"),
        expr("""aggregate(sequence(32, 63), CAST(0 AS BIGINT), (acc, i) ->
          acc + CASE WHEN embedding[i] > 0
            THEN shiftleft(CAST(1 AS BIGINT), i - 32)
            ELSE CAST(0 AS BIGINT) END)""").as("hi"))
      .as[(Long, Array[Float], Long, Long)].collect()
    assert(packed.nonEmpty)
    packed.take(50).foreach { case (id, emb, lo, hi) =>
      val expLo = emb.take(32).zipWithIndex
        .collect { case (v, i) if v > 0 => 1L << i }.sum
      val expHi = emb.drop(32).zipWithIndex
        .collect { case (v, i) if v > 0 => 1L << i }.sum
      assert(lo == expLo && hi == expHi, s"vec $id pack mismatch")
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32),
        s"vec $id words left u32 range")
    }
  }

  test("ann_quantized recall@5 vs exact is near-perfect (rerank covers)") {
    val r = recallAtK(neighbors(Ann.annQuantized(spark, sfDir)))
    info(s"ann_quantized recall@5 = $r")
    // int8 error only hurts if a true neighbor misses the top-50
    // candidate pool before the exact re-rank — should be rare
    assert(r >= 0.8, s"quantized recall too low: $r")
  }

  test("ann_lsh recall ≈ 1 on clustered data (the regime LSH targets)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 10 tight clusters: LSH must find same-cluster neighbors
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val em = (0L until 200L).map { i =>
      val c = centers((i % 10).toInt)
      (i, c.map(x => x + (rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    em.createOrReplaceTempView("__ann_clustered")
    // reuse the operator bodies against a temp dir is overkill; directly
    // check that same-bucket candidates cover same-cluster pairs
    val sigs = em.select(col("vec_id"),
      posexplode(graft.functions.GraftFunctions.rhpSigs(col("embedding"), 8, 16))
        .as(Seq("t", "s")))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.t") === col("b.t") && col("a.s") === col("b.s") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sameCluster = (for {
      i <- 0L until 200L; j <- i + 1 until 200L if i % 10 == j % 10
    } yield (i, j)).toSet
    val recall = sameCluster.count(cand).toDouble / sameCluster.size
    info(s"clustered candidate recall = $recall")
    assert(recall >= 0.95)
  }

  test("emb_outliers: flagged vectors sit below their cluster mean") {
    val rows = Ann.embOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty, "threshold must fire at the smallest SF")
    rows.foreach { r =>
      assert(r.getAs[Double]("cos") < r.getAs[Double]("cluster_mean"))
      assert(r.getAs[Long]("cluster_n") >= 3)
    }
    // flagged set is a strict minority: this is an outlier gate
    val corpus = graft.Tables(spark, sfDir, "embeddings").count()
    assert(rows.length * 10 < corpus,
      s"${rows.length} outliers of $corpus vectors is not an outlier gate")
  }

  test("emb_kmeans: every vector assigned exactly once, cohesion sane") {
    val rows = Ann.embKmeans(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val assigned = rows.map(_.getAs[Long]("n_vectors")).sum
    val corpus = graft.Tables(spark, sfDir, "embeddings").count()
    assert(assigned == corpus, "cluster sizes must partition the corpus")
    rows.foreach { r =>
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Double]("avg_norm") > 0.0)
    }
  }
  test("emb_cluster_sample: balanced budget, small clusters intact, " +
      "deterministic") {
    val rows = Ann.embClusterSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val corpusN = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == corpusN,
      "every corpus vector must belong to exactly one cluster")
    rows.foreach { r =>
      val (n, thresh, kept) = (r.getAs[Long]("n_vectors"),
        r.getAs[Long]("thresh"), r.getAs[Long]("n_kept"))
      assert(thresh >= 0 && thresh <= 65536)
      assert(kept >= 0 && kept <= n)
      // a cluster at-or-under its budget slice keeps everything
      if (thresh == 65536) assert(kept == n)
      if (kept == 0)
        assert(r.getAs[String]("kept_fp") ==
          "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    }
    // bit-reproducible: a second full run selects the identical sample
    val again = Ann.embClusterSample(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
  test("dedup_semantic: flags agree with brute-force within-cluster " +
      "pairs and every dup pair is a true D5 near-dup") {
    val out = Ann.dedupSemantic(spark, sfDir).collect()
    assert(out.nonEmpty)
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val n = math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum)
      if (n == 0) 0 else d / n
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var dups = 0
    out.foreach { r =>
      val (id, cl) = (r.getLong(0), r.getLong(1))
      val isDup = r.getInt(2) == 1
      // brute-force: does a lower-id same-cluster mate clear the bar?
      val expected = cluster.exists { case (o, ocl) =>
        o < id && ocl == cl && r6(cos(embs(o), embs(id))) >= Ann.SemDedupTau
      }
      assert(isDup == expected, s"vec $id flag $isDup != $expected")
      if (isDup) {
        dups += 1
        val kept = r.getLong(3)
        assert(kept < id && cluster(kept) == cl)
        // the flagged pair is a genuine near-dup by the GLOBAL D5 rule
        assert(r6(cos(embs(kept), embs(id))) >= Ann.SemDedupTau)
      } else assert(r.getLong(3) == -1L)
    }
    info(s"semantic dups flagged: $dups of ${out.length}")
    assert(dups > 0, "threshold never fired — spec exercises nothing")
  }
  test("emb_hard_negatives: exactly the top-k wrong-label vectors " +
      "per anchor") {
    val rows = Ann.embHardNegatives(spark, sfDir).collect()
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2))).toSeq
    val labels = all.map(t => t._1 -> t._3).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val n = math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum)
      if (n == 0) 0 else d / n
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == Ann.NumQueries)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      val got = sorted.map(_.getAs[Long]("neighbor_id")).toSeq
      assert(got.length == Ann.K && got.distinct.length == got.length)
      // every row is cross-label, and matches the brute-force top-k
      rs.foreach(r => assert(
        r.getAs[Int]("neg_label") != r.getAs[Int]("anchor_label")))
      val anchor = all.find(_._1 == q).get
      val want = all
        .filter(t => t._3 != anchor._3)
        .map(t => (t._1, r6(cos(anchor._2, t._2))))
        .sortBy { case (id, c) => (-c, id) }
        .take(Ann.K).map(_._1)
      assert(got == want, s"anchor $q: $got != $want")
      assert(labels(got.head) != anchor._3)
    }
  }
  test("ann_mmr: rank-1 is the exact top-1, sets are diverse and " +
      "deterministic") {
    val mmr = Ann.annMmr(spark, sfDir).collect()
    val byQ = mmr.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val ids = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id"))
      assert(ids.length == Ann.MmrK && ids.distinct.length == ids.length)
      assert(!ids.contains(q))
      // the first MMR pick maximizes pure relevance = the exact top-1
      assert(ids.head == exact(q).head,
        s"query $q rank-1 ${ids.head} != exact top-1 ${exact(q).head}")
    }
    // diversity: the MMR set's mean pairwise cosine must not exceed the
    // plain top-5 set's (that's the whole point of the re-ranking)
    def meanPairSim(sets: Map[Long, Seq[Long]]): Double = {
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Float](1).toArray).toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        val n = math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum)
        if (n == 0) 0 else d / n
      }
      val sims = for {
        (_, ids) <- sets.toSeq
        i <- ids.indices; j <- (i + 1) until ids.length
      } yield cos(embs(ids(i)), embs(ids(j)))
      sims.sum / sims.size
    }
    val mmrSets = byQ.map { case (q, rows) =>
      q -> rows.map(_.getAs[Long]("neighbor_id")).toSeq }
    val d1 = meanPairSim(mmrSets)
    val d2 = meanPairSim(exact)
    info(s"mean pairwise cosine: mmr=$d1 top5=$d2")
    assert(d1 <= d2 + 1e-9, "MMR must not be less diverse than top-k")
    val again = Ann.annMmr(spark, sfDir).collect()
    assert(mmr.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("dedup_semantic_sweep: dup volume is monotone non-increasing " +
      "in tau, conserves totals, and the operating-point row equals " +
      "dedup_semantic's dup count") {
    val rows = Ann.dedupSemanticSweep(spark, sfDir).collect()
    assert(rows.map(_.getAs[Double]("tau")).toSeq == Ann.SemSweepTaus)
    val n = Ann.corpus(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == n)
      assert(r.getAs[Long]("n_kept") ==
        n - r.getAs[Long]("n_dups"))
      assert(r.getAs[Long]("dup_bp") ==
        r.getAs[Long]("n_dups") * 10000 / n)
    }
    val dups = rows.map(_.getAs[Long]("n_dups")).toSeq
    assert(dups == dups.sorted.reverse, s"raising tau cannot add dups: $dups")
    val atOp = rows.find(_.getAs[Double]("tau") == Ann.SemDedupTau).get
    val d9 = Ann.dedupSemantic(spark, sfDir).collect()
      .count(_.getAs[Int]("is_dup") == 1).toLong
    assert(atOp.getAs[Long]("n_dups") == d9,
      "the tau=operating-point row must reproduce dedup_semantic")
  }
}
