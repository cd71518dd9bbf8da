package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSpec extends SparkSpec {

  test("hybrid_rrf: scores decreasing, ranks in arm bounds, " +
    "fusion arithmetic checks out") {
    val rows = Hybrid.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("rrf"))
    scores.zip(scores.tail).foreach { case (a, b) => assert(a >= b) }
    rows.foreach { r =>
      val lex = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
      val sem = Option(r.getAs[Integer]("sem_rank")).map(_.toInt)
      assert(lex.isDefined || sem.isDefined)
      (lex ++ sem).foreach(k => assert(k >= 1 && k <= Hybrid.ArmN))
      val expected = lex.map(k => 1.0 / (Hybrid.RrfK + k)).getOrElse(0.0) +
        sem.map(k => 1.0 / (Hybrid.RrfK + k)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-6)
    }
  }

  test("hybrid_mmr: first pick is the fused rank-1, picks come from " +
      "the fused pool, diversified and deterministic") {
    val fused = Hybrid.hybridRrf(spark, sfDir).collect()
      .map(_.getLong(0))
    val out = Hybrid.hybridMmr(spark, sfDir).collect()
    assert(out.length == math.min(Ann.MmrK, fused.length))
    val picks = out.sortBy(_.getAs[Int]("rank")).map(_.getLong(1))
    // rank 1 maximizes pure relevance = the fused top-1
    assert(picks.head == fused.head,
      s"first MMR pick ${picks.head} != fused top-1 ${fused.head}")
    assert(picks.distinct.length == picks.length)
    picks.foreach(p => assert(fused.contains(p),
      s"pick $p not in the fused candidate pool"))
    out.foreach { r =>
      val fr = r.getAs[Int]("fused_rank")
      assert(fr >= 1 && fr <= Hybrid.FuseN)
    }
    val again = Hybrid.hybridMmr(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("hybrid_mmr_multi: every query gets its own MmrK diversified " +
      "picks; query 0's picks equal the single-query hybrid_mmr") {
    val out = Hybrid.hybridMmrMulti(spark, sfDir).collect()
    val qids = Hybrid.MultiQueries.map(_._1).toSet
    assert(out.map(_.getAs[Long]("q_id")).toSet == qids)
    qids.foreach { q =>
      val rows = out.filter(_.getAs[Long]("q_id") == q)
        .sortBy(_.getAs[Int]("rank"))
      assert(rows.length == Ann.MmrK,
        s"query $q: ${rows.length} picks, expected ${Ann.MmrK}")
      assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to Ann.MmrK))
      val picks = rows.map(_.getAs[Long]("doc_id"))
      assert(picks.distinct.length == picks.length)
      // rank 1 maximizes pure relevance = that query's fused top-1
      assert(rows.head.getAs[Int]("fused_rank") == 1,
        s"query $q: first pick has fused_rank " +
          rows.head.getAs[Int]("fused_rank"))
      rows.foreach { r =>
        val fr = r.getAs[Int]("fused_rank")
        assert(fr >= 1 && fr <= Hybrid.FuseN)
      }
    }
    // query 0 IS hybrid_mmr's query (same terms, same embedding id):
    // the multi-query plan must reproduce the single-query result
    val single = Hybrid.hybridMmr(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Int]("rank"), r.getLong(1),
        r.getAs[Double]("mmr_score")))
    val q0 = out.filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("mmr_score")))
    assert(q0.toSeq == single.toSeq,
      s"multi q0 ${q0.toSeq} != single ${single.toSeq}")
  }

  test("hybrid_rrf: a doc ranked by both arms beats one ranked by one " +
    "at similar depth") {
    val rows = Hybrid.hybridRrf(spark, sfDir).collect()
    val both = rows.filter(r => r.get(1) != null && r.get(2) != null)
    if (both.nonEmpty) {
      // any both-arm doc scores at least 1/(k+N) + 1/(k+N)
      val floor = 2.0 / (Hybrid.RrfK + Hybrid.ArmN)
      both.foreach(r =>
        assert(r.getAs[Double]("rrf") >= floor - 1e-9))
    }
  }
}
