package graft.dedup

import graft.SparkSpec

class DedupEvalSpec extends SparkSpec {

  test("dedup_lsh_eval: one summary row; precision 1.0; counts consistent") {
    val r = DedupEval.dedupLshEval(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val nExact = row.getAs[Long]("n_exact_pairs")
    val nLsh = row.getAs[Long]("n_lsh_pairs")
    val nHits = row.getAs[Long]("n_hits")
    val nMissed = row.getAs[Long]("n_missed")
    assert(nExact > 0, "ground-truth pair set empty — eval is vacuous")
    // both paths exact-verify at the same tau: every LSH pair is true
    assert(nHits == nLsh, "LSH produced a pair the exhaustive scan lacks")
    assert(row.getAs[Double]("precision") == 1.0)
    assert(nMissed == nExact - nHits)
    val recall = row.getAs[Double]("recall")
    assert(recall > 0.5 && recall <= 1.0,
      s"128-perm/32-band LSH recall $recall implausible")
  }

  test("dedup_lsh_eval: recall recount matches a direct set comparison") {
    val exact = Dedup.dedupNgramJaccard(spark, sfDir)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, sfDir)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val row = DedupEval.dedupLshEval(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_hits") == (exact & lsh).size.toLong)
    assert(row.getAs[Long]("n_exact_pairs") == exact.size.toLong)
    assert(row.getAs[Long]("n_lsh_pairs") == lsh.size.toLong)
  }

  test("dedup_lsh_sweep: nested bands make candidates, hits and " +
      "recall monotone in the band count; the 32-band point dominates " +
      "the D10 operating point") {
    val rows = DedupEval.dedupLshSweep(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("n_bands")).toSeq == Seq(4, 8, 16, 32))
    rows.foreach { r =>
      assert(r.getAs[Int]("n_bands") * r.getAs[Int]("n_rows") ==
        Dedup.NumPerms)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_true_pairs"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_candidates"))
    }
    assert(rows.map(_.getAs[Long]("n_true_pairs")).distinct.length == 1,
      "the ground truth is config-independent")
    def mono(xs: Seq[Long]) = xs == xs.sorted
    assert(mono(rows.map(_.getAs[Long]("n_candidates")).toSeq),
      "halved rows can only add collisions")
    assert(mono(rows.map(_.getAs[Long]("n_hits")).toSeq))
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    assert(recalls == recalls.sorted)
    // sweep hits at 32 bands count truth∩candidates; D10's hits are
    // truth∩(verified pairs) ⊆ that
    val d10 = DedupEval.dedupLshEval(spark, sfDir).collect().head
    assert(rows.last.getAs[Long]("n_hits") >= d10.getAs[Long]("n_hits"))
    assert(rows.last.getAs[Long]("n_true_pairs") ==
      d10.getAs[Long]("n_exact_pairs"))
  }
}
