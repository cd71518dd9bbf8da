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
}
