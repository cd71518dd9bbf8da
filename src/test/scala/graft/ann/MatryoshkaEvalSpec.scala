package graft.ann

import graft.SparkSpec

class MatryoshkaEvalSpec extends SparkSpec {

  private lazy val rows = MatryoshkaEval.embMatryoshkaEval(spark, sfDir)
    .collect()

  test("one row per dim; full-dim recall is exactly 1; recall in [0,1]") {
    assert(rows.map(_.getAs[Int]("dim")).toSeq == MatryoshkaEval.Dims)
    rows.foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("n_pairs") == 5L * Ann.NumQueries)
    }
    // dim 64 IS the full embedding: the truncated arm equals E1 exactly
    val d64 = rows.find(_.getAs[Int]("dim") == 64).get
    assert(d64.getAs[Double]("recall") == 1.0)
  }

  test("recall does not collapse at the shortest prefix on this corpus") {
    // near-random embeddings are the hardest case; 8 of 64 dims must
    // still beat chance (5 of ~500 corpus-wide would be ~0.01)
    val d8 = rows.find(_.getAs[Int]("dim") == 8).get
    assert(d8.getAs[Double]("recall") > 0.05)
  }
}
