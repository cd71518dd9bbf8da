package graft.ann

import graft.SparkSpec

class AnnEvalSpec extends SparkSpec {

  test("ann_recall_eval: one row per query, recall in [0,1], matches a direct recount") {
    val rows = AnnEval.annRecallEval(spark, sfDir).collect()
    assert(rows.length == Ann.NumQueries)
    rows.foreach { r =>
      val nExact = r.getAs[Long]("n_exact")
      val nHits = r.getAs[Long]("n_hits")
      assert(nExact == 5L) // top-5 per query on this corpus
      assert(nHits >= 0L && nHits <= nExact)
      val recall = r.getAs[Double]("recall")
      assert(math.abs(recall - nHits.toDouble / nExact) < 1e-9 + 1e-4)
    }
    // recount one query by hand from the two arms
    val q0 = rows.head.getAs[Long]("q_id")
    val exact = Ann.annTopK(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("q_id") === q0)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    val approx = Ann.annLsh(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("q_id") === q0)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(rows.head.getAs[Long]("n_hits") == (exact & approx).size.toLong)
  }

  test("ann_recall_eval: mean recall clears the E2 spec bar") {
    val rows = AnnEval.annRecallEval(spark, sfDir).collect()
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    // the LSH suite pins >= chance-beating recall; the eval operator
    // must agree with that standing bar
    assert(mean >= 0.3, s"mean recall $mean below the E2 bar")
  }
}
