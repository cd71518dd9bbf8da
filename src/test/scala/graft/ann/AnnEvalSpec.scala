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

  test("ann_filtered_eval: post arm is a prefix of the pre ranking, " +
      "so overlap == n_post; bounds and label integrity hold") {
    import org.apache.spark.sql.functions.col
    val rows = AnnEval.annFilteredEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labels = graft.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < Ann.NumQueries)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Number]("label").longValue)
      .toMap
    rows.foreach { r =>
      val (nPre, nPost, nOv) = (r.getAs[Long]("n_pre"),
        r.getAs[Long]("n_post"), r.getAs[Long]("n_overlap"))
      assert(nPre >= 1 && nPre <= AnnEval.FK)
      assert(nPost <= nPre)
      // a same-label vector in the unfiltered top-C implies every
      // better same-label vector is there too — the post arm is a
      // PREFIX of the true same-label ranking, hence overlap == n_post
      assert(nOv == nPost,
        s"q=${r.getAs[Long]("q_id")}: overlap $nOv != n_post $nPost")
      assert(r.getAs[Long]("recall_bp") == nOv * 10000 / nPre)
      assert(r.getAs[Number]("q_label").longValue ==
        labels(r.getAs[Long]("q_id")))
    }
    val a = rows.map(_.toString).toSeq
    val b = AnnEval.annFilteredEval(spark, sfDir).collect()
      .map(_.toString).toSeq
    assert(a == b, "not deterministic")
  }
}
