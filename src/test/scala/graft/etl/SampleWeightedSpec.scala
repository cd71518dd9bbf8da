package graft.etl

import graft.SparkSpec

class SampleWeightedSpec extends SparkSpec {

  test("sample_weighted: deterministic, and weight actually biases") {
    val a = Etl.sampleWeighted(spark, sfDir).collect()
    val b = Etl.sampleWeighted(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "hash draws must make the sample bit-reproducible")
    assert(a.length == 50)
    a.foreach { r =>
      val k = r.getAs[Double]("key")
      assert(k > 0.0 && k < 1.0, s"A-Res key $k outside (0,1)")
    }
    // Efraimidis–Spirakis: selection probability ∝ weight, so the
    // sampled docs must skew long vs the corpus average
    val corpusAvg = graft.Tables(spark, sfDir, "documents")
      .agg(org.apache.spark.sql.functions.avg("n_chars"))
      .collect()(0).getDouble(0)
    val sampleAvg = a.map(_.getAs[Long]("weight")).sum.toDouble / a.length
    assert(sampleAvg > corpusAvg,
      s"sample mean weight $sampleAvg must exceed corpus mean $corpusAvg")
  }
}
