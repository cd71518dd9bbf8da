package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbPcaSpec extends SparkSpec {

  test("gram_upper: registered SQL aggregate, exact and order-independent") {
    import spark.implicits._
    graft.functions.GraftExtensions.registerSql(spark)
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 4.0f)),
      (3L, Array(-1.0f, 0.5f))
    ).toDF("id", "v")
    df.createOrReplaceTempView("__gram_in")
    val g = spark.sql("SELECT gram_upper(v) AS g FROM __gram_in")
      .collect()(0).getSeq[Long](0)
    // hand-computed in micro-units: q = floor(x * 1e6)
    def q(x: Double) = math.floor(x * 1e6).toLong
    val rows = Seq((q(1.0), q(2.0)), (q(3.0), q(4.0)), (q(-1.0), q(0.5)))
    val expect = Seq(
      rows.map(r => r._1 * r._1).sum,
      rows.map(r => r._1 * r._2).sum,
      rows.map(r => r._2 * r._2).sum)
    assert(g == expect)
    // order-independence: shuffled partitioning, same buffer
    val g2 = df.repartition(7, col("id"))
      .agg(graft.functions.GramUpper.gramUpper(col("v")))
      .collect()(0).getSeq[Long](0)
    assert(g2 == expect)
  }

  test("emb_pca: one score per vector, deterministic, variance-maximal") {
    val out = EmbPca.embPca(spark, sfDir)
    val rows = out.collect()
    val corpus = graft.Tables(spark, sfDir, "embeddings").count()
    assert(rows.length == corpus)
    assert(out.columns.toSeq == Seq("vec_id", "pc1"))
    // deterministic end to end (training + projection replayed)
    val again = EmbPca.embPca(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // PC1 maximizes variance over unit directions, so it must beat
    // every coordinate axis (each axis IS a unit direction)
    def varOf(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val pcVar = varOf(rows.map(_.getAs[Double]("pc1")))
    val mat = graft.Tables(spark, sfDir, "embeddings")
      .select((0 until EmbPca.Dim)
        .map(i => col("embedding").getItem(i).cast("double").as(s"d$i")): _*)
      .collect()
      .map(r => (0 until EmbPca.Dim).map(r.getDouble).toArray)
    val axisVars = (0 until EmbPca.Dim).map(i => varOf(mat.map(_(i))))
    // 8 power iterations approximate the eigenvector; allow a hair of
    // convergence slack rather than pinning strict dominance
    assert(pcVar >= axisVars.max * 0.99,
      s"pc1 variance $pcVar below best axis ${axisVars.max}")
  }
}
