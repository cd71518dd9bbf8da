package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KnnGraphSpec extends SparkSpec {

  test("emb_knn_graph: planted clusters — mutual edges stay inside " +
      "clusters, never across orthogonal ones") {
    import spark.implicits._
    // two exactly-orthogonal clusters of 3: within-cluster cosine ≈ 1,
    // cross-cluster = 0 — but k=5 > cluster size, so cross arms exist;
    // mutuality keeps them too (ranks are symmetric here), and the
    // within-cluster edges must all rank strictly ahead of cross ones
    val vecs = (0 until 3).map(i =>
      (i.toLong, Array(1.0f, 0.001f * i, 0f))) ++
      (3 until 6).map(i => (i.toLong, Array(0f, 0f, 1.0f + 0.001f * i)))
    val out = KnnGraph.mutualKnn(vecs.toDF("vec_id", "embedding"))
      .collect()
    val within = out.filter(r => (r.getAs[Long]("u") < 3) ==
      (r.getAs[Long]("v") < 3))
    val cross = out.filterNot(r => (r.getAs[Long]("u") < 3) ==
      (r.getAs[Long]("v") < 3))
    assert(within.length == 6) // C(3,2) per cluster
    assert(within.forall(_.getAs[Double]("cos") > 0.99))
    assert(cross.forall(_.getAs[Double]("cos") < 0.01))
    // within-cluster arms rank 1–2, cross arms rank 3+
    assert(within.forall(r => r.getAs[Int]("rank_uv") <= 2 &&
      r.getAs[Int]("rank_vu") <= 2))
    assert(cross.forall(r => r.getAs[Int]("rank_uv") >= 3))
  }

  test("emb_knn_graph: brute-force parity on the sf corpus — the " +
      "mutual edge set matches a local recompute exactly") {
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      // mirror VecOps.cosineF exactly (sqrt·sqrt, not sqrt(prod))
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else d / den
    }
    val topk = vecs.map { case (u, eu) =>
      u -> vecs.filter(_._1 != u)
        .map { case (v, ev) => (v, cos(eu, ev)) }
        .sortBy { case (v, c) =>
          (-BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP), v)
        }
        .take(KnnGraph.KnnK).zipWithIndex
        .map { case ((v, c), i) => v -> (i + 1) }.toMap
    }.toMap
    val expect = (for {
      (u, nb) <- topk.toSeq; (v, ru) <- nb
      rv <- topk(v).get(u) if u < v
    } yield (u, v, ru, rv)).toSet
    val got = KnnGraph.embKnnGraph(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Int]("rank_uv"), r.getAs[Int]("rank_vu"))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("emb_knn_graph_ivf: degenerate single-cell corpus collapses to " +
      "the exact arm (cell restriction removes nothing)") {
    import spark.implicits._
    // ids 0..5 → seeds = {0} → one cell → candidates are all-pairs,
    // so the IVF graph must equal the exact graph edge-for-edge
    val vecs = (0 until 3).map(i =>
      (i.toLong, Array(1.0f, 0.001f * i, 0f))) ++
      (3 until 6).map(i => (i.toLong, Array(0f, 0f, 1.0f + 0.001f * i)))
    val df = vecs.toDF("vec_id", "embedding")
    val exact = KnnGraph.mutualKnn(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    val ivf = KnnGraph.mutualKnnIvf(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(ivf == exact && ivf.nonEmpty)
  }

  test("emb_knn_graph_ivf: recall vs the exact graph on the sf corpus") {
    def edges(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    val exact = edges("emb_knn_graph")
    val ivf = edges("emb_knn_graph_ivf")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(exact.nonEmpty && ivf.nonEmpty)
    assert(recall >= 0.7, s"IVF kNN-graph recall $recall < 0.7 " +
      s"(exact=${exact.size}, ivf=${ivf.size})")
  }

  test("emb_knn_graph_ivf: scoring plan is cell-restricted — nothing " +
      "corpus-derived is nested-loop-broadcast, no cartesian product") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = KnnGraph.ivfScored(spark,
      graft.Tables(spark, sfDir, "embeddings")).queryExecution.sparkPlan
    val bnljs = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    // the centroid crossJoins ARE BNLJ — but their broadcast side must
    // be the driver-local trained centroid set, never a corpus scan
    assert(bnljs.nonEmpty)
    bnljs.foreach { j =>
      val build = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      val leaves = build.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(_.isInstanceOf[LocalTableScanExec]),
        s"corpus-sized broadcast side in BNLJ:\n$build")
    }
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("emb_knn_graph size gate: the key runs the exact arm at test " +
      "SF; exactMax=0 forces the IVF arm, byte-equal to mutualKnnIvf") {
    def edges(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    val df = graft.Tables(spark, sfDir, "embeddings")
    val exact = edges(KnnGraph.mutualKnn(df))
    val gatedDefault = edges(KnnGraph.mutualKnnGated(spark, df))
    assert(exact.nonEmpty && gatedDefault == exact,
      "below the bound the gated key must BE the exact arm")
    val forced = edges(KnnGraph.mutualKnnGated(spark, df, exactMax = 0L))
    val ivf = edges(KnnGraph.mutualKnnIvf(spark, df))
    assert(forced.nonEmpty && forced == ivf,
      "above the bound the gated key must BE the IVF arm")
  }
}
