package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnOpqSpec extends SparkSpec {

  private lazy val c = graft.Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def neighbors(df: DataFrame): Map[Long, Seq[Long]] =
    df.select(col("q_id").cast("long"), col("neighbor_id").cast("long"),
        col("rank"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getLong(1)).toSeq
      }

  test("ann_opq: learned rotation is orthogonal and deterministic") {
    val r1 = AnnOpq.learnedRotation(c)
    val r2 = AnnOpq.learnedRotation(c)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq,
      "rotation must be bit-deterministic")
    // RᵀR ≈ I: per-entry float-syncs bound the drift far below 1e-4
    val d = AnnOpq.Dim
    var maxDev = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0
      var k = 0
      while (k < d) { acc += r1(k)(i) * r1(k)(j); k += 1 }
      maxDev = math.max(maxDev,
        math.abs(acc - (if (i == j) 1.0 else 0.0)))
    }
    info(s"max |RᵀR − I| = $maxDev")
    assert(maxDev < 1e-4, s"rotation not orthogonal: $maxDev")
  }

  test("ann_opq: the Givens chain strictly reduces off-diagonal " +
      "covariance energy (it decorrelates)") {
    val cm = AnnOpq.covariance(c)
    val (_, cmf) = AnnOpq.givensChain(cm)
    def off(m: Array[Array[Double]]): Double =
      (for {
        i <- 0 until AnnOpq.Dim; j <- 0 until AnnOpq.Dim if i != j
      } yield m(i)(j) * m(i)(j)).sum
    val before = off(cm)
    val after = off(cmf)
    info(s"off-diagonal energy: $before -> $after " +
      f"(${after / before * 100}%.1f%% remains)")
    assert(after < before, "rotation failed to decorrelate")
  }

  test("ann_opq: recall@5 vs exact holds the rotation-arm floor and " +
      "the E8 contract shape") {
    val exact = neighbors(Ann.annTopK(spark, sfDir))
    val opq = neighbors(AnnOpq.annOpq(spark, sfDir))
    assert(opq.keySet == exact.keySet)
    opq.foreach { case (q, ns) =>
      assert(ns.size == Ann.K && !ns.contains(q) &&
        ns.distinct.size == ns.size)
    }
    def recallOf(m: Map[Long, Seq[Long]]): Double =
      exact.map { case (q, ns) =>
        m.getOrElse(q, Seq.empty).count(ns.toSet).toDouble / ns.size
      }.sum / exact.size
    val recall = recallOf(opq)
    val pq = recallOf(neighbors(Ann.annPq(spark, sfDir)))
    val bal = recallOf(neighbors(Ann.annPqBalanced(spark, sfDir)))
    info(s"ann_opq recall@5 = $recall, ann_pq = $pq, ann_pq_balanced = $bal")
    // the learned rotation must BEAT the un-rotated PQ baseline (the
    // point of OPQ) and hold an absolute floor; vs the permutation arm
    // the sf sample is 50 neighbor slots, so parity ±1 slot is noise
    assert(recall > pq, s"OPQ ($recall) must beat plain PQ ($pq)")
    assert(recall >= 0.7, s"OPQ recall too low: $recall")
  }

  test("ann_ivfopq: E11's contract shape over the rotated corpus, " +
      "recall comparable to un-rotated IVF-PQ") {
    val exact = neighbors(Ann.annTopK(spark, sfDir))
    val opq = neighbors(AnnOpq.annIvfOpq(spark, sfDir))
    assert(opq.keySet == exact.keySet)
    opq.foreach { case (q, ns) =>
      assert(ns.size == Ann.K && !ns.contains(q) &&
        ns.distinct.size == ns.size)
    }
    def recallOf(m: Map[Long, Seq[Long]]): Double =
      exact.map { case (q, ns) =>
        m.getOrElse(q, Seq.empty).count(ns.toSet).toDouble / ns.size
      }.sum / exact.size
    val r = recallOf(opq)
    val base = recallOf(neighbors(Ann.annIvfPq(spark, sfDir)))
    info(s"ann_ivfopq recall@5 = $r, ann_ivfpq = $base")
    // same probe budget, deeper-structured codes: stay within one
    // 50-slot sample step of the un-rotated composition, floor 0.5
    assert(r >= base - 0.06, s"rotated IVF-PQ fell behind: $r vs $base")
    assert(r >= 0.5, s"IVF-OPQ recall too low: $r")
  }
}
