package graft.ann

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.{BinnedDay, DriftStream}

/** E32 → G16 composition (SURVEY §9b): the embedding drift monitor's
  * per-cell occupancy counts, bucketed into days and replayed through
  * the STREAMING drift detector — proving the embedding-space monitor
  * composes with the live PSI pipeline end-to-end: E32's quantizer
  * frame supplies the histogram (cells as bins), G16 supplies the
  * frozen-reference warmup, the Laplace-smoothed PSI, and the banding.
  * No new query key — both components are already oracled/spec'd on
  * their own; this pins the seam.
  */
class EmbDriftStreamComposeSpec extends SparkSpec {

  private val Days = 12 // > DriftStream.Warmup, so post-warmup days emit

  /** Per-day cell-occupancy histograms off E32's machinery: the
    * reference slice trains the quantizer (frozen centroids), every
    * vector assigns to it, synthetic days split the corpus by vec_id
    * range, and each day's counts land in the cell's rank slot of a
    * fixed [[DriftStream.Bins]]-wide vector.
    */
  private def dailyBins(): Seq[BinnedDay] = {
    val all = Ann.corpus(spark, sfDir)
    val ref = all.filter(col("vec_id") % EmbDrift.DriftMod =!= 0)
    val cents = Ann.refinedCentroids(spark, ref)
    val cellRank = cents.collect().map(_.getLong(0)).sorted
      .zipWithIndex.toMap
    assert(cellRank.size <= DriftStream.Bins,
      "quantizer cells must fit the detector's fixed bin grid " +
        s"(${cellRank.size} cells vs ${DriftStream.Bins} bins)")
    val n = all.count()
    val chunk = (n + Days - 1) / Days
    val counts = Ann.assignCells(all, cents)
      .withColumn("day", (col("vec_id") / chunk).cast("int"))
      .groupBy(col("day"), col("cell_id"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[Int]("day"), r.getAs[Long]("cell_id"),
        r.getAs[Long]("c")))
    (0 until Days).map { d =>
      val bins = Array.fill(DriftStream.Bins)(0L)
      counts.filter(_._1 == d).foreach { case (_, cell, c) =>
        bins(cellRank(cell)) = c
      }
      BinnedDay("emb", f"2026-01-${d + 1}%02d", bins.toSeq)
    }
  }

  private def runStream(batches: Seq[Seq[BinnedDay]], name: String)
      : Seq[(String, Long, Double, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BinnedDay]
    val q = DriftStream.psi(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.sql(s"SELECT * FROM $name ORDER BY day").collect()
        .map(r => (r.getAs[String]("day"), r.getAs[Long]("n"),
          r.getAs[Double]("psi"), r.getAs[String]("band"))).toSeq
    } finally q.stop()
  }

  test("E32 cell occupancy replayed through DriftStream: post-warmup " +
      "days emit PSI equal to a local psiOf replay, identically under " +
      "any micro-batch split") {
    val days = dailyBins()
    // local sequential reference off the shared exact kernel
    val refHist = days.take(DriftStream.Warmup)
      .map(_.bins).transpose.map(_.sum)
    val want = days.drop(DriftStream.Warmup).map { d =>
      val p = DriftStream.psiOf(refHist, d.bins)
      (d.day, d.bins.sum, p, DriftStream.bandOf(p))
    }
    assert(want.nonEmpty)
    val one = runStream(Seq(days), "edrift_one")
    val three = runStream(days.grouped(5).map(_.toSeq).toSeq, "edrift_three")
    assert(one == want, "stream must equal the local E32-fed replay")
    assert(three == want, "micro-batching must not change the verdicts")
    // PSI well-defined on every emitted day ((p−q) and ln(p/q) share
    // a sign, so contributions are non-negative); band names valid
    assert(want.forall(d => d._3 >= 0.0 && !d._3.isNaN))
    assert(want.map(_._4).toSet
      .subsetOf(Set("stable", "moderate", "shifted")))
  }

  test("a planted occupancy shift (all intake mass in one cell) " +
      "drives the composed monitor to 'shifted'") {
    val days = dailyBins()
    val skew = Array.fill(DriftStream.Bins)(0L)
    skew(0) = days.head.bins.sum
    val shifted = days.take(Days - 1) :+
      BinnedDay("emb", "2026-01-31", skew.toSeq)
    val out = runStream(Seq(shifted), "edrift_skew")
    assert(out.nonEmpty && out.last._1 == "2026-01-31")
    assert(out.last._4 == "shifted",
      s"planted one-cell collapse must band as shifted, got ${out.last}")
  }
}
