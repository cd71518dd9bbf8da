package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DriftStreamSpec extends SparkSpec {

  private def day(i: Int) = f"2024-01-$i%02d"

  // 7 warmup days of a uniform-ish histogram, then one identical day
  // (stable), one concentrated day (shifted), one mildly tilted day
  private val base = Vector(5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L)
  private val tilt = Vector(12L, 8L, 6L, 5L, 5L, 4L, 4L, 3L, 2L, 1L)
  private val peak = Vector(50L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
  private val days: Seq[BinnedDay] =
    (1 to 7).map(i => BinnedDay("t", day(i), base)) ++ Seq(
      BinnedDay("t", day(8), base),
      BinnedDay("t", day(9), peak),
      BinnedDay("t", day(10), tilt))

  /** Sequential local replay of the warmup-freeze + per-day PSI. */
  private def replay(ds: Seq[BinnedDay]): Seq[DriftPoint] = {
    val (warm, rest) = ds.sortBy(_.day).splitAt(DriftStream.Warmup)
    val ref = warm.map(_.bins).transpose.map(_.sum)
    rest.map { d =>
      val p = DriftStream.psiOf(ref, d.bins)
      DriftPoint(d.key, d.day, d.bins.sum, p, DriftStream.bandOf(p))
    }
  }

  private def run(batches: Seq[Seq[BinnedDay]]): Seq[DriftPoint] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BinnedDay]
    val name = s"drift${batches.map(_.size).mkString("_")}"
    val q = DriftStream.psi(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.sql(s"SELECT * FROM $name").as[DriftPoint]
        .collect().toSeq.sortBy(_.day)
    } finally q.stop()
  }

  test("stream == sequential replay; the identical day is stable, the " +
      "concentrated day alarms shifted, the tilt lands between") {
    val want = replay(days)
    assert(want.map(_.band) == Seq("stable", "shifted", "moderate"),
      s"planted bands, got ${want.map(_.band)}")
    assert(want.head.psi < 0.001, "day 8 repeats the reference exactly")
    val got = run(Seq(days))
    assert(got == want, s"stream must equal the local replay\n$got\n$want")
  }

  test("micro-batch split and a replayed late day do not change the " +
      "output") {
    val want = replay(days)
    val perDay = run(days.map(Seq(_)))
    assert(perDay == want, "one-day batches must match")
    // replay day 9 after day 10 — dropped under the monotonic contract
    val withLate = run(Seq(days, Seq(BinnedDay("t", day(9), base))))
    assert(withLate == want, "a replayed day must be dropped")
  }
}
