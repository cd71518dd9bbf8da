package graft.etl

import java.sql.Timestamp

import graft.SparkSpec

class DriftPsiSpec extends SparkSpec {

  private def events(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.map { case (t, sec, v) =>
      (t, new Timestamp(1704067200000L + sec * 1000L), v)
    }.toDF("event_type", "ts", "value")
  }

  test("identical halves score exactly zero and read stable") {
    // same value multiset in each half → every bin has p == q →
    // every contribution is exactly (0.0 * ln 1.0) = 0.0, no rounding
    val vals = Seq(1.0, 7.0, 12.0, 31.0, 48.0, 7.0)
    val rows = vals.map(v => ("click", 0L, v)) ++
      vals.map(v => ("click", 1000L, v))
    val out = Etl.driftPsi(events(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("psi") == 0.0)
    assert(r.getAs[String]("band") == "stable")
    assert(r.getAs[Long]("n_base") == 6 && r.getAs[Long]("n_cur") == 6)
  }

  test("a planted shift scores high and reads shifted; hand PSI matches") {
    // baseline all in bin 0 (value 1), current all in bin 9 (value 60):
    // a total distribution swap — PSI far past the 0.25 edge
    val rows = (1 to 20).map(_ => ("click", 0L, 1.0)) ++
      (1 to 20).map(_ => ("click", 1000L, 60.0))
    val r = Etl.driftPsi(events(rows)).collect().head
    // hand replay of the smoothed formula: bins 0 and 9 carry
    // (21/30, 1/30) vs (1/30, 21/30); the 8 empty bins contribute 0
    val hi = 21.0 / 30.0; val lo = 1.0 / 30.0
    val expected = BigDecimal(2.0 * (hi - lo) * math.log(hi / lo))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("psi") == expected)
    assert(r.getAs[String]("band") == "shifted")
  }

  test("per-type isolation: a drifted type never contaminates a stable one") {
    val stable = Seq.tabulate(12)(i => ("view", (i % 2) * 1000L, 7.0))
    val drift = (1 to 6).map(_ => ("error", 0L, 1.0)) ++
      (1 to 6).map(_ => ("error", 1000L, 49.0))
    val out = Etl.driftPsi(events(stable ++ drift)).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[String]("band"))
      .toMap
    assert(out("view") == "stable")
    assert(out("error") == "shifted")
  }
}
