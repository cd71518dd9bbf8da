package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSpec extends SparkSpec {

  test("hybrid_rrf: scores decreasing, ranks in arm bounds, " +
    "fusion arithmetic checks out") {
    val rows = Hybrid.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("rrf"))
    scores.zip(scores.tail).foreach { case (a, b) => assert(a >= b) }
    rows.foreach { r =>
      val lex = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
      val sem = Option(r.getAs[Integer]("sem_rank")).map(_.toInt)
      assert(lex.isDefined || sem.isDefined)
      (lex ++ sem).foreach(k => assert(k >= 1 && k <= Hybrid.ArmN))
      val expected = lex.map(k => 1.0 / (Hybrid.RrfK + k)).getOrElse(0.0) +
        sem.map(k => 1.0 / (Hybrid.RrfK + k)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-6)
    }
  }

  test("hybrid_rrf: a doc ranked by both arms beats one ranked by one " +
    "at similar depth") {
    val rows = Hybrid.hybridRrf(spark, sfDir).collect()
    val both = rows.filter(r => r.get(1) != null && r.get(2) != null)
    if (both.nonEmpty) {
      // any both-arm doc scores at least 1/(k+N) + 1/(k+N)
      val floor = 2.0 / (Hybrid.RrfK + Hybrid.ArmN)
      both.foreach(r =>
        assert(r.getAs[Double]("rrf") >= floor - 1e-9))
    }
  }
}
