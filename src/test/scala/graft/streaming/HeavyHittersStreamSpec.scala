package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.functions.MisraGries

class HeavyHittersStreamSpec extends SparkSpec {

  // adversarial stream: vocab ≫ capacity — 4 genuinely heavy items
  // (>n/(cap+1) each) buried in a long tail of near-singletons, with
  // a fixed LCG scrambling arrival order reproducibly
  private val Cap = 8
  private def series(n: Int): Seq[String] = {
    var s = 98765L
    (1 to n).map { i =>
      s = s * 6364136223846793005L + 1442695040888963407L
      val r = (s >>> 33) % 100
      if (r < 60) s"hot${r % 4}" // 4 items at ~15% each
      else s"tail${(s >>> 17) % 5000}" // ~40% spread over 5000 keys
    }
  }

  private def exactCounts(vals: Seq[String]): Map[String, Long] =
    vals.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("candidates are a superset of the θ-heavy items and counts " +
      "underestimate by at most n/(cap+1), under any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vals = series(30000)
    val exact = exactCounts(vals)
    val n = vals.size.toLong
    val bound = n / (Cap + 1)
    for ((batchSize, name) <- Seq(30000 -> "one", 10007 -> "three")) {
      val mem = MemoryStream[TokenObs]
      val q = HeavyHittersStream.heavyHitters(mem.toDS(), Cap)
        .writeStream.format("memory").queryName(s"hh_$name")
        .outputMode("append").start()
      try {
        vals.grouped(batchSize).foreach { b =>
          mem.addData(b.map(TokenObs("k", _)): _*)
          q.processAllAvailable()
        }
        val rows = spark.sql(
          s"SELECT n, candidates FROM hh_$name ORDER BY n").collect()
        assert(rows.length == (vals.size + batchSize - 1) / batchSize)
        val last = rows.last
        assert(last.getLong(0) == n, s"split=$name: fold count")
        val cands = last.getMap[String, Long](1)
        assert(cands.size <= Cap)
        // superset: every item with true frequency > n/(cap+1) survives
        exact.filter(_._2 > bound).foreach { case (k, c) =>
          assert(cands.contains(k),
            s"split=$name: heavy item $k (count $c > bound $bound) lost")
        }
        // counts never overestimate, and underestimate by ≤ bound
        cands.foreach { case (k, est) =>
          val truth = exact.getOrElse(k, 0L)
          assert(est <= truth, s"split=$name: $k overestimated")
          assert(truth - est <= bound,
            s"split=$name: $k off by ${truth - est} > $bound")
        }
      } finally q.stop()
    }
  }

  test("single-sequence stream replays the local fold exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vals = series(5000)
    val local = mutable.HashMap.empty[String, Long]
    vals.foreach(MisraGries.fold(local, _, Cap))
    val mem = MemoryStream[TokenObs]
    val q = HeavyHittersStream.heavyHitters(mem.toDS(), Cap)
      .writeStream.format("memory").queryName("hh_replay")
      .outputMode("append").start()
    try {
      // one batch, one key, one partition of state → the stream folds
      // in arrival order, so the buffer replays the local fold bitwise
      mem.addData(vals.map(TokenObs("k", _)): _*)
      q.processAllAvailable()
      val r = spark.sql("SELECT n, candidates FROM hh_replay")
        .collect().head
      assert(r.getLong(0) == vals.size.toLong)
      assert(r.getMap[String, Long](1).toMap == local.toMap)
    } finally q.stop()
  }

  test("keys keep independent state; empty batches emit nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TokenObs]
    val q = HeavyHittersStream.heavyHitters(mem.toDS(), Cap)
      .writeStream.format("memory").queryName("hh_keys")
      .outputMode("append").start()
    try {
      mem.addData(TokenObs("a", "x"), TokenObs("a", "x"),
        TokenObs("b", "y"))
      q.processAllAvailable()
      mem.addData(TokenObs("b", "z"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, n, candidates FROM hh_keys ORDER BY key, n")
        .collect()
      assert(rows.length == 3) // a@1, b@1, b@2 — no empty-key emission
      val a = rows(0)
      assert(a.getString(0) == "a" && a.getLong(1) == 2L &&
        a.getMap[String, Long](2).toMap == Map("x" -> 2L))
      val b2 = rows(2)
      assert(b2.getString(0) == "b" && b2.getLong(1) == 2L &&
        b2.getMap[String, Long](2).toMap == Map("y" -> 1L, "z" -> 1L))
    } finally q.stop()
  }

  test("stream state wire format round-trips the H9 buffer bytes") {
    val m = mutable.HashMap("alpha" -> 3L, "beta" -> 1L, "γ" -> 7L)
    assert(MisraGries.fromBytes(MisraGries.toBytes(m)) == m)
  }
}
