package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.functions.QuantileSketch

class QuantileStreamSpec extends SparkSpec {

  /** Rank of `v` in the exact sorted data, as a fraction of n. */
  private def rankError(sorted: Array[Double], v: Double, q: Double): Double =
    math.abs(sorted.count(_ <= v).toDouble / sorted.length - q)

  // deterministic value stream: a fixed LCG permutes 1..n so arrival
  // order is scrambled but reproducible
  private def series(n: Int): Seq[Double] = {
    var s = 12345L
    (1 to n).map { i =>
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % n + 1).toDouble
    }
  }

  test("counts conserve and the rank-error bound holds under any " +
      "batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vals = series(20000)
    val sorted = vals.toArray.sorted
    for ((batchSize, name) <- Seq(20000 -> "one", 1111 -> "many")) {
      val mem = MemoryStream[ValueObs]
      val q = QuantileStream.quantiles(mem.toDS())
        .writeStream.format("memory").queryName(s"qs_$name")
        .outputMode("append").start()
      try {
        vals.grouped(batchSize).foreach { b =>
          mem.addData(b.map(v => ValueObs("lat", v)): _*)
          q.processAllAvailable()
        }
        val rows = spark.sql(
          s"SELECT n, p50, p95, p99 FROM qs_$name ORDER BY n").collect()
        // the LAST update carries the full fold
        val last = rows.last
        assert(last.getLong(0) == 20000L,
          s"split=$name: count ${last.getLong(0)} != 20000")
        for ((v, p) <- Seq(last.getDouble(1) -> 0.5,
            last.getDouble(2) -> 0.95, last.getDouble(3) -> 0.99)) {
          val err = rankError(sorted, v, p)
          assert(err <= 0.02, f"split=$name p=$p: rank error $err%.4f")
        }
        // one update per non-empty batch
        assert(rows.length == (vals.size + batchSize - 1) / batchSize)
      } finally q.stop()
    }
  }

  test("single-sequence stream replays the local fold exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vals = series(5000)
    // local sequential fold through the SAME sketch code
    val local = new QuantileSketch.Levels
    vals.foreach(local.insert(_, QuantileStream.Capacity))
    val mem = MemoryStream[ValueObs]
    val q = QuantileStream.quantiles(mem.toDS())
      .writeStream.format("memory").queryName("qs_replay")
      .outputMode("append").start()
    try {
      // one batch, one key, one partition worth of state -> the fold
      // order is the arrival order, so the sketch replays bitwise
      mem.addData(vals.map(v => ValueObs("k", v)): _*)
      q.processAllAvailable()
      val r = spark.sql(
        "SELECT n, p50, p95, p99 FROM qs_replay").collect().head
      assert(r.getLong(0) == local.totalWeight)
      assert(r.getDouble(1) == local.quantile(0.5))
      assert(r.getDouble(2) == local.quantile(0.95))
      assert(r.getDouble(3) == local.quantile(0.99))
    } finally q.stop()
  }

  test("keys keep independent state; empty batches emit nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ValueObs]
    val q = QuantileStream.quantiles(mem.toDS())
      .writeStream.format("memory").queryName("qs_keys")
      .outputMode("append").start()
    try {
      mem.addData(ValueObs("a", 1.0), ValueObs("a", 2.0),
        ValueObs("b", 100.0))
      q.processAllAvailable()
      mem.addData(ValueObs("b", 200.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT key, n, p50 FROM qs_keys")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      // a emits once (n=2); b emits twice (n=1 then n=2); a's state
      // is untouched by b's second batch. The sketch's quantile rule
      // returns the first value whose cumulative weight EXCEEDS
      // ⌊q·total⌋, so p50 of {1,2} is 2 and of {100,200} is 200.
      assert(rows.toSet ==
        Set(("a", 2L, 2.0), ("b", 1L, 100.0), ("b", 2L, 200.0)))
    } finally q.stop()
  }
}
