package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {

  private val Qs = Seq(0.5, 0.9, 0.99)

  /** Rank of `v` in the exact sorted data, as a fraction of n. */
  private def rankError(exactSorted: Array[Double], v: Double, q: Double): Double = {
    val n = exactSorted.length
    val below = exactSorted.count(_ <= v)
    math.abs(below.toDouble / n - q)
  }

  test("rank error <= 2% at k=200 on lineitem prices, any partitioning") {
    val prices = graft.Tables(spark, sfDir, "lineitem")
      .select(col("l_extendedprice").cast("double").as("p"))
    val exact = prices.collect().map(_.getDouble(0)).sorted

    for (parts <- Seq(1, 7, 32)) {
      val row = prices.repartition(parts)
        .agg(QuantileSketch.quantileSketch(col("p"), Qs).as("qv"))
        .collect().head
      val got = row.getSeq[Double](0)
      assert(got.size == Qs.size)
      Qs.zip(got).foreach { case (q, v) =>
        val err = rankError(exact, v, q)
        assert(err <= 0.02,
          f"parts=$parts q=$q: rank error $err%.4f > 2%% (got $v%.2f)")
      }
    }
  }

  test("sketch state stays bounded: levels x capacity, not n") {
    val l = new QuantileSketch.Levels
    (1 to 100000).foreach(i => l.insert(i.toDouble, 200))
    val stored = l.levels.map(_.size).sum
    // O(k log(n/k)) stored values for 100k inserts
    assert(stored <= 200 * l.levels.size)
    assert(l.levels.size <= 16, s"too many levels: ${l.levels.size}")
    assert(l.totalWeight == 100000L)
    // and the quantiles of 1..100k are still within bound
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val v = l.quantile(q)
      assert(math.abs(v / 100000.0 - q) <= 0.02, s"q=$q got $v")
    }
  }

  test("merge conserves weight and keeps the bound") {
    val a = new QuantileSketch.Levels
    val b = new QuantileSketch.Levels
    (1 to 50000).foreach(i => a.insert(i.toDouble, 200))
    (50001 to 100000).foreach(i => b.insert(i.toDouble, 200))
    a.absorb(b, 200)
    assert(a.totalWeight == 100000L)
    Seq(0.25, 0.5, 0.75).foreach { q =>
      val v = a.quantile(q)
      assert(math.abs(v / 100000.0 - q) <= 0.02, s"merged q=$q got $v")
    }
  }

  test("serialization round-trip preserves levels and weight exactly") {
    val l = new QuantileSketch.Levels
    (1 to 12345).foreach(i => l.insert(i.toDouble, 200))
    val rt = QuantileSketch.fromBytes(QuantileSketch.toBytes(l))
    assert(rt.levels.map(_.toSeq).toSeq == l.levels.map(_.toSeq).toSeq)
    assert(rt.totalWeight == l.totalWeight,
      s"round-trip weight ${rt.totalWeight} != ${l.totalWeight}")
    val e = QuantileSketch.fromBytes(
      QuantileSketch.toBytes(new QuantileSketch.Levels))
    assert(e.totalWeight == 0L)
  }

  test("nulls are skipped; empty input yields NaN") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("v")
    val got = df.agg(QuantileSketch
        .quantileSketch(col("v"), Seq(0.5)).as("q"))
      .collect().head.getSeq[Double](0)
    assert(got.head == 3.0 || got.head == 1.0) // median of {1,3}, rank rule
    val empty = spark.emptyDataset[Double].toDF("v")
      .agg(QuantileSketch.quantileSketch(col("v"), Seq(0.5)))
      .collect().head.getSeq[Double](0)
    assert(empty.head.isNaN)
  }
}
