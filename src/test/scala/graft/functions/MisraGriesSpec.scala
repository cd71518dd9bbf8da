package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextOps

class MisraGriesSpec extends SparkSpec {

  test("sketch candidates are a superset of true heavies on skewed data") {
    import spark.implicits._
    val k = 64
    // 10 heavy tokens × 500 occurrences over a 20k-singleton long tail:
    // vocabulary (20010) ≫ capacity (64), the regime the sketch is for
    val heavy = (0 until 10).flatMap(h => Seq.fill(500)(s"h$h"))
    val tail = (0 until 20000).map(i => s"t$i")
    val df = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(heavy ++ tail), 8)
      .toDF("tok")
    val sketch = df
      .agg(MisraGries.misraGries(col("tok"), k).as("s"))
      .head().getMap[String, Long](0)
    assert(sketch.size <= k, s"sketch exceeded capacity: ${sketch.size}")
    (0 until 10).foreach { h =>
      assert(sketch.contains(s"h$h"), s"heavy token h$h missing from sketch")
    }
    // counts are underestimates, never overestimates
    sketch.filterKeys(_.startsWith("h")).foreach { case (_, c) =>
      assert(c <= 500L)
    }
  }

  test("heavy_hitters two-pass result is exactly the brute-force answer") {
    val hh = TextOps.heavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val brute = graft.Tables(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over())
      .filter(col("n") * TextOps.HeavyDenom >= col("total"))
      .select(col("tok"), col("n"))
      .orderBy(col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hh == brute)
    assert(hh.nonEmpty)
  }

  test("merge keeps the superset guarantee across partition layouts") {
    import spark.implicits._
    val heavy = (0 until 5).flatMap(h => Seq.fill(300)(s"H$h"))
    val tail = (0 until 5000).map(i => s"x$i")
    val data = scala.util.Random.shuffle(heavy ++ tail)
    Seq(1, 3, 16).foreach { parts =>
      val sketch = spark.sparkContext.parallelize(data, parts).toDF("tok")
        .agg(MisraGries.misraGries(col("tok"), 32).as("s"))
        .head().getMap[String, Long](0)
      (0 until 5).foreach { h =>
        assert(sketch.contains(s"H$h"),
          s"heavy H$h missing with $parts partitions")
      }
    }
  }
}
