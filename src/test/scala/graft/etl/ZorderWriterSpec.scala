package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VecOps

class ZorderWriterSpec extends SparkSpec {

  test("zValue interleaves bits (reference check) and clamps range") {
    def slowZ(a: Long, b: Long): Long = {
      var z = 0L
      (0 until 32).foreach { i =>
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val a = rnd.nextLong() & 0xFFFFFFFFL
      val b = rnd.nextLong() & 0xFFFFFFFFL
      assert(VecOps.zValue(a, b) == slowZ(a, b))
    }
    assert(VecOps.zValue(0, 0) == 0L)
    assert(VecOps.zValue(-5, 1) == VecOps.zValue(0, 1)) // clamped below
    assert(VecOps.zValue(1L << 40, 0) == VecOps.zValue(0xFFFFFFFFL, 0))
  }

  test("z-ordered files bound BOTH dimensions (single sort bounds one)") {
    import spark.implicits._
    val n = 128
    // n×n grid, row-major — deliberately adversarial for a plain sort
    val grid = (0 until n * n).map(i => (i / n, i % n, i.toLong))
      .toDF("x", "y", "payload")
    val files = 16

    def avgExtents(dir: String): (Double, Double) = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .collect()
      (spans.map(_.getAs[Int]("sx").toDouble).sum / spans.length / (n - 1),
        spans.map(_.getAs[Int]("sy").toDouble).sum / spans.length / (n - 1))
    }

    val zdir = Files.createTempDirectory("zorder").toString
    val written = ZorderWriter.write(grid, zdir, "x", "y", files)
    assert(written == files)
    val (zx, zy) = avgExtents(zdir)
    info(f"z-order avg extent: x=$zx%.3f y=$zy%.3f of global")
    // 16 files over a 2-d z-curve → each file ≈ a quadrant strip:
    // both dims well under the full range
    assert(zx <= 0.5, f"x extent too wide under z-order: $zx%.3f")
    assert(zy <= 0.5, f"y extent too wide under z-order: $zy%.3f")

    // contrast: range-partition by x alone — x clusters tightly but
    // every file spans (almost) all of y
    val sdir = Files.createTempDirectory("sorted").toString
    grid.repartitionByRange(files, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(sdir)
    val (_, sy) = avgExtents(sdir)
    info(f"x-sorted avg y extent: $sy%.3f of global")
    assert(sy >= 0.9, "control layout unexpectedly bounded y")
    assert(zy < sy / 2, "z-order should at least halve the y extent")
  }
}
