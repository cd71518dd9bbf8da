package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BackfillSpec extends SparkSpec {

  test("dynamic overwrite replaces only the touched partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("backfill").toString
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0))
    val day2 = Seq((3L, "2024-01-02", 30.0))
    PartitionedWriter.write(
      (day1 ++ day2).toDF("id", "day", "v"), dir, "day")

    // backfill day2 with corrected values; day1 must be untouched
    Backfill.overwriteSlice(
      Seq((3L, "2024-01-02", 99.0), (4L, "2024-01-02", 40.0))
        .toDF("id", "day", "v"),
      dir, "day")

    val back = spark.read.parquet(dir)
      .select(col("id"), col("day").cast("string"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(back == Set(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 99.0), (4L, "2024-01-02", 40.0)))
  }

  test("backfill is idempotent: re-running produces the same table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("backfill-idem").toString
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "k", "v")
    PartitionedWriter.write(base, dir, "k")
    val slice = Seq((2L, "b", 5.0)).toDF("id", "k", "v")
    Backfill.overwriteSlice(slice, dir, "k")
    val once = spark.read.parquet(dir).collect().map(_.toString).sorted
    Backfill.overwriteSlice(slice, dir, "k")
    val twice = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(once.toSeq == twice.toSeq)
  }
}
