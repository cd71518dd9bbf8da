package graft.etl

import java.nio.file.Files

import graft.SparkSpec

class TableStatsSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-tablestats").resolve("t").toString

  test("fragmented table: counts conserve, compaction recommended") {
    import spark.implicits._
    val out = tmp()
    (1L to 10000L).map(i => (i, s"row_$i")).toDF("id", "v")
      .repartition(8).write.parquet(out)
    val r = TableStats.report(spark, out)
    assert(r.nFiles == 8)
    assert(r.totalRows == 10000)
    assert(r.minFileBytes > 0 && r.maxFileBytes >= r.minFileBytes)
    assert(r.minFileRows > 0, "every file's rows must be attributed")
    // 8 files of a few KB each: all small → compact
    assert(r.smallFiles == 8 && r.smallFileRatio == 1.0)
    assert(r.recommendCompact)
  }

  test("many-file layout: O(1) rollup + bounded offender list") {
    import spark.implicits._
    val out = tmp()
    // force a 64-file layout; one fat partition to make a skew offender
    (1L to 20000L).map(i => (if (i % 4 == 0) 0L else i, s"v$i"))
      .toDF("k", "v")
      .repartition(64, org.apache.spark.sql.functions.col("k"))
      .write.parquet(out)
    val r = TableStats.report(spark, out)
    assert(r.nFiles >= 32, s"expected a many-file layout, got ${r.nFiles}")
    assert(r.totalRows == 20000)
    assert(r.maxFileRows >= 5000, "the hashed-together keys form a fat file")
    // the offender list is the ONLY per-file surface, and it is bounded
    val off = TableStats.skewOffenders(spark, out, 5).collect()
    assert(off.length == 5)
    assert(off.head.getAs[Long]("rows") == r.maxFileRows)
    assert(off.map(_.getAs[Long]("rows")).toSeq.sorted.reverse ==
      off.map(_.getAs[Long]("rows")).toSeq)
  }

  test("compacted single file: no recommendation, skew = 1") {
    import spark.implicits._
    val out = tmp()
    (1L to 1000L).map(i => (i, i * 2)).toDF("id", "v")
      .repartition(1).write.parquet(out)
    val r = TableStats.report(spark, out)
    assert(r.nFiles == 1)
    assert(r.totalRows == 1000)
    assert(!r.recommendCompact, "a single file is never compacted further")
    assert(math.abs(r.sizeSkew - 1.0) < 1e-9)
    val df = TableStats.reportDf(spark, out).collect()(0)
    assert(df.getAs[Long]("n_files") == 1)
    assert(!df.getAs[Boolean]("recommend_compact"))
  }
}
