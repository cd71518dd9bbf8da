package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactorSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).map(_.toSeq).getOrElse(Seq())
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("unpartitioned: many small files collapse to one, rows and content conserved") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    val df = (1L to 5000L).map(i => (i, s"row$i")).toDF("id", "v")
    df.repartition(40).write.parquet(dir)
    assert(parquetFiles(dir).size == 40)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq

    val r = Compactor.compact(spark, dir)
    assert(r.filesBefore == 40L && r.rows == 5000L)
    // KBs of data, 128 MB target -> exactly one output file
    assert(parquetFiles(dir).size == 1 && r.filesAfter == 1L)
    val after = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(after == before)
    // no staging leftovers
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.startsWith("_compact")))
  }

  test("partitioned: only unhealthy partitions rewrite; healthy files untouched") {
    import spark.implicits._
    val root = Files.createTempDirectory("compactp").resolve("t").toString
    // partition a: fragmented (20 files); partition b: already one file
    (1L to 2000L).map(i => ("a", i)).toDF("part", "id")
      .repartition(20).write.partitionBy("part").parquet(root)
    (1L to 100L).map(i => ("b", i)).toDF("part", "id")
      .coalesce(1).write.mode("append").partitionBy("part").parquet(root)
    val bFiles = parquetFiles(s"$root/part=b")
      .map(f => (f.getName, f.lastModified, f.length))
    assert(parquetFiles(s"$root/part=a").size == 20 && bFiles.size == 1)
    val before = spark.read.parquet(root)
      .orderBy("part", "id").collect().toSeq

    val r = Compactor.compact(spark, root, partitionCol = Some("part"))
    assert(r.partitionsSeen == 2 && r.partitionsCompacted == 1)
    assert(parquetFiles(s"$root/part=a").size == 1)
    // the healthy partition's file is byte-identical, not rewritten
    assert(parquetFiles(s"$root/part=b")
      .map(f => (f.getName, f.lastModified, f.length)) == bFiles)
    // partition column survives the per-leaf rewrite (it lives in the
    // directory name, which the swap preserves)
    val after = spark.read.parquet(root)
      .orderBy("part", "id").collect().toSeq
    assert(after == before)
    assert(r.rows == 2100L)
  }
}
