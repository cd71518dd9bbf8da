package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{BenchMetrics, SparkSpec, Tables}

class PartitionedWriterSpec extends SparkSpec {

  test("partitioned layout prunes scans via directory-level filters") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val dir = Files.createTempDirectory("partitioned").toString
    val parts = PartitionedWriter.write(docs, dir, "lang")
    assert(parts.nonEmpty && parts.forall(_.startsWith("lang=")))

    // correctness: filtered read returns exactly the en rows
    val enExpected = docs.filter(col("lang") === "en").count()
    val back = spark.read.parquet(dir)
    assert(back.filter(col("lang") === "en").count() == enExpected)
    assert(back.count() == docs.count())

    // the lang predicate must resolve at the partition tier, not as a
    // data filter the scan evaluates per row
    val plan = back.filter(col("lang") === "en")
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(plan.replaceAll("\\s+", " ")
      .matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      "lang filter did not land in PartitionFilters")

    // and it must actually read fewer bytes than a full scan
    val m = BenchMetrics.install(spark.sparkContext)
    val s0 = m.snapshot(spark.sparkContext)
    spark.read.parquet(dir).count()
    val s1 = m.snapshot(spark.sparkContext)
    spark.read.parquet(dir).filter(col("lang") === "en").count()
    val s2 = m.snapshot(spark.sparkContext)
    val full = (s1 - s0).input
    val pruned = (s2 - s1).input
    info(s"full scan $full B, pruned scan $pruned B")
    assert(pruned < full, s"pruned scan ($pruned) not below full ($full)")
  }
}
