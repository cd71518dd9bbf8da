package graft.ann

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqIndexSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("pqidx").toString
    PqIndex.build(spark, sfDir, r)
    r
  }

  test("at rest: codes + cell id only — no embeddings in the index") {
    val idx = spark.read.parquet(PqIndex.vectorsDir(root))
    assert(idx.columns.sorted.toSeq == Seq("cell_id", "codes", "vec_id"))
    // every vector present, m codes each
    val n = graft.Tables(spark, sfDir, "embeddings").count()
    assert(idx.count() == n)
    assert(idx.filter(size(col("codes")) =!= Ann.PqM).count() == 0)
    // both sidecars driver-sized
    assert(spark.read.parquet(PqIndex.centroidsDir(root)).count()
      <= Ann.TrainCap / Ann.IvfSeedMod + 1)
    assert(spark.read.parquet(PqIndex.codebookDir(root)).count()
      <= Ann.PqM.toLong * Ann.PqK)
  }

  test("query prunes the code scan to probed cells via PartitionFilters") {
    val q = PqIndex.query(spark, root, sfDir, Ann.queriesDf(spark, sfDir))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.replaceAll("\n", " ")
      .matches(".*PartitionFilters: \\[[^\\]]*cell_id[^\\]]*\\].*"),
      "probed-cells filter did not land in PartitionFilters")
  }

  test("indexed retrieval equals the non-indexed E11 query exactly") {
    val indexed = PqIndex.annIvfPqIndexed(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val direct = Ann.annIvfPq(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(indexed.length == direct.length && indexed.nonEmpty)
    indexed.zip(direct).foreach { case (a, b) => assert(a == b) }
  }
}
