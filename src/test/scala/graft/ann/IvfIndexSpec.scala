package graft.ann

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("ivfidx").toString
    IvfIndex.build(spark, sfDir, r)
    r
  }

  test("build: one directory per inverted list + driver-sized centroid sidecar") {
    val cells = new java.io.File(IvfIndex.vectorsDir(root))
      .listFiles().filter(_.isDirectory).map(_.getName).toSeq
    assert(cells.nonEmpty && cells.forall(_.startsWith("cell_id=")))
    val nCents = spark.read.parquet(IvfIndex.centroidsDir(root)).count()
    assert(nCents == cells.size.toLong,
      s"sidecar has $nCents centroids for ${cells.size} list directories")
    // bounded by construction: never more lists than cap/seed-mod cells
    assert(nCents <= Ann.TrainCap / Ann.IvfSeedMod + 1)
    // the index stores every corpus vector exactly once
    val n = graft.Tables(spark, sfDir, "embeddings").count()
    assert(spark.read.parquet(IvfIndex.vectorsDir(root)).count() == n)
  }

  test("query scan prunes to the probed cells via PartitionFilters") {
    val q = IvfIndex.query(spark, root, Ann.queriesDf(spark, sfDir))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(plan.replaceAll("\n", " ")
      .matches(".*PartitionFilters: \\[[^\\]]*cell_id[^\\]]*\\].*"),
      "probed-cells filter did not land in PartitionFilters")
  }

  test("indexed retrieval equals the non-indexed E3 query exactly") {
    val indexed = IvfIndex.annIvfIndexed(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val direct = Ann.annIvf(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(indexed.length == direct.length && indexed.length > 0)
    indexed.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("probe IN-list is driver-sized and strictly smaller than the cell set") {
    val cents = spark.read.parquet(IvfIndex.centroidsDir(root))
    val probed = Ann.probeCells(Ann.queriesDf(spark, sfDir), cents)
    val probedCells = probed.select(col("cell_id")).distinct().count()
    val allCells = cents.count()
    assert(probedCells <= allCells)
    // with the floor/ceiling probe rule each query touches 4..8 cells
    val perQuery = probed.groupBy(col("q_id")).count()
      .agg(min(col("count")), max(col("count"))).head()
    assert(perQuery.getLong(0) >= math.min(Ann.IvfProbes, allCells))
    assert(perQuery.getLong(1) <= Ann.IvfMaxProbes)
  }
}
