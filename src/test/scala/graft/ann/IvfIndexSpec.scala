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
    val n = graft.Tables(spark, sfDir, "embeddings").count()
    // bounded by construction: never more lists than cap/seed-mod cells
    assert(nCents <= Ann.trainCapFor(n) / Ann.IvfSeedMod + 1)
    // the index stores every corpus vector exactly once
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

  test("append + maintain ≡ full rebuild under the same stored sidecar, " +
      "bit-equal query results") {
    val c = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = c.filter(col("vec_id") % 3 =!= 0)
    val d1 = c.filter(col("vec_id") % 3 === 0 && col("vec_id") % 2 === 0)
    val d2 = c.filter(col("vec_id") % 3 === 0 && col("vec_id") % 2 =!= 0)
    // build on the base slice, then append two daily batches
    val rootA = Files.createTempDirectory("ivfappend").toString
    IvfIndex.writeIndex(spark, base,
      Ann.refinedCentroids(spark, base), rootA)
    val rep = IvfIndex.appendToIndex(spark, rootA, d1).collect()
    assert(rep.map(_.getAs[Long]("n_appended")).sum == d1.count())
    IvfIndex.appendToIndex(spark, rootA, d2)
    // reference: one fresh write of ALL vectors against the SAME
    // stored sidecar (the artifact freeze is what makes this exact)
    val rootB = Files.createTempDirectory("ivfrebuild").toString
    IvfIndex.writeIndex(spark, c,
      spark.read.parquet(IvfIndex.centroidsDir(rootA)), rootB)
    val qs = Ann.queriesDf(spark, sfDir)
    def res(r: String) = IvfIndex.query(spark, r, qs)
      .collect().map(_.toSeq).sortBy(_.toString)
    val appended = res(rootA)
    assert(appended.length > 0)
    assert(appended.toSeq == res(rootB).toSeq,
      "appended index must answer bit-identically to the rebuild")
    // maintenance folds the per-append files back; results unchanged
    val before = res(rootA)
    val m = IvfIndex.maintain(spark, rootA)
    assert(m.partitionsCompacted > 0,
      "two appends must leave at least one cell worth compacting")
    assert(m.filesAfter < m.filesBefore)
    assert(res(rootA).toSeq == before.toSeq,
      "compaction must not change query results")
  }
}
