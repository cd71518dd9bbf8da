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
      <= Ann.trainCapFor(n) / Ann.IvfSeedMod + 1)
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

  test("append against stored sidecars encodes identically to a fresh " +
      "write: bit-equal queries, compaction-safe") {
    val c = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = c.filter(col("vec_id") % 4 =!= 1)
    val delta = c.filter(col("vec_id") % 4 === 1)
    // full build trains sidecars on the base slice only
    val rootA = Files.createTempDirectory("pqappend").toString
    val sample = Ann.trainSample(spark, base)
    val refined = Ann.refineLocal(spark, sample)
    // train both quantizers on the base slice (build's own recipe)
    val cbS = {
      val asgS = Ann.assignCells(sample, refined)
        .join(org.apache.spark.sql.functions.broadcast(refined),
          Seq("cell_id"))
        .withColumn("res",
          expr("zip_with(embedding, c_emb, (a, b) -> a - b)"))
        .select(col("vec_id"), col("res").as("embedding"))
      Ann.pqTrainLocal(spark, asgS)
    }
    refined.coalesce(1).write.mode("overwrite")
      .parquet(PqIndex.centroidsDir(rootA))
    cbS.coalesce(1).write.mode("overwrite")
      .parquet(PqIndex.codebookDir(rootA))
    PqIndex.encodeFrame(base, refined, cbS)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(PqIndex.vectorsDir(rootA))
    val rep = PqIndex.appendToIndex(spark, rootA, delta).collect()
    assert(rep.map(_.getAs[Long]("n_appended")).sum == delta.count())
    // reference: fresh write of ALL vectors against the SAME sidecars
    val rootB = Files.createTempDirectory("pqrebuild").toString
    spark.read.parquet(PqIndex.centroidsDir(rootA)).coalesce(1)
      .write.mode("overwrite").parquet(PqIndex.centroidsDir(rootB))
    spark.read.parquet(PqIndex.codebookDir(rootA)).coalesce(1)
      .write.mode("overwrite").parquet(PqIndex.codebookDir(rootB))
    PqIndex.encodeFrame(c,
      spark.read.parquet(PqIndex.centroidsDir(rootA)),
      spark.read.parquet(PqIndex.codebookDir(rootA)))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(PqIndex.vectorsDir(rootB))
    val qs = Ann.queriesDf(spark, sfDir)
    def res(r: String) = PqIndex.query(spark, r, sfDir, qs)
      .collect().map(_.toSeq).sortBy(_.toString)
    val appended = res(rootA)
    assert(appended.length > 0)
    assert(appended.toSeq == res(rootB).toSeq,
      "appended codes must answer bit-identically to the rebuild")
    val before = res(rootA)
    val m = PqIndex.maintain(spark, rootA)
    assert(m.filesAfter <= m.filesBefore)
    assert(res(rootA).toSeq == before.toSeq)
  }
}
