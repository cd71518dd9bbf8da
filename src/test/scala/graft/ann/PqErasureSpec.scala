package graft.ann

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E33-for-PQ ([[PqIndex.eraseFromIndex]], r15): right-to-erasure
  * surgery on the compressed index. Pins the same contract family as
  * IndexErasureSpec — report conservation, erase ≡
  * rebuild-from-survivors under FROZEN sidecars (centroids AND
  * codebook), untouched partitions byte-stable, full lifecycle with
  * appends and compaction — plus the PQ-specific claim that survivors
  * keep their exact CODES (no re-encoding during erasure).
  */
class PqErasureSpec extends SparkSpec {

  private def scratch(tag: String): String =
    Files.createTempDirectory(s"graft-pq-erase-$tag").toString

  private def listFiles(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    if (!root.exists) Map.empty
    else walk(root).map(f => f.getPath -> f.length).toMap
  }

  test("report conserves counts and replays the seeded cohort; " +
      "victims leave the codes table, survivors keep exact codes") {
    val root = scratch("sf")
    PqIndex.build(spark, sfDir, root)
    val beforeRows = spark.read.parquet(PqIndex.vectorsDir(root))
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val all = graft.Tables(spark, sfDir, "embeddings")
    val report = PqIndex.eraseFromIndex(spark, root,
      IndexErasure.victimsOf(all)).collect()
    val nAll = all.count()
    val victims = IndexErasure.victimsOf(all)
      .collect().map(_.getLong(0)).toSet
    assert(victims.nonEmpty, "the 10% cohort must be non-empty")
    assert(report.map(_.getAs[Long]("n_before")).sum == nAll)
    assert(report.map(_.getAs[Long]("n_erased")).sum == victims.size)
    report.foreach { r =>
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_erased"))
      val bp = r.getAs[Long]("erased_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Int]("rewrite_advised") ==
        (if (bp >= IndexErasure.RecompactBp) 1 else 0))
    }
    val after = spark.read.parquet(PqIndex.vectorsDir(root))
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(after.keySet.intersect(victims).isEmpty, "victims must be gone")
    assert(after.keySet.size.toLong == nAll - victims.size)
    // surgery must not re-encode: every survivor keeps its exact codes
    after.foreach { case (id, codes) => assert(codes == beforeRows(id)) }
  }

  test("post-erasure retrieval never returns a victim and is bit-equal " +
      "to a rebuild from the surviving corpus under the SAME frozen " +
      "sidecars (erasure must not retrain either quantizer)") {
    val rootA = scratch("a"); val rootB = scratch("b")
    val all = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    PqIndex.build(spark, sfDir, rootA)
    val victims = IndexErasure.victimsOf(all).localCheckpoint()
    PqIndex.eraseFromIndex(spark, rootA, victims)
    // rebuild from survivors against rootA's FROZEN sidecars
    val cents = spark.read.parquet(PqIndex.centroidsDir(rootA))
    val cb = spark.read.parquet(PqIndex.codebookDir(rootA))
    cents.coalesce(1).write.parquet(PqIndex.centroidsDir(rootB))
    cb.coalesce(1).write.parquet(PqIndex.codebookDir(rootB))
    PqIndex.encodeFrame(
        all.join(victims, Seq("vec_id"), "left_anti"), cents, cb)
      .write.partitionBy("cell_id").parquet(PqIndex.vectorsDir(rootB))
    val q = Ann.queriesDf(spark, sfDir)
    val a = PqIndex.query(spark, rootA, sfDir, q).collect()
    val b = PqIndex.query(spark, rootB, sfDir, q).collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq,
      "erased index must retrieve exactly like the survivor rebuild")
    val victimSet = victims.collect().map(_.getLong(0)).toSet
    assert(!a.exists(r => victimSet(r.getAs[Long]("neighbor_id"))),
      "no erased vector may surface in results")
  }

  test("full lifecycle: build -> append -> erase a cohort spanning " +
      "base AND appended files -> compact; erased stays erased") {
    val rootA = scratch("life")
    val all = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(col("vec_id") % 3 =!= 0)
    val delta = all.filter(col("vec_id") % 3 === 0)
    // sidecars train on the full corpus (the append-equivalence spec's
    // recipe); base writes, delta appends against the stored artifacts
    PqIndex.build(spark, sfDir, rootA)
    val fs = new org.apache.hadoop.fs.Path(PqIndex.vectorsDir(rootA))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(PqIndex.vectorsDir(rootA)), true)
    val cents = spark.read.parquet(PqIndex.centroidsDir(rootA))
    val cb = spark.read.parquet(PqIndex.codebookDir(rootA))
    PqIndex.encodeFrame(base, cents, cb)
      .write.partitionBy("cell_id").parquet(PqIndex.vectorsDir(rootA))
    PqIndex.appendToIndex(spark, rootA, delta)
    val victims = IndexErasure.victimsOf(all).localCheckpoint()
    val vict = victims.collect().map(_.getLong(0)).toSet
    assert(vict.exists(_ % 3 == 0) && vict.exists(_ % 3 != 0),
      "cohort must span base and appended vectors for this to bite")
    PqIndex.eraseFromIndex(spark, rootA, victims)
    PqIndex.maintain(spark, rootA) // compaction must not resurrect
    val left = spark.read.parquet(PqIndex.vectorsDir(rootA))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(left.intersect(vict).isEmpty,
      "compaction after erasure must not resurrect victims")
    assert(left.size.toLong == all.count() - vict.size)
  }

  test("untouched code lists keep their exact bytes; a fully-erased " +
      "cell's directory is dropped; duplicate victim ids don't " +
      "inflate the report") {
    import spark.implicits._
    val root = scratch("cells")
    // at-rest layout written directly: erasure operates on the codes
    // table alone, so the sidecars are irrelevant to this contract
    Seq(
      (1L, 10L, Seq(1, 2)), (1L, 11L, Seq(3, 4)),
      (2L, 20L, Seq(5, 6)), (2L, 21L, Seq(7, 8)))
      .toDF("cell_id", "vec_id", "codes")
      .write.partitionBy("cell_id").parquet(PqIndex.vectorsDir(root))
    val before = listFiles(s"${PqIndex.vectorsDir(root)}/cell_id=2")
    assert(before.nonEmpty)
    val report = PqIndex.eraseFromIndex(spark, root,
      Seq(10L, 11L, 10L, 11L).toDF("vec_id")).collect()
      .map(r => r.getAs[Long]("cell_id") -> r).toMap
    assert(report(1L).getAs[Long]("n_before") == 2,
      "duplicated victim ids must not multiply report rows")
    assert(report(1L).getAs[Long]("n_erased") == 2)
    assert(report(1L).getAs[Long]("n_after") == 0)
    assert(report(1L).getAs[Int]("rewrite_advised") == 1)
    assert(report(2L).getAs[Long]("n_erased") == 0)
    assert(!new java.io.File(
      s"${PqIndex.vectorsDir(root)}/cell_id=1").exists,
      "fully-erased code list must drop its directory")
    assert(listFiles(s"${PqIndex.vectorsDir(root)}/cell_id=2") == before,
      "untouched code list must keep its exact files")
    val left = spark.read.parquet(PqIndex.vectorsDir(root))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(left == Set(20L, 21L))
  }
}
