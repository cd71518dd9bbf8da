package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndexErasureSpec extends SparkSpec {

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-erase-$tag").toString

  private def listFiles(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    if (!root.exists) Map.empty
    else walk(root).map(f => f.getPath -> f.length).toMap
  }

  test("report conserves counts and replays the seeded cohort; " +
      "erasure removes exactly the victims from the inverted lists") {
    val root = scratch("sf")
    val report = {
      IvfIndex.build(spark, sfDir, root)
      IndexErasure.eraseFromIndex(spark, root,
        IndexErasure.victimsOf(graft.Tables(spark, sfDir, "embeddings")))
    }.collect()
    val all = graft.Tables(spark, sfDir, "embeddings")
    val nAll = all.count()
    val nVictims = IndexErasure.victimsOf(all).count()
    assert(nVictims > 0, "the 10% cohort must be non-empty at sf0.001")
    assert(report.map(_.getAs[Long]("n_before")).sum == nAll)
    assert(report.map(_.getAs[Long]("n_erased")).sum == nVictims)
    report.foreach { r =>
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_erased"))
      val bp = r.getAs[Long]("erased_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Int]("rewrite_advised") ==
        (if (bp >= IndexErasure.RecompactBp) 1 else 0))
    }
    // the files now hold exactly the survivors
    val left = spark.read.parquet(IvfIndex.vectorsDir(root))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val victims = IndexErasure.victimsOf(all)
      .collect().map(_.getLong(0)).toSet
    assert(left.intersect(victims).isEmpty, "victims must be gone")
    assert(left.size.toLong == nAll - nVictims, "survivors must remain")
  }

  test("post-erasure retrieval never returns a victim and is bit-equal " +
      "to a rebuild from the surviving corpus under the SAME sidecar " +
      "(erasure must not retrain)") {
    val rootA = scratch("a"); val rootB = scratch("b")
    val all = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    IvfIndex.build(spark, sfDir, rootA)
    val victims = IndexErasure.victimsOf(all).localCheckpoint()
    IndexErasure.eraseFromIndex(spark, rootA, victims)
    // rebuild from survivors against rootA's FROZEN centroid sidecar
    val cents = spark.read.parquet(IvfIndex.centroidsDir(rootA))
    IvfIndex.writeIndex(spark,
      all.join(victims, Seq("vec_id"), "left_anti"), cents, rootB)
    val q = Ann.queriesDf(spark, sfDir)
    val a = IvfIndex.query(spark, rootA, q).collect()
    val b = IvfIndex.query(spark, rootB, q).collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq,
      "erased index must retrieve exactly like the survivor rebuild")
    val victimSet = victims.collect().map(_.getLong(0)).toSet
    assert(!a.exists(r => victimSet(r.getAs[Long]("neighbor_id"))),
      "no erased vector may surface in results")
  }

  test("full index lifecycle: build -> append -> erase a cohort " +
      "spanning base AND appended files -> compact; the erased set " +
      "stays erased and retrieval equals the survivor rebuild") {
    import spark.implicits._
    val rootA = scratch("life"); val rootB = scratch("life-ref")
    val all = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // build on one slice, append the rest (E30's daily-append shape)
    val base = all.filter(col("vec_id") % 3 =!= 0)
    val delta = all.filter(col("vec_id") % 3 === 0)
    IvfIndex.writeIndex(spark, base,
      Ann.refinedCentroids(spark, all), rootA)
    IvfIndex.appendToIndex(spark, rootA, delta)
    // cohort spans both the base files and the append files
    val victims = IndexErasure.victimsOf(all).localCheckpoint()
    val vict = victims.collect().map(_.getLong(0)).toSet
    assert(vict.exists(_ % 3 == 0) && vict.exists(_ % 3 != 0),
      "cohort must span base and appended vectors for this to bite")
    IndexErasure.eraseFromIndex(spark, rootA, victims)
    IvfIndex.maintain(spark, rootA) // compaction must not resurrect
    val left = spark.read.parquet(IvfIndex.vectorsDir(rootA))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(left.intersect(vict).isEmpty,
      "compaction after erasure must not resurrect victims")
    assert(left.size.toLong == all.count() - vict.size)
    // retrieval still equals a survivor rebuild under the SAME sidecar
    val cents = spark.read.parquet(IvfIndex.centroidsDir(rootA))
    IvfIndex.writeIndex(spark,
      all.join(victims, Seq("vec_id"), "left_anti"), cents, rootB)
    val q = Ann.queriesDf(spark, sfDir)
    assert(IvfIndex.query(spark, rootA, q).collect().toSeq ==
      IvfIndex.query(spark, rootB, q).collect().toSeq)
  }

  test("untouched inverted lists keep their exact bytes; a fully-" +
      "erased cell's directory is dropped") {
    import spark.implicits._
    val root = scratch("cells")
    // two orthogonal clusters under explicit one-hot centroids: cell
    // 1 holds victims only, cell 2 is never touched
    def v(axis: Int, eps: Float): Array[Float] = {
      val a = new Array[Float](64); a(axis) = 1f; a(axis + 1) = eps; a
    }
    val c = Seq.tabulate(8)(i =>
      (i.toLong, v(if (i < 4) 0 else 8, 0.01f * (i % 4))))
      .toDF("vec_id", "embedding")
    val cents = Seq((1L, v(0, 0f)), (2L, v(8, 0f)))
      .toDF("cell_id", "c_emb")
    IvfIndex.writeIndex(spark, c, cents, root)
    val before = listFiles(s"${IvfIndex.vectorsDir(root)}/cell_id=2")
    assert(before.nonEmpty)
    val report = IndexErasure.eraseFromIndex(spark, root,
      Seq(0L, 1L, 2L, 3L).toDF("vec_id")).collect()
      .map(r => r.getAs[Long]("cell_id") -> r).toMap
    assert(report(1L).getAs[Long]("n_after") == 0)
    assert(report(1L).getAs[Int]("rewrite_advised") == 1)
    assert(report(2L).getAs[Long]("n_erased") == 0)
    assert(!new java.io.File(
      s"${IvfIndex.vectorsDir(root)}/cell_id=1").exists,
      "fully-erased inverted list must drop its directory")
    assert(listFiles(s"${IvfIndex.vectorsDir(root)}/cell_id=2") == before,
      "untouched inverted list must keep its exact files")
    val left = spark.read.parquet(IvfIndex.vectorsDir(root))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(left == Set(4L, 5L, 6L, 7L))
  }
}
