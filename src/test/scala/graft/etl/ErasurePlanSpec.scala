package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ErasurePlanSpec extends SparkSpec {

  /** The same md5-u16 draw the kernel applies, computed locally. */
  private def u16(userId: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
  }

  test("etl_erasure_plan: planted log — the per-partition plan matches " +
      "a local replay of the seeded cohort exactly") {
    import spark.implicits._
    // 40 users × 2 days, two rows each on day 1 — enough users that
    // the ≈1.6% cohort is (deterministically) non-empty or empty;
    // either way the local replay must agree row for row
    val rows =
      (1L to 40L).flatMap { u =>
        Seq((u, "2024-01-01"), (u, "2024-01-01"), (u, "2024-01-02"))
      } ++ Seq((777216L, "2024-01-02"), (777216L, "2024-01-02"))
    val df = rows.toDF("user_id", "d")
      .withColumn("ts", col("d").cast("timestamp")).drop("d")
    val got = Etl.erasurePlan(df).collect().map(r =>
      r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("part_rows"), r.getAs[Long]("del_rows"),
          r.getAs[Long]("del_users"),
          Option(r.get(r.fieldIndex("amp_bp"))).map(_.asInstanceOf[Long])))
      .toMap
    val local = rows.groupBy(_._2).map { case (day, rs) =>
      val del = rs.filter(r => u16(r._1) < Etl.ErasureThresh)
      val amp = if (del.nonEmpty)
        Some(rs.size.toLong * 10000 / del.size) else None
      day -> (rs.size.toLong, del.size.toLong,
        del.map(_._1).distinct.size.toLong, amp)
    }
    assert(got == local)
    // the audit covers every partition, deletions or not
    assert(got.keySet == Set("2024-01-01", "2024-01-02"))
  }

  test("etl_erasure_plan: sf invariants — deletions bounded by rows, " +
      "amplification ≥ 1× where present, cohort rate near the knob") {
    val rows = Etl.etlErasurePlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var totRows = 0L; var totDel = 0L
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("part_rows"), r.getAs[Long]("del_rows"))
      assert(d >= 0 && d <= n)
      val amp = Option(r.get(r.fieldIndex("amp_bp")))
      assert(amp.isDefined == (d > 0))
      amp.foreach(a => assert(a.asInstanceOf[Long] >= 10000L))
      totRows += n; totDel += d
    }
    // the seeded cohort is ≈ ErasureThresh/65536 of traffic; allow 3×
    val rate = totDel.toDouble / totRows
    val target = Etl.ErasureThresh.toDouble / 65536
    assert(rate < 3 * target, s"cohort rate $rate vs target $target")
  }
}
