package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetentionPlanSpec extends SparkSpec {

  test("etl_retention_plan: planted ages — per-TTL row and user " +
      "impact are hand-exact, totals conserve across the grid") {
    import spark.implicits._
    // "now" = the span max (2024-04-10); planted ages in days:
    // u1 at 0 and 100, u2 at 10, u3 at 40 → 4 rows total
    val rows = Seq(
      (1L, "2024-04-10 12:00:00"), (1L, "2024-01-01 12:00:00"),
      (2L, "2024-03-31 12:00:00"), (3L, "2024-03-01 12:00:00"))
    val df = rows.toDF("user_id", "t")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")
    val out = Etl.retentionPlan(df).collect()
      .map(r => r.getAs[Int]("ttl_days") -> r).toMap
    assert(out.keySet == Etl.RetentionDays.toSet)
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_total") == 4)
      assert(r.getAs[Long]("n_rows_kept") ==
        4 - r.getAs[Long]("n_rows_deleted"))
      assert(r.getAs[Long]("deleted_bp") ==
        r.getAs[Long]("n_rows_deleted") * 10000 / 4)
    }
    // ttl 7: ages {100, 10, 40} delete → 3 rows, users {1, 2, 3}
    assert(out(7).getAs[Long]("n_rows_deleted") == 3)
    assert(out(7).getAs[Long]("n_users_affected") == 3)
    // ttl 30: {100, 40} → 2 rows, users {1, 3}
    assert(out(30).getAs[Long]("n_rows_deleted") == 2)
    assert(out(30).getAs[Long]("n_users_affected") == 2)
    // ttl 60 and 90: only the age-100 row, user 1
    assert(out(60).getAs[Long]("n_rows_deleted") == 1)
    assert(out(60).getAs[Long]("n_users_affected") == 1)
    assert(out(90).getAs[Long]("n_rows_deleted") == 1)
    assert(out(90).getAs[Long]("n_users_affected") == 1)
    // deletion volume is monotone non-increasing in the window
    val dels = Etl.RetentionDays
      .map(t => out(t).getAs[Long]("n_rows_deleted"))
    assert(dels == dels.sorted.reverse)
  }
}
