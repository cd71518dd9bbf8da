package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Planted-data invariants for the as-of join family's newest member
  * and cross-checks against the sf corpus.
  */
class EventOpsSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    // (user, epoch-seconds offset, type, event_id)
    rows.map { case (u, sec, t, id) =>
      (u, new Timestamp(1704067200000L + sec * 1000L), t, id)
    }.toDF("user_id", "ts", "event_type", "event_id")
  }

  test("asof_join_nearest: picks the closer side, breaks exact ties " +
      "backward, and survives missing directions") {
    val rows = Seq[(Long, Long, String, Long)](
      // user 1: click at t=10 and t=30, error at t=18 → prev (Δ=8 < 12)
      (1L, 10L, "click", 100L), (1L, 30L, "click", 101L),
      (1L, 18L, "error", 1L),
      // user 2: clicks equidistant at t=10/t=30 around error t=20 →
      // tie goes to the EARLIER click (backward)
      (2L, 10L, "click", 200L), (2L, 30L, "click", 201L),
      (2L, 20L, "error", 2L),
      // user 3: only a later click → forward match despite no prev
      (3L, 50L, "click", 300L), (3L, 40L, "error", 3L),
      // user 4: no clicks at all → null nearest
      (4L, 5L, "error", 4L))
    val out = EventOps.nearestAsof(ev(rows)).collect()
      .map(r => r.getAs[Long]("error_id") -> r).toMap
    def delta(id: Long) = out(id).getAs[Long]("delta_us")
    assert(delta(1L) == -8000000L, s"user 1 must match backward: ${delta(1L)}")
    assert(delta(2L) == -10000000L, "exact tie must resolve backward")
    assert(delta(3L) == 10000000L, "forward-only user must match forward")
    assert(out(4L).isNullAt(out(4L).fieldIndex("nearest_click_ts")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("delta_us")))
  }

  test("asof_join_nearest: on the sf corpus the nearest delta is never " +
      "beaten by the directed as-of joins") {
    val nearest = EventOps.asofJoinNearest(spark, sfDir).collect()
    assert(nearest.nonEmpty)
    // every non-null |delta| must be minimal: recompute brute force
    // (project to integer micros so the check is type-agnostic)
    import org.apache.spark.sql.functions.{col, unix_micros}
    val evs = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
    val clicksByUser = evs.filter(_.getString(2) == "click")
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(1)) }
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    nearest.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val errTs = micros(r.getAs[Timestamp]("error_ts"))
      clicksByUser.get(u) match {
        case None => assert(r.isNullAt(3))
        case Some(cs) =>
          val best = cs.map(c => math.abs(c - errTs)).min
          val got = math.abs(r.getAs[Long]("delta_us"))
          assert(got == best, s"error ${r.getAs[Long]("error_id")}: " +
            s"|delta| $got us, brute-force best $best us")
      }
    }
  }
}
