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

  test("events_sequence_match: skip-till-next anchoring, error gating, " +
      "window bound, and instance counting on planted sequences") {
    val H = 72L * 3600L // the match window in seconds
    val rows = Seq[(Long, Long, String, Long)](
      // user 1: two views before the click → anchor is the LATEST view
      (1L, 10L, "view", 10L), (1L, 20L, "view", 11L),
      (1L, 30L, "click", 12L), (1L, 40L, "purchase", 13L),
      // user 2: error BEFORE the anchor view is outside the span → match
      (2L, 5L, "error", 20L), (2L, 10L, "view", 21L),
      (2L, 20L, "click", 22L), (2L, 30L, "purchase", 23L),
      // user 3: error between view and click poisons the span
      (3L, 10L, "view", 30L), (3L, 15L, "error", 31L),
      (3L, 20L, "click", 32L), (3L, 30L, "purchase", 33L),
      // user 4: error between click and purchase poisons the span
      (4L, 10L, "view", 40L), (4L, 20L, "click", 41L),
      (4L, 25L, "error", 42L), (4L, 30L, "purchase", 43L),
      // user 5: purchase one second past the 72 h window → no match
      (5L, 0L, "view", 50L), (5L, 10L, "click", 51L),
      (5L, H + 1L, "purchase", 52L),
      // user 6: click with no prior view never forms a pair
      (6L, 10L, "click", 60L), (6L, 20L, "purchase", 61L),
      // user 7: a later view+click re-anchor the pair (rightmost chain)
      (7L, 10L, "view", 70L), (7L, 20L, "click", 71L),
      (7L, 30L, "view", 72L), (7L, 40L, "click", 73L),
      (7L, 50L, "purchase", 74L),
      // user 8: two matching purchases → first reported, both counted
      (8L, 10L, "view", 80L), (8L, 20L, "click", 81L),
      (8L, 30L, "purchase", 82L), (8L, 40L, "purchase", 83L))
    val out = EventOps.sequenceMatch(ev(rows)).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 7L, 8L),
      s"matched users: ${out.keySet.toSeq.sorted}")
    def secs(u: Long, c: String): Long =
      (out(u).getAs[Timestamp](c).getTime - 1704067200000L) / 1000L
    assert(secs(1L, "view_ts") == 20L, "anchor must be the latest view")
    assert(secs(1L, "click_ts") == 30L)
    assert(out(1L).getAs[Long]("span_sec") == 20L)
    assert(out(2L).getAs[Long]("span_sec") == 20L,
      "error before the anchor view must not gate the match")
    assert(secs(7L, "view_ts") == 30L && secs(7L, "click_ts") == 40L,
      "a later view+click pair must re-anchor")
    assert(secs(8L, "purchase_ts") == 30L, "first instance reported")
    assert(out(8L).getAs[Long]("n_matches") == 2L, "both instances counted")
    assert(out.values.forall(_.getAs[Long]("n_matches") >= 1L))
  }

  test("events_sequence_match: the one-pass window plan agrees with a " +
      "sequential CEP replay over the sf corpus") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val evs = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).flatMap { case (u, rs) =>
      var lv, pv, pc, le = Option.empty[Long]
      val found = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      rs.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, t) =>
        t match {
          case "view" => lv = Some(us)
          case "error" => le = Some(us)
          case "click" => if (lv.isDefined) { pv = lv; pc = Some(us) }
          case "purchase" =>
            if (pc.isDefined && us - pv.get <= EventOps.SeqMatchWindowUs &&
                le.forall(_ < pv.get))
              found += ((pv.get, pc.get, us))
          case _ => ()
        }
      }
      if (found.isEmpty) None
      else Some(u -> (found.minBy(_._3), found.size.toLong))
    }
    val got = EventOps.eventsSequenceMatch(spark, sfDir).collect()
    assert(got.length == expected.size,
      s"matched users: spark ${got.length}, replay ${expected.size}")
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val ((v, c, p), n) = expected(u)
      assert(micros(r.getAs[Timestamp]("view_ts")) == v, s"user $u view")
      assert(micros(r.getAs[Timestamp]("click_ts")) == c, s"user $u click")
      assert(micros(r.getAs[Timestamp]("purchase_ts")) == p, s"user $u purchase")
      assert(r.getAs[Long]("span_sec") == (p - v) / 1000000L, s"user $u span")
      assert(r.getAs[Long]("n_matches") == n, s"user $u count")
    }
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
