package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventsAttributionSpec extends SparkSpec {

  test("events_attribution: conversions conserved, horizon respected, brute-force parity") {
    val rows = EventOps.eventsAttribution(spark, sfDir).collect()
    val nPurchases = graft.Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    // every purchase lands in exactly one attribution bucket
    assert(rows.map(_.getAs[Long]("n_conv")).sum == nPurchases)
    val types = rows.map(_.getAs[String]("touch_type")).toSet
    assert(types.subsetOf(Set("click", "view", "none")))

    // brute-force replay on the collected event log
    val ev = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val byUser = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.sortBy(x => (x._2, x._3))
    }
    val expect = scala.collection.mutable.Map[String, (Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L))
    byUser.values.foreach { xs =>
      var lt: Option[(Long, String)] = None
      xs.foreach { case (_, us, _, tpe, vc) =>
        if (tpe == "purchase") {
          val att = lt match {
            case Some((tus, ttype))
                if us - tus <= EventOps.AttributionHorizonUs => (ttype, us - tus)
            case _ => ("none", 0L)
          }
          val (n, v, d) = expect(att._1)
          expect(att._1) = (n + 1, v + vc, d + att._2)
        }
        if (tpe == "click" || tpe == "view") lt = Some((us, tpe))
      }
    }
    rows.foreach { r =>
      val k = r.getAs[String]("touch_type")
      assert((r.getAs[Long]("n_conv"), r.getAs[Long]("value_cents"),
        r.getAs[Long]("sum_delay_us")) == expect(k), s"bucket $k disagrees")
    }
    assert(rows.length == expect.size)
  }

  private def decayEvents(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
  }

  private val T = 1704067200000000L // 2024-01-01T00:00:00Z in µs
  private val Day = 86400000000L

  test("events_attribution_decay: planted purchases get exact dyadic " +
      "half-life credits; horizon edges and no-touch fall-through hold") {
    // user 1: touches at 0.5 d (w=1) and 1.5 d (w=1/2) before a $10.00
    // purchase; a click 8 d back is out of horizon. sw = 3/2.
    val u1 = Seq(
      (10L, T - Day * 8, 1L, "click", 0.0),
      (11L, T - Day / 2, 1L, "click", 0.0),
      (12L, T - Day * 3 / 2, 1L, "view", 0.0),
      (13L, T, 1L, "purchase", 10.0))
    // user 2: no touches at all → full credit to 'none'
    val u2 = Seq((20L, T, 2L, "purchase", 3.0))
    // user 3: touch at exactly the 7-day horizon (included, w=1/128)
    // and at exactly 1 µs before (w=1); same-µs touch excluded
    val u3 = Seq(
      (30L, T - Day * 7, 3L, "view", 0.0),
      (31L, T - 1L, 3L, "click", 0.0),
      (32L, T, 3L, "view", 0.0), // same µs as the purchase: excluded
      (33L, T, 3L, "purchase", 2.56))
    val out = EventOps.attributionDecay(decayEvents(u1 ++ u2 ++ u3))
      .collect().map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_credits"), r.getAs[Long]("n_purchases"),
          r.getAs[Long]("credit_milli_cents"))).toMap
    // u1: click 1000 c · 1000 · (1 / 1.5) → 666667; view → 333333
    // u3: click 256000 · (128/129) → 254016; view 256000 · (1/129) → 1984
    assert(out("click") == (2L, 2L, 666667L + 254016L))
    assert(out("view") == (2L, 2L, 333333L + 1984L))
    assert(out("none") == (1L, 1L, 300000L))
    // conservation: every purchase's credits sum to v_cents·1000
    // within ±1 mc per credit (u1 splits 1 000 000 into 666667+333333)
    val total = out.values.map(_._3).sum
    assert(math.abs(total - (1000L + 300L + 256L) * 1000L) <= 1)
  }

  test("events_attribution_decay: deterministic on the sf tables and " +
      "credit mass is conserved within rounding") {
    val a = EventOps.eventsAttributionDecay(spark, sfDir).collect()
    val b = EventOps.eventsAttributionDecay(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val totalMc = a.map(_.getAs[Long]("credit_milli_cents")).sum
    val nCredits = a.map(_.getAs[Long]("n_credits")).sum
    val purseMc = graft.Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(round(value * 100) as bigint)")))
      .collect()(0).getLong(0) * 1000L
    // each credit rounds to the nearest mc → total drift < 1 mc/credit
    assert(math.abs(totalMc - purseMc) <= nCredits)
  }
}
