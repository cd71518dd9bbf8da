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
}
