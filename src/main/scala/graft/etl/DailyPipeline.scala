package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's COMPLETE daily job (`aiesec.py` end-to-end),
  * composed from graft components — the "switch your pipeline to this
  * library" proof:
  *
  *   1. ingest scraped HTML cards (`graft-cards` DSv2 source
  *      ≈ aiesec.py:38-66)
  *   2. extract + normalize typed fields, including the reference's
  *      `"."` → `"N/A"` duration rule and applicant-count parsing
  *      (≈ aiesec.py:70-125,139)
  *   3. rotate the keyed snapshot (SnapshotStore ≈ Today/Yesterday
  *      xlsx, aiesec.py:20-21,131)
  *   4. snapshot delta by key — LEFT ANTI (≈ aiesec.py:142-144),
  *      plus the operational monitors the reference lacks: a
  *      freshness gate on the diff baseline (3b), a volume band vs
  *      yesterday (4b), and an online-CUSUM level-shift detector
  *      over the full run history (4c)
  *   5. styled Today report + New report, premium rows highlighted
  *      (XlsxSink ≈ aiesec.py:147-186)
  *   6. conditional alert payload, only when the delta is non-empty
  *      (≈ aiesec.py:241-251)
  *
  * Scheduling stays external (Airflow/cron call `run` per day — same
  * contract as the reference); everything inside is distributed.
  */
object DailyPipeline {

  case class Result(
      nToday: Long,
      nNew: Long,
      alert: Option[String],
      todayReport: String,
      newReport: Option[String],
      volumeAlarm: Option[String] = None,
      freshnessAlarm: Option[String] = None,
      shiftAlarm: Option[String] = None)

  val VolumeRatio = 2L // alarm outside [prev/2, prev*2] — B31's band
  val FreshSlaDays = 1L // baseline older than this → stale-diff alarm

  /** Extract + normalize card records (step 2). Expects the card
    * field layout the reference scrapes: id, country, premium,
    * applicants, duration, organization.
    */
  def normalize(cards: DataFrame): DataFrame =
    cards.select(
      element_at(col("fields"), "id").cast("string").as("id"),
      trim(col("title")).as("title"),
      upper(trim(element_at(col("fields"), "country"))).as("country"),
      (lower(coalesce(element_at(col("fields"), "premium"), lit("no")))
        === "yes").as("premium"),
      coalesce(nullif(regexp_extract(
        element_at(col("fields"), "applicants"), "([0-9]+)", 1), lit(""))
        .cast("int"), lit(0)).as("applicants"),
      // the reference's "." → "N/A" null-token rule (aiesec.py:105)
      when(trim(element_at(col("fields"), "duration")) === "." ||
          element_at(col("fields"), "duration").isNull, "N/A")
        .otherwise(trim(element_at(col("fields"), "duration")))
        .as("duration"),
      coalesce(element_at(col("fields"), "organization"), lit(""))
        .as("organization"))
      .filter(col("id").isNotNull)

  /** @param xlsxSnapshots rotate snapshots as .xlsx files (the
    *        reference's exact medium — lets a migrating user keep
    *        their existing Today/Yesterday.xlsx cycle) instead of
    *        parquet (the scale default).
    * @param alertSink where the conditional alert is DELIVERED
    *        (≈ aiesec.py:236-249's SMTP send): the HTML-card digest of
    *        the new rows goes here when the delta is non-empty.
    *        Defaults to no delivery — the payload is still returned.
    * @param fetcher optional LIVE page fetch (≈ aiesec.py:38-63's
    *        consent + load-more browser loop): when set, the pipeline
    *        drives the page to its full card list first, materializes
    *        the final DOM under the store (`_fetched/<version>.html` —
    *        an auditable, re-parseable record of exactly what was
    *        scraped), and ingests THAT instead of `cardsPath`.
    */
  def run(spark: SparkSession, cardsPath: String, storeRoot: String,
      version: String, reportDir: String,
      xlsxSnapshots: Boolean = false,
      alertSink: AlertSink = AlertSink.Noop,
      fetcher: Option[graft.sources.FetchSource.PageDriver] = None): Result = {
    // 0 (optional): live fetch → materialized page; 1-2: ingest +
    // normalize through the same graft-cards scan either way
    val inputPath = fetcher match {
      case Some(d) => graft.sources.FetchSource
        .fetchToFile(d, s"$storeRoot/_fetched/$version.html").toString
      case None => cardsPath
    }
    val today = normalize(
      spark.read.format("graft-cards").load(inputPath))

    // 3: rotate the keyed snapshot (keeps this + previous)
    val store =
      if (xlsxSnapshots) new XlsxSnapshotStore(spark, storeRoot, "id")
      else new SnapshotStore(spark, storeRoot, "id")

    // 3b: freshness gate BEFORE the diff (A34's concern, the daily-job
    // form): the delta's baseline is whatever snapshot rotation keeps,
    // so a missed day makes "New" over-report (diffing against a
    // 2-day-old Yesterday) and a replayed/out-of-order version would
    // diff against the FUTURE. Gated on date-parseable versions only —
    // ad-hoc version ids (specs use "v1") opt out.
    val freshnessAlarm = store.versions.lastOption.flatMap { prev =>
      (parseDay(prev), parseDay(version)) match {
        case (Some(p), Some(v)) =>
          val gap = java.time.temporal.ChronoUnit.DAYS.between(p, v)
          if (gap <= 0)
            Some(s"FRESHNESS: run $version is not newer than stored $prev")
          else if (gap > FreshSlaDays)
            Some(s"FRESHNESS: baseline $prev is $gap days behind " +
              s"$version; New report diffs against a stale snapshot")
          else None
        case _ => None
      }
    }
    freshnessAlarm.foreach(a => alertSink.send(a, s"<p>$a</p>"))

    store.rotate(today, version)

    // 4: delta — new ids vs the previous snapshot
    val newRows = store.newRows

    // 4b: volume sanity against yesterday (the B31/G9 band, batch
    // form): a scrape that silently collapses or floods is the daily
    // job's worst failure mode — the reference would happily report
    // "0 new" forever on an empty page. Alarm is DELIVERED like the
    // delta alert, and always returned for the caller's runbook.
    val nToday = today.count()
    val volumeAlarm = store.previous.map(_.count()).filter(_ > 0)
      .flatMap { nPrev =>
        if (nToday > VolumeRatio * nPrev || VolumeRatio * nToday < nPrev)
          Some(s"VOLUME: $version has $nToday rows vs previous $nPrev")
        else None
      }
    volumeAlarm.foreach(a => alertSink.send(a, s"<p>$a</p>"))

    // 4c: level-shift monitor on the FULL run history. The band above
    // is memoryless (today vs yesterday only); a slow drift — the
    // scrape source quietly paginating less every week — stays inside
    // the 2× band forever. The run log keeps one (day, n) row per run
    // (O(days) data; a production deployment compacts the daily
    // appends), and the G12 online-CUSUM kernel replays it: warmup
    // freezes the reference level, today's point alarms on an
    // accumulated shift. Same kernel, same spec-pinned fold.
    val shiftAlarm = {
      import spark.implicits._
      Seq((version, nToday)).toDF("day", "n").coalesce(1)
        .write.mode("append").parquet(s"$storeRoot/_runlog")
      val log = spark.read.parquet(s"$storeRoot/_runlog")
        .select(lit("daily_rows").as("key"), col("day"), col("n"))
        .as[graft.streaming.KeyedCount]
      graft.streaming.ChangepointStream.cusum(log)
        .filter(_.day == version).collect().headOption
        .filter(_.alarm > 0)
        .map(p => s"SHIFT: $version volume $nToday drifted from the " +
          s"warmup level (CUSUM S+=${p.sPos} S-=${p.sNeg})")
    }
    shiftAlarm.foreach(a => alertSink.send(a, s"<p>$a</p>"))

    // 5: styled reports (premium highlight ≈ PREMIUM == "Yes")
    new java.io.File(reportDir).mkdirs()
    val todayPath = s"$reportDir/Today.xlsx"
    val latest = store.latest.get.orderBy(col("id"))
    val premIdx = latest.columns.indexOf("premium")
    val isPremium = (r: org.apache.spark.sql.Row) => r.getBoolean(premIdx)
    XlsxSink.write(latest, todayPath, isPremium)

    val nNew = newRows.count()
    val newPath =
      if (nNew > 0) {
        val p = s"$reportDir/New.xlsx"
        XlsxSink.write(newRows.orderBy(col("id")), p, isPremium)
        Some(p)
      } else None

    // 6: conditional alert — build the digest AND deliver it
    val alert =
      if (nNew > 0) {
        val subject = s"ALERT: $nNew new records in $version"
        alertSink.send(subject,
          AlertSink.renderCards(newRows.orderBy(col("id"))))
        Some(subject)
      } else None

    Result(nToday, nNew, alert, todayPath, newPath, volumeAlarm,
      freshnessAlarm, shiftAlarm)
  }

  private def parseDay(s: String): Option[java.time.LocalDate] =
    scala.util.Try(java.time.LocalDate.parse(s)).toOption
}
