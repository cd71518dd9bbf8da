package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.etl.DailyPipeline
import graft.sources.FetchSource.{FetchResult, PageDriver}

class FetchSourceSpec extends SparkSpec {

  private def card(id: Int): String =
    s"""<div class="card"><h2>Intern $id</h2>
       |<p>id: $id</p><p>country: de</p><p>premium: No</p>
       |<p>applicants: $id applicants</p><p>duration: 6 weeks</p>
       |<p>organization: org$id</p></div>""".stripMargin

  /** Scripted fake: `pages(i)` is the DOM after i successful load-more
    * clicks; the button "exists" while more pages remain (or forever,
    * with `stickyButton`, modeling an exhausted-but-clickable button).
    */
  private class FakeDriver(pages: Seq[String], hasConsent: Boolean = true,
      stickyButton: Boolean = false) extends PageDriver {
    var page = 0
    var consentClicks = 0
    var loadMoreClicks = 0
    override def acceptConsent(): Boolean = {
      if (hasConsent) consentClicks += 1
      hasConsent
    }
    override def loadMore(): Boolean = {
      val present = stickyButton || page < pages.size - 1
      if (present) {
        loadMoreClicks += 1
        page = math.min(page + 1, pages.size - 1)
      }
      present
    }
    override def pageSource(): String = pages(page)
  }

  test("load-more loop clicks until the card list stops growing") {
    val d = new FakeDriver(Seq(
      card(1),
      card(1) + card(2),
      card(1) + card(2) + card(3)))
    val r: FetchResult = FetchSource.fetchAll(d)
    assert(r.consentDismissed && d.consentClicks == 1)
    assert(r.cards == 3)
    assert(CardsSource.countCards(r.html) == 3)
    assert(d.loadMoreClicks == 2)
  }

  test("a permanently-clickable but exhausted button terminates the loop") {
    val d = new FakeDriver(
      Seq(card(1), card(1) + card(2)), stickyButton = true)
    val r = FetchSource.fetchAll(d)
    assert(r.cards == 2)
    // one growing click + one no-growth click that ends the loop —
    // never MaxRounds spins
    assert(d.loadMoreClicks == 2)
  }

  test("single-page site: no button, no consent, zero clicks") {
    val d = new FakeDriver(Seq(card(1)), hasConsent = false)
    val r = FetchSource.fetchAll(d)
    assert(!r.consentDismissed && r.rounds == 0 && r.cards == 1)
  }

  test("daily pipeline runs fetch -> parse -> diff -> report end-to-end") {
    val root = Files.createTempDirectory("fetchdaily")
    val store = root.resolve("store").toString
    val reports = root.resolve("reports").toString

    val day1 = new FakeDriver(Seq(card(1), card(1) + card(2)))
    val r1 = DailyPipeline.run(spark, cardsPath = "", storeRoot = store,
      version = "2026-08-12", reportDir = reports, fetcher = Some(day1))
    assert(r1.nToday == 2 && r1.nNew == 2)

    // the fetched page is materialized under the store for audit/replay
    val fetched = new java.io.File(s"$store/_fetched/2026-08-12.html")
    assert(fetched.isFile)
    assert(CardsSource.countCards(Files.readString(fetched.toPath)) == 2)

    val day2 = new FakeDriver(Seq(
      card(1), card(1) + card(2), card(1) + card(2) + card(3)))
    val r2 = DailyPipeline.run(spark, cardsPath = "", storeRoot = store,
      version = "2026-08-13", reportDir = reports, fetcher = Some(day2))
    assert(r2.nToday == 3 && r2.nNew == 1)
    assert(r2.alert.contains("ALERT: 1 new records in 2026-08-13"))
    assert(r2.newReport.isDefined)
  }
}
