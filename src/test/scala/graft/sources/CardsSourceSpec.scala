package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CardsSourceSpec extends SparkSpec {

  test("round-trip: etl_report_cards HTML → graft-cards source") {
    val rendered = graft.etl.Etl.reportCards(spark, sfDir).collect()
    val html = rendered.map(_.getString(1)).mkString("<html><body>", "\n", "</body></html>")
    val dir = Files.createTempDirectory("cards")
    Files.writeString(dir.resolve("page1.html"), html)
    Files.writeString(dir.resolve("page2.html"),
      """<div class="card"><h2>Extra</h2><p>country: DE</p>
        |<p>premium: Yes</p></div>""".stripMargin)

    val df = spark.read.format("graft-cards").load(dir.toString)
    assert(df.columns.toSeq ==
      Seq("file", "card_idx", "title", "fields", "raw"))
    assert(df.count() == rendered.length + 1)

    // parallelism contract: one partition per file
    assert(df.rdd.getNumPartitions == 2)

    val extra = df.filter(col("title") === "Extra")
      .select(col("fields")).head().getMap[String, String](0)
    assert(extra("country") == "DE" && extra("premium") == "Yes")

    // field extraction matches what the renderer wrote (reference
    // round-trip: report sink ⇄ card source)
    val firstTitle = rendered.head.getString(1)
    val parsedTitles = df.filter(col("file").endsWith("page1.html"))
      .orderBy("card_idx").select("title").collect().map(_.getString(0))
    assert(parsedTitles.length == rendered.length)
    assert(firstTitle.contains(parsedTitles.head))
    val seg = df.filter(col("file").endsWith("page1.html"))
      .orderBy("card_idx")
      .select(element_at(col("fields"), "segment")).head().getString(0)
    assert(Set("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      .contains(seg))
  }

  test("parse is total on malformed input") {
    val rows = CardsSource.parse("f",
      "<div class=\"card\">no title, no fields</div> junk <div>not a card</div>")
      .toSeq
    assert(rows.length == 1)
    assert(rows.head.isNullAt(2)) // title null
  }
}
