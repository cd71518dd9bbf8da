package graft.etl

import java.nio.file.Files
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import graft.SparkSpec

class XlsxSinkSpec extends SparkSpec {

  private def entries(path: String): Map[String, String] = {
    val zf = new ZipFile(path)
    try zf.entries().asScala.map { e =>
      e.getName -> new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    }.toMap
    finally zf.close()
  }

  test("writes a well-formed styled xlsx with conditional highlight") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha & co", "Yes", 10.5),
      (2L, "beta <x>", "No", -3.25)
    ).toDF("id", "name", "premium", "score")
    val path = Files.createTempDirectory("xlsx").resolve("out.xlsx").toString
    XlsxSink.write(df, path, highlight = _.getString(2) == "Yes")

    val es = entries(path)
    assert(es.keySet == Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels", "xl/styles.xml",
      "xl/worksheets/sheet1.xml"))

    val sheet = es("xl/worksheets/sheet1.xml")
    // header styled (s="1"), highlighted row styled (s="2"), xml escaped
    assert(sheet.contains("""<c r="A1" s="1""""))
    assert(sheet.contains("alpha &amp; co"))
    assert(sheet.contains("beta &lt;x&gt;"))
    assert(sheet.contains("""<c r="A2" s="2"><v>1</v>"""))
    assert(sheet.contains("""<c r="A3" s="0"><v>2</v>"""))
    assert(sheet.contains("<v>-3.25</v>"))
    assert(sheet.contains("customWidth"))

    val styles = es("xl/styles.xml")
    assert(styles.contains("FF4472C4")) // header fill
    assert(styles.contains("FFFFF2CC")) // highlight fill
  }

  test("rejects unaggregated (huge) input") {
    import spark.implicits._
    val big = spark.range(XlsxSink.MaxRows + 1L).toDF("id")
    val path = Files.createTempDirectory("xlsx").resolve("big.xlsx").toString
    assertThrows[IllegalArgumentException](XlsxSink.write(big, path))
  }
}
