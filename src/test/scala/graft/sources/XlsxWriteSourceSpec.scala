package graft.sources

import java.nio.file.Files
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import graft.SparkSpec

class XlsxWriteSourceSpec extends SparkSpec {

  private def sheet(path: String): String = {
    val zf = new ZipFile(path)
    try {
      val e = zf.getEntry("xl/worksheets/sheet1.xml")
      new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    } finally zf.close()
  }

  test("df.write.format(graft-xlsx) renders a styled workbook") {
    import spark.implicits._
    val path = Files.createTempDirectory("xlsxw").resolve("report.xlsx").toString
    Seq(
      (1L, "acme", "Yes", 10.5),
      (2L, "zorg", "No", 3.25)
    ).toDF("id", "name", "premium", "score")
      .coalesce(1).orderBy("id")
      .write.format("graft-xlsx")
      .mode("overwrite")
      .option("highlight", "premium=Yes")
      .save(path)

    val xml = sheet(path)
    assert(xml.contains("acme") && xml.contains("zorg"))
    assert(xml.contains("""<c r="A1" s="1""""))    // styled header
    assert(xml.contains("""s="2"><v>1</v>"""))      // premium row highlighted
    assert(xml.contains("""s="0"><v>2</v>"""))      // normal row not
    assert(xml.contains("<v>10.5</v>") && xml.contains("<v>3.25</v>"))
  }

  test("multi-partition writes land in partition order") {
    import spark.implicits._
    val path = Files.createTempDirectory("xlsxw").resolve("multi.xlsx").toString
    spark.range(0, 8, 1, numPartitions = 4)
      .selectExpr("id", "concat('row', id) AS label")
      .write.format("graft-xlsx").mode("overwrite").save(path)
    val xml = sheet(path)
    val order = "<v>(\\d+)</v>".r.findAllMatchIn(xml).map(_.group(1).toLong).toSeq
    assert(order == order.sorted, s"rows out of order: $order")
    assert(order.size == 8)
  }
}
