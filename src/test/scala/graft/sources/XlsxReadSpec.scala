package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.etl.XlsxRead

/** A28 `graft-xlsx` READ path: write→read round-trip through the DSv2
  * source, schema inference, shared-string files (what openpyxl/Excel
  * write — the reference's Yesterday.xlsx, aiesec.py:137), column
  * pruning, and user-specified schemas.
  */
class XlsxReadSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("xlsxr").resolve(name).toString

  test("write -> read round-trip preserves values and infers types") {
    import spark.implicits._
    val path = tmp("rt.xlsx")
    Seq(
      (1L, "acme & söhne", true, 10.5),
      (2L, "zorg <quoted>", false, 3.25)
    ).toDF("id", "name", "premium", "score")
      .coalesce(1).orderBy("id")
      .write.format("graft-xlsx").mode("overwrite").save(path)

    val back = spark.read.format("graft-xlsx").load(path)
    assert(back.schema == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("premium", BooleanType), StructField("score", DoubleType))))
    assert(back.orderBy("id").collect().toSeq == Seq(
      Row(1L, "acme & söhne", true, 10.5),
      Row(2L, "zorg <quoted>", false, 3.25)))
  }

  test("empty cells read as null; mixed columns fall back to string") {
    import spark.implicits._
    val path = tmp("nulls.xlsx")
    Seq(
      ("a", Some(1L), "1"),
      ("b", None, "x")
    ).toDF("k", "n", "mixed")
      .coalesce(1).orderBy("k")
      .write.format("graft-xlsx").mode("overwrite").save(path)

    val back = spark.read.format("graft-xlsx").load(path)
    assert(back.schema("n").dataType == LongType)
    assert(back.schema("mixed").dataType == StringType)
    assert(back.orderBy("k").collect().toSeq == Seq(
      Row("a", 1L, "1"), Row("b", null, "x")))
  }

  test("column pruning honors the projected subset") {
    import spark.implicits._
    val path = tmp("prune.xlsx")
    Seq((1L, "x", 2.0)).toDF("id", "name", "score")
      .write.format("graft-xlsx").mode("overwrite").save(path)
    val projected = spark.read.format("graft-xlsx").load(path)
      .select("score", "id")
    assert(projected.collect().toSeq == Seq(Row(2.0, 1L)))
  }

  test("user-specified schema overrides inference") {
    import spark.implicits._
    val path = tmp("user.xlsx")
    Seq((7L, "2024-05-01")).toDF("n", "day")
      .write.format("graft-xlsx").mode("overwrite").save(path)
    val s = StructType(Seq(
      StructField("n", IntegerType), StructField("day", DateType)))
    val back = spark.read.format("graft-xlsx").schema(s).load(path)
    assert(back.collect().toSeq ==
      Seq(Row(7, java.sql.Date.valueOf("2024-05-01"))))
  }

  test("shared-string workbooks (openpyxl/Excel style) parse identically") {
    // hand-rolled minimal workbook using t="s" cells + sharedStrings.xml
    // — the layout the reference's snapshots actually have
    val path = tmp("shared.xlsx")
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>41</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val shared =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>name</t></si><si><t>n</t></si>
        |<si><r><t>ali</t></r><r><t>ce</t></r></si><si><t>bob</t></si>
        |</sst>""".stripMargin
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def put(n: String, c: String): Unit = {
        zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("xl/worksheets/sheet1.xml", sheet)
      put("xl/sharedStrings.xml", shared)
    } finally zos.close()

    val back = spark.read.format("graft-xlsx").load(path)
    assert(back.schema("n").dataType == LongType)
    // rich-text runs (<r><t>ali</t></r><r><t>ce</t></r>) join to "alice"
    assert(back.orderBy("name").collect().toSeq ==
      Seq(Row("alice", 41L), Row("bob", 42L)))
  }

  test("multi-sheet workbooks: select by name or 1-based index") {
    val path = tmp("multi.xlsx")
    def sheetXml(tag: String, v: Long): String =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
         |<row r="2"><c r="A2"><v>$v</v></c></row>
         |</sheetData></worksheet>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="summary" sheetId="1" r:id="rId1"/>
        |<sheet name="detail" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def put(n: String, c: String): Unit = {
        zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", rels)
      put("xl/worksheets/sheet1.xml", sheetXml("summary", 1L))
      put("xl/worksheets/sheet2.xml", sheetXml("detail", 2L))
    } finally zos.close()

    def readK(opts: Map[String, String]): Long =
      opts.foldLeft(spark.read.format("graft-xlsx")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(path).collect()(0).getLong(0)
    assert(readK(Map.empty) == 1L)              // default: first sheet
    assert(readK(Map("sheet" -> "detail")) == 2L)
    assert(readK(Map("sheet" -> "2")) == 2L)
    assert(readK(Map("sheet" -> "summary")) == 1L)
    val e = intercept[Exception] {
      XlsxRead.readRaw(path, Some("nope"))
    }
    assert(e.getMessage.contains("no sheet named"))
  }

  private def putZip(path: String, entries: (String, String)*): Unit = {
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try entries.foreach { case (n, c) =>
      zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  test("cells without the optional r reference keep their position") {
    // OOXML makes `r` optional; minimal third-party writers omit it.
    // Cells without it sit one right of the previous cell — silently
    // dropping them is data loss on exactly the files the read path
    // exists for. Row 3 mixes explicit and implicit references.
    val path = tmp("noref.xlsx")
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row><c t="inlineStr"><is><t>a</t></is></c><c t="inlineStr"><is><t>b</t></is></c><c t="inlineStr"><is><t>c</t></is></c></row>
        |<row><c><v>1</v></c><c><v>2</v></c><c><v>3</v></c></row>
        |<row r="3"><c r="A3"><v>4</v></c><c><v>5</v></c><c r="C3"><v>6</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    putZip(path, "xl/worksheets/sheet1.xml" -> sheet)
    val back = spark.read.format("graft-xlsx").load(path)
    assert(back.schema.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(back.orderBy("a").collect().toSeq ==
      Seq(Row(1L, 2L, 3L), Row(4L, 5L, 6L)))
  }

  test("date-styled serial cells surface as DateType / TimestampType") {
    // openpyxl-shaped workbook: dates are NUMBERS carrying a date
    // numFmt through the styles part (builtin 14 = date; custom 164
    // with date+time letters = datetime). Un-styled numbers stay long.
    val path = tmp("dates.xlsx")
    val day = java.time.LocalDate.of(2024, 5, 1)
    val serial = java.time.temporal.ChronoUnit.DAYS
      .between(java.time.LocalDate.of(1899, 12, 30), day)
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd\ hh:mm:ss"/></numFmts>
        |<cellXfs count="3">
        |<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
        |<xf numFmtId="14" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
        |<xf numFmtId="164" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
        |</cellXfs></styleSheet>""".stripMargin
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>day</t></is></c><c r="B1" t="inlineStr"><is><t>ts</t></is></c><c r="C1" t="inlineStr"><is><t>plain</t></is></c></row>
         |<row r="2"><c r="A2" s="1"><v>$serial</v></c><c r="B2" s="2"><v>$serial.5</v></c><c r="C2"><v>$serial</v></c></row>
         |</sheetData></worksheet>""".stripMargin
    putZip(path,
      "xl/worksheets/sheet1.xml" -> sheet,
      "xl/styles.xml" -> styles)
    val back = spark.read.format("graft-xlsx").load(path)
    assert(back.schema("day").dataType == DateType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("plain").dataType == LongType)
    assert(back.collect().toSeq == Seq(Row(
      java.sql.Date.valueOf("2024-05-01"),
      java.sql.Timestamp.valueOf("2024-05-01 12:00:00"),
      serial)))
  }

  test("str-formula results under a date style pass through untouched") {
    // a TEXT(...) formula result can wear a date xf while its value is
    // genuinely a string — numeric-looking text must NOT be rewritten
    // into a date (only typeless cells carry serials)
    val path = tmp("strfmla.xlsx")
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<cellXfs count="2">
        |<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
        |<xf numFmtId="14" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
        |</cellXfs></styleSheet>""".stripMargin
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>code</t></is></c></row>
        |<row r="2"><c r="A2" t="str" s="1"><f>TEXT(1,"0")</f><v>45413</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    putZip(path,
      "xl/worksheets/sheet1.xml" -> sheet,
      "xl/styles.xml" -> styles)
    val back = spark.read.format("graft-xlsx").load(path)
    assert(back.collect().map(_.get(0)).toSeq == Seq(45413L),
      "string formula result must keep its text value, not a date")
  }

  test("sparse rows materialize missing trailing cells as null") {
    val raw = XlsxRead.RawSheet(
      header = IndexedSeq("a", "b"),
      rows = IndexedSeq(IndexedSeq("1", null), IndexedSeq("2", "x")))
    assert(XlsxRead.inferSchema(raw)("a").dataType == LongType)
    assert(XlsxRead.inferSchema(raw)("b").dataType == StringType)
  }
}
