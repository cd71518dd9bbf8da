package graft.etl

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}

/** A9 `XlsxSink` — styled Excel report writer (≈ aiesec.py:147-186:
  * header fill/font, conditional row highlighting, auto column widths),
  * written as minimal OOXML (a zip of XML parts) with zero dependencies.
  *
  * Scale contract: the input must already be aggregated — this sink
  * collects to the driver (reports are small by definition; the heavy
  * lifting stays distributed upstream). A hard row cap enforces that.
  */
object XlsxSink {

  val MaxRows = 100000

  /** Write `df` to `path` as a styled .xlsx.
    *
    * @param highlight rows matching this predicate get the highlight
    *                  fill (≈ the reference's `PREMIUM == "Yes"`
    *                  conditional format).
    */
  def write(df: DataFrame, path: String,
      highlight: Row => Boolean = _ => false): Unit = {
    val cols = df.columns.toSeq
    val rows = df.limit(MaxRows + 1).collect().toSeq
    require(rows.size <= MaxRows,
      s"XlsxSink is a report sink: aggregate first (>$MaxRows rows)")
    writeValues(cols, rows.map(r => r.toSeq.toIndexedSeq), path,
      vs => highlight(Row.fromSeq(vs)))
  }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def colRef(i: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA ...
    var n = i; val sb = new StringBuilder
    do { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 } while (n >= 0)
    sb.toString
  }

  private def cellXml(ref: String, v: Any, style: Int): String = v match {
    case null => ""
    case n: Byte => s"""<c r="$ref" s="$style"><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref" s="$style"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref" s="$style"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref" s="$style"><v>$n</v></c>"""
    case n: Float => s"""<c r="$ref" s="$style"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref" s="$style"><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref" s="$style"><v>$n</v></c>"""
    case b: Boolean =>
      s"""<c r="$ref" s="$style" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case other =>
      s"""<c r="$ref" s="$style" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
  }

  /** Core renderer over plain value rows — shared by the programmatic
    * API above and the `graft-xlsx` DataSource V2 write path.
    */
  private[graft] def writeValues(cols: Seq[String], rows: Seq[IndexedSeq[Any]],
      path: String, highlight: IndexedSeq[Any] => Boolean): Unit = {
    // Auto column widths from max rendered length (reference autofits,
    // aiesec.py:180-186); excel width unit ≈ one character.
    val widths = cols.indices.map { i =>
      val maxLen = (cols(i).length +: rows.map(r =>
        Option(r(i)).map(_.toString.length).getOrElse(0))).max
      math.min(maxLen + 2, 60)
    }
    val colsXml = widths.zipWithIndex.map { case (w, i) =>
      s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>"""
    }.mkString

    val header = cols.zipWithIndex.map { case (c, i) =>
      cellXml(s"${colRef(i)}1", c, 1)
    }.mkString
    val body = rows.zipWithIndex.map { case (r, ri) =>
      val style = if (highlight(r)) 2 else 0
      val cells = cols.indices.map { ci =>
        cellXml(s"${colRef(ci)}${ri + 2}", r(ci), style)
      }.mkString
      s"""<row r="${ri + 2}">$cells</row>"""
    }.mkString

    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<cols>$colsXml</cols>
         |<sheetData><row r="1">$header</row>$body</sheetData>
         |</worksheet>""".stripMargin

    // Style ids: 0 default, 1 header (bold white on blue fill),
    // 2 highlight fill (≈ the reference's premium-row yellow).
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<fonts count="2">
        |<font><sz val="11"/><name val="Calibri"/></font>
        |<font><b/><color rgb="FFFFFFFF"/><sz val="11"/><name val="Calibri"/></font>
        |</fonts>
        |<fills count="4">
        |<fill><patternFill patternType="none"/></fill>
        |<fill><patternFill patternType="gray125"/></fill>
        |<fill><patternFill patternType="solid"><fgColor rgb="FF4472C4"/></patternFill></fill>
        |<fill><patternFill patternType="solid"><fgColor rgb="FFFFF2CC"/></patternFill></fill>
        |</fills>
        |<borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf/></cellStyleXfs>
        |<cellXfs count="3">
        |<xf xfId="0"/>
        |<xf xfId="0" fontId="1" fillId="2" applyFont="1" applyFill="1"/>
        |<xf xfId="0" fillId="3" applyFill="1"/>
        |</cellXfs>
        |</styleSheet>""".stripMargin

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
        |</Types>""".stripMargin

    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin

    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin

    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
        |</Relationships>""".stripMargin

    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/styles.xml", styles)
      put("xl/worksheets/sheet1.xml", sheet)
    } finally zos.close()
  }
}
