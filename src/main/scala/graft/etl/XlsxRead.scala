package graft.etl

import java.util.zip.ZipFile

import org.w3c.dom.Element

import org.apache.spark.sql.types._

/** Xlsx READ support (the reverse of [[XlsxSink]]): parse a worksheet
  * out of the OOXML zip into raw string cells, with schema inference.
  * Closes the reference's snapshot round-trip — it reads
  * `Yesterday.xlsx` back before the anti-join (aiesec.py:137), so a
  * migrating user with existing xlsx snapshots needs a read path, not
  * just the styled writer.
  *
  * Parsing is JDK-only (ZipFile + DOM — an .xlsx is a small report
  * file by the same contract the write side enforces, so DOM's
  * whole-document materialization is fine). Handles the cell styles
  * real-world writers emit: inline strings (what XlsxSink writes),
  * shared strings (what openpyxl/Excel write), numbers, booleans,
  * formula string results, date/datetime serials (via the styles
  * part's numFmt — surfaced as DateType/TimestampType), and cells
  * whose optional `r` reference is absent (positioned after the
  * previous cell, per OOXML).
  */
object XlsxRead {

  /** Header names + data rows as raw strings (null = empty cell). */
  case class RawSheet(header: IndexedSeq[String],
      rows: IndexedSeq[IndexedSeq[String]])

  /** @param sheet worksheet selector: None = the first sheet; Some(s)
    *        = a sheet NAME from the workbook (exact match), or a
    *        1-based position when `s` is numeric.
    */
  def readRaw(path: String, sheet: Option[String] = None): RawSheet = {
    val zf = new ZipFile(path)
    try {
      def slurp(name: String): Option[Array[Byte]] =
        Option(zf.getEntry(name)).map { e =>
          val is = zf.getInputStream(e)
          try is.readAllBytes() finally is.close()
        }
      val shared = slurp("xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
      val styles = slurp("xl/styles.xml")
        .map(parseStyleDateKinds).getOrElse(IndexedSeq.empty)
      val entry = resolveSheetEntry(slurp, sheet, path)
      val bytes = slurp(entry).getOrElse(throw new IllegalArgumentException(
        s"$path: worksheet part '$entry' missing from the archive"))
      parseSheet(bytes, shared, styles)
    } finally zf.close()
  }

  /** Worksheet zip-entry for the requested sheet, via workbook.xml
    * (sheet name → relationship id) + workbook.xml.rels (rId →
    * worksheet target). Falls back to the sheet1.xml convention when
    * the workbook part is absent (minimal writers, XlsxSink included).
    */
  private def resolveSheetEntry(slurp: String => Option[Array[Byte]],
      sheet: Option[String], path: String): String = {
    val wb = slurp("xl/workbook.xml")
    if (wb.isEmpty)
      return "xl/worksheets/sheet1.xml"
    val sheets = elems(parseDom(wb.get).getDocumentElement, "sheet")
      .map(s => (s.getAttribute("name"),
        Option(s.getAttributeNS(
          "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
          "id")).filter(_.nonEmpty).getOrElse(s.getAttribute("r:id"))))
    require(sheets.nonEmpty, s"$path: workbook declares no sheets")
    val (name, rid) = sheet match {
      case None => sheets.head
      case Some(s) if s.forall(_.isDigit) && s.nonEmpty =>
        val i = s.toInt
        require(i >= 1 && i <= sheets.length,
          s"$path: sheet index $i out of 1..${sheets.length}")
        sheets(i - 1)
      case Some(s) => sheets.find(_._1 == s).getOrElse(
        throw new IllegalArgumentException(s"$path: no sheet named '$s' " +
          sheets.map(_._1).mkString("(", ", ", ")")))
    }
    val target = slurp("xl/_rels/workbook.xml.rels").flatMap { rels =>
      elems(parseDom(rels).getDocumentElement, "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target"))
    }.getOrElse(s"worksheets/sheet${sheets.indexWhere(_._1 == name) + 1}.xml")
    if (target.startsWith("/")) target.stripPrefix("/")
    else s"xl/$target"
  }

  /** Hardened DOM parse: no DTDs / external entities (untrusted files). */
  private def parseDom(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
  }

  private def elems(parent: Element, local: String): Seq[Element] = {
    val nl = parent.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val doc = parseDom(bytes)
    val sis = doc.getElementsByTagNameNS("*", "si")
    (0 until sis.getLength).map { i =>
      // rich text splits one string over several <r><t> runs — join them
      elems(sis.item(i).asInstanceOf[Element], "t")
        .map(_.getTextContent).mkString
    }
  }

  /** "BC12" → 0-based column index 54. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((n, c) => n * 26 + (c - 'A' + 1)) - 1

  /** Per-cellXf date classification from xl/styles.xml: 0 = not a
    * date format, 1 = date, 2 = timestamp. Builtin numFmtIds cover
    * what Excel/openpyxl emit by default (14-17 and the East Asian
    * 27-36 are dates; 18-21/45-47 times and 22 datetime map to
    * timestamp); custom <numFmt> codes classify by their format
    * letters after stripping quoted literals, [..] sections, and
    * escapes — y/d mean a date part, h a time part.
    */
  private def parseStyleDateKinds(bytes: Array[Byte]): IndexedSeq[Int] = {
    val doc = parseDom(bytes)
    val custom = elems(doc.getDocumentElement, "numFmt").map { e =>
      val code = e.getAttribute("formatCode")
        .replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
        .replaceAll("\\\\.", "").toLowerCase
      val kind =
        if (code.contains("y") || code.contains("d"))
          if (code.contains("h")) 2 else 1
        else if (code.contains("h")) 2
        else 0
      e.getAttribute("numFmtId").toInt -> kind
    }.toMap
    val builtin: Map[Int, Int] =
      ((14 to 17) ++ (27 to 36)).map(_ -> 1).toMap ++
        ((18 to 21) ++ (45 to 47) :+ 22).map(_ -> 2).toMap
    val cellXfs = elems(doc.getDocumentElement, "cellXfs").headOption
      .map(elems(_, "xf")).getOrElse(Seq.empty)
    cellXfs.map { xf =>
      val id = Option(xf.getAttribute("numFmtId")).filter(_.nonEmpty)
        .map(_.toInt).getOrElse(0)
      custom.getOrElse(id, builtin.getOrElse(id, 0))
    }.toIndexedSeq
  }

  /** Excel serial number → ISO date / timestamp string (epoch
    * 1899-12-30, the convention every modern writer uses for dates
    * past the 1900-02-29 ghost; sub-day fraction rounds to seconds).
    */
  private def serialToString(serial: Double, kind: Int): String = {
    val days = math.floor(serial).toLong
    val secsRaw = math.round((serial - days) * 86400.0)
    val (d, secs) = if (secsRaw >= 86400L) (days + 1, 0L) else (days, secsRaw)
    val ld = java.time.LocalDate.of(1899, 12, 30).plusDays(d)
    if (kind == 1) ld.toString
    else java.time.LocalDateTime
      .of(ld, java.time.LocalTime.ofSecondOfDay(secs))
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  private def cellValue(c: Element, shared: IndexedSeq[String],
      styles: IndexedSeq[Int]): String = {
    def v: Option[String] = elems(c, "v").headOption.map(_.getTextContent)
    c.getAttribute("t") match {
      case "s" => v.map(s => shared(s.trim.toInt)).orNull
      case "inlineStr" => elems(c, "is").headOption
        .map(is => elems(is, "t").map(_.getTextContent).mkString).orNull
      case "b" => v.map(s => if (s.trim == "1") "true" else "false").orNull
      case _ => // "str" (formula result) and plain numbers
        val kind = Option(c.getAttribute("s")).filter(_.nonEmpty)
          .flatMap(s => scala.util.Try(s.toInt).toOption)
          .filter(i => i >= 0 && i < styles.length)
          .map(styles).getOrElse(0)
        // a date-styled NUMERIC cell is an Excel serial date — surface
        // it as the ISO string the schema inference and converters
        // understand. Only typeless cells carry serials: a t="str"
        // formula RESULT is text even when the cell wears a date style
        // (e.g. TEXT(...) under a date xf), so it passes through
        // untouched no matter how numeric it looks.
        val isStr = c.getAttribute("t") == "str"
        v.map { s =>
          if (!isStr && kind != 0 && isDouble(s.trim))
            serialToString(s.trim.toDouble, kind)
          else s
        }.orNull
    }
  }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String],
      styles: IndexedSeq[Int]): RawSheet = {
    val doc = parseDom(bytes)
    val rowNodes = doc.getElementsByTagNameNS("*", "row")
    val rows = (0 until rowNodes.getLength).map { i =>
      val cells = elems(rowNodes.item(i).asInstanceOf[Element], "c")
      // OOXML makes the cell reference `r` OPTIONAL: a cell without it
      // sits one right of the previous cell (or at column 0). Tracking
      // the running position instead of requiring `r` keeps data from
      // third-party minimal writers from being silently dropped.
      var next = 0
      val byIdx = cells.map { c =>
        val ref = c.getAttribute("r")
        val idx = if (ref.takeWhile(_.isLetter).isEmpty) next
          else colIndex(ref)
        next = idx + 1
        idx -> cellValue(c, shared, styles)
      }.toMap
      (byIdx, if (byIdx.isEmpty) -1 else byIdx.keys.max)
    }
    if (rows.isEmpty) return RawSheet(IndexedSeq.empty, IndexedSeq.empty)
    val width = rows.map(_._2).max + 1
    def materialize(m: Map[Int, String]): IndexedSeq[String] =
      (0 until width).map(m.getOrElse(_, null))
    val header = materialize(rows.head._1).zipWithIndex
      .map { case (h, i) => if (h == null || h.isEmpty) s"_c$i" else h }
    RawSheet(header, rows.tail.map(r => materialize(r._1)))
  }

  private def isLong(s: String): Boolean =
    try { s.toLong; true } catch { case _: NumberFormatException => false }
  private def isDouble(s: String): Boolean =
    try { s.toDouble; true } catch { case _: NumberFormatException => false }
  private def isBool(s: String): Boolean =
    s == "true" || s == "false"
  private def isDate(s: String): Boolean =
    s.length == 10 && s.matches("\\d{4}-\\d{2}-\\d{2}")
  private def isTimestamp(s: String): Boolean =
    s.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}(\\.\\d+)?")

  /** Narrowest of long < double < boolean < date < timestamp < string
    * that fits every non-null value of each column (all-null →
    * string). Date-styled numeric cells arrive from [[parseSheet]] as
    * ISO strings, so a date column round-trips to DateType.
    */
  def inferSchema(raw: RawSheet): StructType =
    StructType(raw.header.zipWithIndex.map { case (name, i) =>
      val vs = raw.rows.map(_(i)).filter(_ != null)
      val dt: DataType =
        if (vs.isEmpty) StringType
        else if (vs.forall(isLong)) LongType
        else if (vs.forall(isDouble)) DoubleType
        else if (vs.forall(isBool)) BooleanType
        else if (vs.forall(isDate)) DateType
        else if (vs.forall(isTimestamp)) TimestampType
        else StringType
      StructField(name, dt, nullable = true)
    })

  /** Raw cell string → external Scala value for `dt` (null passes
    * through; unparseable values fail loudly with cell context).
    */
  def convert(s: String, dt: DataType, colName: String): Any = {
    if (s == null) return null
    try dt match {
      case StringType => s
      case LongType => s.toLong
      case IntegerType => s.toInt
      case ShortType => s.toShort
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case BooleanType => s.toBoolean
      case d: DecimalType => BigDecimal(s).setScale(d.scale)
      case DateType => java.sql.Date.valueOf(s)
      case TimestampType => java.sql.Timestamp.valueOf(s)
      case other => throw new IllegalArgumentException(
        s"graft-xlsx: unsupported read type $other")
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.startsWith("graft-xlsx") => throw e
      case _: Exception => throw new IllegalArgumentException(
        s"graft-xlsx: column '$colName': cannot parse '$s' as $dt")
    }
  }
}
