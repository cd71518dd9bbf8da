package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.{XlsxRead, XlsxSink}

/** DataSource V2 READ + WRITE paths for the styled Excel report format
  * (A9/A28):
  *
  * {{{
  * df.write.format("graft-xlsx")
  *   .mode("overwrite")
  *   .option("highlight", "premium=Yes")   // ≈ aiesec.py:168 cond. fill
  *   .save("/reports/today.xlsx")
  *
  * spark.read.format("graft-xlsx")         // ≈ aiesec.py:137 read-back
  *   .load("/reports/yesterday.xlsx")      // schema inferred, or
  * spark.read.format("graft-xlsx").schema(s).load(...)
  * }}}
  *
  * Write: executor writers serialize their (bounded) row slices into
  * commit messages; the driver-side `commit` renders the single styled
  * workbook in partition order. This inverts the usual DSv2 flow on
  * purpose: an .xlsx is one small file by contract (reports are
  * aggregated before writing — the XlsxSink row cap enforces it), so
  * the only distributed work is producing the rows.
  *
  * Read: one InputPartition (same one-small-file contract — there is
  * nothing to split), column pruning honored, schema inferred
  * narrowest-type per column unless user-specified. Reads both what
  * XlsxSink writes (inline strings) and what openpyxl/Excel write
  * (shared strings), so existing reference snapshots load as-is.
  */
class XlsxWriteSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-xlsx"

  override def supportsExternalMetadata(): Boolean = true

  // Write path: schema comes from the DataFrame (this returns empty).
  // Read path: infer from the file when it exists. `sheet` option
  // selects the worksheet (name or 1-based index; default first).
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("path"))
      .filter(p => new java.io.File(p).isFile)
      .map(p => XlsxRead.inferSchema(
        XlsxRead.readRaw(p, Option(options.get("sheet")))))
      .getOrElse(new StructType())

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new XlsxTable(schema, Option(properties.get("path")))
}

class XlsxTable(schema: StructType, path: Option[String])
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = "graft-xlsx"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val p = Option(options.get("path")).orElse(path).getOrElse(
      throw new IllegalArgumentException("graft-xlsx: path required"))
    new XlsxScanBuilder(schema, p, Option(options.get("sheet")))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        // Fail fast at plan time: a malformed highlight spec or unknown
        // column must error BEFORE the write job runs, not at commit.
        private val highlight =
          Option(info.options.get("highlight")).map { spec =>
            val i = spec.indexOf('=')
            require(i > 0,
              s"graft-xlsx: highlight must be 'column=value', got '$spec'")
            val colName = spec.substring(0, i).trim
            require(info.schema().fieldNames.contains(colName),
              s"graft-xlsx: highlight column '$colName' not in schema " +
                info.schema().fieldNames.mkString("(", ", ", ")"))
            (colName, spec.substring(i + 1))
          }
        override def toBatch: BatchWrite =
          new XlsxBatchWrite(info.schema(),
            Option(info.options.get("path")).getOrElse(
              throw new IllegalArgumentException("graft-xlsx: path required")),
            highlight)
      }
    }
}

/** One partition's rows, already converted to external Scala values. */
case class XlsxRowsMessage(partitionId: Int, rows: Array[Array[Any]])
  extends WriterCommitMessage

class XlsxBatchWrite(schema: StructType, path: String,
    highlightSpec: Option[(String, String)]) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new XlsxWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.collect { case m: XlsxRowsMessage => m }
      .sortBy(_.partitionId)
      .flatMap(_.rows)
      .map(_.toIndexedSeq)
      .toSeq
    require(rows.size <= XlsxSink.MaxRows,
      s"graft-xlsx is a report sink: aggregate first (>${XlsxSink.MaxRows} rows)")
    val cols = schema.fieldNames.toSeq
    val highlight: IndexedSeq[Any] => Boolean = highlightSpec match {
      case Some((colName, value)) =>
        val idx = schema.fieldIndex(colName)
        vs => Option(vs(idx)).exists(_.toString == value)
      case None => _ => false
    }
    XlsxSink.writeValues(cols, rows, path, highlight)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class XlsxWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val converter =
        CatalystTypeConverters.createToScalaConverter(schema)
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]

      override def write(record: InternalRow): Unit = {
        require(buf.size < XlsxSink.MaxRows,
          "graft-xlsx: partition exceeds report row cap — aggregate first")
        buf += converter(record)
          .asInstanceOf[org.apache.spark.sql.Row].toSeq.toArray
      }
      override def commit(): WriterCommitMessage =
        XlsxRowsMessage(partitionId, buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

class XlsxScanBuilder(fullSchema: StructType, path: String,
    sheet: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the file's field order; honor the pruned set
    required = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    // one small file by the write side's contract → one partition
    override def planInputPartitions(): Array[InputPartition] =
      Array(XlsxInputPartition(path, sheet))
    override def createReaderFactory(): PartitionReaderFactory =
      new XlsxPartitionReaderFactory(required)
  }
}

case class XlsxInputPartition(path: String, sheet: Option[String])
  extends InputPartition

class XlsxPartitionReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[XlsxInputPartition]
    val path = part.path
    new PartitionReader[InternalRow] {
      private val raw = XlsxRead.readRaw(path, part.sheet)
      private val colIdx = schema.fields.map { f =>
        val i = raw.header.indexOf(f.name)
        require(i >= 0, s"graft-xlsx: column '${f.name}' not in $path " +
          raw.header.mkString("(", ", ", ")"))
        i
      }
      private val toRow = CatalystTypeConverters
        .createToCatalystConverter(schema)
      private var pos = -1

      override def next(): Boolean = { pos += 1; pos < raw.rows.length }
      override def get(): InternalRow = {
        val r = raw.rows(pos)
        val vals = schema.fields.zip(colIdx).map { case (f, i) =>
          XlsxRead.convert(r(i), f.dataType, f.name)
        }
        toRow(org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq))
          .asInstanceOf[InternalRow]
      }
      override def close(): Unit = ()
    }
  }
}
