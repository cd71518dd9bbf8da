package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.XlsxSink

/** DataSource V2 WRITE path for the styled Excel report sink (A9):
  *
  * {{{
  * df.write.format("graft-xlsx")
  *   .mode("overwrite")
  *   .option("highlight", "premium=Yes")   // ≈ aiesec.py:168 cond. fill
  *   .save("/reports/today.xlsx")
  * }}}
  *
  * Executor writers serialize their (bounded) row slices into commit
  * messages; the driver-side `commit` renders the single styled
  * workbook in partition order. This inverts the usual DSv2 flow on
  * purpose: an .xlsx is one small file by contract (reports are
  * aggregated before writing — the XlsxSink row cap enforces it), so
  * the only distributed work is producing the rows.
  */
class XlsxWriteSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-xlsx"

  override def supportsExternalMetadata(): Boolean = true

  // write-only source: schema always comes from the DataFrame
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new XlsxTable(schema)
}

class XlsxTable(schema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft-xlsx"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

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
