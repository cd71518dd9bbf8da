package graft.sources

import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for semi-structured HTML "card" files — the Spark-side
  * generalization of the reference's card scraping (aiesec.py:38-66:
  * Selenium fetches a page, BeautifulSoup splits it into cards, regex
  * pulls the fields). Here the fetch already happened (files on disk);
  * this source does the split + field extraction as a first-class
  * parallel scan: one input partition per file, parsing runs on
  * executors, schema is (file, card_idx, title, fields map, raw).
  *
  * Reads exactly the format `etl_report_cards` (A7) renders:
  * `<div class="card"><h2>TITLE</h2><p>key: value</p>...</div>`.
  *
  * Usage: `spark.read.format("graft-cards").load(pathOrGlob)`.
  */
class CardsSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cards"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CardsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CardsTable(properties.asScala.getOrElse("paths",
      properties.asScala.getOrElse("path", "")))
}

object CardsSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("card_idx", IntegerType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("fields", MapType(StringType, StringType), nullable = false),
    StructField("raw", StringType, nullable = false)))

  private val CardRe =
    """(?s)<div class="card">(.*?)</div>""".r
  private val TitleRe = """(?s)<h2>(.*?)</h2>""".r
  private val FieldRe = """(?s)<p>\s*([^:<]+):\s*(.*?)</p>""".r

  /** Parse one file's content into card rows. Pure function — the
    * per-partition reader and the specs share it.
    */
  def parse(file: String, content: String): Iterator[InternalRow] =
    CardRe.findAllMatchIn(content).zipWithIndex.map { case (m, i) =>
      val body = m.group(1)
      val title = TitleRe.findFirstMatchIn(body).map(_.group(1).trim)
      val kvs = FieldRe.findAllMatchIn(body)
        .map(f => (f.group(1).trim, f.group(2).trim)).toSeq
      val keys = kvs.map(kv => UTF8String.fromString(kv._1))
      val vals = kvs.map(kv => UTF8String.fromString(kv._2))
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(file),
        i,
        title.map(UTF8String.fromString).orNull,
        ArrayBasedMapData(keys.toArray, vals.toArray),
        UTF8String.fromString(m.matched)))
    }

  /** Card count of a raw page — the fetch loop's stabilization signal
    * (same regex as the scan, so "fetch saw n cards" and "the scan
    * parses n cards" can never disagree).
    */
  def countCards(content: String): Int = CardRe.findAllMatchIn(content).size

  /** Expand a comma-separated path spec (files, dirs, globs) into the
    * concrete file list — one InputPartition each.
    */
  def listFiles(pathSpec: String, conf: Configuration): Seq[String] = {
    require(pathSpec.nonEmpty, "graft-cards: no path given")
    pathSpec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq
          .filter(_.isFile).map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }.sorted
  }
}

/** Java-serializable Hadoop `Configuration` carrier (the Spark-internal
  * `SerializableConfiguration` is `private[spark]`): the driver captures
  * `spark.sessionState.newHadoopConf()` — fs.defaultFS, S3/HDFS
  * credentials, user-set `spark.hadoop.*` — and ships it to executors,
  * so the source works on non-default filesystems too.
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

class CardsTable(pathSpec: String) extends Table with SupportsRead {
  override def name(): String = s"graft-cards($pathSpec)"
  override def schema(): StructType = CardsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      // driver-side: honor the session's Hadoop configuration
      private val hadoopConf = new SerializableHadoopConf(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
      override def build(): Scan = this
      override def readSchema(): StructType = CardsSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        CardsSource.listFiles(pathSpec, hadoopConf.value)
          .map(f => CardFilePartition(f): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new CardsReaderFactory(hadoopConf)
    }
}

case class CardFilePartition(file: String) extends InputPartition

class CardsReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[CardFilePartition].file
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        val path = new Path(file)
        val fs = path.getFileSystem(conf.value)
        val in = fs.open(path)
        val content = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        CardsSource.parse(file, content)
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
