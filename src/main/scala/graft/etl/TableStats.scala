package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A26 `TableStats` — storage-layout health report for a parquet
  * dataset: per-file row counts (one distributed pass grouped on
  * `input_file_name`), file sizes (driver-side filesystem metadata —
  * listing is O(files), no data read), and the derived signals a
  * table-maintenance job keys on: small-file ratio (scan/open overhead
  * at 100 TB is per-file, so thousands of KB-files poison a scan),
  * file-size skew (one fat file serializes its stage), and a
  * compaction recommendation. The companion to [[ShardedWriter]]
  * (which WRITES size-targeted files): this is the audit that decides
  * when to re-shard.
  */
object TableStats {

  /** Files smaller than this fraction of the target are "small". */
  val SmallFileBytes: Long = 32L * 1024 * 1024
  /** Recommend compaction when this share of files is small. */
  val CompactRatio = 0.5

  final case class Report(
      nFiles: Long, totalBytes: Long, totalRows: Long,
      minFileBytes: Long, maxFileBytes: Long, avgFileBytes: Double,
      minFileRows: Long, maxFileRows: Long,
      smallFiles: Long, smallFileRatio: Double,
      sizeSkew: Double, recommendCompact: Boolean)

  def report(spark: SparkSession, path: String): Report = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toUri.toString, s.getLen))
    require(files.nonEmpty, s"no parquet files under $path")
    val rowsPerFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val sizes = files.map(_._2)
    val rows = files.map { case (f, _) => rowsPerFile.getOrElse(f, 0L) }
    val small = sizes.count(_ < SmallFileBytes).toLong
    val avg = sizes.sum.toDouble / sizes.length
    Report(
      nFiles = files.length,
      totalBytes = sizes.sum,
      totalRows = rows.sum,
      minFileBytes = sizes.min, maxFileBytes = sizes.max,
      avgFileBytes = avg,
      minFileRows = rows.min, maxFileRows = rows.max,
      smallFiles = small,
      smallFileRatio = small.toDouble / sizes.length,
      sizeSkew = if (avg == 0) 0.0 else sizes.max / avg,
      recommendCompact =
        sizes.length > 1 && small.toDouble / sizes.length >= CompactRatio)
  }

  /** The report as a one-row DataFrame, for pipelines that persist
    * table-health history alongside the data.
    */
  def reportDf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val r = report(spark, path)
    Seq((r.nFiles, r.totalBytes, r.totalRows, r.minFileBytes,
      r.maxFileBytes, math.round(r.avgFileBytes * 100) / 100.0,
      r.smallFiles, math.round(r.smallFileRatio * 10000) / 10000.0,
      math.round(r.sizeSkew * 10000) / 10000.0, r.recommendCompact))
      .toDF("n_files", "total_bytes", "total_rows", "min_file_bytes",
        "max_file_bytes", "avg_file_bytes", "small_files",
        "small_file_ratio", "size_skew", "recommend_compact")
  }
}
