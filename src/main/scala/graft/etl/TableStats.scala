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

  /** Driver memory stays O(1) no matter how many files the table has:
    * the size stats stream off `listStatusIterator` into scalar
    * accumulators (never a retained per-file array/map), and the
    * per-file row counts aggregate DISTRIBUTEDLY — only their O(1)
    * min/max/sum rollup is collected. Per-file detail is available
    * bounded via [[skewOffenders]].
    */
  def report(spark: SparkSession, path: String): Report = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listStatusIterator(new Path(path))
    var n = 0L; var total = 0L; var small = 0L
    var mnB = Long.MaxValue; var mxB = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")) {
        n += 1; total += s.getLen
        mnB = math.min(mnB, s.getLen); mxB = math.max(mxB, s.getLen)
        if (s.getLen < SmallFileBytes) small += 1
      }
    }
    require(n > 0, s"no parquet files under $path")
    val rs = spark.read.parquet(path)
      .groupBy(input_file_name().as("f")).count()
      .agg(count(lit(1)).as("files_with_rows"), sum("count").as("rows"),
        min("count").as("min_rows"), max("count").as("max_rows"))
      .collect()(0)
    val filesWithRows = rs.getLong(0)
    val totalRows = if (rs.isNullAt(1)) 0L else rs.getLong(1)
    // a file absent from the scan groups is a zero-row file
    val minRows =
      if (filesWithRows < n || rs.isNullAt(2)) 0L else rs.getLong(2)
    val maxRows = if (rs.isNullAt(3)) 0L else rs.getLong(3)
    val avg = total.toDouble / n
    Report(
      nFiles = n,
      totalBytes = total,
      totalRows = totalRows,
      minFileBytes = mnB, maxFileBytes = mxB,
      avgFileBytes = avg,
      minFileRows = minRows, maxFileRows = maxRows,
      smallFiles = small,
      smallFileRatio = small.toDouble / n,
      sizeSkew = if (avg == 0) 0.0 else mxB / avg,
      recommendCompact = n > 1 && small.toDouble / n >= CompactRatio)
  }

  /** The `n` most row-heavy files (the offenders a re-shard targets
    * first): distributed TakeOrderedAndProject — the collect any
    * consumer does on this is bounded by `n`, never O(files).
    */
  def skewOffenders(spark: SparkSession, path: String,
      n: Int = 10): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))
      .orderBy(col("rows").desc, col("file"))
      .limit(n)

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
