package graft.etl

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A19 `ShardedWriter` — size-targeted parquet output shards: the sink
  * side of a corpus pipeline. Consumers (training dataloaders,
  * downstream jobs) want shards of roughly equal, bounded size with a
  * global sort order — not whatever partition layout the last shuffle
  * left behind.
  *
  * `repartitionByRange` on the sort key gives contiguous, globally
  * ordered shards (range boundaries from a sampled sketch — one extra
  * lightweight pass); `maxRecordsPerFile` caps any shard that range
  * skew made too large. At 100 TB the same call shape holds — shard
  * count scales with row count, each task writes one bounded file, and
  * the sort key doubles as the read-side clustering key.
  */
object ShardedWriter {

  import org.apache.spark.sql.DataFrameWriter
  import org.apache.spark.sql.Row

  /** The shared sharding pipeline: range-partition to the row target,
    * sort within shards, cap file size, hand the configured writer to
    * the serializer, count the resulting shard files. Both output arms
    * are thin serializer choices over this — the sharding math lives
    * exactly once.
    */
  private def sharded(df: DataFrame, path: String, sortKey: String,
      targetRows: Long, fileSuffix: String)(
      serialize: (DataFrameWriter[Row], String) => Unit): Int = {
    require(targetRows > 0, "ShardedWriter: targetRows must be positive")
    val n = df.count()
    val shards = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    serialize(
      df.repartitionByRange(shards, col(sortKey))
        .sortWithinPartitions(sortKey)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", targetRows),
      path)
    Option(new File(path).listFiles())
      .map(_.count(f => f.getName.endsWith(fileSuffix))).getOrElse(0)
  }

  /** Writes `df` under `path`, returns the parquet file count. */
  def write(df: DataFrame, path: String, sortKey: String,
      targetRows: Long): Int =
    sharded(df, path, sortKey, targetRows, ".parquet")(_.parquet(_))

  /** Same size-targeted, range-ordered sharding, but emitting
    * gzip-compressed JSONL — the standard interchange format training
    * dataloaders consume. One bounded `.json.gz` per task; at 100 TB
    * the shape is identical to the parquet arm (the only difference is
    * the serializer), so the layout/ordering guarantees carry over.
    * Returns the shard file count.
    */
  def writeJsonl(df: DataFrame, path: String, sortKey: String,
      targetRows: Long): Int =
    sharded(df, path, sortKey, targetRows, ".json.gz")(
      _.option("compression", "gzip").json(_))
}
