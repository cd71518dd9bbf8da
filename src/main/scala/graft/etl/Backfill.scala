package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A23 `Backfill` — idempotent partition-slice recompute over a
  * Hive-partitioned table (the layout [[PartitionedWriter]] writes):
  * re-running a day/slice replaces EXACTLY the partitions present in
  * the new frame and leaves every other partition byte-identical.
  *
  * That is Spark's dynamic partition-overwrite mode — without it,
  * `mode("overwrite")` on a partitioned table TRUNCATES THE WHOLE
  * TABLE first, the classic backfill footgun. At 100 TB the difference
  * is rewriting one day versus rewriting the archive; idempotence
  * (same input → same files) is what makes retry-on-failure safe.
  */
object Backfill {

  /** Overwrites only the partitions present in `slice`. The dynamic
    * mode is set per-write via option, not session-wide, so concurrent
    * static-mode writers are unaffected.
    */
  def overwriteSlice(slice: DataFrame, path: String, partCol: String): Unit =
    slice
      .repartition(col(partCol)) // one writer task per partition value
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
}
