package graft.etl

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A22 `PartitionedWriter` — Hive-style partitioned parquet layout:
  * `path/col=value/part-*.parquet`. The read side then resolves
  * partition predicates against DIRECTORY NAMES — a `lang = 'en'`
  * filter never opens a non-en file (explain shows it under
  * `PartitionFilters`, not `PushedFilters`). At 100 TB this is the
  * first and cheapest pruning tier: date/language/source partitions
  * routinely cut scans by 10–1000× before row groups or footers are
  * even considered.
  *
  * The repartition on the partition column keeps one writer task per
  * partition value (without it, every task opens a file in every
  * partition directory — the small-files explosion).
  */
object PartitionedWriter {

  /** Writes `df` partitioned by `partCol`; returns distinct partition
    * directory names (e.g. `lang=en`).
    */
  def write(df: DataFrame, path: String, partCol: String): Seq[String] = {
    df.repartition(col(partCol))
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
      .map(_.getName).toSeq.sorted
  }
}
