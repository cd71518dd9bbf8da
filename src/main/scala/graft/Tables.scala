package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated test tables.
  *
  * At cluster scale the same layout holds: one directory per scale
  * factor / dataset, one parquet dataset per table. Reads stay lazy so
  * Catalyst can push filters and prune columns into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright (PARQUET_TYPE_ILLEGAL). Read nanos as raw long and
      // floor-truncate to microseconds — the same truncation DuckDB
      // applies when it coerces ns → its native µs timestamps, so both
      // engines see identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // FLOOR division in pure long arithmetic (`div` truncates toward
      // zero, which would round negative pre-1970 nanos UP; going via
      // floor(ts/1000.0) would lose precision past 2^53). DuckDB floors.
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(
          expr("(ts div 1000) - CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
