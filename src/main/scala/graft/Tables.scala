package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated test tables.
  *
  * At cluster scale the same layout holds: one directory per scale
  * factor / dataset, one parquet dataset per table. Reads stay lazy so
  * Catalyst can push filters and prune columns into the scan.
  *
  * Testdata contract — non-zero embeddings: every `embeddings.embedding`
  * vector has strictly positive L2 norm at all shipped scale factors.
  * The Spark-side ANN/dedup kernels guard zero-norm vectors to cosine
  * 0.0, but several DuckDB oracles use `list_cosine_similarity`, which
  * yields NaN on a zero vector — the Spark ≡ oracle gate equivalence
  * therefore rests on this invariant. `EmbeddingInvariantSpec` pins it
  * against the sf0.001 snapshot so a testdata regeneration that breaks
  * it fails loudly in `sbt test` rather than silently in the gate.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped in two physical encodings across testdata
      // generations: parquet TIMESTAMP(NANOS) (which Spark 4 can only
      // read as a raw long via the legacy conf — PARQUET_TYPE_ILLEGAL
      // otherwise) and plain timestamp[us] (read as TIMESTAMP_NTZ).
      // The conf must be set BEFORE the read so the nanos variant is
      // readable at all; it is a no-op on µs files, so we can then
      // branch on the schema Spark actually inferred.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          // Nanos-as-long: FLOOR-truncate to microseconds — the same
          // truncation DuckDB applies coercing ns → its native µs
          // timestamps, so both engines see identical values. Pure long
          // arithmetic (`div` truncates toward zero, which would round
          // negative pre-1970 nanos UP; floor(ts/1000.0) would lose
          // precision past 2^53).
          raw.withColumn("ts", timestamp_micros(
            expr("(ts div 1000) - CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END")))
        case TimestampNTZType =>
          // µs testdata: under the UTC session tz a plain cast keeps
          // the same wall-clock instants DuckDB reads natively.
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ =>
          raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
