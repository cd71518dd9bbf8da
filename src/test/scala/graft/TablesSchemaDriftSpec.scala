package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Guards against driver-side testdata regeneration changing physical
  * schemas under us (round 6 lost 41 queries to events.ts flipping from
  * TIMESTAMP(NANOS) to timestamp[us]). Every table must load through
  * Tables.apply into an analyzable, executable plan, and the events
  * loader must normalize BOTH ts encodings to TimestampType with
  * identical values.
  */
class TablesSchemaDriftSpec extends SparkSpec {

  test("every testdata table loads and is analyzable via Tables.apply") {
    for (name <- Tables.all) {
      val df = Tables(spark, sfDir, name)
      // resolves the plan and touches execution; > 0 also guards
      // against silently-empty regenerated tables
      assert(df.limit(1).count() > 0, s"table $name empty or unreadable")
    }
  }

  test("events.ts normalizes to TimestampType whatever the physical encoding") {
    val df = Tables(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // the round-6 failure mode: any arithmetic on ts must analyze
    val ok = df.select((col("ts").cast("long") % 3600).as("m")).limit(1).count()
    assert(ok > 0)
  }

  test("nanos-as-long and timestamp[us] encodings load to identical values") {
    val tmp = Files.createTempDirectory("graft-tsdrift").toString
    val micros = Seq(
      (1L, 1640995200123456L), // 2022-01-01 00:00:00.123456
      (2L, -1000001L),         // pre-1970: floor semantics matter
      (3L, 0L))
    // µs variant: what the current testdata generation ships — parquet
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), i.e. TIMESTAMP_NTZ to
    // Spark, which is what the loader's NTZ branch must normalize.
    spark.createDataFrame(micros).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/us/events.parquet")
    // ns-as-long variant: what rounds 1–5 shipped. Written as a plain
    // long column (parquet INT64 without timestamp logical type) —
    // that is exactly what Spark sees under nanosAsLong, and the ns
    // value includes a sub-µs remainder to exercise floor truncation.
    spark.createDataFrame(micros).toDF("event_id", "us")
      .select(col("event_id"), expr("us * 1000L + 999").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/ns/events.parquet")

    val fromUs = Tables(spark, s"$tmp/us", "events")
      .select(col("event_id"), col("ts").cast("long").as("s"), col("ts"))
    val fromNs = Tables(spark, s"$tmp/ns", "events")
      .select(col("event_id"), col("ts").cast("long").as("s"), col("ts"))
    assert(fromUs.schema("ts").dataType == TimestampType)
    assert(fromNs.schema("ts").dataType == TimestampType)

    val mismatches = fromUs.as("a").join(fromNs.as("b"), "event_id")
      .where(col("a.ts") =!= col("b.ts"))
      .count()
    assert(mismatches == 0L, "ns and µs loaders disagree on values")
  }
}
