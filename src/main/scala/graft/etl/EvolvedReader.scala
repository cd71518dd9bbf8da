package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A37 `EvolvedReader` — schema-evolution-safe parquet reads. A 100 TB
  * table is never one schema: columns get added over months of daily
  * appends, and the old shards are too big to rewrite. A naive read
  * either sees only one generation's schema (silently dropping the new
  * column from old-file scans... or the old files entirely) or fails.
  * This reader makes the contract explicit:
  *
  *  - `mergeSchema` unions the physical schemas across generations;
  *  - the caller's TARGET schema is then enforced: columns missing
  *    from the union (declared but never yet written) materialize as
  *    their declared default, columns present but null in old
  *    generations coalesce to the default, and columns in files but
  *    not in the target are dropped (forward-compat: an old reader
  *    survives a newer writer);
  *  - lossless numeric/date widenings (int→long, float→double) cast
  *    silently; any NARROWING mismatch fails loudly at plan time —
  *    truncating a column is never an acceptable default.
  *
  * Defaults are applied in the projection (no rewrite of old files —
  * that's the point), so they cost nothing at scan time and the filter
  * pushdown on real columns is unaffected.
  */
object EvolvedReader {

  /** Widenings considered lossless (source → allowed targets). */
  private val widen: Map[DataType, Set[DataType]] = Map(
    ByteType -> Set(ShortType, IntegerType, LongType),
    ShortType -> Set(IntegerType, LongType),
    IntegerType -> Set(LongType),
    FloatType -> Set(DoubleType),
    DateType -> Set(TimestampType))

  def read(spark: SparkSession, path: String, target: StructType,
      defaults: Map[String, Any] = Map.empty): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    val present = merged.schema.map(f => f.name -> f.dataType).toMap
    def defaulted(f: StructField, c: Column): Column =
      defaults.get(f.name) match {
        case Some(d) => coalesce(c, lit(d).cast(f.dataType)).as(f.name)
        case None => c.as(f.name)
      }
    val cols: Seq[Column] = target.map { f =>
      present.get(f.name) match {
        case None =>
          // declared but never written: pure default projection
          lit(defaults.getOrElse(f.name, null)).cast(f.dataType).as(f.name)
        case Some(dt) if dt == f.dataType =>
          defaulted(f, col(f.name))
        case Some(dt) if widen.getOrElse(dt, Set.empty)(f.dataType) =>
          defaulted(f, col(f.name).cast(f.dataType))
        case Some(dt) =>
          throw new IllegalArgumentException(
            s"EvolvedReader: column '${f.name}' is $dt on disk but " +
              s"${f.dataType} in the target — not a lossless widening; " +
              "refusing a narrowing read")
      }
    }
    merged.select(cols: _*)
  }
}
