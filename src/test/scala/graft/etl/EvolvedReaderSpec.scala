package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class EvolvedReaderSpec extends SparkSpec {

  test("generations with added columns read under one target; defaults fill the old files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").resolve("t").toString
    // gen 1: before the score column existed
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    // gen 2: score added
    Seq((3L, "c", 0.9)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)

    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType),
      StructField("score", DoubleType),
      StructField("tag", StringType))) // declared, never yet written
    val df = EvolvedReader.read(spark, dir, target,
      defaults = Map("score" -> -1.0, "tag" -> "none"))
    // names + types match the target (defaulted columns additionally
    // become non-nullable — stronger than the target, fine)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      target.map(f => (f.name, f.dataType)))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getDouble(2)).toSeq == Seq(-1.0, -1.0, 0.9))
    assert(rows.map(_.getString(3)).forall(_ == "none"))
  }

  test("columns on disk but absent from the target are dropped (forward compat)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve2").resolve("t").toString
    Seq((1L, "a", "internal")).toDF("id", "v", "debug_col").write.parquet(dir)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val df = EvolvedReader.read(spark, dir, target)
    assert(df.columns.toSeq == Seq("id", "v"))
    assert(df.count() == 1)
  }

  test("lossless widening casts; narrowing refuses at plan time") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve3").resolve("t").toString
    Seq((1, 2.5f)).toDF("id", "x").write.parquet(dir) // int, float on disk
    val wide = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType)))
    val df = EvolvedReader.read(spark, dir, wide)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("x").dataType == DoubleType)
    assert(df.collect().head.getLong(0) == 1L)

    val narrow = StructType(Seq(StructField("id", LongType),
      StructField("x", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      EvolvedReader.read(spark, dir, narrow)
    }
    assert(e.getMessage.contains("narrowing"))
  }
}
