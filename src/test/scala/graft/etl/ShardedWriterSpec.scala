package graft.etl

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardedWriterSpec extends SparkSpec {

  test("shards respect the row target and conserve + order the data") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val total = docs.count()
    val target = 20L
    val out = Files.createTempDirectory("graft-shards").toString

    val nFiles = ShardedWriter.write(docs, out, "doc_id", target)
    assert(nFiles >= math.ceil(total.toDouble / target).toInt)

    // every file within the cap; union conserves the data exactly
    val files = new File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    var seen = 0L
    files.foreach { f =>
      val c = spark.read.parquet(f).count()
      assert(c <= target, s"$f has $c rows > $target")
      seen += c
    }
    assert(seen == total)
    val rt = spark.read.parquet(out)
    assert(rt.count() == total)
    assert(rt.select("doc_id").distinct().count() == total)

    // range sharding: files hold contiguous, non-overlapping key ranges
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA < loB)
      case _ => ()
    }
  }

  test("jsonl arm: gzip shards round-trip with the same layout contract") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val total = docs.count()
    val target = 20L
    val out = Files.createTempDirectory("graft-jsonl").toString

    val nFiles = ShardedWriter.writeJsonl(docs, out, "doc_id", target)
    assert(nFiles >= math.ceil(total.toDouble / target).toInt)

    val files = new File(out).listFiles()
      .filter(_.getName.endsWith(".json.gz")).map(_.toString).sorted
    assert(files.length == nFiles)
    files.foreach { f =>
      assert(spark.read.json(f).count() <= target)
    }
    // round-trip conserves rows and values (json text compare on a
    // sample key, schema read back as (doc_id, text))
    val rt = spark.read.json(out)
    assert(rt.count() == total)
    assert(rt.select("doc_id").distinct().count() == total)
    val orig = docs.orderBy("doc_id").limit(5).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val back = rt.select(col("doc_id").cast("long"), col("text"))
      .orderBy("doc_id").limit(5).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(orig.toSeq == back.toSeq)
  }
}
