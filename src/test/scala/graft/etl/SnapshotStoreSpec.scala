package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotStoreSpec extends SparkSpec {

  test("rotation, newRows and diff across versions") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap").toString
    val store = new SnapshotStore(spark, root, "id")

    assert(store.versions.isEmpty)
    assert(store.newRows.isEmpty)

    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    store.rotate(v1, "2026-08-10")
    assert(store.versions == Seq("2026-08-10"))
    // no previous → everything new
    assert(store.newRows.count() == 2)

    val v2 = Seq((2L, "b", 25.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    store.rotate(v2, "2026-08-11")
    assert(store.versions == Seq("2026-08-10", "2026-08-11"))

    val newIds = store.newRows.select("id").as[Long].collect().sorted
    assert(newIds.toSeq == Seq(3L))

    val statuses = store.diff
      .select(col("id"), col("status")).as[(Long, String)]
      .collect().toMap
    assert(statuses == Map(1L -> "removed", 2L -> "changed", 3L -> "added"))

    // retain(2): a third rotation drops the oldest version
    val v3 = Seq((3L, "c", 30.0)).toDF("id", "name", "v")
    store.rotate(v3, "2026-08-12")
    assert(store.versions == Seq("2026-08-11", "2026-08-12"))
    val d3 = store.diff.select(col("id"), col("status"))
      .as[(Long, String)].collect().toMap
    assert(d3 == Map(2L -> "removed", 3L -> "unchanged"))
  }
}
