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

  test("xlsx → parquet migration: media never mix in one root") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapmix").toString
    val xlsx = new XlsxSnapshotStore(spark, root, "id")
    xlsx.rotate(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), "2026-08-10")
    xlsx.rotate(Seq((2L, "b"), (3L, "c")).toDF("id", "name"), "2026-08-11")
    assert(xlsx.versions == Seq("2026-08-10", "2026-08-11"))

    // the SCHEDULING.md migration flow: switch the job to parquet mode
    // against the SAME root — the parquet store must not list (or try
    // to read) the xlsx snapshots left behind
    val pq = new SnapshotStore(spark, root, "id")
    assert(pq.versions.isEmpty)
    assert(pq.newRows.isEmpty)

    pq.rotate(Seq((3L, "c"), (4L, "d")).toDF("id", "name"), "2026-08-12")
    assert(pq.versions == Seq("2026-08-12"))
    assert(pq.latest.get.count() == 2)

    // and the xlsx store, still pointed at the root, ignores parquet
    assert(xlsx.versions == Seq("2026-08-10", "2026-08-11"))
    assert(xlsx.latest.get.select("id").as[Long].collect().sorted
      .toSeq == Seq(2L, 3L))
  }

  test("a subclass with an unregistered suffix still lists its snapshots") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapcustom").toString
    // a downstream medium no central registry has heard of — the
    // store knows its own suffix, and the parquet store excludes any
    // dot-extension entry, so both directions classify correctly
    class V2Store(s: org.apache.spark.sql.SparkSession, r: String)
        extends SnapshotStore(s, r, "id") {
      override protected def suffix: String = ".v2"
    }
    val v2 = new V2Store(spark, root)
    v2.rotate(Seq((1L, "a")).toDF("id", "name"), "2026-08-10")
    v2.rotate(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), "2026-08-11")
    assert(v2.versions == Seq("2026-08-10", "2026-08-11"))
    assert(v2.latest.get.count() == 2)
    // the plain parquet store at the same root must not see them
    val pq = new SnapshotStore(spark, root, "id")
    assert(pq.versions.isEmpty)
  }
}
