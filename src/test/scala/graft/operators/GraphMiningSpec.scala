package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the graph-mining batch (B76–B78) that the
  * DuckDB oracle compare can't express: the degree-ordered triangle
  * plan agrees with brute force, skyline tie/duplicate rules, and the
  * path-count conservation law.
  */
class GraphMiningSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("triangleCounts: K4 plus a pendant — every K4 node is in 3 " +
      "triangles, the pendant is in none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val out = triCounts(edgesDf(k4))
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle with a tail — hub orientation finds " +
      "the single triangle once") {
    // star-heavy node 1 (degree 4) — with naive wedge joins the hub
    // would fan out; the count must still be exactly one triangle
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 6L), (1L, 7L))
    assert(triCounts(edgesDf(g)) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def triCounts(edges: DataFrame): Map[Long, Long] =
    GraphMining.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap

  test("triangleCounts agrees with the naive a<b<c triple join on the " +
      "sf co-purchase graph") {
    val edges = GraphMining.copurchaseEdges(
      graft.Tables(spark, sfDir, "lineitem")).cache()
    try {
      val naive = edges.as("e1")
        .join(edges.as("e2"), col("e1.v") === col("e2.u"))
        .join(edges.as("e3"),
          col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
        .count()
      val total = GraphMining.triangleCounts(edges)
        .agg(sum(col("n_tri"))).head().getLong(0)
      assert(naive > 0, "co-purchase graph should contain triangles")
      assert(total == 3 * naive,
        s"per-node counts sum $total != 3 * $naive triangles")
    } finally { edges.unpersist(); () }
  }

  private def pointsDf(rows: Seq[(Long, Double, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "price", "size")
  }

  test("skyline: duplicates both survive, equal-coordinate-one-dim " +
      "points are dominated") {
    val pts = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), // duplicate frontier point
      (3L, 9.0, 7), (4L, 10.0, 6),  // 4 dominated by 1 (same price)
      (5L, 11.0, 5),                // dominated by 1 (same size)
      (6L, 8.0, 9), (7L, 12.0, 4))
    val got = GraphMining.skyline(pointsDf(pts)).collect()
      .map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 2L, 3L, 6L, 7L))
  }

  test("skyline agrees with the naive dominance anti-join on the part " +
      "table") {
    val pts = graft.Tables(spark, sfDir, "part")
      .select(col("p_partkey").as("id"),
        col("p_retailprice").as("price"), col("p_size").as("size"))
    val dominated = pts.as("p").join(pts.as("q"),
      col("q.price") <= col("p.price") && col("q.size") <= col("p.size") &&
        (col("q.price") < col("p.price") || col("q.size") < col("p.size")),
      "left_semi")
    val naive = pts.except(dominated).collect().map(_.getLong(0)).toSet
    val got = GraphMining.skyline(pts).collect().map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("pathTrigrams: planted stream counts + ts ties broken by " +
      "event_id") {
    import spark.implicits._
    val t0 = new java.sql.Timestamp(1704067200000L)
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    // user 1: a,b,a,b → (a,b,a), (b,a,b); user 2 has a ts tie where
    // event_id order decides: events 20<21 at the same instant
    val ev = Seq(
      (1L, ts(0), 10L, "a"), (1L, ts(1), 11L, "b"),
      (1L, ts(2), 12L, "a"), (1L, ts(3), 13L, "b"),
      (2L, ts(0), 20L, "x"), (2L, ts(0), 21L, "y"), (2L, ts(5), 22L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = GraphMining.pathTrigrams(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getAs[Long]("n_paths")).toMap
    assert(got == Map(("a", "b", "a") -> 1L, ("b", "a", "b") -> 1L,
      ("x", "y", "z") -> 1L))
  }

  test("pathTrigrams: path mass conserves — sum of counts equals " +
      "sum over users of max(0, n_events - 2)") {
    val ev = graft.Tables(spark, sfDir, "events")
    val expected = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(greatest(col("n") - 2, lit(0L)))).head().getLong(0)
    val got = GraphMining.pathTrigrams(ev)
      .agg(sum(col("n_paths"))).head().getLong(0)
    assert(got == expected && got > 0)
  }

  test("queries are deterministic across runs") {
    for ((name, q) <- GraphMining.queries) {
      val a = q(spark, sfDir).collect().map(_.toString).toSeq
      val b = q(spark, sfDir).collect().map(_.toString).toSeq
      assert(a == b, s"$name not deterministic")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }
}
