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

  test("basketRules: hand-computed support/confidence/lift on planted " +
      "baskets; sub-min-support pairs excluded") {
    import spark.implicits._
    // baskets: 1:{1,2,3} 2:{1,2} 3:{1,2} 4:{3,4} 5:{3,4} 6:{1,3}
    // s(1)=4 s(2)=3 s(3)=4 s(4)=2, N=6; pair (2,3) occurs once -> out
    val op = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L), (4L, 4L), (5L, 3L), (5L, 4L),
      (6L, 1L), (6L, 3L)).toDF("o", "p")
    val got = GraphMining.basketRules(op).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_both"), r.getAs[Long]("conf_bp"),
          r.getAs[Long]("lift_milli")))).toMap
    assert(got == Map(
      (1L, 2L) -> ((3L, 7500L, 1500L)), (2L, 1L) -> ((3L, 10000L, 1500L)),
      (1L, 3L) -> ((2L, 5000L, 750L)), (3L, 1L) -> ((2L, 5000L, 750L)),
      (3L, 4L) -> ((2L, 5000L, 1500L)), (4L, 3L) -> ((2L, 10000L, 1500L))))
  }

  test("skyline matches naive dominance on seeded random tie-heavy " +
      "point sets") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 12) {
      val n = 5 + rnd.nextInt(50)
      // few distinct values => duplicates and one-dim ties are common,
      // which is exactly where the staircase tie rules can go wrong
      val pts = (1 to n).map(i =>
        (i.toLong, rnd.nextInt(10) / 2.0, rnd.nextInt(8)))
      val naive = pts.filter(p => !pts.exists(q =>
        q._2 <= p._2 && q._3 <= p._3 &&
          (q._2 < p._2 || q._3 < p._3))).map(_._1).toSet
      val got = GraphMining.skyline(pointsDf(pts)).collect()
        .map(_.getAs[Long]("id")).toSet
      assert(got == naive, s"n=$n pts=$pts")
    }
  }

  test("triangleCounts matches a naive per-node count on seeded " +
      "random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val n = 4 + rnd.nextInt(12)
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n if rnd.nextInt(100) < 35
      } yield (i.toLong, j.toLong)).toSeq
      if (edges.nonEmpty) {
        val adj = edges.flatMap(e => Seq(e, e.swap))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val naive = (0L until n).map { v =>
          val nb = adj.getOrElse(v, Set.empty).toSeq
          v -> (for {
            a <- nb; b <- nb if a < b && adj(a)(b)
          } yield 1).size.toLong
        }.filter(_._2 > 0).toMap
        val got = triCounts(edgesDf(edges))
        assert(got == naive, s"n=$n edges=$edges")
      }
    }
  }

  test("skyline3d matches naive dominance on seeded random tie-heavy " +
      "3-D point sets, duplicates survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (it <- 1 to 8) {
      val n = 5 + rnd.nextInt(40)
      val base = (1 to n).map(i => (i.toLong, rnd.nextInt(8) / 2.0,
        rnd.nextInt(6).toDouble, rnd.nextInt(10).toDouble))
      // force a duplicate pair each round
      val pts = base :+ base.head.copy(_1 = n + 1L)
      def dom(q: (Long, Double, Double, Double),
          p: (Long, Double, Double, Double)) =
        q._2 <= p._2 && q._3 <= p._3 && q._4 >= p._4 &&
          (q._2 < p._2 || q._3 < p._3 || q._4 > p._4)
      val naive = pts.filter(p => !pts.exists(q => dom(q, p)))
        .map(_._1).toSet
      val got = GraphMining.skyline3dKernel(
          pts.toDF("id", "price", "sz", "qty"))
        .collect().map(_.getAs[Long]("id")).toSet
      assert(got == naive, s"round $it: got $got want $naive")
      // the duplicate of a frontier point must ride along with it
      assert(got.contains(1L) == got.contains(n + 1L))
    }
  }

  test("skyline_3d agrees with the naive dominance anti-join on the " +
      "sf rollup") {
    val pts = graft.Tables(spark, sfDir, "part")
      .join(graft.Tables(spark, sfDir, "lineitem"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .agg(sum(col("l_quantity")).as("qty"))
      .select(col("p_partkey").as("id"),
        col("p_retailprice").as("price"),
        col("p_size").cast("double").as("sz"), col("qty"))
    val dominated = pts.as("p").join(pts.as("q"),
      col("q.price") <= col("p.price") && col("q.sz") <= col("p.sz") &&
        col("q.qty") >= col("p.qty") &&
        (col("q.price") < col("p.price") || col("q.sz") < col("p.sz") ||
          col("q.qty") > col("p.qty")),
      "left_semi")
    val naive = pts.except(dominated).collect().map(_.getLong(0)).toSet
    val got = GraphMining.skyline3dKernel(pts).collect()
      .map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("graph_components: rollups agree with a local union-find over " +
      "the same edge set") {
    val edges = GraphMining.copurchaseEdges(
        graft.Tables(spark, sfDir, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
    }
    val nodesByComp = parent.keys.toSeq.groupBy(find)
    val edgesByComp = edges.groupBy { case (u, _) => find(u) }
    val local = nodesByComp.map { case (c, ns) =>
      c -> ((ns.size.toLong, edgesByComp(c).size.toLong))
    }
    val got = GraphMining.graphComponents(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))).toMap
    assert(got == local && got.nonEmpty)
  }

  test("jaccardLinks: planted wedge graph — the one non-adjacent pair " +
      "scores its hand-computed Jaccard, adjacent pairs never appear") {
    // N1={2,3}, N2={1,3,4}, N3={1,2,4}, N4={2,3}: only (1,4) is
    // non-adjacent with common neighbors {2,3} → J = 2/(2+2−2) = 1
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = GraphMining.jaccardLinks(edgesDf(g)).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("u"), r.getAs[Long]("v")) == (1L, 4L))
    assert(r.getAs[Long]("n_common") == 2L)
    assert((r.getAs[Long]("deg_u"), r.getAs[Long]("deg_v")) == (2L, 2L))
    assert(r.getAs[Long]("jacc_milli") == 1000L)
  }

  test("jaccardLinks: a hub center above the degree cap generates no " +
      "wedges — its leaves never become candidates") {
    // star: center 100 with JaccDegCap+1 leaves; every leaf pair
    // shares only the (capped-out) hub → no candidates at all
    val leaves = (1L to (GraphMining.JaccDegCap + 1L))
    val star = leaves.map(l => (l, 100L))
    assert(GraphMining.jaccardLinks(edgesDf(star)).collect().isEmpty)
    // one leaf under the cap and the pairs reappear
    val smaller = leaves.take(GraphMining.JaccDegCap - 1)
      .map(l => (l, 100L))
    val out = GraphMining.jaccardLinks(edgesDf(smaller)).collect()
    // C(cap−1, 2) leaf pairs, each J = 1/(1+1−1) = 1
    val n = GraphMining.JaccDegCap - 1L
    assert(out.length == (n * (n - 1) / 2).toInt)
    assert(out.forall(_.getAs[Long]("jacc_milli") == 1000L))
  }

  test("jaccardLinks: capped hub shared by a surviving pair still " +
      "counts in the exact n_common recount") {
    // hub 100 has cap+1 leaves (capped out of wedge generation), but
    // leaves 1 and 2 also share low-degree neighbor 200 — the wedge at
    // 200 generates the (1,2) candidate, and the exact recount must
    // include the hub: n_common = 2 (hub + 200), J = 2/(2+2−2) = 1.
    // The capped-count version would report n_common = 1, J = 1/3.
    val leaves = (1L to (GraphMining.JaccDegCap + 1L))
    val g = leaves.map(l => (l, 100L)) ++ Seq((1L, 200L), (2L, 200L))
    val out = GraphMining.jaccardLinks(edgesDf(g)).collect()
    val r = out.find(r => r.getAs[Long]("u") == 1L &&
      r.getAs[Long]("v") == 2L).get
    assert(r.getAs[Long]("n_common") == 2L)
    assert((r.getAs[Long]("deg_u"), r.getAs[Long]("deg_v")) == (2L, 2L))
    assert(r.getAs[Long]("jacc_milli") == 1000L)
  }

  test("lpaCommunities: bridged cliques keep separate labels, and the " +
      "rollup matches an exact local replay of the synchronous votes") {
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val k4b = Seq((11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L),
      (12L, 14L), (13L, 14L))
    val g = k4a ++ k4b ++ Seq((4L, 11L)) // one bridge
    // exact local replay of R synchronous frequency-vote rounds
    val nbrs = (g ++ g.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to GraphMining.LpaRounds) {
      lab = nbrs.map { case (n, ns) =>
        val freq = ns.groupBy(lab).view.mapValues(_.size).toMap
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expect = lab.values.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }
    val got = GraphMining.lpaCommunities(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("community") -> r.getAs[Long]("n_nodes"))
      .toMap
    assert(got == expect && got.nonEmpty)
    // density boundary holds: no community spans both cliques
    assert(got.values.sum == 8L)
    assert(expect.size >= 2, s"bridged cliques collapsed: $expect")
  }

  test("kcoreConverged: a squared-path fuse cascades one node per " +
      "round — convergence needs >3 rounds and the fixed-R result is " +
      "a strict superset") {
    // K5 core {c1..c5} + squared path w1-w5 (w_i ~ w_{i+1}, w_{i+2})
    // fused into it: each peel round removes exactly the current chain
    // end, so the true 3-core (the K5) takes 5 effective rounds + 1
    // no-change round to prove convergence
    val c = Seq(101L, 102L, 103L, 104L, 105L)
    val k5 = for { i <- c.indices; j <- i + 1 until c.size }
      yield (c(i), c(j))
    val chain = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L), (4L, 101L), (5L, 101L), (5L, 102L))
    val g = edgesDf(k5 ++ chain)
    val (core, rounds, converged) = GraphMining.kcoreConverged(g)
    assert(converged)
    assert(rounds == 6, s"expected 5 peel rounds + 1 proof round, got $rounds")
    val coreMap = core.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(coreMap == c.map(_ -> 4L).toMap)
    // the fixed-R key is a documented SUPERSET on this graph: after 3
    // rounds w4/w5 still stand (their supports fell later)
    val fixed = GraphMining.kcorePeel(g).collect()
      .map(_.getAs[Long]("node")).toSet
    assert(coreMap.keySet.subsetOf(fixed) && fixed.size > coreMap.size,
      s"fixed-R should over-approximate here: $fixed")
  }

  test("kcoreConverged: an already-converged graph early-stops after " +
      "one proof round, not the cap") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val (core, rounds, converged) = GraphMining.kcoreConverged(edgesDf(k4))
    assert(converged && rounds == 1)
    assert(core.collect().map(_.getAs[Long]("degree")).forall(_ == 3L))
  }

  test("kcorePeel: K4 with a pendant chain — the chain peels away, " +
      "the 3-core survives with exact degrees") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val out = GraphMining.kcorePeel(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kcorePeel: cascading removal — a node that only falls under " +
      "the bound after round 1 is peeled in round 2") {
    // node 5 has degree 3 (1, 2, 6) until the degree-1 node 6 is
    // peeled in round 1; round 2 then drops 5, leaving the K4
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (2L, 5L), (5L, 6L))
    val out = GraphMining.kcorePeel(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("bfsLayers: hub seeding, layered distances, horizon cutoff") {
    // star at 1 (degree 3) + chain 4-5-6-7-8-9-10: seeds are the top-3
    // by (degree desc, id asc) = {1, 4, 5}; node 10 sits 5 hops from
    // the nearest seed — past BfsRounds=4, so it must NOT report
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 9L), (9L, 10L))
    val out = GraphMining.bfsLayers(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Int]("dist")).toMap
    assert(out == Map(1L -> 0, 4L -> 0, 5L -> 0,
      2L -> 1, 3L -> 1, 6L -> 1, 7L -> 2, 8L -> 3, 9L -> 4))
  }

  test("graph_closeness: per-hub reach, hop totals and milli " +
      "closeness are hand-exact; each seed's traversal is independent") {
    // star at 1 (deg 4), bridge 2 (deg 3: 1,6,7), tail 6-8 (deg 2):
    // seeds = {1, 2, 6}; all 7 other nodes reachable within 4 hops
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 6L), (2L, 7L), (6L, 8L))
    val out = GraphMining.hubCloseness(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 6L))
    // from 1: dists {2,3,4,5}=1, {6,7}=2, {8}=3 → n=7, sum=11
    assert(out(1L).getAs[Long]("degree") == 4)
    assert(out(1L).getAs[Long]("n_reached") == 7)
    assert(out(1L).getAs[Long]("sum_dist") == 11)
    assert(out(1L).getAs[Long]("closeness_milli") == 7000 / 11)
    // from 2: {1,6,7}=1, {3,4,5,8}=2 → n=7, sum=11
    assert(out(2L).getAs[Long]("n_reached") == 7)
    assert(out(2L).getAs[Long]("sum_dist") == 11)
    // from 6: {2,8}=1, {1,7}=2, {3,4,5}=3 → n=7, sum=15
    assert(out(6L).getAs[Long]("degree") == 2)
    assert(out(6L).getAs[Long]("sum_dist") == 15)
    assert(out(6L).getAs[Long]("closeness_milli") == 7000 / 15)
  }

  test("graph_eccentricity: max hop distance and outermost-ring size " +
      "are hand-exact on the planted star+bridge+tail graph") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 6L), (2L, 7L), (6L, 8L))
    val out = GraphMining.hubEccentricity(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("n_reached"), r.getAs[Int]("eccentricity"),
          r.getAs[Long]("n_at_ecc"))).toMap
    // seed 1: rings {2,3,4,5} {6,7} {8} → ecc 3, ring 1
    // seed 2: rings {1,6,7} {3,4,5,8} → ecc 2, ring 4
    // seed 6: rings {2,8} {1,7} {3,4,5} → ecc 3, ring 3
    assert(out == Map(
      1L -> ((7L, 3, 1L)), 2L -> ((7L, 2, 4L)), 6L -> ((7L, 3, 3L))))
  }

  test("graph_betweenness: hand-exact Brandes dependencies on the " +
      "planted star+bridge+tail graph (all three seed traversals)") {
    // same graph as the closeness spec: star at 1, bridge 2, tail 6-8;
    // seeds = {1, 2, 6}. Hand-unrolled milli dependencies:
    //  s=1: DAG 1→{2,3,4,5}, 2→{6,7}, 6→{8}; δ8=0, δ6=1000, δ7=0,
    //       δ2=(1000+1000)+1000=3000, leaves 0
    //  s=2: DAG 2→{1,6,7}, 1→{3,4,5}, 6→{8}; δ1=3000, δ6=1000
    //  s=6: DAG 6→{2,8}, 2→{1,7}, 1→{3,4,5}; δ1=3000, δ2=(1000+3000)
    //       +1000=5000
    // totals (node≠seed rows): 1→6000, 2→8000, 6→2000, rest 0;
    // node 2 is the biggest broker — the bridge, as betweenness should
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 6L), (2L, 7L), (6L, 8L))
    val out = GraphMining.hubBetweenness(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("n_sources"), r.getAs[Long]("bc_milli"))).toMap
    assert(out(1L) == (2L, 6000L))
    assert(out(2L) == (2L, 8000L))
    assert(out(6L) == (2L, 2000L))
    assert(out(3L) == (3L, 0L) && out(4L) == (3L, 0L) &&
      out(5L) == (3L, 0L))
    assert(out(7L) == (3L, 0L) && out(8L) == (3L, 0L))
  }

  test("graph_betweenness: σ multiplicity — parallel shortest paths " +
      "split dependency by the σ ratio (floor-division millis)") {
    // diamond 1-2-4, 1-3-4 plus tail 4-5, plus pendants 1-6, 1-7 to
    // make 1 the clear top seed; seeds (deg desc, id) = {1, 4, 2}.
    //  s=1: σ: 2,3,6,7=1; 4=2; 5=2. backward: δ4=σ4/σ5·(1000+δ5)
    //    with δ5=0 → (2·1000)//2=1000; δ2=δ3=(1·(1000+1000))//2=1000;
    //    δ6=δ7=δ5=0
    //  s=4: DAG 4→{2,3,5}, {2,3}→1, 1→{6,7}; σ1=2, σ6=σ7=2.
    //    δ1 = (2·(1000+0))//2 per pendant = 1000+1000 = 2000;
    //    δ2=δ3=(1·(1000+2000))//2=1500; δ5=δ6=δ7=0
    //  s=2: DAG 2→{1,4}, 1→{3,6,7}, 4→{3,5} — σ3=2 (via 1 AND 4);
    //    δ1=(1·1000)//2+1000+1000=2500; δ4=(1·1000)//2+1000=1500;
    //    δ3=δ5=δ6=δ7=0
    // totals: 1→2000+2500=4500 (n=2), 2→1000(s=1)+1500(s=4)=2500
    //   (n=2), 3→1000+1500+0=2500 (n=3, never a seed),
    //   4→1000(s=1)+1500(s=2)=2500 (n=2), 5,6,7→0 (n=3)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (1L, 6L), (1L, 7L))
    val out = GraphMining.hubBetweenness(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("n_sources"), r.getAs[Long]("bc_milli"))).toMap
    assert(out(1L) == (2L, 4500L))
    assert(out(2L) == (2L, 2500L))
    assert(out(3L) == (3L, 2500L))
    assert(out(4L) == (2L, 2500L))
    assert(out(5L) == (3L, 0L))
    assert(out(6L) == (3L, 0L) && out(7L) == (3L, 0L))
  }

  test("graph_stress: hand-exact integer path counts on the planted " +
      "star+bridge+tail graph (all σ = 1 ⇒ stress ≡ betweenness/1000)") {
    // same graph/seeds as the betweenness spec; with every σ = 1 the
    // stress recursion counts plain reachable-target tallies:
    //  s=1: δ6=1 (path to 8), δ2=(1+1)+(1+0)=3 (paths to 6,7,8)
    //  s=2: δ1=3 (paths to 3,4,5), δ6=1
    //  s=6: δ1=3, δ2=(1+3)+(1+0)=5
    // totals: 1→6, 2→8, 6→2, rest 0
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 6L), (2L, 7L), (6L, 8L))
    val out = GraphMining.hubStress(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("n_sources"), r.getAs[Long]("stress_paths"))).toMap
    assert(out(1L) == (2L, 6L))
    assert(out(2L) == (2L, 8L))
    assert(out(6L) == (2L, 2L))
    assert(out(3L) == (3L, 0L) && out(4L) == (3L, 0L) &&
      out(5L) == (3L, 0L))
    assert(out(7L) == (3L, 0L) && out(8L) == (3L, 0L))
  }

  test("graph_stress: σ multiplicity — parallel shortest paths COUNT " +
      "(σ products), where betweenness only splits fractions") {
    // the betweenness diamond: 1-2-4, 1-3-4, tail 4-5, pendants 1-6,7;
    // seeds = {1, 4, 2}. Hand recursion δ(v) = σ_v·Σ(1 + δ(w)/σ_w):
    //  s=1: σ4=2,σ5=2; δ4=2·(1+0)=2 (σ15(4)=σ14·σ45=2), δ2=δ3=1·(1+2/2)=2
    //  s=4: σ1=2,σ6=σ7=2; δ1=2·[(1+0)+(1+0)]=4, δ2=δ3=1·(1+4/2)=3
    //  s=2: σ3=2 (via 1 AND 4); δ1=(1+0/2)+(1+0)+(1+0)=3, δ4=(1+0/2)+(1+0)=2
    // totals: 1→4+3=7 (n=2), 2→2+3=5 (n=2), 3→2+3+0=5 (n=3),
    //   4→2+2=4 (n=2), 5,6,7→0 (n=3)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (1L, 6L), (1L, 7L))
    val out = GraphMining.hubStress(edgesDf(g)).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("n_sources"), r.getAs[Long]("stress_paths"))).toMap
    assert(out(1L) == (2L, 7L))
    assert(out(2L) == (2L, 5L))
    assert(out(3L) == (3L, 5L))
    assert(out(4L) == (2L, 4L))
    assert(out(5L) == (3L, 0L))
    assert(out(6L) == (3L, 0L) && out(7L) == (3L, 0L))
  }

  test("bfsLayers: every node gets exactly one distance (a node " +
      "reachable from two seeds reports the minimum once)") {
    // 3 sits one hop from both seed candidates 1 and 2
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 5L))
    val rows = GraphMining.bfsLayers(edgesDf(g)).collect()
    val keys = rows.map(_.getAs[Long]("p_partkey")).toSeq
    assert(keys.distinct.size == keys.size, "duplicate node rows")
    assert(rows.map(r => r.getAs[Long]("p_partkey") ->
      r.getAs[Int]("dist")).toMap ==
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1))
  }

  private def wedgesDf(triples: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    triples.toDF("u", "v", "support")
  }

  private def forestSet(df: DataFrame): Set[(Long, Long, Long, Int)] =
    df.collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
      r.getAs[Long]("support"), r.getAs[Int]("round_added"))).toSet

  test("boruvkaForest: two strong triangles and a weak bridge — round " +
      "1 picks each cluster's strong edges, round 2 the bridge, and " +
      "the weak in-cluster edges never enter") {
    val g = Seq((1L, 2L, 10L), (2L, 3L, 9L), (1L, 3L, 1L),
      (4L, 5L, 10L), (5L, 6L, 9L), (4L, 6L, 1L), (3L, 4L, 2L))
    assert(forestSet(GraphMining.boruvkaForest(wedgesDf(g))) == Set(
      (1L, 2L, 10L, 1), (2L, 3L, 9L, 1),
      (4L, 5L, 10L, 1), (5L, 6L, 9L, 1),
      (3L, 4L, 2L, 2)))
  }

  test("boruvkaForest: equal supports resolve by the (u, v) total " +
      "order — the forest is still deterministic and acyclic") {
    val g = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L))
    assert(forestSet(GraphMining.boruvkaForest(wedgesDf(g))) == Set(
      (1L, 2L, 5L, 1), (1L, 3L, 5L, 1)))
  }

  test("boruvkaForest: the distributed rounds agree with a local " +
      "sequential Boruvka replay over the sf co-purchase graph, and " +
      "the forest is acyclic") {
    val wedges = GraphMining
      .copurchaseWeightedEdges(graft.Tables(spark, sfDir, "lineitem"))
      .collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("support")))
      .toSeq
    assert(wedges.nonEmpty)
    // local replay: same total order, same min-label contraction
    var lbl = wedges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> n).toMap
    val expected = scala.collection.mutable.Set.empty[(Long, Long, Long, Int)]
    for (k <- 1 to GraphMining.MstRounds) {
      val cross = wedges.filter(e => lbl(e._1) != lbl(e._2))
      val picks = cross.flatMap(e => Seq(lbl(e._1) -> e, lbl(e._2) -> e))
        .groupBy(_._1).values
        .map(_.map(_._2).minBy(e => (-e._3, e._1, e._2))).toSet
      picks.foreach(e => expected += ((e._1, e._2, e._3, k)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      picks.foreach { e =>
        val (a, b) = (find(lbl(e._1)), find(lbl(e._2)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      lbl = lbl.map { case (n, l) => n -> find(l) }
    }
    val got = forestSet(GraphMining.graphMst(spark, sfDir))
    assert(got == expected.toSet,
      s"forest mismatch: ${got.size} vs replay ${expected.size}")
    // acyclic: edges never reach node count within any merged group
    val nNodes = lbl.size
    val nComponents = lbl.values.toSet.size
    assert(got.size <= nNodes - nComponents,
      s"cycle: ${got.size} edges, $nNodes nodes, $nComponents components")
  }

  test("weightedPaths: a cheap multi-hop route beats the direct weak " +
      "edge, and the horizon caps reach at WpRounds edges") {
    import spark.implicits._
    // costs: support 1000 → 1 + 1000 div 1000 = 2; support 2 → 501.
    // hub 1 (deg 3) and nodes 2, 3 (deg 2, lowest ids) are the seeds.
    // seed 1 → 3: direct weak edge costs 501, the 2-hop strong route
    // 1-2-3 costs 4 — the distance tier must pick 4. node 8 sits 5
    // edges from every seed → past WpRounds=4, must NOT count.
    val w = Seq((1L, 2L, 1000L), (1L, 3L, 2L), (1L, 4L, 1000L),
      (2L, 3L, 1000L), (4L, 5L, 1000L), (5L, 6L, 1000L),
      (6L, 7L, 1000L), (7L, 8L, 1000L)).toDF("u", "v", "support")
    val out = GraphMining.weightedPaths(w).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_reached"),
          r.getAs[Long]("sum_cost"), r.getAs[Long]("min_cost"),
          r.getAs[Long]("max_cost")))).toMap
    // seed 1: {2:2, 3:4, 4:2, 5:4, 6:6, 7:8}; seed 2: {1:2, 3:2,
    // 4:4, 5:6, 6:8}; seed 3: {2:2, 1:4, 4:6, 5:8, 6:507} — note 6:
    // within the 4-edge horizon only the weak direct edge reaches it
    // (3-1-4-5-6 = 501+2+2+2); the strong detour 3-2-1-4-5-6 needs a
    // 5th edge, exactly the ≤-WpRounds-edges semantics
    assert(out == Map(
      1L -> ((3L, 6L, 26L, 2L, 8L)),
      2L -> ((2L, 5L, 22L, 2L, 8L)),
      3L -> ((2L, 5L, 527L, 2L, 507L))))
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
