package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationOpsSpec extends SparkSpec {

  test("text_vocab_kl: KL is non-negative everywhere, zero for a " +
      "source matching the blend, large for a lexical outlier") {
    import spark.implicits._
    // two sources with IDENTICAL token distributions and one speaking
    // a disjoint vocabulary — the outlier must dominate the ranking
    val docs = Seq(
      ("a", "x x y z"), ("a", "x y"),
      ("b", "x x y z"), ("b", "x y"),
      ("c", "q q r s q r")
    ).toDF("source", "text")
    val out = CurationOps.vocabKl(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Double]("kl") >= 0.0,
        s"negative KL for ${r.getAs[String]("source")}")
    }
    assert(out("a").getAs[Double]("kl") == out("b").getAs[Double]("kl"))
    assert(out("c").getAs[Double]("kl") > out("a").getAs[Double]("kl"))
    assert(out("c").getAs[Long]("n_tokens") == 6)
    // realized vocab (7 distinct tokens) < VocabK: every token is
    // in-vocab, so the OOV bucket is empty for every source
    out.values.foreach(r => assert(r.getAs[Long]("n_oov") == 0))
  }

  test("text_vocab_kl: sf corpus scores are non-negative and " +
      "deterministic") {
    val a = CurationOps.textVocabKl(spark, sfDir).collect()
    val b = CurationOps.textVocabKl(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach(r => assert(r.getAs[Double]("kl") >= 0.0))
  }

  test("text_vocab_kl_lang: the (source, lang) slice stays " +
      "non-negative and refines the source-level rows") {
    val fine = CurationOps.textVocabKlLang(spark, sfDir).collect()
    val coarse = CurationOps.textVocabKl(spark, sfDir).collect()
    assert(fine.nonEmpty)
    fine.foreach(r => assert(r.getAs[Double]("kl") >= 0.0))
    // every source appears in the fine slicing, and per-source token
    // mass is conserved across its language slices
    val fineBySrc = fine.groupBy(_.getString(0))
    assert(fineBySrc.keySet == coarse.map(_.getString(0)).toSet)
    coarse.foreach { c =>
      val slices = fineBySrc(c.getString(0))
      assert(slices.map(_.getAs[Long]("n_tokens")).sum ==
        c.getAs[Long]("n_tokens"))
    }
  }

  test("interval_join_bucketed: the bucket trick yields a hash join, " +
      "never a nested loop") {
    val p = CurationOps.intervalJoinBucketed(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    // without the bucket equi-key this plan is a BroadcastNestedLoopJoin
    // (O(n·m) at scale) — the operator exists to make it a hash join
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"interval join degraded to a product:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
  }

  test("interval_join_bucketed: equals the naive range predicate join") {
    import spark.implicits._
    val bucketed = CurationOps.intervalJoinBucketed(spark, sfDir)
    val orders = graft.Tables(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val naive = orders.join(graft.Tables(spark, sfDir, "lineitem"),
        to_date(col("l_shipdate")).between(to_date(col("o_orderdate")),
          date_add(to_date(col("o_orderdate")), 6)))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipments"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
    assert(bucketed.count() == naive.count())
    assert(bucketed.join(naive,
      Seq("o_orderkey", "n_shipments", "sum_qty")).count() == naive.count())
  }

  test("dedup_containment: a strict subset document scores 10000 bp") {
    import spark.implicits._
    // doc 2 is a strict prefix of doc 1 → every shingle of 2 is in 1
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally unrelated words only here nothing shared"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("contain")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // reuse the other tables from sfDir? containment only reads documents
    val out = CurationOps.dedupContainment(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq == Seq((2L, 1L, 10000L)))
  }

  test("vocab_coverage: an all-in-vocab doc is 0 bp; oov counts exact") {
    val out = CurationOps.vocabCoverage(spark, sfDir)
    import spark.implicits._
    val rows = out.select("n_tokens", "n_oov", "oov_bp")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, oov, bp) =>
      assert(oov <= n && bp == oov * 10000 / n)
    }
  }

  test("etl_late_data: a constructed straggler is flagged with its lag") {
    import spark.implicits._
    val ev = Seq(
      // arrival order = event_id; user 1's third arrival is 30 min
      // behind its watermark
      (1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-01 11:00:00", 7L),
      (3L, "2024-01-01 10:30:00", 7L),
      (4L, "2024-01-01 10:59:00", 8L)) // within 10 min of wm: not late
      .toDF("event_id", "s", "user_id")
      // the driver's events layout stores ts as raw NANOSECOND longs
      // (parquet TIMESTAMP(NANOS)); Tables() floor-converts to micros
      .select(col("event_id"),
        (unix_micros(to_timestamp(col("s"))) * 1000L).as("ts"),
        col("user_id"), lit("t").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("late")
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = CurationOps.etlLateData(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq((7L, 3L, 1L, 1800L), (8L, 1L, 0L, 0L)))
  }

  test("etl_k_anonymity: tier semantics, nesting, and mass " +
      "conservation") {
    val out = CurationOps.etlKAnonymity(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, g, t) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_gen"),
        r.getAs[Int]("risk_tier"))
      assert(g >= n, "generalized group must contain the fine group")
      t match {
        case 0 => assert(n >= CurationOps.AnonK)
        case 1 => assert(n < CurationOps.AnonK && g >= CurationOps.AnonK)
        case 2 => assert(n < CurationOps.AnonK && g < CurationOps.AnonK)
        case other => fail(s"unknown tier $other")
      }
    }
    val total = graft.Tables(spark, sfDir, "customer").count()
    assert(out.map(_.getAs[Long]("n_users")).sum == total,
      "QI groups must partition the customer table")
  }

  test("etl_dp_counts: contribution bounding caps a heavy user, the " +
      "seeded noise replays locally, and the noise bound holds") {
    import spark.implicits._
    val t0 = 1704153600000L // 2024-01-02 UTC
    val heavy = (1 to 100).map(i =>
      (1L, new java.sql.Timestamp(t0 + i * 1000), "click"))
    val light = Seq((2L, new java.sql.Timestamp(t0 + 1000), "click"))
    val ev = (heavy ++ light).toDF("user_id", "ts", "event_type")
    val row = CurationOps.dpCounts(ev).collect()
    assert(row.length == 1)
    // capped: heavy user contributes DpCap=5, light user 1 -> 6
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("click:2024-01-02".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u16 = java.lang.Long.parseLong(md5.take(4), 16)
    val cen = (u16 + 0.5) / 65536.0 - 0.5
    val noise = -(CurationOps.DpCap / CurationOps.DpEps) *
      math.signum(cen) * math.log(1.0 - 2.0 * math.abs(cen))
    val expected = BigDecimal(6 + noise)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.head.getAs[Double]("released") == expected,
      s"got ${row.head.getAs[Double]("released")}, want $expected")
    // sf corpus: every release stays inside the maximum noise
    // magnitude b*ln(65536) of its capped count
    val out = CurationOps.etlDpCounts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        r.getAs[Double]("released")).toMap
    val capped = graft.Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(least(col("c"), lit(CurationOps.DpCap))).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        r.getAs[Long]("n")).toMap
    assert(out.keySet == capped.keySet && out.nonEmpty)
    val bound = (CurationOps.DpCap / CurationOps.DpEps) *
      math.log(65536.0) + 1e-6
    out.foreach { case (k, rel) =>
      assert(math.abs(rel - capped(k)) <= bound, s"$k noise out of bound")
    }
  }

  test("emb_whiten: whitened dims have ~0 mean and ~unit spread") {
    import spark.implicits._
    val out = CurationOps.embWhiten(spark, sfDir)
    val rows = out.select("w_norm", "z_max").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    // whitened norm concentrates around sqrt(dims)=8 for 64-dim data;
    // allow generous slack — this is a sanity envelope, not the oracle
    val avgNorm = rows.map(_._1).sum / rows.length
    assert(avgNorm > 6.0 && avgNorm < 10.0, s"avg w_norm=$avgNorm")
    rows.foreach { case (n, z) => assert(z > 0 && z <= n + 1e-9) }
  }

  test("anon_l_diversity: a homogeneous group fails, a mixed group " +
      "passes, and the modal share is floor-exact") {
    import spark.implicits._
    // nation 1 band 0: five customers, one segment → l=1, modal 100%
    // nation 1 band 1: four customers over three segments → l=3
    val customers = (
      Seq.fill(5)((1, 500.0, "AUTO")) ++
        Seq((1, 1500.0, "AUTO"), (1, 1500.0, "AUTO"),
          (1, 1500.0, "BUILDING"), (1, 1500.0, "HOUSEHOLD")))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
    val out = CurationOps.lDiversity(customers).collect()
      .map(r => r.getAs[Long]("band1") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("l_distinct"),
          r.getAs[Long]("modal_share_bp"), r.getAs[Boolean]("diverse")))
      .toMap
    assert(out(0L) == (5L, 1L, 10000L, false))
    assert(out(1L) == (4L, 3L, 5000L, true))
  }

  test("anon_t_closeness: a class mirroring the global distribution " +
      "scores EMD 0, a fully shifted class scores the max gap") {
    import spark.implicits._
    // global = 10×band0 + 10×band9 (m = 2, per-mille cum 500 / 1000);
    // n1 sits entirely in band0 (cum 1000/1000 → gap 500), n2 entirely
    // in band9 (cum 0/1000 → gap 500), n3 mirrors the global mix
    val customers = (
      Seq.fill(5)((1, 500.0, "SEG")) ++
        Seq.fill(5)((2, 9500.0, "SEG")) ++
        (Seq.fill(5)((3, 500.0, "SEG")) ++
          Seq.fill(5)((3, 9500.0, "SEG"))))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
    val out = CurationOps.tCloseness(customers).collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("emd_milli"),
          r.getAs[Boolean]("t_ok")))
      .toMap
    assert(out(1) == (5L, 500L, false))
    assert(out(2) == (5L, 500L, false))
    assert(out(3) == (10L, 0L, true))
  }

  test("anon_t_closeness: sf invariants — EMD within [0, 1000], class " +
      "sizes conserve the table, verdict matches the threshold") {
    val rows = CurationOps.anonTCloseness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables(spark, sfDir, "customer").count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == total)
    rows.foreach { r =>
      val emd = r.getAs[Long]("emd_milli")
      assert(emd >= 0 && emd <= 1000)
      assert(r.getAs[Boolean]("t_ok") == (emd <= CurationOps.TCloseMilli))
    }
  }

  test("anon_l_diversity: sf invariants — l ≤ group size, modal share " +
      "within (0, 10000], diverse ⇔ l ≥ AnonL") {
    val rows = CurationOps.anonLDiversity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l, bp) = (r.getAs[Long]("n_users"),
        r.getAs[Long]("l_distinct"), r.getAs[Long]("modal_share_bp"))
      assert(l >= 1 && l <= n)
      assert(bp > 0 && bp <= 10000)
      // the modal value covers at least 1/l of the group
      assert(bp >= 10000 / l - 1)
      assert(r.getAs[Boolean]("diverse") == (l >= CurationOps.AnonL))
    }
  }

  test("link_blocking: planted near-match found, sub-threshold and " +
      "cross-brand pairs excluded, oversized block capped") {
    import spark.implicits._
    val hub = (100L until 100L + CurationOps.BlockCap + 8).map(k =>
      (k, "ubiquitous filler", "Brand#9", "BULK"))
    val parts = (Seq(
      // near-match: 2 of 3 tokens shared -> milli-jaccard 666 >= 500,
      // found through the ("acme"|"corp", Brand#1) blocks
      (1L, "acme corp ltd", "Brand#1", "ECONOMY"),
      (2L, "acme corp", "Brand#1", "STANDARD"),
      // sub-threshold: 1 of 5 union -> 200 < 500, candidate but no match
      (3L, "acme widget gmbh", "Brand#1", "ECONOMY"),
      // same name, DIFFERENT brand: blocking never pairs it (by design)
      (4L, "acme corp ltd", "Brand#2", "ECONOMY"),
      // exact duplicate listing -> 1000
      (5L, "blue bolt", "Brand#3", "SMALL"),
      (6L, "blue bolt", "Brand#3", "LARGE")
    ) ++ hub).toDF("p_partkey", "p_name", "p_brand", "p_type")
    val out = CurationOps.linkBlockingOf(parts).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) -> r).toMap
    assert(out.keySet == Set((1L, 2L), (5L, 6L)),
      s"unexpected match set: ${out.keySet}")
    assert(out((1L, 2L)).getAs[Long]("milli_jaccard") == 666)
    assert(out((1L, 2L)).getAs[Int]("same_type") == 0)
    assert(out((5L, 6L)).getAs[Long]("milli_jaccard") == 1000)
    // the hub block ("ubiquitous"/"filler", Brand#9) exceeds BlockCap:
    // its identical-name listings produce NO candidates — the cap
    // dropped the block wholesale (asserted via the match set above)
  }

  test("link_entities: transitive match chain resolves to ONE entity " +
      "even when the endpoints miss the threshold; isolated pair and " +
      "unmatched records stay apart") {
    import spark.implicits._
    val parts = Seq(
      // chain: 1~2 (3/5 = 600) and 2~3 (3/5 = 600) match, but
      // 1~3 share only {alpha, beta} of 6 -> 333 < 500: transitivity
      // must still put all three in one entity labeled min id 1
      (1L, "alpha beta gamma delta", "Brand#1", "A"),
      (2L, "alpha beta gamma epsilon", "Brand#1", "B"),
      (3L, "alpha beta epsilon zeta", "Brand#1", "C"),
      // isolated exact pair -> its own entity
      (7L, "red rod", "Brand#2", "A"),
      (8L, "red rod", "Brand#2", "A"),
      // unmatched -> appears in NO entity (CC only sees edge nodes)
      (9L, "lone widget", "Brand#3", "A")
    ).toDF("p_partkey", "p_name", "p_brand", "p_type")
    // sanity: the endpoints are NOT a matched pair on their own
    val pairs = CurationOps.linkPairFrame(parts).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L), (7L, 8L)), s"got $pairs")
    val out = CurationOps.linkEntitiesOf(parts).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("entity_id"), r.getAs[Long]("entity_size")))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 7L, 8L),
      s"only linked records resolve, got ${out.keySet}")
    assert(out(1L) == (1L, 3L) && out(2L) == (1L, 3L) &&
      out(3L) == (1L, 3L), "the chain is one entity, min-id label 1")
    assert(out(7L) == (7L, 2L) && out(8L) == (7L, 2L))
  }

  test("link_survivorship: golden record per entity — name mode with " +
      "asc tiebreak, anchor type from the min-partkey member, exact " +
      "cent bounds, conflict width") {
    import spark.implicits._
    val parts = Seq(
      // one entity of three: names 2-1 split -> mode "acme corp kit";
      // anchor (min partkey 1) donates type "A"; prices 9.99/12.50/9.99
      (1L, "acme corp kit deluxe", "Brand#1", "A", 5, 9.99),
      (2L, "acme corp kit", "Brand#1", "B", 5, 12.50),
      (3L, "acme corp kit", "Brand#1", "B", 7, 9.99),
      // exact pair, names tie 1-1 -> lexicographically smaller wins
      (7L, "red rod z", "Brand#2", "C", 2, 3.00),
      (8L, "red rod y z", "Brand#2", "C", 2, 4.00)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
    val out = CurationOps.linkSurvivorshipOf(parts).collect()
      .map(r => r.getAs[Long]("entity_id") -> r).toMap
    assert(out.keySet == Set(1L, 7L))
    val e1 = out(1L)
    assert(e1.getAs[Long]("n_records") == 3)
    assert(e1.getAs[String]("name_golden") == "acme corp kit")
    assert(e1.getAs[String]("type_anchor") == "A")
    assert(e1.getAs[Long]("n_types") == 2)
    assert(e1.getAs[Long]("price_min_cents") == 999)
    assert(e1.getAs[Long]("price_max_cents") == 1250)
    val e7 = out(7L)
    assert(e7.getAs[Long]("n_records") == 2)
    assert(e7.getAs[String]("name_golden") == "red rod y z")
    assert(e7.getAs[Long]("n_types") == 1)
  }
}
