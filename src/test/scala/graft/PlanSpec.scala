package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan invariants for headline operators (SURVEY.md §5):
  * filters reach the parquet scan, column pruning holds, dimension
  * joins broadcast, and the sessionize window/agg share one shuffle.
  * These are the properties that keep the plans viable at 100 TB, so
  * they're pinned as tests, not left to chance.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("q1_agg: shipdate filter pushed into scan, columns pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // scan must not read all 11 lineitem columns for a 6-column agg
    val out = p.linesIterator.find(_.startsWith("Output")).get
    assert(out.startsWith("Output [6]"), s"expected 6-column scan, got: $out")
  }

  test("q3_shipping: selective customer filter pushed + dimension broadcast") {
    val p = plan("q3_shipping")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "customer segment filter must reach the scan")
    assert(p.contains("BroadcastHashJoin"),
      "filtered customer dim must broadcast")
  }

  test("join_broadcast: no sort-merge join anywhere") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "dimension joins must be broadcast, not shuffled")
  }

  test("sessionize: window and session agg share one shuffle") {
    val p = plan("sessionize")
    // exchanges: one for the user_id window (+1 for the final
    // deterministic orderBy) — the groupBy must reuse the window's
    // user_id partitioning rather than shuffle again
    val n = countOccurrences(p, "+- Exchange")
    assert(n <= 2, s"expected <=2 exchanges (window + final sort), got $n\n$p")
  }

  test("mm_meta / text ops: single-pass, no shuffle before the final sort") {
    for (q <- Seq("mm_meta", "text_tokens", "text_fingerprint")) {
      val p = plan(q)
      val n = countOccurrences(p, "+- Exchange")
      assert(n <= 1, s"$q should only shuffle for the final sort, got $n")
    }
  }

  test("decontaminate: eval side broadcasts, corpus side never shuffles raw") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark shingle set must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the corpus side must not shuffle into a sort-merge join")
  }

  test("text_entropy: map-only, the sole exchange is the final sort") {
    val p = plan("text_entropy")
    val n = countOccurrences(p, "+- Exchange")
    assert(n <= 1, s"char_entropy must not shuffle characters, got $n")
  }

  test("q13_custdist: no nested-loop join for the outer join") {
    val p = plan("q13_custdist")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "equi outer join must hash- or merge-join")
  }

  test("stream_join (batch mode): interval predicate stays in the hash join") {
    val p = plan("stream_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "user_id equi-key must drive a real join, not a cartesian")
    assert(!p.contains("CartesianProduct"))
  }

  test("q6_revenue: every predicate pushed, two-column scan") {
    val p = plan("q6_revenue")
    for (f <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(p.contains(s"IsNotNull($f)"), s"$f must reach PushedFilters")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    val out = p.linesIterator.find(_.startsWith("Output")).get
    assert(out.startsWith("Output [4]"),
      s"scan must read only the filter+agg columns, got: $out")
  }

  test("q14_promo / q5_local_supplier: dims broadcast, facts never do") {
    for (q <- Seq("q14_promo", "q5_local_supplier")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: dims must broadcast")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian")
    }
  }

  test("q42-style aggregate pushdown: q1_agg partial-aggregates map-side") {
    val p = plan("q1_agg")
    assert(countOccurrences(p, "HashAggregate") >= 2,
      "sum/avg must partial-aggregate before the exchange")
  }

  test("text_repetition: map-only, the sole exchange is the final sort") {
    val p = plan("text_repetition")
    val n = countOccurrences(p, "+- Exchange")
    assert(n <= 1, s"run folds must not shuffle tokens, got $n")
  }

  test("win_hopping: one shuffle on (window, type), no join anywhere") {
    val p = plan("win_hopping")
    val n = countOccurrences(p, "+- Exchange")
    assert(n <= 2, s"expected agg + final-sort exchanges only, got $n")
    assert(!p.contains("Join"), "hop expansion must be map-side, not a join")
  }

  test("corpus_sample: rate table broadcasts, corpus never shuffles raw") {
    val p = plan("corpus_sample")
    assert(p.contains("BroadcastHashJoin"),
      "the O(sources) rate table must broadcast back")
    assert(!p.contains("SortMergeJoin"),
      "the corpus side must not shuffle into the rate join")
  }

  test("dedup_segments: exchanges key on the segment hash / doc rollup only") {
    val p = plan("dedup_segments")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "segment dedup must never form doc pairs")
  }

  test("graph_pagerank: iterations read a local relation, not the fact scan") {
    val p = plan("graph_pagerank")
    // the transition matrix is driver-materialized: the lineitem scan
    // must appear ZERO times in the final plan (edges were consumed at
    // build time), leaving only frontier-sized joins
    assert(!p.contains("lineitem"),
      "unrolled iterations must not replay the fact-table subtree")
  }

  // ---- TPC-H family q2-q22: the invariants that keep these shapes
  // viable at 100 TB, pinned per query so a regression (a lost
  // pushdown, a join degrading to cartesian) fails CI, not the bench.

  private val tpchFamily = Seq(
    "q2_min_cost_supp", "q8_market_share", "q9_profit",
    "q11_important_stock", "q12_shipmode", "q15_top_supplier",
    "q16_parts_supp", "q17_small_qty", "q19_disjunctive",
    "q20_potential_promo", "q21_waiting", "q22_global_sales")

  test("q2-q22: every scan pushes filters, dims broadcast, no cartesian") {
    for (q <- tpchFamily) {
      val p = plan(q)
      assert(!p.contains("PushedFilters: []"),
        s"$q: a scan lost its pushed filters")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian")
      assert(p.contains("BroadcastHashJoin"),
        s"$q: dimension joins must broadcast")
    }
  }

  test("q11/q22: nested-loop joins only against one-row aggregates") {
    // the documented pattern: a scalar threshold (one row) broadcast
    // back — O(1) build side at any scale. More than the known two
    // means a real join degraded.
    for (q <- Seq("q11_important_stock", "q22_global_sales"))
      assert(countOccurrences(plan(q), "BroadcastNestedLoopJoin") <= 2,
        s"$q: unexpected nested-loop join beyond the scalar-threshold pair")
  }

  test("q18_large_orders: no forced broadcast on the fact-derived HAVING set") {
    // the HAVING key set is SF-linear: a broadcast HINT would OOM at
    // 100 TB. Size-based planning may still CHOOSE broadcast at test
    // SF — what must never return is the unconditional hint.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val hints = SparkEntry.queries("q18_large_orders")(spark, sfDir)
      .queryExecution.optimizedPlan
      .collect { case j: Join => j.hint }
    assert(hints.forall(h => h.leftHint.isEmpty && h.rightHint.isEmpty),
      s"q18 must leave join strategy to size estimates/AQE, got $hints")
  }

  test("corpus_pipeline: persisted clean frame reused, anti-joins broadcast") {
    val p = plan("corpus_pipeline")
    // the 7-stage pipeline persists the cleaned/gated frame once and
    // every later stage (decontaminate, fingerprint, dedup-drop) reads
    // the cache — the documents parquet must never rescan per stage
    assert(p.contains("InMemoryTableScan"),
      "clean/gate persist point must be active")
    // decontaminate and the dup-drop are anti-joins against broadcast
    // sets (eval shingles, dup doc ids) — at 100 TB the corpus side
    // must stay map-side, never shuffle into a sort-merge anti-join
    assert(countOccurrences(p, "BroadcastHashJoin LeftAnti") >= 2,
      "decontaminate + dup-drop must be broadcast anti-joins")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus-side must never shuffle raw docs into a join")
  }

  test("abc_pareto: cumulative share runs partitioned, off one cached scan") {
    val p = plan("abc_pareto")
    // the O(parts) running sum must be partition-parallel: its window
    // spec carries the range-partition id, never a bare global order
    assert("sum\\(rev_d#\\d+\\) windowspecdefinition\\(pid#".r
      .findFirstIn(p).isDefined,
      "rev_d cumulative window must be partitioned by pid")
    // both branches (offsets + rows) must read the persisted range
    // exchange, not re-run the lineitem aggregate (the explain text
    // repeats the cached subtree under each InMemoryTableScan — that's
    // printing, not re-execution)
    assert(p.contains("InMemoryTableScan"),
      "offsets and row branches must share the cached ranged frame")
  }

  test("dedup_semantic: cluster-scoped pairs equi-join on cell_id, " +
      "never a cartesian") {
    val p = plan("dedup_semantic")
    // the whole point of SemDeDup over D5: the pair pass must key on
    // cell_id (sort-merge or shuffled-hash), not enumerate all pairs
    assert(!p.contains("CartesianProduct"),
      "pair generation must not be a cartesian product")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "within-cluster pairs must be an equi join on cell_id")
  }

  test("emb_hard_negatives: anchors broadcast, corpus never shuffles") {
    val p = plan("emb_hard_negatives")
    // the label-inequality predicate forces a nested-loop join — fine
    // ONLY because the build side is the broadcast 10-anchor frame
    assert(p.contains("BroadcastNestedLoopJoin"),
      "anchor set must broadcast against the corpus scan")
    // exchanges: the q_id top-k window + the final (q_id, rank) sort;
    // the corpus-sized side must not shuffle anywhere else
    val n = countOccurrences(p, "+- Exchange")
    assert(n <= 2, s"expected <=2 exchanges (window + sort), got $n\n$p")
  }

  test("ts_changepoint: events scan pruned to the two used columns") {
    val p = plan("ts_changepoint")
    val out = p.linesIterator.find(_.startsWith("Output")).get
    assert(out.startsWith("Output [2]"),
      s"daily-count scan must read only (ts, event_type), got: $out")
  }

  test("ann_mmr: greedy runs in one cogroup, candidates broadcast-scan " +
      "onto the bounded-heap top-C") {
    val p = plan("ann_mmr")
    // the greedy loop must be the single CoGroup — not unrolled joins
    assert(p.contains("CoGroup"), "greedy selection must be one cogroup")
    // candidate generation: corpus scanned once against BROADCAST
    // queries; the top-C candidate cut is the H5 bounded heap (r13 —
    // even WindowGroupLimit's pushed rank limit still fully sorts
    // every candidate partition)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query set must broadcast against the corpus scan")
    assert(countOccurrences(p, "TopK (") >= 2,
      s"candidate top-C must be partial+final TopKExec, plan:\n$p")
    assert(!p.contains("WindowGroupLimit") && !p.contains(" Window "),
      "no rank-filter window may survive in the candidate cut")
    assert(!p.contains("CartesianProduct"))
  }

  test("r13 rerank-pool sweep: every retrieve-then-rerank arm selects " +
      "its pool on TopKExec, no corpus-scale rank window") {
    // the ten r12-weak sites + the eval tier; each pool cut must plan
    // partial+final TopKExec. Keys whose plans legitimately retain
    // windows over BOUNDED frames (probeCells' queries×cells frame,
    // hybrid's per-arm limit-N ranks) assert only the TopK presence;
    // the pure brute-force arms also pin the absence of any window.
    val noWindowKeys = Seq("ann_quantized", "ann_bq", "ann_pq",
      "ann_pq_balanced", "ann_opq", "emb_hard_negatives",
      "mm_embed_topk", "ann_filtered_eval")
    val topkOnlyKeys = Seq("ann_ivfq", "ann_ivfpq", "ann_ivfopq",
      "hybrid_mmr_multi")
    for (q <- noWindowKeys ++ topkOnlyKeys) {
      val p = plan(q)
      assert(countOccurrences(p, "TopK (") >= 2,
        s"$q: expected partial+final TopKExec, plan:\n${p.take(3000)}")
      if (noWindowKeys.contains(q))
        assert(!p.contains("WindowGroupLimit") && !p.contains(" Window "),
          s"$q: rank-filter window survived the r13 TopK sweep")
    }
  }

  test("sample_pergroup: bounded-heap TopKExec, never a full window sort") {
    val p = plan("sample_pergroup")
    // the sampler must plan on the H5 operator (partial map-side heap
    // + final heap after the lang shuffle), not sort every doc per
    // language to keep 10 — that window spelling is a corpus-wide
    // sort at 100 TB
    assert(countOccurrences(p, "TopK (") >= 2,
      s"expected partial+final TopKExec, plan:\n$p")
    assert(!p.contains(" Window "),
      "sampler must not fall back to a window sort")
  }

  test("events_attribution: one user exchange, no inequality join") {
    val p = plan("events_attribution")
    // the touch-carry window and purchase filter share the single
    // (user_id) exchange; attribution must never plan a theta join
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "attribution must not plan an inequality join")
    // FormattedMode prints each node in the tree AND the detail list,
    // so count unique numbered operators
    val nExchanges = "\\((\\d+)\\) Exchange".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nExchanges <= 3,
      s"expected user exchange + agg/sort exchanges only, got $nExchanges")
  }

  test("emb_matryoshka_eval: every truncated arm broadcasts the query side") {
    val p = plan("emb_matryoshka_eval")
    // 4 truncated arms each broadcast the 10-row query frame against
    // the corpus scan (the full-dim ground truth is collected once,
    // not replayed per union branch); the corpus never shuffles into
    // a join build side
    val nBnlj = "\\((\\d+)\\) BroadcastNestedLoopJoin".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nBnlj == 4, s"each arm must be a broadcast-query scan, got $nBnlj")
    assert(!p.contains("SortMergeJoin"),
      "no corpus-sized join side may shuffle in the eval")
  }

  test("ann_ivf_indexed: probe filter prunes at the index scan") {
    val p = plan("ann_ivf_indexed")
    assert(p.replaceAll("\n", " ")
      .matches(".*PartitionFilters: \\[[^\\]]*cell_id[^\\]]*\\].*"),
      "probed-cells IN-list must land in PartitionFilters")
  }

  test("graph_triangles: every join is an equi hash join — no " +
      "cartesian/theta fallback anywhere in the wedge plan") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "wedge + closing joins must stay equi-joins")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k head must not globally sort the node table")
  }

  test("skyline_pareto: the only global-order pass runs over the " +
      "collapsed per-price frame, never the part table") {
    val p = plan("skyline_pareto")
    val nWin = "\\((\\d+)\\) Window".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nWin == 1, s"expected exactly one window pass, got $nWin")
    // the staircase window's SinglePartition exchange must consume the
    // price-collapsed HashAggregate, not a fact-scale frame — in the
    // tree, Window sits directly over Sort < Exchange < HashAggregate
    assert(p.contains("SinglePartition"),
      "staircase window needs its global frame")
    assert(p.replaceAll("\\s+", " ").matches(
      ".*Window \\(\\d+\\) \\+- Sort \\(\\d+\\) \\+- Exchange \\(\\d+\\)" +
        " \\+- HashAggregate.*"),
      s"window must consume the collapsed per-price aggregate:\n$p")
    // the O(distinct prices) frame broadcasts back; the part scan
    // never shuffles into the join
    assert(p.contains("BroadcastHashJoin"),
      "staircase frame must broadcast back to the fact side")
  }

  test("events_paths: lead window and path count share two exchanges, " +
      "head is TakeOrderedAndProject") {
    val p = plan("events_paths")
    val nEx = "\\((\\d+)\\) Exchange".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nEx <= 2,
      s"expected user window + path agg exchanges only, got $nEx")
    assert(p.contains("TakeOrderedAndProject"),
      "path head must not globally sort the path table")
  }

  test("skyline_3d: the only nested-loop join is the frontier-sized " +
      "candidate anti-join; local phase is one mapPartitions pass") {
    val p = plan("skyline_3d")
    val nBnlj = "\\((\\d+)\\) BroadcastNestedLoopJoin".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nBnlj == 1, s"expected exactly the candidate anti-join, got $nBnlj")
    assert(p.contains("BroadcastNestedLoopJoin LeftAnti"),
      "phase-2 verify must be the broadcast anti join")
    assert(p.contains("MapPartitions"),
      "phase-1 local candidates must be the single imperative pass")
  }

  test("orders_basket_rules: the only nested-loop join is the one-row " +
      "scalar broadcast; head on TakeOrderedAndProject") {
    val p = plan("orders_basket_rules")
    val nBnlj = "\\((\\d+)\\) BroadcastNestedLoopJoin".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nBnlj <= 1, s"only the N scalar may nested-loop, got $nBnlj")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "rule head must not globally sort the rule table")
  }

  test("graph_components / etl_k_anonymity / etl_dp_counts: no " +
      "cartesian anywhere; the privacy/DP frames stay one fact " +
      "shuffle + collapsed-frame work") {
    assert(!plan("graph_components").contains("CartesianProduct"))
    for (q <- Seq("etl_k_anonymity", "etl_dp_counts")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("Join"),
        s"$q must be join-free")
      val nEx = "\\((\\d+)\\) Exchange".r
        .findAllMatchIn(p).map(_.group(1)).toSet.size
      assert(nEx <= 3,
        s"$q: expected fact agg + collapsed frame + sort, got $nEx exchanges")
    }
  }

  test("text_keyphrases: equi-joins only, ranked head on " +
      "TakeOrderedAndProject") {
    val p = plan("text_keyphrases")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "word-score join must stay an equi join")
    assert(p.contains("TakeOrderedAndProject"),
      "phrase head must not globally sort the phrase table")
  }

  test("mm_shard_pack: one stream repartition feeds the pack; the " +
      "manifest agg adds at most two more exchanges") {
    val p = plan("mm_shard_pack")
    val nEx = "\\((\\d+)\\) Exchange".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nEx <= 3, s"expected stream + agg + sort exchanges, got $nEx")
    assert(p.contains("MapPartitions"),
      "greedy pack must be the single imperative pass")
  }

  test("events_attribution_decay: one user exchange, no inequality " +
      "join — the in-horizon touch set rides the range window") {
    val p = plan("events_attribution_decay")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "decay attribution must never plan a theta join")
    // one user exchange; the distinct-agg pair, final agg, and sort
    // all run over the O(touch-types) collapsed frame
    val nEx = "\\((\\d+)\\) Exchange".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nEx <= 5,
      s"expected user + distinct-pair + agg + sort exchanges, got $nEx")
  }

  test("ts_seasonal: windows run over the collapsed daily frame and " +
      "the weekday-effect join broadcasts") {
    val p = plan("ts_seasonal")
    assert(p.contains("BroadcastHashJoin"),
      "O(types × 7) seasonal frame must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "seasonal join must never shuffle the daily frame")
    // events scan reads only the three columns the daily agg needs
    val out = p.linesIterator.find(_.startsWith("Output")).get
    assert(out.startsWith("Output [3]"), s"expected 3-column scan: $out")
  }

  test("anon_l_diversity: one fact exchange — the second collapse " +
      "rides the first groupBy's partitioning") {
    val p = plan("anon_l_diversity")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the audit is aggregation-only")
    // customer scan prunes to the three QI/sensitive columns
    val out = p.linesIterator.find(_.startsWith("Output")).get
    assert(out.startsWith("Output [3]"), s"expected 3-column scan: $out")
  }

  test("etl_erasure_plan: one map-side-combined fact exchange — the " +
      "planning scan never joins") {
    val p = plan("etl_erasure_plan")
    assert(!p.contains("Join"), "the audit is aggregation-only")
    // events scan prunes to (ts, user_id)
    val out = p.linesIterator.find(_.startsWith("Output")).get
    assert(out.startsWith("Output [2]"), s"expected 2-column scan: $out")
  }

  test("graph_kcore: every peel round is equi-semi-joins — no " +
      "cartesian anywhere, lineage cut per round") {
    val p = plan("graph_kcore")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "peel rounds must stay hash semi-joins")
    // the final plan reads the round-3 checkpoint, not rounds 1–2
    assert(p.contains("Scan ExistingRDD"),
      "per-round localCheckpoint must truncate lineage")
  }

  test("etl_bitemporal: both knowledge points resolve in ONE fact " +
      "aggregate; the only nested loop is the one-row bounds broadcast") {
    val p = plan("etl_bitemporal")
    val nBnlj = "\\((\\d+)\\) BroadcastNestedLoopJoin".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nBnlj == 1, s"expected the scalar-bounds broadcast, got $nBnlj")
    assert(!p.contains("SortMergeJoin"),
      "the correction report must never shuffle-join")
    // bounds agg + user agg + sort — never two fact passes
    val nEx = "\\((\\d+)\\) Exchange".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(nEx <= 4, s"expected bounds/user/sort exchanges, got $nEx")
  }

  test("graph_jaccard_links: equi joins only, ranked head on " +
      "TakeOrderedAndProject") {
    val p = plan("graph_jaccard_links")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "wedge/degree/anti joins must stay equi joins")
    assert(p.contains("TakeOrderedAndProject"),
      "link head must not globally sort the candidate table")
  }

  test("corpus_dsir: the O(buckets) stats frame broadcasts — tokens " +
      "never shuffle for the weight join") {
    val p = plan("corpus_dsir")
    assert(p.contains("BroadcastHashJoin"),
      "bucket-stats join must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the token frame must never sort-merge")
  }

  test("corpus_dsir_select: the weighted-sample head is a bounded " +
      "top-k, never a global corpus sort") {
    val p = plan("corpus_dsir_select")
    assert(p.contains("TakeOrderedAndProject"),
      "Gumbel-top-k must reduce via TakeOrderedAndProject")
    assert(!p.contains("SortMergeJoin"),
      "stats/source joins must stay broadcast")
  }

  test("agg_exact_median: both phases collapse map-side — the only " +
      "range shuffle is the final presentation sort") {
    val p = plan("agg_exact_median")
    // phase-1 exchange keys on the COLLAPSED (group, bucket) pair,
    // never a row-level or sort shuffle of the fact stream
    assert(p.contains("hashpartitioning(event_type"),
      "bucket counts must partial-aggregate before the shuffle")
    assert(countOccurrences(p, "rangepartitioning") == 1,
      "a second range shuffle means a global sort leaked in")
  }

  test("cohort_ltv / events_streaks: one fact shuffle, broadcast " +
      "rollups, no cartesian") {
    val p1 = plan("cohort_ltv")
    assert(p1.contains("BroadcastExchange"),
      "cohort sizes must broadcast, not shuffle-join")
    assert(!p1.contains("CartesianProduct"))
    assert(countOccurrences(p1, "rangepartitioning") == 1)
    val p2 = plan("events_streaks")
    assert(countOccurrences(p2, "rangepartitioning") == 1,
      "islands must key on user_id hash, not a global day sort")
    assert(!p2.contains("CartesianProduct"))
  }

  test("dedup_substring: window hashes shuffle on the 8-byte hash, " +
      "dup rollup broadcasts back, no cartesian") {
    val p = plan("dedup_substring")
    assert(p.contains("rolling_win_hashes"),
      "the H14 kernel must be the window source")
    assert(p.contains("hashpartitioning(wh#"),
      "corpus-wide grouping must key on the window hash")
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "the O(docs) dup rollup must broadcast to the stats branch")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(countOccurrences(p, "rangepartitioning") == 1,
      "only the final presentation sort may range-shuffle")
  }

  test("dedup_substring_pairs: pairs generate via a hash equi join " +
      "inside capped groups, top-20 is a bounded take") {
    val p = plan("dedup_substring_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must never materialize a global sort")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the self-join must stay an equi join on the window hash")
  }

  test("dedup_incremental: intake scores against the store via " +
      "hash-keyed SEMI joins — the store side never fans out") {
    val p = plan("dedup_incremental")
    assert(p.contains("rolling_win_hashes"),
      "the H14 kernel must be the window source")
    assert(p.contains("LeftSemi"),
      "store membership must be a semi join (no store row duplication)")
    assert(p.contains("hashpartitioning(wh#"),
      "the window-hit join must key on the 8-byte window hash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_hot_spans: groups key on the hash, window text " +
      "materializes only for dup groups, top-20 is a bounded take") {
    val p = plan("dedup_hot_spans")
    assert(p.contains("rolling_win_hashes"),
      "the H14 kernel must be the window source")
    assert(p.contains("hashpartitioning(wh#"),
      "corpus-wide grouping must key on the window hash")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must never materialize a global sort")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus_novelty: shingles shuffle as 8-byte hashes, the " +
      "source-degree window keys on the hash, no cartesian") {
    val p = plan("corpus_novelty")
    assert(p.contains("xxhash64"),
      "shingle strings must compress to hashes before the wide shuffle")
    assert(p.contains("hashpartitioning(g#"),
      "the degree window must key on the shingle hash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("tokenize_fertility: the merge dictionary broadcasts into the " +
      "corpus token stream, rollup collapses map-side") {
    val p = plan("tokenize_fertility")
    assert(p.contains("BroadcastHashJoin"),
      "the dictionary must broadcast into the token stream")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("decontaminate_report: the eval side broadcasts, only matches " +
      "shuffle, no corpus self-join") {
    val p = plan("decontaminate_report")
    assert(p.contains("BroadcastHashJoin"),
      "the bench shingles must broadcast into the corpus scan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("vocab_growth: one-row span broadcasts (the only nested-loop " +
      "join), first occurrences shuffle on the token, cumulatives on " +
      "the 10-row spine") {
    val p = plan("vocab_growth")
    assert(p.contains("hashpartitioning(tk#"),
      "token first-occurrence must be one token-keyed shuffle")
    assert(!p.contains("CartesianProduct"))
    // the two span crossJoins are one-row broadcasts — allowed (each
    // appears twice in FormattedMode: tree + detail); nothing
    // corpus-sized may nested-loop beyond them
    assert(countOccurrences(p, "BroadcastNestedLoopJoin") <= 4)
  }

  test("emb_drift_cells: centroids and totals broadcast, the cell " +
      "rollup keys on cell_id") {
    val p = plan("emb_drift_cells")
    assert(p.contains("BroadcastExchange"),
      "centroids/totals must broadcast, never shuffle the corpus")
    assert(p.contains("hashpartitioning(cell_id#"),
      "the per-cell rollup must key on cell_id")
    assert(!p.contains("CartesianProduct"))
  }

  test("bpe_encode: the dictionary broadcasts; the corpus pass is " +
      "one generate + join, no corpus self-join") {
    val p = plan("bpe_encode")
    assert(p.contains("BroadcastHashJoin"),
      "the vocab dictionary must broadcast into the token stream")
    assert(!p.contains("SortMergeJoin"),
      "the corpus-sized side must never shuffle for the dict join")
    assert(!p.contains("CartesianProduct"))
  }

  test("link_blocking: the verify chain is equi-joined and " +
      "column-pruned; only the small MATCHED frame is checkpointed, " +
      "so the presentation sort samples megabytes") {
    // the chain plan (pre-checkpoint): candidate generation and both
    // verify joins are keyed; scans prune to the four used columns
    val chain = graft.operators.CurationOps
      .linkPairPlanFrame(graft.Tables(spark, sfDir, "part"))
      .queryExecution.explainString(FormattedMode)
    assert(!chain.contains("CartesianProduct") &&
      !chain.contains("BroadcastNestedLoopJoin"),
      "blocking must never degrade to an unkeyed pair join")
    assert(chain.contains("Scan parquet"),
      "the chain reads the column-pruned source directly")
    assert(!chain.contains("p_retailprice") &&
      !chain.contains("p_container") && !chain.contains("p_size"),
      "part columns the chain never touches must prune out of every scan")
    // the registered query: a sort over the checkpointed matched
    // frame — the range partitioner's sampling pass must NOT re-run
    // the verify chain (r14: the r13 candidate-set checkpoint made
    // that sampling pass read 7.9 GB twice at factor 100)
    val p = plan("link_blocking")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD")
      || p.contains("ExistingRDD"),
      s"the sort must read the checkpointed matched frame:\n$p")
    assert(!p.contains("Scan parquet"),
      "no source re-scan above the matched checkpoint")
  }

  test("emb_knn_graph: the quadratic scoring pass runs once — the " +
      "mutuality join reads the checkpointed O(n·k) frame") {
    // mutualKnn checkpoints the directed top-k before the self-join,
    // so the executed mutuality plan must contain NO scoring subtree
    // (the checkpoint truncates lineage → no BNLJ at all here)
    val p = plan("emb_knn_graph")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "self-join must read the checkpointed frame, not re-score")
    assert(!p.contains("CartesianProduct"),
      "mutuality must stay an equi join")
  }

  test("dedup_minhash_lsh: the band join's broadcast→shuffle " +
      "transition (the factor-100 probe's plan change) stays a keyed " +
      "equi join with identical results — never cartesian") {
    // sf-corpus plan: the band frame is small, so broadcasting one
    // self-join side is the RIGHT plan here — pin its shape
    val base = plan("dedup_minhash_lsh")
    assert(!base.contains("CartesianProduct") &&
      !base.contains("BroadcastNestedLoopJoin"),
      "band candidates must join on (band, bucket) equi keys")
    val baseRows = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(_.toString).toSet
    // above the bound: at 100 TB the band frame's size estimate
    // exceeds ANY broadcast threshold, so the planner loses the
    // broadcast option entirely — threshold -1 reproduces exactly
    // that planner state on the sf corpus
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      val p = df.queryExecution.explainString(FormattedMode)
      assert(!p.contains("BroadcastHashJoin"),
        "above-bound plan must not plan any broadcast hash join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "the band join must become a shuffle equi join above the bound")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "losing broadcast must never degrade to an unkeyed pair join")
      // and the transition is results-invariant: the shuffle plan
      // emits exactly the broadcast plan's verified pairs
      assert(df.collect().map(_.toString).toSet == baseRows,
        "broadcast and shuffle band plans must agree row-for-row")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
