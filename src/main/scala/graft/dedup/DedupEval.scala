package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** D10 `dedup_lsh_eval` — banding-quality evaluation for the MinHash
  * LSH dedup, as data rather than a spec assertion (the dedup twin of
  * E22: band/row settings are THE knob a production dedup tunes, and
  * the tuning loop gates on exactly this report). Compares D3's
  * LSH-candidate pair set against D2's exhaustive inverted-index
  * ground truth at the same τ: recall measures pairs the banding never
  * collided (the only loss — both paths verify exact Jaccard, so
  * precision is 1.0 by construction, and the report proving that is
  * the point: a precision below 1 means the verify step broke).
  *
  * Cost shape: both arms are the existing operators unchanged; the
  * eval adds one (ia, ib)-keyed full-outer join over two already-small
  * pair sets and reduces to a single summary row.
  */
object DedupEval {

  def dedupLshEval(spark: SparkSession, dir: String): DataFrame =
    dedupLshEvalOf(graft.Tables(spark, dir, "documents"))

  /** [[dedupLshEval]]'s kernel on any (doc_id, text) frame. */
  def dedupLshEvalOf(docs: DataFrame): DataFrame = {
    val sh = Dedup.shingledOf(docs)
    val exact = Dedup.ngramJaccardPairsOf(sh, materialize = true)
      .select(col("ia"), col("ib"), lit(1).as("e"))
    val lsh = Dedup.minhashLshPairs(sh)
      .select(col("ia"), col("ib"), lit(1).as("l"))
    exact.join(lsh, Seq("ia", "ib"), "full_outer")
      .agg(
        sum(coalesce(col("e"), lit(0))).cast("long").as("n_exact_pairs"),
        sum(coalesce(col("l"), lit(0))).cast("long").as("n_lsh_pairs"),
        sum(when(col("e") === 1 && col("l") === 1, 1).otherwise(0))
          .cast("long").as("n_hits"))
      .select(
        col("n_exact_pairs"), col("n_lsh_pairs"), col("n_hits"),
        (col("n_exact_pairs") - col("n_hits")).as("n_missed"),
        round(col("n_hits") / col("n_exact_pairs").cast("double"), 4)
          .as("recall"),
        round(col("n_hits") / col("n_lsh_pairs").cast("double"), 4)
          .as("precision"))
  }

  /** The banding sweep grid: bands ∈ SweepBands at fixed
    * [[Dedup.NumPerms]]-perm signatures (rows = perms / bands). Rows
    * nest by halving, so candidates(4) ⊆ candidates(8) ⊆ … — recall is
    * provably monotone in the band count (spec-pinned).
    */
  val SweepBands: Seq[Int] = Seq(4, 8, 16, 32)

  /** D17 `dedup_lsh_sweep` — the TUNING artifact above D10's single
    * point: candidate recall AND candidate volume for the whole
    * banding grid at one fixed signature budget (band/row choice
    * trades recall against verify cost — P(candidate) = 1−(1−j^r)^b —
    * and a production dedup picks its operating point off exactly
    * this table; D10 then monitors the chosen point). Ground truth is
    * D2's exhaustive inverted-index pair set at the same τ; per
    * config the report carries the candidate-pair count (the verify
    * COST axis), true-pair hits, and recall. The 128-perm signature
    * computes ONCE (checkpointed) and each config is one band-explode
    * + bucket self-join over it; the truth frame computes once. At
    * 100 TB this is a sample-slice job by construction — the sweep is
    * run on a slice to pick (b, r), then D3 runs the choice.
    */
  def dedupLshSweep(spark: SparkSession, dir: String): DataFrame =
    dedupLshSweepOf(graft.Tables(spark, dir, "documents"))

  /** [[dedupLshSweep]]'s kernel on any (doc_id, text) frame.
    *
    * r16 (guide §2.3/§2.4 — the r15 "per-config band explode" leftover):
    * the grid's bands NEST (rows halve as bands double), so a pair
    * collides on a coarse band of r rows iff it collides on ALL of that
    * band's r/rMin constituent finest slices — slice equality over a
    * partition of the index range is conjunction of the parts' equality.
    * The old shape exploded the signature and self-joined PER CONFIG
    * (4 configs × 2 sides: 8 explode passes, the full 128-long-per-doc
    * bucket payload shuffled four times over). Now ONE explode at the
    * finest config (bMax buckets of rMin longs — the same 128 longs per
    * doc crossing once) and ONE self-join produce the matched
    * finest-slice pairs; every coarser config's candidate set derives
    * from that (checkpointed, collision-sized) frame by counting
    * complete coarse groups — no signature bytes re-shuffled. Candidate
    * sets are provably identical, so every reported count is unchanged.
    */
  def dedupLshSweepOf(docs: DataFrame): DataFrame = {
    import Dedup.NumPerms
    val sh = Dedup.shingledOf(docs)
    val sig = sh
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhashSig(col("shingles"), NumPerms)
          .as("sig"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER)
    val truth = Dedup.ngramJaccardPairsOf(sh, materialize = true)
      .select(col("ia"), col("ib"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER)
    val bMax = SweepBands.max
    val rMin = NumPerms / bMax
    val bands = sig.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, $bMax - 1), x -> slice(sig, x * $rMin + 1, $rMin))"))
        .as(Seq("band", "bucket")))
    // one bucket per (doc, band), so (band, ia, ib) rows are unique —
    // no distinct needed before the per-config derivation
    val matched = bands
      .select(col("doc_id").as("ia"), col("band"), col("bucket"))
      .join(bands.select(col("doc_id").as("ib"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .filter(col("ia") < col("ib"))
      .select(col("band"), col("ia"), col("ib"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER)
    SweepBands.map { b =>
      val r = NumPerms / b
      val g = bMax / b // finest slices per coarse band
      val cand = matched
        .groupBy(col("ia"), col("ib"), expr(s"band div $g").as("cb"))
        .agg(count(lit(1)).as("nsub"))
        .filter(col("nsub") === g)
        .select("ia", "ib").distinct()
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true_pairs"))))
        .crossJoin(broadcast(
          truth.join(cand, Seq("ia", "ib"), "left_semi")
            .agg(count(lit(1)).as("n_hits"))))
        .select(lit(b).as("n_bands"), lit(r).as("n_rows"),
          col("n_candidates"), col("n_true_pairs"), col("n_hits"))
    }.reduce(_ unionByName _)
      .withColumn("recall",
        round(col("n_hits") / col("n_true_pairs").cast("double"), 4))
      .orderBy(col("n_bands"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_lsh_sweep" -> (dedupLshSweep _),
    "dedup_lsh_eval" -> (dedupLshEval _))

  /** Both arms' oracles replayed verbatim as derived tables, joined
    * and aggregated exactly as the Spark side.
    */
  /** One sweep config's oracle CTEs: band slice, bucket self-join,
    * and the summary scalar row.
    */
  private def sweepCfgCte(b: Int): String = {
    val r = Dedup.NumPerms / b
    // MATERIALIZED throughout (round 12): bk$b feeds both self-join
    // sides and cand$b is read twice by the summary row — inlined,
    // the signature chain upstream re-evaluated per reference and the
    // sf1 gate's watchdog fired (the §8m(d) CTE-inlining class)
    s"""bk$b AS MATERIALIZED (SELECT doc_id, band,
       |    list_slice(sig, band*$r+1, band*$r+$r) AS bucket
       |  FROM (SELECT doc_id, sig, unnest(range(0, $b)) AS band
       |        FROM sig)),
       |cand$b AS MATERIALIZED (SELECT DISTINCT a.doc_id ia, b.doc_id ib
       |  FROM bk$b a JOIN bk$b b ON a.band = b.band
       |    AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |r$b AS (SELECT CAST($b AS INT) AS n_bands, CAST($r AS INT) AS n_rows,
       |    (SELECT count(*) FROM cand$b) AS n_candidates,
       |    (SELECT count(*) FROM truth) AS n_true_pairs,
       |    (SELECT count(*) FROM truth t2 JOIN cand$b c
       |      ON t2.ia = c.ia AND t2.ib = c.ib) AS n_hits)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // dedup_lsh_sweep: the shared 128-perm signature replay, D2's
    // oracle verbatim as the truth table, one band-slice + self-join
    // + summary row per config, unioned
    "dedup_lsh_sweep" ->
      s"""WITH ${Dedup.minhashSigOracleCte},
         |truth AS MATERIALIZED (SELECT ia, ib
         |  FROM (${Dedup.oracle("dedup_ngram_jaccard")})),
         |${SweepBands.map(sweepCfgCte).mkString(",\n")}
         |SELECT n_bands, n_rows, n_candidates, n_true_pairs, n_hits,
         |  round(n_hits / CAST(n_true_pairs AS DOUBLE), 4) AS recall
         |FROM (${SweepBands.map(b => s"SELECT * FROM r$b")
          .mkString(" UNION ALL ")})
         |ORDER BY n_bands""".stripMargin,
    "dedup_lsh_eval" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN e.ia IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_exact_pairs,
         |  CAST(sum(CASE WHEN l.ia IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_lsh_pairs,
         |  CAST(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  CAST(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
         |  round(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NOT NULL
         |      THEN 1 ELSE 0 END)
         |    / CAST(sum(CASE WHEN e.ia IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE), 4) AS recall,
         |  round(sum(CASE WHEN e.ia IS NOT NULL AND l.ia IS NOT NULL
         |      THEN 1 ELSE 0 END)
         |    / CAST(sum(CASE WHEN l.ia IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE), 4) AS precision
         |FROM (${Dedup.oracle("dedup_ngram_jaccard")}) e
         |FULL JOIN (${Dedup.oracle("dedup_minhash_lsh")}) l
         |  ON e.ia = l.ia AND e.ib = l.ib""".stripMargin)
}
