package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One key-day's complete value histogram (fixed
  * [[DriftStream.Bins]]-wide bin counts) — the same pre-aggregated
  * per-day contract as [[KeyedCount]] for G11/G12: the upstream
  * watermark + window aggregation closes a day before it reaches the
  * detector.
  */
case class BinnedDay(key: String, day: String, bins: Seq[Long])

/** One day's drift verdict. */
case class DriftPoint(key: String, day: String, n: Long, psi: Double,
    band: String)

/** G16 `DriftStream` — streaming distribution-drift monitoring, the
  * live arm of `etl_drift_psi` (A32; E32 is the embedding-space
  * sibling). The OFFLINE statistic splits the whole span at its
  * midpoint — not incrementally maintainable (every new day moves the
  * midpoint and re-labels history) — so the streaming form freezes
  * the reference the way a production monitor actually does: the
  * first [[Warmup]] complete days accumulate the reference histogram,
  * then every later day emits
  *
  *   PSI(day) = Σ_b (p_b − q_b) · ln(p_b / q_b),
  *   p = (ref_b + 1)/(refTot + B),  q = (n_b + 1)/(dayTot + B)
  *
  * against that frozen reference — A32's exact Laplace-smoothed
  * spelling, so a day's PSI is a pure function of integer state and
  * the day's integer counts: bit-identical under any micro-batch
  * partitioning (spec-pinned, including stream ≡ a sequential local
  * replay). Bands reuse A32's 0.1 / 0.25 thresholds. State is
  * O(keys × (B+3) fields), days must arrive monotonically per key
  * (late/replayed days are dropped — [[ForecastStream]]'s contract).
  */
object DriftStream {

  val Bins = 10   // fixed-width value bins, A32's grid
  val Warmup = 7  // complete days that freeze the reference histogram
  val PsiModerate = 0.1
  val PsiShifted = 0.25

  def psi(ds: Dataset[BinnedDay]): Dataset[DriftPoint] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[DriftState, DriftPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** One day's PSI against a reference histogram — the shared exact
    * kernel for the stream and the spec's local replay.
    */
  def psiOf(ref: Seq[Long], bins: Seq[Long]): Double = {
    val refTot = ref.sum.toDouble + Bins
    val dayTot = bins.sum.toDouble + Bins
    val raw = (0 until Bins).map { b =>
      val p = (ref(b) + 1.0) / refTot
      val q = (bins(b) + 1.0) / dayTot
      (p - q) * math.log(p / q)
    }.sum
    math.round(raw * 1e6) / 1e6
  }

  def bandOf(psi: Double): String =
    if (psi < PsiModerate) "stable"
    else if (psi < PsiShifted) "moderate"
    else "shifted"

  private def step(key: String, rows: Iterator[BinnedDay],
      state: GroupState[DriftState]): Iterator[DriftPoint] = {
    val sorted = rows.toSeq.sortBy(_.day)
    var st = state.getOption
      .getOrElse(DriftState("", Warmup, Vector.fill(Bins)(0L)))
    val out = Seq.newBuilder[DriftPoint]
    sorted.foreach { r =>
      require(r.bins.length == Bins,
        s"BinnedDay.bins must be exactly $Bins wide, got ${r.bins.length}")
      if (st.lastDay.isEmpty || st.lastDay < r.day) {
        if (st.warmLeft > 0) {
          st = DriftState(r.day, st.warmLeft - 1,
            st.ref.zip(r.bins).map { case (a, x) => a + x })
        } else {
          val p = psiOf(st.ref, r.bins)
          out += DriftPoint(key, r.day, r.bins.sum, p, bandOf(p))
          st = st.copy(lastDay = r.day)
        }
      } // else: late or replayed day — dropped (monotonic contract)
    }
    state.update(st)
    out.result().iterator
  }
}

/** Per-key detector state: last folded day, warmup days remaining,
  * and the (frozen after warmup) reference histogram.
  */
case class DriftState(lastDay: String, warmLeft: Int, ref: Seq[Long])
