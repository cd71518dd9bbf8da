package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key online-CUSUM state: last folded day, warmup remaining,
  * warmup total, reference total T₀ (frozen after warmup), and the
  * two one-sided accumulators in W-scaled integer units.
  */
case class CusumState(lastDay: String, warmLeft: Int, warmSum: Long,
    t0: Long, sPos: Long, sNeg: Long)

/** One day's detector output. */
case class CusumPoint(key: String, day: String, n: Long,
    sPos: Long, sNeg: Long, alarm: Int)

/** G12 `ChangepointStream` — streaming level-shift detection, the live
  * arm of `ts_changepoint` (B73). The OFFLINE statistic (argmax of
  * |n·cum_t − t·T| over the whole series) is not incrementally
  * maintainable — every new day re-weights every prefix — so the
  * streaming form is the classical ONE-SIDED ONLINE CUSUM (Page '54):
  * a [[Warmup]]-day window freezes the reference total T₀, and each
  * day's count folds into
  *
  *   S⁺ = max(0, S⁺ + (W·x − T₀) − κ),
  *   S⁻ = max(0, S⁻ − (W·x − T₀) − κ),   κ = ⌊T₀/2⌋
  *
  * alarming when either side exceeds H = [[ThreshMult]]·T₀. Everything
  * stays in W-scaled INTEGER units (W·x − T₀ is exact; no mean, no
  * floats), so the fold replays bit-identically under any batch
  * partitioning — the spec pins stream == sequential hand replay. The
  * slack κ tunes the detector to ~half-of-baseline shifts: a stable
  * series pays |W·x − T₀| < κ per day and both sides drain to 0, a
  * doubled or halved level accumulates ~T₀/2 per day and crosses H in
  * ~2·ThreshMult days. State is O(keys × 6 longs); late/replayed days
  * are dropped under the same monotonic contract as [[ForecastStream]].
  */
object ChangepointStream {

  val Warmup = 7     // days that freeze the reference total T₀
  val ThreshMult = 4 // alarm at S± > ThreshMult · T₀

  def cusum(ds: Dataset[KeyedCount]): Dataset[CusumPoint] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  private def step(key: String, rows: Iterator[KeyedCount],
      state: GroupState[CusumState]): Iterator[CusumPoint] = {
    val sorted = rows.toSeq.sortBy(_.day)
    val out = Seq.newBuilder[CusumPoint]
    var st = state.getOption
      .getOrElse(CusumState("", Warmup, 0L, 0L, 0L, 0L))
    sorted.foreach { r =>
      if (st.lastDay.isEmpty || st.lastDay < r.day) {
        if (st.warmLeft > 0) {
          // warmup: accumulate the reference; no detection yet
          val warm = st.copy(lastDay = r.day, warmLeft = st.warmLeft - 1,
            warmSum = st.warmSum + r.n)
          st = if (warm.warmLeft == 0) warm.copy(t0 = warm.warmSum) else warm
          out += CusumPoint(key, r.day, r.n, 0L, 0L, 0)
        } else {
          val dev = Warmup * r.n - st.t0 // W-scaled deviation, exact
          val slack = st.t0 / 2
          val sp = math.max(0L, st.sPos + dev - slack)
          val sn = math.max(0L, st.sNeg - dev - slack)
          val alarm = if (sp > ThreshMult * st.t0 ||
            sn > ThreshMult * st.t0) 1 else 0
          // an alarm resets the accumulators: each shift reports once,
          // then the detector re-arms against the SAME reference
          st = st.copy(lastDay = r.day,
            sPos = if (alarm == 1) 0L else sp,
            sNeg = if (alarm == 1) 0L else sn)
          out += CusumPoint(key, r.day, r.n, sp, sn, alarm)
        }
      }
    }
    state.update(st)
    out.result().iterator
  }
}
