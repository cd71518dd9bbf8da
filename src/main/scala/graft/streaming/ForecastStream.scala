package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One per-key daily revenue observation in fixed-point cents. */
case class DailyCents(key: String, day: String, cents: Long)

/** The live forecast state after folding a day in. */
case class ForecastPoint(key: String, day: String, rev: Double,
    level: Double, trend: Double, forecastNext: Double)

/** G11 `ForecastStream` — streaming Holt forecast maintenance: the
  * live arm of `ts_holt` (B72). Keeps each key's (level, trend) pair
  * in `GroupState` and folds every arriving daily observation through
  * the EXACT integer recurrence the batch operator runs —
  * l' = ⌊(5·x + 5·(l + t)) / 10⌋, t' = ⌊(3·(l' − l) + 7·t) / 10⌋ in
  * bigint cents with TRUE floor division — emitting the refreshed
  * level/trend/one-step forecast per day. Because the batch operator
  * is a left fold over the day-ordered series and the state here IS
  * that fold's accumulator, the stream output equals the batch output
  * row-for-row on any batch partitioning of the input (the spec pins
  * this against `ts_holt`'s own fold); a float recurrence would lose
  * that equality the first time a half-way value rounded differently.
  *
  * State is O(keys × last-day + 2 longs) — independent of event
  * volume; like [[AnomalyStream]], the upstream windowed aggregation
  * bounds what reaches this operator to one row per key per day.
  *
  * Ordering contract: the fold is MONOTONIC in day. The upstream
  * watermark aggregation emits each closed day once, in order; if a
  * source nevertheless replays or late-delivers a day ≤ the last one
  * folded, that row is DROPPED (no output, state untouched) — folding
  * it on top of newer state would silently corrupt (level, trend) and
  * every forecast after it, which is exactly the failure the
  * stream==batch parity claim must exclude. The spec pins both the
  * drop and the state's immunity.
  */
object ForecastStream {

  def forecasts(ds: Dataset[DailyCents]): Dataset[ForecastPoint] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(String, Long, Long), ForecastPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** ⌊x / 10⌋ for any sign — the pmod-then-exact-div spelling the
    * batch fold uses, so a dipping (negative) trend stays on identical
    * integers in both arms.
    */
  private def fdiv10(x: Long): Long = {
    val m = ((x % 10) + 10) % 10
    (x - m) / 10
  }

  private def step(key: String, rows: Iterator[DailyCents],
      state: GroupState[(String, Long, Long)]): Iterator[ForecastPoint] = {
    val sorted = rows.toSeq.sortBy(_.day)
    val out = Seq.newBuilder[ForecastPoint]
    var st = state.getOption
    sorted.foreach { r =>
      // ISO day strings compare chronologically; a day at-or-before
      // the last folded one is a replay/late row — drop, don't fold
      if (!st.exists(_._1 >= r.day)) {
        st = Some(st match {
          case None => (r.day, r.cents, 0L) // fold init: l₁ = x₁, t₁ = 0
          case Some((_, l, t)) =>
            val lNew = fdiv10(5L * r.cents + 5L * (l + t))
            (r.day, lNew, fdiv10(3L * (lNew - l) + 7L * t))
        })
        val (_, l, t) = st.get
        out += ForecastPoint(key, r.day, r.cents / 100.0, l / 100.0,
          t / 100.0, (l + t) / 100.0)
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }
}
