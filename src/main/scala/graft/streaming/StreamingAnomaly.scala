package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.EventAnalytics.dailyAnomalies]]
  * (battery q151): the same integer z-test —
  * (n·x−S)²·(n−1) > σ²·n·(n·Q−S²) over the trailing `lookback`
  * OBSERVED days — evaluated the moment a day CLOSES (the first event
  * of a newer day arrives for that type), instead of in a nightly
  * batch. The alert that pages during the incident, not after it.
  *
  * State per event type is the open day's running count plus the last
  * `lookback` closed day-counts — O(lookback) longs, pruned on every
  * close; no raw events are retained. Day arithmetic, the ROWS-frame
  * semantics (observed days, calendar gaps skipped), and the verdict
  * integers are shared with the batch operator, and the spec pins
  * stream ≡ batch on closed days.
  */
object StreamingAnomaly {

  final case class Ev(event_type: String, ts_us: Long)

  final case class AnomState(counts: Map[Long, Long], lastClosed: Long,
      nLateDropped: Long = 0L)

  final case class Verdict(event_type: String, day: Long, cnt: Long,
      n_prev: Long, dev_sq: Long, bound_sq: Long, is_anomaly: Boolean,
      late_drops: Long = 0L)

  val DayUs: Long = 86400000000L

  /** The shared verdict arithmetic: `prev` = the trailing observed
    * day-counts (oldest first), `x` = the closing day's count.
    */
  private[streaming] def verdict(tpe: String, day: Long, x: Long,
      prev: Seq[Long], minPrev: Int, sigma: Int,
      lateDrops: Long = 0L): Verdict = {
    val n = prev.length.toLong
    val s = prev.sum
    val q = prev.map(c => c * c).sum
    val dev = (n * x - s) * (n * x - s) * (n - 1)
    val bound = sigma.toLong * sigma * n * (n * q - s * s)
    Verdict(tpe, day, x, n, dev, bound, n >= minPrev && dev > bound, lateDrops)
  }

  /** Stateful day-close detection. Emits one [[Verdict]] per (type,
    * day) as soon as a later day's event arrives for that type; the
    * still-open day stays in state. Append-mode friendly (each verdict
    * is emitted exactly once).
    */
  def maintain(events: Dataset[Ev], lookback: Int = 7, minPrev: Int = 4,
      sigma: Int = 2): Dataset[Verdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomState, Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (tpe, evs, state: GroupState[AnomState]) =>
          var st = state.getOption.getOrElse(AnomState(Map.empty, Long.MinValue))
          var counts = st.counts
          var lateDrops = st.nLateDropped
          evs.foreach { e =>
            val d = e.ts_us / DayUs
            // closed is closed: a late event for an already-judged day
            // must not resurrect a pruned count into future trailing
            // windows (the watermark policy, keyed on day closure) —
            // but the drop is COUNTED, not invisible: a source with
            // meaningful lateness surfaces as a growing late_drops
            // on this type's verdicts instead of silent under-counts
            if (d > st.lastClosed)
              counts += d -> (counts.getOrElse(d, 0L) + 1L)
            else lateDrops += 1L
          }
          if (counts.isEmpty) {
            state.update(st.copy(nLateDropped = lateDrops))
            Iterator.empty
          }
          else {
          val maxDay = counts.keys.max
          // every observed day strictly before the newest is closed:
          // judge the not-yet-judged ones in order, each against the
          // trailing `lookback` observed closed days before it
          val ordered = counts.keys.toSeq.sorted
          val closing = ordered.filter(d => d > st.lastClosed && d < maxDay)
          val out = closing.map { d =>
            val prev = ordered.filter(_ < d).takeRight(lookback).map(counts)
            verdict(tpe, d, counts(d), prev, minPrev, sigma, lateDrops)
          }
          // prune: the open day + the lookback closed days behind it
          val keep = ordered.takeRight(lookback + 1).toSet
          st = AnomState(counts.view.filterKeys(keep).toMap,
            math.max(st.lastClosed, closing.lastOption.getOrElse(Long.MinValue)),
            lateDrops)
          state.update(st)
          out.iterator
          }
      }
  }
}
