package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental per-user feature maintenance — the streaming twin of
  * [[graft.operators.EventAnalytics.userFeatures]] (battery q156): the
  * same activity/session/spend features, kept CURRENT in the state
  * store as events arrive, instead of recomputed from history per
  * training run. This is the online half of a feature store: batch
  * backfills the matrix, the stream keeps it fresh, and the feature
  * definitions (session gap, cents arithmetic, day bucketing) are
  * shared constants so the two surfaces cannot drift.
  *
  * State per user is O(1) counters + the set of active DAYS (bounded
  * by calendar span, not event count; a production deployment with
  * multi-year users would swap the exact set for an HLL union, the
  * same trade [[graft.operators.EventAnalytics.rollingActiveSketch]]
  * makes). Events WITHIN a micro-batch are processed in ts order;
  * cross-batch ordering is the source's append order, exactly like
  * the batch window's ORDER BY ts. Violations of that in-order
  * assumption (an event arriving with ts below the user's running
  * max) are DETECTED, not assumed away: each one increments the
  * `n_out_of_order` output column, so a disordered source shows up
  * as a nonzero counter instead of silent session-count drift.
  *
  * Reference scope: the reference pipeline has no streaming tier; this
  * extends its provenance/event model (etl/db.py batch status rows) to
  * the continuous case, Spark-first.
  */
object StreamingFeatures {

  final case class FeatEvent(user_id: Long, ts_us: Long, value: Double,
      event_type: String)

  final case class FeatState(nEvents: Long, nPurchases: Long, nSessions: Long,
      lastUs: Long, sumValueC: Long, days: Set[Long],
      nOutOfOrder: Long = 0L)

  final case class UserFeatures(user_id: Long, n_events: Long,
      n_purchases: Long, n_sessions: Long, active_days: Long,
      sum_value_c: Long, last_us: Long, n_out_of_order: Long = 0L)

  val DayUs: Long = 86400000000L

  /** Fold a (ts-sorted) chunk of one user's events into the running
    * state — shared by every micro-batch. Cents use the same
    * floor(value·100) the batch operator and oracle use.
    */
  private def fold(st: Option[FeatState], evs: Seq[FeatEvent],
      purchaseType: String, gapUs: Long): Option[FeatState] =
    evs.foldLeft(st) { (acc, e) =>
      val cents = math.floor(e.value * 100).toLong
      val p = if (e.event_type == purchaseType) 1L else 0L
      acc match {
        case Some(s) =>
          val newSession = if (e.ts_us - s.lastUs > gapUs) 1L else 0L
          // a cross-batch late event (ts below the running max) can
          // never open a session here, while the batch twin's global
          // ORDER BY ts would have seen it in place — count it, so
          // stream/batch drift on a disordered source is OBSERVABLE
          // in the output instead of silent
          val ooo = if (e.ts_us < s.lastUs) 1L else 0L
          Some(FeatState(s.nEvents + 1, s.nPurchases + p,
            s.nSessions + newSession, math.max(s.lastUs, e.ts_us),
            s.sumValueC + cents, s.days + e.ts_us / DayUs,
            s.nOutOfOrder + ooo))
        case None =>
          Some(FeatState(1L, p, 1L, e.ts_us, cents, Set(e.ts_us / DayUs)))
      }
    }

  /** The stateful transform: one [[UserFeatures]] row per user per
    * micro-batch that touched them (Update output mode — the sink
    * upserts by user_id). Works identically on a batch Dataset (one
    * "micro-batch" covering all history) — the spec pins
    * stream ≡ batch.
    */
  def maintain(events: Dataset[FeatEvent], purchaseType: String = "purchase",
      gapUs: Long = 30L * 60 * 1000000): Dataset[UserFeatures] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FeatState, UserFeatures](GroupStateTimeout.NoTimeout) {
        (userId, evs, state: GroupState[FeatState]) =>
          val next = fold(state.getOption, evs.toSeq.sortBy(_.ts_us),
            purchaseType, gapUs).get
          state.update(next)
          UserFeatures(userId, next.nEvents, next.nPurchases, next.nSessions,
            next.days.size.toLong, next.sumValueC, next.lastUs,
            next.nOutOfOrder)
      }
  }
}
