package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funnel and cohort-retention analytics over an event stream — the
  * two standard "billions of events, one pass" reports. Both are
  * expressed so the heavy data moves through at most one shuffle key
  * (the user), and everything downstream of that shuffle is
  * partition-local: at 100 TB the plans are a repartition-by-user
  * plus narrow work, never an events-sized self-join.
  *
  * Timestamps are integer epoch-µs columns throughout (the repo's
  * cross-engine parity rule: compare int64 µs, never raw timestamps).
  */
object EventAnalytics {

  /** Ordered conversion funnel: per user, the first time each stage
    * was reached, where stage i must occur STRICTLY AFTER the user's
    * first completion of stage i-1 (the re-ordering-proof definition —
    * a purchase logged before the first view does not convert).
    *
    * Implementation: one window partition by user; stage i's column is
    * min(ts where type = stage_i and ts > stage_{i-1} time) over the
    * partition — each stage a window expression chained on the
    * previous one, all sharing ONE exchange. The per-user collapse
    * reuses the same partitioning (no second shuffle).
    *
    * Output: (user, t_<stage> epoch-µs per stage — null once the user
    * falls out — and `stage_reached` = how many stages completed).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct.size == stages.size, s"stages must be unique: $stages")
    val w = Window.partitionBy(col(userCol))
    val staged = stages.zipWithIndex.foldLeft(
      events.select(col(userCol), col(typeCol), col(tsUsCol))) {
      case (df, (st, i)) =>
        val cond =
          if (i == 0) col(typeCol) === st
          else col(typeCol) === st && col(tsUsCol) > col(s"_t${i - 1}")
        df.withColumn(s"_t$i", min(when(cond, col(tsUsCol))).over(w))
    }
    val aggs = stages.zipWithIndex.map { case (st, i) =>
      min(col(s"_t$i")).as(s"t_$st")
    }
    val reached = stages.map(st => when(col(s"t_$st").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    staged.groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stage_reached", reached)
  }

  /** Cohort retention: users are cohorted by the day (µs div 86.4e9)
    * of their first event; each cell counts the cohort's distinct
    * users active `day_offset` days later. Two aggregations over the
    * user key plus one over the (cohort, offset) grid — the grid is
    * days², tiny no matter the event volume.
    *
    * Output: (cohort_day, day_offset, n_users); offset 0 is the cohort
    * size row.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsUsCol: String): DataFrame = {
    val DayUs = 86400000000L
    val day = expr(s"$tsUsCol div $DayUs").as("_day")
    val byDay = events.select(col(userCol).as("_user"), day)
    val cohorts = byDay.groupBy(col("_user")).agg(min(col("_day")).as("cohort_day"))
    val activity = byDay.distinct()
    activity.join(cohorts, "_user")
      .groupBy(col("cohort_day"), (col("_day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("_user")).as("n_users"))
  }

  /** Trailing time-window stats: for every event, the count and sum of
    * `value` over the key's events in `[ts - backUs, ts]` — the
    * moving-aggregate feature (rolling activity, rate limits, spend
    * velocity) the tumbling q29 windows can't express, because each
    * row gets its OWN window.
    *
    * One shuffle (the key); the frame is a value-based RANGE frame on
    * the integer µs timestamp, so ties are peer-grouped identically on
    * every engine and the result is independent of intra-tie order —
    * which also means `value` should be integral (the repo's integer
    * cross-engine summation rule; pre-scale doubles with
    * `round(x * 100)` cents first).
    */
  /** Recency-decayed sum per key: each event contributes
    * `value div 2^(age / halfLifeUs)` (age measured from the stream's
    * max timestamp; the shift saturates at `maxShift`). Power-of-two
    * decay on purpose: `exp`/`pow`-based decay is not bit-stable
    * across engines, while an integer halving schedule is exact
    * everywhere and keeps the whole feature an associative BIGINT sum
    * — the recency-weighting shape ranking/feature pipelines need,
    * scan + one groupBy, no window.
    *
    * CONTRACT: `value` must be non-negative. The halving is Spark
    * `div` (truncation toward zero); for negative values truncation
    * and floor division disagree (-5 div 2 = -2 vs -3), so a SQL
    * oracle using `//` (floor) would diverge and "decay by halving"
    * stops being monotone. Feed deltas/refunds as separate
    * non-negative columns and subtract the two decayed sums instead.
    */
  def decayedSum(events: DataFrame, key: Column, tsUs: Column,
      value: Column, halfLifeUs: Long, maxShift: Int = 30): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be positive, got $halfLifeUs")
    require(maxShift >= 0 && maxShift <= 62, s"maxShift must be in [0, 62]: $maxShift")
    val ref = events.agg(max(tsUs).as("_ref"))
    events.crossJoin(broadcast(ref))
      .withColumn("_v", value).withColumn("_ts", tsUs)
      // integral div — a double round trip would lose µs bits
      .withColumn("_shift",
        least(expr(s"(_ref - _ts) div ${halfLifeUs}L"), lit(maxShift.toLong)))
      .withColumn("_contrib", expr("_v div shiftleft(1L, cast(_shift as int))"))
      .groupBy(key.as("key"))
      .agg(sum(col("_contrib")).as("decayed_sum"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * consecutive (from_type → to_type) counts and the row-normalized
    * transition probability in 1e-6 fixed point — the behavioral
    * "bigram LM" that anomaly/bot screens and funnel designs read
    * (a session whose transitions are improbable under the matrix is
    * an outlier). Ordering is (ts, id) so timestamp ties are
    * deterministic on any engine; probabilities are exact integer
    * floor division (counts are non-negative, Spark DIV ≡ DuckDB //).
    *
    * Scale shape: one user-key shuffle for the lead() window (the same
    * exchange sessionize/funnel pay), then two type-bounded groupBys
    * (|types|² rows at most).
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .select(col(typeCol).as("from_type"), col("_next").as("to_type"))
    val cnt = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("_t"))
    cnt.join(tot, Seq("from_type"))
      .withColumn("p_1e6", expr("n * 1000000 DIV _t"))
      .select(col("from_type"), col("to_type"), col("n"), col("p_1e6"))
  }

  def trailingStats(events: DataFrame, key: Column, tsUs: Column,
      value: Column, backUs: Long): DataFrame = {
    require(backUs >= 0, s"window lookback must be >= 0, got $backUs")
    val w = Window.partitionBy(key).orderBy(tsUs)
      .rangeBetween(-backUs, Window.currentRow)
    events.withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", sum(value).over(w))
  }

  private val DayUs = 86400000000L

  /** Rolling-window active users — per observed day, the exact DAU and
    * the distinct users active in the `windowDays`-day window ENDING
    * that day (WAU/MAU): the engagement series every event product
    * reports, and the one a tumbling `groupBy(day)` cannot produce
    * because windows overlap.
    *
    * Exact plan: dedup to (user, day) pairs (one shuffle, map-side
    * combine), fan each pair out to the `windowDays` target days it
    * can serve (map-only ×w), semi-join to observed days, and
    * count-distinct per day. The fan-out is w×|pairs| rows of two
    * BIGINTs — at 100 TB that is the standard exact rolling-actives
    * plan; when even that exchange is too wide, [[rollingActiveSketch]]
    * fans out |days| pre-aggregated HLL sketches instead of users.
    */
  def rollingActive(events: DataFrame, userCol: String, tsUsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val pairs = events.select(col(userCol).as("_user"),
      expr(s"$tsUsCol div ${DayUs}L").as("_day")).distinct()
    val days = pairs.select(col("_day").as("day")).distinct()
    val dau = pairs.groupBy(col("_day").as("day"))
      .agg(count_distinct(col("_user")).as("dau"))
    val rolling = pairs
      .select(col("_user"), explode(sequence(col("_day"),
        col("_day") + lit(windowDays - 1L))).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count_distinct(col("_user")).as("rolling_active"))
    dau.join(rolling, Seq("day"))
      .select(col("day"), col("dau"), col("rolling_active"))
  }

  /** Sketch-mode rolling actives: one HLL sketch per (day) — |days|
    * rows, built with a single map-side-combinable pass — then the
    * window union merges `windowDays` SKETCHES per target day instead
    * of re-shuffling w× the raw user stream. This is how the rolling
    * series stays cheap when |users|/day is itself huge; the estimate
    * carries HLL's standard ~1.04/√2^lgK relative error (spec-pinned
    * against [[rollingActive]]).
    */
  def rollingActiveSketch(events: DataFrame, userCol: String,
      tsUsCol: String, windowDays: Int = 7, lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    val pairs = events.select(col(userCol).as("_user"),
      expr(s"$tsUsCol div ${DayUs}L").as("_day"))
    val days = pairs.select(col("_day").as("day")).distinct()
    val daily = pairs.groupBy(col("_day"))
      .agg(expr(s"hll_sketch_agg(_user, $lgK)").as("_sk"))
    daily
      .select(explode(sequence(col("_day"),
        col("_day") + lit(windowDays - 1L))).as("day"), col("_sk"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(_sk, true))")
        .as("rolling_est"))
  }

  /** Daily-count anomaly detection per event type: flag days whose
    * count deviates from the trailing `lookback`-day mean by more
    * than `sigma` SAMPLE standard deviations — computed ENTIRELY in
    * integers, so both engines agree to the bit. With n = trailing
    * days present, S = Σcnt, Q = Σcnt², x = today's count, the test
    *   |x − S/n| > sigma·√((Q − S²/n)/(n−1))
    * cross-multiplies to
    *   (n·x − S)²·(n−1) > sigma²·n·(n·Q − S²)
    * (both sides BIGINT-exact while counts stay ≲ 1e9/day; beyond
    * that pre-scale counts by a common factor — the z-score is
    * scale-free). Days with fewer than `minPrev` trailing observations
    * are never flagged (cold start). The trailing frame is the
    * previous `lookback` OBSERVED days (ROWS frame), so silent
    * calendar gaps don't shrink the variance estimate with zeros.
    *
    * Shape at scale: one hash agg to (type, day) — map-side combined,
    * output cardinality |types|·|days| ≪ events — then a window per
    * type over that tiny series. The raw stream is never windowed.
    */
  /** Per-user feature snapshot — the point-in-time feature matrix a
    * churn/propensity model trains on, derived in one pass over the
    * event stream: activity volume, session count (same 30-min-gap
    * sessionization as the session report), active-day spread, spend
    * in integer cents, and recency against the corpus watermark.
    * Everything integer (µs, cents, counts) — bit-identical across
    * engines.
    *
    * Shape at scale: one window per user (lag → session starts) over
    * user-partitioned data, then a single per-user aggregate; the
    * corpus watermark is a broadcast 1-row aggregate. No driver
    * state, no second pass over the raw stream.
    */
  def userFeatures(events: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String, typeCol: String, purchaseType: String = "purchase",
      gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsUsCol))
    val sessioned = events
      .select(col(userCol).as("user_id"), col(tsUsCol).as("ts_us"),
        col(valueCol).as("value"), col(typeCol).as("event_type"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
    val perUser = sessioned.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === purchaseType, 1L).otherwise(0L))
          .as("n_purchases"),
        sum(col("new_session")).as("n_sessions"),
        countDistinct(expr(s"ts_us DIV ${DayUs}L")).as("active_days"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_c"),
        max(col("ts_us")).as("last_us"))
    val watermark = events.agg(max(col(tsUsCol)).as("mx_us"))
    perUser.crossJoin(broadcast(watermark))
      .withColumn("recency_days", expr(s"(mx_us - last_us) DIV ${DayUs}L"))
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        col("n_sessions"), col("active_days"), col("sum_value_c"),
        col("last_us"), col("recency_days"))
      .orderBy(col("user_id"))
  }

  def dailyAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      lookback: Int = 7, minPrev: Int = 4, sigma: Int = 2): DataFrame = {
    require(lookback >= 1 && minPrev >= 1 && sigma >= 1,
      s"need lookback, minPrev, sigma >= 1, got $lookback, $minPrev, $sigma")
    val daily = events
      .groupBy(col(typeCol).as("event_type"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    daily
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("s_prev", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("q_prev",
        coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
      .withColumn("dev_sq",
        expr("(n_prev*cnt - s_prev)*(n_prev*cnt - s_prev)*(n_prev - 1)"))
      .withColumn("bound_sq",
        expr(s"${sigma.toLong * sigma}*n_prev*(n_prev*q_prev - s_prev*s_prev)"))
      .withColumn("is_anomaly",
        col("n_prev") >= minPrev && col("dev_sq") > col("bound_sq"))
      .select(col("event_type"), col("day"), col("cnt"), col("n_prev"),
        col("dev_sq"), col("bound_sq"), col("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Inter-arrival log₂-band histogram: per event type, how the gaps
    * between a user's consecutive events distribute across power-of-2
    * µs bands — the burstiness profile (a bot fires in the bottom
    * bands; a human's gaps spread). Band = bitlen(gap_us) (the q88
    * digit-count idiom; gap 0 → band 0), attributed to the LATER
    * event's type. One user-keyed window, then a |types|·64-bounded
    * aggregate.
    *
    * Output: (event_type, band, n_gaps) ordered by type, band.
    */
  def interArrivalBands(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol), col(idCol))
    events
      .withColumn("_prev", lag(col(tsUsCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col(typeCol).as("event_type"),
        when(col(tsUsCol) === col("_prev"), lit(0L))
          .otherwise(length(bin(col(tsUsCol) - col("_prev"))).cast("long"))
          .as("band"))
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("n_gaps"))
      .orderBy(col("event_type"), col("band"))
  }

  /** Per-user event-type entropy — the behavioral-diversity signal
    * (a "user" firing one event type thousands of times is a bot or
    * an instrumentation loop; q137's transition matrix sees the same
    * thing pairwise, this is the one-number screen). Exact integers:
    * per-type bits = floor-log2(n) − floor-log2(c) via binary digit
    * counts (the q88 idiom), weighted by c.
    *
    * Shape: the raw stream aggregates to (user, type) counts first —
    * the only corpus-width shuffle — then user totals re-aggregate
    * from that |users|·|types|-bounded table; the bits join is
    * user-co-partitioned with it.
    *
    * Output: (user_id, n_events, n_types, sum_bits).
    */
  def userEventEntropy(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    val bitlen = (c: Column) => length(bin(c)).cast("long")
    val ct = events.select(col(userCol).as("user_id"), col(typeCol).as("t"))
      .groupBy(col("user_id"), col("t")).agg(count(lit(1)).as("c"))
    val tot = ct.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_types"))
    ct.join(tot, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        (col("c") * (bitlen(col("n_events")) - bitlen(col("c")))).as("b"))
      .groupBy(col("user_id"))
      .agg(first(col("n_events")).as("n_events"),
        first(col("n_types")).as("n_types"),
        sum(col("b")).cast("long").as("sum_bits"))
  }
}
