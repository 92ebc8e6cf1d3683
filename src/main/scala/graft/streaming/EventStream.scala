package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the reference's polling micro-batch
  * loop (test/run_* scripts re-scanning the control table) re-expressed
  * as real streams. Same transforms run in batch mode for the oracle
  * (SparkEntry q29).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark;
  * sessionization state lives in the state store keyed by user —
  * both shuffle once on their grouping key and scale with executors.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, last: Long, n: Int, sumValue: Double)

  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, sum_value: Double)

  /** Tumbling-window counts with a watermark — the streaming shape of
    * SparkEntry.q29 (readStream → window agg → sink).
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value_c"))

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): a session closes after `gapMs` of
    * inactivity per user.
    *
    * `flushOpen = true` (batch mode): one pass, emits closed sessions
    * plus the final open one per user. `flushOpen = false` (streaming):
    * open sessions stay in the state store with a processing-time
    * timeout of `gapMs` and flush when it fires.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      flushOpen: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = evs.toSeq.sortBy(_.ts.getTime)
      var out = Vector.empty[Session]
      var st = state.getOption
      if (state.hasTimedOut && sorted.isEmpty) {
        st.foreach(s => out :+= Session(userId, s.start, s.last, s.n, s.sumValue))
        state.remove()
        return out.iterator
      }
      sorted.foreach { e =>
        val t = e.ts.getTime
        st match {
          case Some(s) if t - s.last <= gapMs =>
            st = Some(s.copy(last = t, n = s.n + 1, sumValue = s.sumValue + e.value))
          case Some(s) =>
            out :+= Session(userId, s.start, s.last, s.n, s.sumValue)
            st = Some(SessionState(t, t, 1, e.value))
          case None =>
            st = Some(SessionState(t, t, 1, e.value))
        }
      }
      st.foreach { s =>
        if (flushOpen) {
          out :+= Session(userId, s.start, s.last, s.n, s.sumValue)
          state.remove()
        } else {
          state.update(s)
          state.setTimeoutDuration(gapMs)
        }
      }
      out.iterator
    }
    val timeout =
      if (flushOpen) GroupStateTimeout.NoTimeout else GroupStateTimeout.ProcessingTimeTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /** File-source streaming reader for an events directory (parquet). */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }
}
