package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming twin of the exact-count side of Sketches.heavyHitters
  * (q62) — the stream/batch unification point for live token
  * monitoring: the SAME groupBy+count aggregation runs windowed over
  * the event stream, and the same rank tail serves both the batch
  * report and each emitted window.
  *
  * State and scale: the open aggregation state is (open windows ×
  * distinct tokens) counters, bounded by the watermark — closed
  * windows flush and leave the state store. One shuffle on (window,
  * token), map-side partial counts before it, exactly the batch
  * plan's shape. The rank tail runs per COMPLETED window (foreachBatch
  * or over the sink table), so no streaming-unsupported window
  * function sits inside the stream itself.
  *
  * The count-min sketch side of q62 stays batch: its error contract is
  * per-total-count and the sketch is a driver-held summary; a
  * per-window sketch would be a different contract, not a twin.
  */
object StreamingHeavyHitters {

  /** Per-event-time-window token counts — works unchanged on a
    * streaming OR batch frame (the spec runs both and compares).
    * Output: (window_start, token, cnt).
    */
  def windowedTokenCounts(events: DataFrame, tokenCol: Column, tsCol: Column,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val src = events.select(tsCol.as("ts"), tokenCol.cast("string").as("token"))
      .filter(col("token").isNotNull)
    val marked = if (src.isStreaming) src.withWatermark("ts", watermark) else src
    marked
      .groupBy(window(col("ts"), window_).as("w"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w").getField("start").as("window_start"), col("token"),
        col("cnt").cast("long").as("cnt"))
  }

  /** Streaming maintenance of the PORTABLE count-min sketch (q217's
    * counter relation on a stream): the md5-celled (r, cell) fan-out
    * — the SAME [[graft.operators.Sketches.cmsCells]] the batch
    * operator and the DuckDB oracle use — into a running groupBy
    * count. Update output mode; the sink upserts by (r, cell), and
    * because CMS merge IS counter addition, the upserted relation
    * after any micro-batch sequence is BIT-IDENTICAL to the batch
    * sketch over the union of those batches (the state-identity the
    * parity spec pins). State is ≤ depth·width counters FOREVER —
    * the sketch contract: an unbounded token stream never grows it.
    *
    * This supersedes the old "the sketch side stays batch" note: the
    * binary driver-held sketch had no streaming story, the counter
    * RELATION does.
    */
  def cmsCounterUpdates(stream: DataFrame, token: Column,
      depth: Int = 4, width: Int = 8192): DataFrame =
    graft.operators.Sketches.cmsCells(
        stream.select(token.cast("string").as("token"))
          .filter(col("token").isNotNull),
        col("token"), depth, width)
      .groupBy(col("r"), col("cell")).agg(count(lit(1)).as("c"))

  /** Rank tail over emitted window counts — (cnt DESC, token ASC), the
    * q62 tie order. Runs on completed windows (a batch frame: the sink
    * table or a foreachBatch micro-batch), where rank windows are
    * legal; per-window cardinality is the token vocabulary, so the
    * partition sort is small.
    */
  def topNPerWindow(counts: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1, s"need topN>=1, got $topN")
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("cnt").desc, col("token"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
  }
}
