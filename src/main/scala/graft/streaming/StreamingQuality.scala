package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Ingest-time corpus quality monitor: the curation gates
  * ([[TextAnalysis.curationGates]] — quality score + language ID from
  * one tokenization) run STATELESS on the arriving document stream,
  * and a watermarked tumbling window aggregates per-(window, source)
  * pass/fail counts — the live dashboard that catches a feed going bad
  * (scraper regression, encoding corruption, spam flood) within one
  * window instead of one release.
  *
  * Stream-batch unification is the point: the gate expressions are the
  * EXACT oracle-verified batch operators (q41/q26 arithmetic), applied
  * unchanged; only the windowed count is streaming-specific, and its
  * state is bounded by the watermark (sources × windows in flight).
  * Same shape works in batch mode for the spec's ground truth.
  */
object StreamingQuality {

  /** Per-(window, source) gate monitor over documents shaped
    * (ts timestamp, source string, text string). Emits pass counts for
    * the quality gate (≥ minQuality1e6), the language gate (== lang),
    * and both combined, alongside the total.
    */
  def qualityMonitor(docs: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours", minQuality1e6: Long = 600000L,
      lang: String = "en"): DataFrame = {
    val gated = docs
      .withColumn("_g", TextAnalysis.curationGates(col("text")))
      .withColumn("_qok", (col("_g.quality_1e6") >= minQuality1e6).cast("long"))
      .withColumn("_lok", (col("_g.predicted_lang") === lang).cast("long"))
    gated
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_qok")).as("n_quality_pass"),
        sum(col("_lok")).as("n_lang_pass"),
        sum(col("_qok") * col("_lok")).as("n_pass"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_docs"), col("n_quality_pass"), col("n_lang_pass"), col("n_pass"))
  }
}
