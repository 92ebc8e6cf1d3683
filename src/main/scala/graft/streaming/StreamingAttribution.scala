package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-stream interval join — click→purchase attribution: each
  * purchase joins the SAME user's clicks from the preceding
  * `windowSec` seconds. This is the one Structured Streaming join
  * shape with state on BOTH sides: each side buffers rows until its
  * watermark passes the interval bound, so state is bounded by
  * ingest-rate × (delay + window), never by stream length.
  *
  * The same function runs unchanged on batch frames (`withWatermark`
  * is a no-op in batch) — that batch twin is the oracle-verified
  * battery entry (q141), and the streaming spec pins stream ≡ batch
  * on identical input, the repo's established unification pattern.
  *
  * Scale shape: one user-key shuffle per side (the join exchange);
  * the interval condition keeps per-user state a time-bounded buffer.
  * `left_outer` emits unattributed purchases with NULL click columns
  * once the watermark closes their window — the attribution report
  * needs the misses as much as the hits.
  */
object StreamingAttribution {

  /** Interval-join purchases to candidate clicks. `clicks` needs
    * (user, id, ts) shaped columns named `user_id`, `click_id`,
    * `click_ts`; `purchases` `user_id`, `purchase_id`, `purchase_ts`
    * (both ts TIMESTAMP — event time). Emits one row per qualifying
    * (purchase, click) pair plus NULL-click rows for purchases with
    * no click in `[purchase_ts − windowSec, purchase_ts]`.
    */
  def attributeClicks(clicks: DataFrame, purchases: DataFrame,
      windowSec: Long = 1800L, delay: String = "1 hour"): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val c = clicks
      .select(col("user_id").as("_cuser"), col("click_id"), col("click_ts"))
      .withWatermark("click_ts", delay)
    val p = purchases
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    p.join(c,
        col("user_id") === col("_cuser") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowSec SECONDS"),
        "left_outer")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Last-click attribution over [[attributeClicks]] pairs: the single
    * latest qualifying click per purchase (ties on click_ts broken by
    * highest click_id — deterministic on any engine). A rank window
    * after a stream-stream join is a second stateful operator, so in
    * streaming run this inside `foreachBatch` (or on the sink table);
    * in batch it composes directly — the q141 shape.
    */
  def lastClick(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("click_ts").desc_nulls_last, col("click_id").desc_nulls_last)
    pairs
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .drop("_r")
  }
}
