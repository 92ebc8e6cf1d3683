package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of
  * [[graft.operators.Dedup.exact]] for continuous ingest: drop
  * re-arrivals of the same content key as documents flow in, instead
  * of re-scanning the corpus per batch.
  *
  * Two state regimes, chosen by how the key space grows:
  *
  *  - [[exact]]: `dropDuplicates` on the key — exact forever, but the
  *    state store keeps every key ever seen. Right for bounded key
  *    spaces (batch ids, source files), wrong for an unbounded corpus.
  *  - [[exactWithinWatermark]]: `dropDuplicatesWithinWatermark` — the
  *    state store holds only keys newer than the event-time watermark
  *    minus the delay, so state is bounded by ingest-rate × delay no
  *    matter how long the stream runs (the only formulation that
  *    survives 100 TB/day). Duplicates arriving later than the delay
  *    are late data by definition and pass through — the lake-side
  *    batch `Dedup.exact` stays the final guarantee; the stream keeps
  *    the hot path clean.
  *
  * Both shuffle once on the key (hash-partitioned state store), same
  * as the batch groupBy — the plan shape scales with executors.
  */
object StreamingDedup {

  /** Content identity for text payloads: md5 of the raw bytes —
    * deterministic, engine-portable, and 16 bytes of state per key
    * instead of the document. Null text hashes to a null key (grouped
    * together by dropDuplicates' null-safe equality) — the SAME
    * grouping batch `Dedup.exact`'s md5 groupBy produces, so stream
    * and lake never disagree on whether null and empty-string
    * documents are duplicates (they are not).
    */
  def contentKey(text: Column): Column = md5(text.cast("binary"))

  /** Exact streaming dedup on arbitrary key columns; unbounded state. */
  def exact(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  /** Watermark-bounded streaming dedup: duplicates of a key are
    * dropped while the key is within `delay` of the watermark; state
    * self-expires after that.
    */
  def exactWithinWatermark(stream: DataFrame, tsCol: String, delay: String,
      keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Document-stream convenience: dedup on the md5 content key of
    * `textCol`, watermark-bounded. The key column `content_md5` is
    * kept in the output — it is the id the downstream near-dup
    * (MinHash/SimHash) stages bucket on.
    */
  def dedupDocuments(stream: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    exactWithinWatermark(
      stream.withColumn("content_md5", contentKey(col(textCol))),
      tsCol, delay, Seq("content_md5"))

  /** Chunk-level streaming dedup — the streaming twin of
    * [[graft.operators.Dedup.cdcDedupReport]]'s dedup half: documents
    * explode into content-defined chunks as they arrive
    * ([[graft.operators.Dedup.cdcChunks]] is stateless per row, so it
    * runs unchanged on the stream), and only first-seen chunk hashes
    * pass — sub-document dedup at ingest, catching the boilerplate and
    * re-quoted passages document-level keys miss. State is one 60-bit
    * hash per chunk within the watermark delay: bounded by
    * chunk-ingest-rate × delay, the only formulation that survives an
    * unbounded stream.
    *
    * Output: the surviving (id, tsCol, chunk_no, chunk_h, n_words)
    * chunk rows, append-mode compatible.
    */
  def dedupChunks(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, delay: String, mask: Int = 16): DataFrame =
    exactWithinWatermark(
      graft.operators.Dedup.cdcChunks(stream, idCol, textCol, mask,
        carry = Seq(tsCol)),
      tsCol, delay, Seq("chunk_h"))

  /** Streaming cluster-label maintenance — the streaming twin of
    * [[graft.operators.Dedup.maintainComponents]]: each micro-batch of
    * near-dup PAIRS (id_a, id_b) folds into a versioned label table
    * through [[graft.operators.Dedup.maintainComponentsDelta]], so the
    * lake always carries the labeling a full recompute over every pair
    * seen so far would produce — while each batch pays only the
    * contracted-graph fixpoint plus a COW upsert of the labels that
    * actually changed (per-ingest IO tracks the merge, not history).
    *
    * Same foreachBatch rationale as the ingest gates (the update needs
    * a join against the very table the stream is appending to), same
    * one-code-path guarantee (stream and batch maintenance CANNOT
    * drift), same idempotence: a re-delivered batch's edges contract
    * to self-loops, the delta comes back empty, and nothing commits —
    * at-least-once sources land exactly-once label state.
    *
    * State: none in the streaming engine — the state IS the label
    * table (recordkey = id, precombine = batch_no), readable by any
    * batch job mid-stream.
    */
  def clusterMaintGate(stream: DataFrame,
      labels: graft.operators.VersionedTable,
      checkpointDir: String, batchBase: Long = 0L,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // Precombine-floor cache (ADVICE r13): the stored max(batch_no)
    // only advances through THIS writer's own commits (the gate is the
    // label table's single writer — the same assumption every
    // foreachBatch upsert loop here already makes), so the
    // history-wide max aggregation runs ONCE, on the first committing
    // batch after start/restart, and the floor advances locally with
    // each commit thereafter — per-ingest IO tracks the merge, not a
    // 10⁸-label table scan per micro-batch. −1 = not yet read.
    var floorCache = -1L
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val snap = labels.snapshotOpt
        val prior = snap
          .map(_.select(col("id"), col("cluster_id")))
          .getOrElse(spark.range(0)
            .select(col("id"), col("id").as("cluster_id")))
        val changes = graft.operators.Dedup.maintainComponentsDelta(
          prior, batch.select(col("id_a"), col("id_b")))
          .localCheckpoint(true)
        if (!changes.isEmpty) {
          // the precombine stamp must stay monotone across CHECKPOINT
          // RESETS too: a fresh checkpoint restarts batchId at 0, and
          // upsert keeps the max-precombine row per key — a stamp
          // below the stored maximum would silently LOSE the new
          // labels. Derive the floor from the table itself (once per
          // gate lifetime — cached above); batchBase remains the
          // caller's provenance offset.
          if (floorCache < 0L)
            floorCache = snap
              .map(_.agg(max(col("batch_no"))).collect()(0))
              .collect { case r if !r.isNullAt(0) => r.getLong(0) + 1L }
              .getOrElse(0L)
          val stamp = math.max(floorCache, batchBase + batchId)
          labels.upsert(changes.withColumn("batch_no", lit(stamp)))
          floorCache = stamp + 1L
        }
        ()
      }
      .start()
  }
}
