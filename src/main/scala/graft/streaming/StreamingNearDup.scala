package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{IncrementalDedup, VersionedTable}

/** Streaming NEAR-dup ingest — continuous
  * [[graft.operators.IncrementalDedup.appendNovelNearDup]]: each
  * micro-batch runs the batch admission operator (exact md5 OR
  * LSH-band + signature-agreement rejection against the admitted
  * signature index) and commits the survivors, via `foreachBatch`.
  *
  * Why foreachBatch and not a stateful streaming join: the admission
  * decision needs "∃ admitted historical doc within similarity T" —
  * an aggregate over a join against an index that THIS STREAM is
  * appending to. Spark's stream-static joins freeze the static side
  * per batch and stateful dedup only sees exact keys, so the honest
  * formulation is the micro-batch one: freeze the index snapshot,
  * run the audited batch operator, commit, repeat. Exactly the shape
  * the versioned-lake maintenance jobs use (StreamingIngest,
  * q96's postings maintenance) — and it inherits the batch
  * operator's oracle-checked semantics verbatim, so stream and lake
  * CANNOT drift (one code path).
  *
  * Delivery guarantees: re-delivered micro-batches admit nothing new
  * (appendNovelNearDup is idempotent per content, and empty
  * admissions don't commit), so at-least-once sources land
  * exactly-once content in the index.
  *
  * State: none in the streaming engine (no watermark, no state
  * store) — the "state" IS the signature index table, bucketed and
  * manifest-pruned like any lake table, shared with batch jobs.
  */
object StreamingNearDup {

  /** Start the ingest gate: every micro-batch of `stream` (must carry
    * `idCol` + `textCol`) is admitted against — and folded into —
    * `index`. `batchBase` offsets the recorded batch_no so replays
    * across restarts keep monotone provenance.
    *
    * `trigger` controls the run mode: the default
    * `Trigger.AvailableNow()` drains what the source currently has
    * and STOPS (the test/replay/scheduled-ingest-cycle shape — call
    * again per cycle); pass `Trigger.ProcessingTime(...)` for a
    * continuously running gate.
    */
  def ingestGate(stream: DataFrame, index: VersionedTable,
      idCol: String, textCol: String,
      checkpointDir: String, batchBase: Long = 0L,
      simThreshold1e6: Long = 500000L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalDedup.appendNovelNearDup(index, batch, idCol, textCol,
          batchBase + batchId, simThreshold1e6)
        ()
      }
      .start()

  /** Embedding-space twin of [[ingestGate]]: every micro-batch runs
    * the batch semantic-admission operator
    * ([[graft.operators.IncrementalDedup.appendNovelSemantic]] —
    * sign-bucket blocking + in-bucket cosine verify against the
    * admitted vector index) and commits the survivors. Same
    * foreachBatch rationale, same trigger contract, same idempotence
    * (re-delivered vectors find themselves at cosine 10^6), and the
    * SAME code path as the lake-side batch gate, so stream and batch
    * cannot drift.
    */
  def semanticIngestGate(stream: DataFrame, index: VersionedTable,
      idCol: String, embCol: String,
      checkpointDir: String, batchBase: Long = 0L,
      simThreshold1e6: Long = 950000L, signBits: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalDedup.appendNovelSemantic(index, batch, idCol, embCol,
          batchBase + batchId, simThreshold1e6, signBits)
        ()
      }
      .start()

  /** PQ-CODED twin of [[semanticIngestGate]] — the same foreachBatch
    * shape over [[IncrementalDedup.appendNovelSemanticPq]] (one code
    * path for stream and lake, the family discipline): the index
    * stores (id, m codes, bucket) per admitted vector and micro-batch
    * admission verifies bucket collisions by ADC against the batch's
    * per-vector LUT — history never materializes vectors, so the
    * stream gate's state is m+2 ints per admitted vector forever.
    * Codebooks are caller state trained offline (retraining mid-stream
    * would silently re-key the index — the batch operator's contract);
    * re-delivery idempotence holds iff reconstruction cosine clears
    * the threshold, as documented there.
    */
  def semanticPqIngestGate(stream: DataFrame, index: VersionedTable,
      idCol: String, embCol: String,
      codebooks: Seq[Seq[(Int, Seq[Double])]],
      checkpointDir: String, batchBase: Long = 0L,
      adcThreshold1e6: Long = 950000L, signBits: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalDedup.appendNovelSemanticPq(index, batch, idCol, embCol,
          batchBase + batchId, adcThreshold1e6, signBits, codebooks)
        ()
      }
      .start()

  /** MULTIMODAL twin of [[ingestGate]]: every micro-batch first runs
    * `decode` — the REAL codec pass (e.g.
    * `Multimodal.decodeImageAHash(_)` or
    * `Multimodal.decodeAudioFingerprint(_)`), executed once per
    * arriving payload inside the batch — then admits by perceptual
    * fingerprint against the admitted fingerprint index
    * ([[graft.operators.IncrementalDedup.appendNovelFingerprint]]:
    * exact-fp OR banded-Hamming rejection). Same foreachBatch
    * rationale, same trigger contract, same idempotence
    * (re-delivered payloads re-fingerprint identically and find
    * themselves via the exact test), and the SAME code path as the
    * lake-side batch gate — stream and batch cannot drift. Index
    * state is 24 B per admitted item regardless of payload size: the
    * gate scales with the fingerprint index, never the media corpus.
    */
  def mediaIngestGate(stream: DataFrame, index: VersionedTable,
      idCol: String, fpCol: String,
      decode: DataFrame => DataFrame,
      checkpointDir: String, batchBase: Long = 0L,
      maxHamming: Int = 3, bands: Int = 4, strideBits: Int = 16,
      maskBits: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalDedup.appendNovelFingerprint(index, decode(batch),
          idCol, fpCol, batchBase + batchId, maxHamming, bands, strideBits,
          maskBits)
        ()
      }
      .start()

  /** Stitch-detection ingest gate — the q239 flagger on a stream:
    * every micro-batch runs the SAME IncrementalDedup.detectStitches
    * (one code path for stream and lake), appends its fragments to the
    * boundary index, and hands the pairs it found to `onPairs` (write
    * them next to the corpus; stitchReassemble's degree filter runs
    * downstream). Unlike the three dedup gates nothing is rejected —
    * continuations are provenance. State is the index itself (2·w
    * tokens + 2 longs per fragment); Spark streaming state stays
    * empty. Exactly-once batches are the q239 contract: a checkpoint
    * replay re-runs foreachBatch with the same batchId, and upsert by
    * fid makes the index idempotent, but re-found pairs reach
    * `onPairs` again — sink by (id_a, id_b) key.
    */
  def stitchIngestGate(stream: DataFrame, index: VersionedTable,
      idCol: String, textCol: String, w: Int,
      onPairs: (DataFrame, Long) => Unit,
      checkpointDir: String, batchBase: Long = 0L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onPairs(IncrementalDedup.detectStitches(index, batch,
          idCol, textCol, w, batchBase + batchId), batchBase + batchId)
        ()
      }
      .start()
}
