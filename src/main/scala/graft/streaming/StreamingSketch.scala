package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming quantile-sketch maintenance — the streaming twin of
  * [[graft.operators.Sketches.quantileSketchMerge]] (battery q221):
  * each source's bottom-k-by-hash sample is kept CURRENT in the state
  * store as documents arrive, instead of recomputed from the corpus
  * per read. Because bottom-k merge is LOSSLESS (the k smallest
  * hashes of a union are contained in the union of each side's k
  * smallest), the streamed state is bit-identical to the batch
  * operator's sample over the same history — the spec pins
  * stream ≡ batch on the k-sets themselves, not on derived estimates.
  *
  * Scale shape, in two stages:
  *
  *  1. [[localCut]] — a STATELESS per-partition pre-cut
  *     (`mapPartitions`, capped (h, v) max-heaps): each input
  *     partition forwards at most sources·k pairs per micro-batch, so
  *     the stateful shuffle carries samples, never the document
  *     stream. This is the map-side combine the batch operator gets
  *     from its salted two-level window; a hot source costs
  *     partitions·k shuffled rows, not its row count.
  *  2. [[maintain]] — `mapGroupsWithState` keyed by source; state is
  *     one sorted Vector of ≤ k (h, v) pairs = 16·k bytes per source
  *     FOREVER, regardless of stream length (the sketch contract).
  *     Update output mode: one row per source per micro-batch that
  *     touched it; the sink upserts by source and a corpus-wide
  *     quantile is answered from sources·k rows via the same
  *     lossless-merge law (explode with [[sketchRows]], re-cut).
  *
  * The hash is the engine-wide `md5Long(id)` — deterministic across
  * runs, engines, and partitionings, so replaying history yields the
  * same sample (rand()-reservoirs are none of these). Re-deliveries of
  * the same id are NOT deduplicated (multiset semantics, same as the
  * batch twin); feed the stream exactly-once rows, e.g. downstream of
  * [[StreamingDedup]].
  *
  * Reference scope: the reference pipeline has no streaming tier; this
  * extends q221's sketch algebra to continuous ingest, Spark-first.
  */
object StreamingSketch {

  /** One hashed observation: `h = md5Long(id)`, `v` the sketched value. */
  final case class HV(source: String, h: Long, v: Long)

  final case class QSketchState(hs: Vector[Long], vs: Vector[Long])

  /** Per-source sample snapshot: parallel arrays sorted by (h, v),
    * `m_sample` = their length (≤ k).
    */
  final case class SourceSketch(source: String, m_sample: Long,
      hs: Seq[Long], vs: Seq[Long])

  private val hvOrd: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  /** Fold (h, v) pairs into a capped max-heap keeping the k smallest
    * by (h, v) — the shared cut used by both stages. Multiset
    * semantics: duplicate pairs both survive if within k, exactly like
    * the batch operator's row_number cut.
    */
  private def heapCut(it: Iterator[(Long, Long)], seed: Iterable[(Long, Long)],
      k: Int): Vector[(Long, Long)] = {
    val heap = mutable.PriorityQueue.empty[(Long, Long)](hvOrd) // max at head
    seed.foreach(heap.enqueue(_))
    while (heap.size > k) heap.dequeue()
    it.foreach { p =>
      if (heap.size < k) heap.enqueue(p)
      else if (hvOrd.lt(p, heap.head)) { heap.dequeue(); heap.enqueue(p) }
    }
    heap.dequeueAll.reverse.toVector // ascending (h, v)
  }

  /** Stage 1 — stateless per-partition bottom-k per source. Memory is
    * (sources seen in the partition)·k pairs; output per partition per
    * micro-batch is the same bound. Runs BEFORE the stateful shuffle.
    */
  def localCut(rows: Dataset[HV], k: Int): Dataset[HV] = {
    // same contract error as maintain — a direct caller with k < 2
    // must not surface as a NoSuchElementException inside heapCut
    require(k >= 2, s"need k >= 2, got $k")
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val acc = mutable.Map.empty[String, Vector[(Long, Long)]]
      it.foreach { r =>
        val cur = acc.getOrElse(r.source, Vector.empty)
        // amortize: only re-cut when the buffer doubles past k
        val next = cur :+ (r.h, r.v)
        acc(r.source) =
          if (next.length >= 2 * k) heapCut(Iterator.empty, next, k) else next
      }
      acc.iterator.flatMap { case (s, pairs) =>
        heapCut(Iterator.empty, pairs, k).iterator.map(p => HV(s, p._1, p._2))
      }
    }
  }

  /** Stage 2 — the stateful transform: merge each micro-batch's
    * pre-cut pairs into the per-source k-set and emit the updated
    * snapshot (Update output mode; the sink upserts by source).
    * Works identically on a batch Dataset (one "micro-batch" covering
    * all history) — lossless merge makes the two indistinguishable.
    */
  def maintain(rows: Dataset[HV], k: Int): Dataset[SourceSketch] = {
    require(k >= 2, s"need k >= 2, got $k")
    import rows.sparkSession.implicits._
    localCut(rows, k).groupByKey(_.source)
      .mapGroupsWithState[QSketchState, SourceSketch](GroupStateTimeout.NoTimeout) {
        (source, incoming, state: GroupState[QSketchState]) =>
          val prior = state.getOption
            .map(s => s.hs.zip(s.vs)).getOrElse(Vector.empty)
          val merged = heapCut(incoming.map(r => (r.h, r.v)), prior, k)
          state.update(QSketchState(merged.map(_._1), merged.map(_._2)))
          SourceSketch(source, merged.length.toLong,
            merged.map(_._1), merged.map(_._2))
      }
  }

  /** Document-stream convenience: hash `idCol` with the engine-wide
    * md5Long and sketch `valueCol` per `sourceCol` — the q221 column
    * contract on a stream.
    */
  def sketchDocuments(stream: DataFrame, idCol: String, valueCol: String,
      sourceCol: String, k: Int): Dataset[SourceSketch] = {
    import stream.sparkSession.implicits._
    maintain(stream.select(col(sourceCol).as("source"),
      graft.functions.md5Long(col(idCol).cast("string")).as("h"),
      col(valueCol).cast("long").as("v")).as[HV], k)
  }

  /** Explode upserted [[SourceSketch]] snapshots back to (source, h, v)
    * sample rows — the input shape for merged-quantile reads (re-cut
    * the union to k for the global sketch, the q221 merge law).
    */
  def sketchRows(snapshots: DataFrame): DataFrame =
    snapshots.select(col("source"),
        explode(arrays_zip(col("hs"), col("vs"))).as("_p"))
      .select(col("source"), col("_p.hs").as("h"), col("_p.vs").as("v"))

  /** Weighted-sample twin: the per-stratum priority sample
    * ([[graft.operators.Sampling.prioritySampleByStratum]], battery
    * q234) kept current on a stream. Pure reuse of the bottom-k
    * machinery — (prio = md5(id) DIV weight, id) plays (h, v) in the
    * SAME lossless merge, so everything proven for the quantile
    * sketch carries verbatim: stateless per-partition pre-cut, ≤16·k
    * bytes of state per stratum forever, streamed state ≡ the batch
    * operator over the union of micro-batches. Snapshot shape:
    * hs = priorities, vs = ids (ascending (prio, id) = rank order).
    * Weight < 1 or NULL raises — the batch operator's contract.
    */
  def sampleWeighted(stream: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, k: Int): Dataset[SourceSketch] = {
    import stream.sparkSession.implicits._
    val w = when(col(weightCol).isNull || col(weightCol).cast("long") < 1L,
        raise_error(lit("sampleWeighted: weight must be >= 1")))
      .otherwise(col(weightCol).cast("long"))
    maintain(stream
      .select(col(stratumCol).as("source"), col(idCol).cast("long").as("v"),
        graft.functions.md5Long(col(idCol).cast("string")).as("_mh"),
        w.as("_w"))
      .withColumn("h", expr("CAST(_mh DIV _w AS BIGINT)"))
      .select(col("source"), col("h"), col("v")).as[HV], k)
  }
}
