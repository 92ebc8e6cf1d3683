package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalDedup => ID, VersionedTable}

/** The dedup-on-ingest gates' SHARED contract, pinned in ONE
  * table-driven sweep (VERDICT r12 item 8) — the StreamingSpec
  * state-identity-table pattern applied to the batch gates, so
  * contract drift between family members fails one named row instead
  * of going unnoticed:
  *
  * | gate (battery row)  | index key | in-batch exact dedup | re-delivery result | re-delivery commit | index on re-delivery |
  * |---------------------|-----------|----------------------|--------------------|--------------------|----------------------|
  * | exact (q94)         | h         | first occurrence     | empty              | none               | unchanged            |
  * | near-dup (q173)     | doc_id    | first occurrence     | empty              | none               | unchanged            |
  * | semantic (q204)     | id        | NONE (batch-granular)| empty              | none               | unchanged            |
  * | fingerprint (q214)  | media_id  | first occurrence     | empty              | none               | unchanged            |
  * | stitch (q239)       | fid       | n/a (flags, all admit)| pairs RE-FLAGGED  | boundary overwrite | unchanged            |
  * | semantic-PQ (q246)  | id        | NONE (batch-granular)| empty*             | none               | unchanged            |
  *
  * (*) the PQ gate's re-delivery idempotence additionally requires
  * each vector's PQ reconstruction cosine ≥ the gate threshold (its
  * documented contract) — this table's codebooks reconstruct the
  * fixture vectors exactly, so the shared assertion applies verbatim.
  *
  * Shared invariants asserted for every row: (1) the index-key
  * requirement is enforced (require, not silent misuse); (2) the
  * returned frame is PINNED via localCheckpoint(true) before the
  * commit mutates the snapshot — re-collecting it after later ingests
  * yields the same rows; (3) re-delivering a batch NEVER grows the
  * index (content idempotence for the four admit gates, record-key
  * overwrite for the flag gate). Divergences are table fields, not
  * surprises: semantic admits in-batch exact copies (documented
  * batch-granular trade), stitch flags provenance pairs instead of
  * rejecting and its boundary upsert always commits.
  */
class IngestGateContractSpec extends SparkSpec {
  import spark.implicits._

  private def vt(name: String, key: String) = new VersionedTable(spark,
    Fixtures.tmpDir(name).toString, key, "batch_no", numBuckets = 4)

  // content alphabets: same letter => same content (the dup relation);
  // distinct letters are far apart in each gate's similarity space
  private val plainWords = Map(
    "A" -> "alpha bravo charlie delta", "B" -> "echo foxtrot golf hotel",
    "C" -> "wumpus quartz veldt jynx")
  // stitch alphabet: B's head IS A's tail, so (A, B) is a seam pair
  private val stitchWords = Map(
    "A" -> "alpha bravo charlie delta", "B" -> "charlie delta echo foxtrot",
    "C" -> "wumpus quartz veldt jynx")
  private val vecs = Map(
    "A" -> Seq(1.0, 0.0, 0.0), "B" -> Seq(0.0, 1.0, 0.0),
    "C" -> Seq(0.0, 0.0, 1.0))
  // PQ alphabet: no zero slices (a zero subspace scores 0 by the
  // scoreFixedSafe guard and would break self-recognition); m=2/k=2
  // codebooks over these three reconstruct them EXACTLY, so identical
  // re-delivery scores mean ADC 1e6 and the shared idempotence
  // assertion applies; the closest distinct pair (A vs C) scores 0.5e6
  private val vecsPq = Map(
    "A" -> Seq(1.0, 0.0, 1.0, 0.0), "B" -> Seq(0.0, 1.0, 0.0, 1.0),
    "C" -> Seq(1.0, 0.0, 0.0, 1.0))
  private lazy val pqCbs = graft.operators.Similarity.trainPqCodebooks(
    vecsPq.values.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong + 1, v) }.toDF("id", "emb"),
    m = 2, k = 2, iters = 2)
  private val fps = Map("A" -> 0L, "B" -> 0x0F0F0F0F0F0F0F0FL,
    "C" -> 0x3333333333333333L)

  private def textDf(words: Map[String, String])(seeds: Seq[(Long, String)]) =
    seeds.map { case (i, c) => (i, words(c)) }.toDF("id", "text")

  /** One family member normalized to the common harness: `mk` maps
    * (id, letter) seeds to the gate's input schema, `ingest` runs the
    * gate and projects its id column (admit gates) or its pair columns
    * (the flag gate).
    */
  private case class Gate(
      name: String,
      recordKey: String,
      mk: Seq[(Long, String)] => DataFrame,
      ingest: (VersionedTable, DataFrame, Long) => DataFrame,
      flags: Boolean,
      inBatchDedup: Boolean)

  private val gates = Seq(
    Gate("exact-q94", "h", textDf(plainWords),
      (t, b, n) => ID.appendNovel(t, b, "id", "text", n)
        .select(col("doc_id").as("rid")),
      flags = false, inBatchDedup = true),
    Gate("neardup-q173", "doc_id", textDf(plainWords),
      (t, b, n) => ID.appendNovelNearDup(t, b, "id", "text", n)
        .select(col("doc_id").as("rid")),
      flags = false, inBatchDedup = true),
    Gate("semantic-q204", "id",
      seeds => seeds.map { case (i, c) => (i, vecs(c)) }.toDF("id", "emb"),
      (t, b, n) => ID.appendNovelSemantic(t, b, "id", "emb", n,
          simThreshold1e6 = 900000L, signBits = 2)
        .select(col("id").as("rid")),
      flags = false, inBatchDedup = false),
    Gate("fingerprint-q214", "media_id",
      seeds => seeds.map { case (i, c) => (i, fps(c)) }.toDF("id", "fp"),
      (t, b, n) => ID.appendNovelFingerprint(t, b, "id", "fp", n)
        .select(col("media_id").as("rid")),
      flags = false, inBatchDedup = true),
    Gate("stitch-q239", "fid", textDf(stitchWords),
      (t, b, n) => ID.detectStitches(t, b, "id", "text", w = 2, n)
        .select(col("id_a"), col("id_b")),
      flags = true, inBatchDedup = false),
    Gate("semantic-pq-q246", "id",
      seeds => seeds.map { case (i, c) => (i, vecsPq(c)) }.toDF("id", "emb"),
      (t, b, n) => ID.appendNovelSemanticPq(t, b, "id", "emb", n,
          adcThreshold1e6 = 900000L, signBits = 2, codebooks = pqCbs)
        .select(col("id").as("rid")),
      flags = false, inBatchDedup = false))

  private def ids(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet
  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("the dedup-on-ingest gate family shares one pinned contract " +
    "(key requirement, result pinning, re-delivery idempotence)") {
    gates.foreach { g => withClue(s"[${g.name}] ") {
      // 1. index-key requirement enforced up front
      intercept[IllegalArgumentException] {
        g.ingest(vt(s"${g.name}_wrongkey", "not_the_key"),
          g.mk(Seq((1L, "A"))), 1L)
      }
      val index = vt(s"${g.name}_idx", g.recordKey)
      // 2. first ingest: in-batch exact-dup handling per the table
      val r1 = g.ingest(index, g.mk(Seq((1L, "A"), (2L, "B"), (3L, "A"))), 1L)
      if (g.flags) assert(pairs(r1) == Set((1L, 2L), (3L, 2L)),
        "within-batch seams flagged")
      else assert(ids(r1) ==
        (if (g.inBatchDedup) Set(1L, 2L) else Set(1L, 2L, 3L)))
      val n1 = index.snapshot.count()
      // 3. cross-batch: history dup rejected (admit gates) or seam
      // flagged against history (flag gate); genuine novelty admitted
      val b2 = g.mk(Seq((10L, "A"), (11L, "C")))
      val r2 = g.ingest(index, b2, 2L)
      val r2pin = r2.collect().toSeq // pin probe: rows as collected NOW
      if (g.flags) {
        assert(pairs(r2) == Set((10L, 2L)), "history head continues batch tail")
        assert(index.snapshot.count() == n1 + 2, "flag gate admits everything")
      } else {
        assert(ids(r2) == Set(11L), "history dup rejected, novelty admitted")
        assert(index.snapshot.count() == n1 + 1)
      }
      val n2 = index.snapshot.count()
      val commits2 = index.commits.length
      // 4. re-delivery of the same batch
      val r3 = g.ingest(index, b2, 3L)
      if (g.flags) {
        assert(pairs(r3) == Set((10L, 2L)),
          "re-delivery re-flags its pairs (documented, not idempotent output)")
        assert(index.commits.length == commits2 + 1,
          "boundary upsert overwrites by record key and always commits")
      } else {
        assert(r3.isEmpty, "re-delivery admits nothing")
        assert(index.commits.length == commits2,
          "empty admission must not commit")
      }
      assert(index.snapshot.count() == n2, "re-delivery never grows the index")
      // 5. the ingest-2 result was PINNED before later ingests mutated
      // the snapshot: re-collecting it now must reproduce the rows
      assert(r2.collect().toSeq == r2pin, "result pinned via localCheckpoint")
    }}
  }
}
