package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalDedup => ID, VersionedTable}

/** The dedup-on-ingest gates' SHARED contract, pinned in ONE
  * table-driven sweep (VERDICT r12 item 8; r13 item 5 added the
  * seventh member) — the StreamingSpec state-identity-table pattern
  * applied to the batch gates, so contract drift between family
  * members fails one named row instead of going unnoticed. Expected
  * results are TABLE FIELDS (not branch logic), so a member whose
  * semantics genuinely diverge declares that divergence in data:
  *
  * | gate (battery row)  | index key | first ingest               | re-delivery result | re-delivery commit |
  * |---------------------|-----------|----------------------------|--------------------|--------------------|
  * | exact (q94)         | h         | first occurrence           | empty              | none               |
  * | near-dup (q173)     | doc_id    | first occurrence           | empty              | none               |
  * | semantic (q204)     | id        | all (batch-granular)       | empty              | none               |
  * | fingerprint (q214)  | media_id  | first occurrence           | empty              | none               |
  * | stitch (q239)       | fid       | flags seams, admits all    | pairs RE-FLAGGED   | boundary overwrite |
  * | semantic-PQ (q246)  | id        | all (batch-granular)       | empty*             | none               |
  * | cluster-maint (q255)| id        | full label write set       | empty (self-loops) | none               |
  * | cm-edges (q263 ing.)| id        | full label write set       | empty (self-loops) | none               |
  * | sample (q264)       | id        | full k-set                 | empty (loses cut)  | none               |
  * | buf-sample (q279)   | id        | full (k+m)-set             | empty (loses cut)  | none               |
  *
  * (the r16 addition: `maintainSampleBuffered` is q279's ingest side —
  * identical ingest semantics to q264's row at cut k+m, plus the cap
  * column takedowns spend; the takedown itself is a DELETE flow and is
  * sweep-pinned in BufferedSampleSpec, like q263's in
  * TakedownRepairSpec. The q281 takedown-everywhere composition row
  * introduces NO new lake-writing gate: every structure it drives is
  * either a row of this table — cm-edges, buf-sample — or a
  * maintenance reader (maintainPostings/maintainRollupCdc/
  * maintainPqIndex) pinned in VersionedTableSpec/OperatorsSpec; the
  * lake-writing-gate enumeration here stays complete.)
  *
  * (the r15 additions complete the lake-writing enumeration:
  * `maintainClustersWithEdges` is the q263 flow's ingest side — label
  * semantics identical to q255's row, plus the persisted edge
  * relation; `maintainSample` exercises the one gate whose
  * maintenance also COW-DELETES — rows falling out of the k-set.
  * `takedown` is a DELETE flow, not an ingest — its shape (two
  * tables, a deleted-id input, remove+relabel write sets) doesn't
  * reduce to this table's columns; its full contract — requires,
  * pinning, re-delivery no-commit, floor-monotone reset stamp — is
  * sweep-pinned in TakedownRepairSpec instead.)
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
  * index (content idempotence for the admit gates, zero contracted
  * edges for the maintenance gate, record-key overwrite for the flag
  * gate). The maintenance member additionally pins the CHECKPOINT-
  * RESET precombine contract (the be0235e fix, shared with the
  * streaming twin): a batch stamped with a RESET counter (batchNo
  * below stamps already in the table) must still win the COW
  * precombine race via the floor-monotone stamp — asserted by
  * re-reading the final snapshot, which shows stale labels if the
  * stamp regressed.
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
  // maintenance alphabet: each seed (i, letter) is the EDGE
  // (i, anchor(letter)) — same letter ⇒ same component via its anchor
  private val anchors = Map("A" -> 101L, "B" -> 102L, "C" -> 103L)

  private def textDf(words: Map[String, String])(seeds: Seq[(Long, String)]) =
    seeds.map { case (i, c) => (i, words(c)) }.toDF("id", "text")
  private def edgeDf(seeds: Seq[(Long, String)]) =
    seeds.map { case (i, c) => (i, anchors(c)) }.toDF("id_a", "id_b")

  /** One family member normalized to the common harness: `mk` maps
    * (id, letter) seeds to the gate's input schema, `ingest` runs the
    * gate and projects its result to all-long columns (admitted id,
    * flagged pair, or written label). Expected results per step are
    * table data; `reset` is the maintenance member's checkpoint-reset
    * leg: (seed batch ingested at batchNo=0, expected write set,
    * expected FINAL index labels after the floor-monotone stamp wins).
    */
  private case class Gate(
      name: String,
      recordKey: String,
      mk: Seq[(Long, String)] => DataFrame,
      ingest: (VersionedTable, DataFrame, Long) => DataFrame,
      r1: Set[Seq[Long]],
      idx1: Long,
      r2: Set[Seq[Long]],
      idx2Grow: Long,
      r3: Set[Seq[Long]],
      redeliverCommits: Boolean,
      reset: Option[(Seq[(Long, String)], Set[Seq[Long]], Set[Seq[Long]])] =
        None)

  private val gates = Seq(
    Gate("exact-q94", "h", textDf(plainWords),
      (t, b, n) => ID.appendNovel(t, b, "id", "text", n)
        .select(col("doc_id")),
      r1 = Set(Seq(1L), Seq(2L)), idx1 = 2L,
      r2 = Set(Seq(11L)), idx2Grow = 1L,
      r3 = Set.empty, redeliverCommits = false),
    Gate("neardup-q173", "doc_id", textDf(plainWords),
      (t, b, n) => ID.appendNovelNearDup(t, b, "id", "text", n)
        .select(col("doc_id")),
      r1 = Set(Seq(1L), Seq(2L)), idx1 = 2L,
      r2 = Set(Seq(11L)), idx2Grow = 1L,
      r3 = Set.empty, redeliverCommits = false),
    Gate("semantic-q204", "id",
      seeds => seeds.map { case (i, c) => (i, vecs(c)) }.toDF("id", "emb"),
      (t, b, n) => ID.appendNovelSemantic(t, b, "id", "emb", n,
          simThreshold1e6 = 900000L, signBits = 2)
        .select(col("id")),
      // in-batch exact copy ADMITS: batch-granular by documented trade
      r1 = Set(Seq(1L), Seq(2L), Seq(3L)), idx1 = 3L,
      r2 = Set(Seq(11L)), idx2Grow = 1L,
      r3 = Set.empty, redeliverCommits = false),
    Gate("fingerprint-q214", "media_id",
      seeds => seeds.map { case (i, c) => (i, fps(c)) }.toDF("id", "fp"),
      (t, b, n) => ID.appendNovelFingerprint(t, b, "id", "fp", n)
        .select(col("media_id")),
      r1 = Set(Seq(1L), Seq(2L)), idx1 = 2L,
      r2 = Set(Seq(11L)), idx2Grow = 1L,
      r3 = Set.empty, redeliverCommits = false),
    Gate("stitch-q239", "fid", textDf(stitchWords),
      (t, b, n) => ID.detectStitches(t, b, "id", "text", w = 2, n)
        .select(col("id_a"), col("id_b")),
      // within-batch seams flagged; everything admits
      r1 = Set(Seq(1L, 2L), Seq(3L, 2L)), idx1 = 3L,
      // history head (B=2) continues batch tail (10=A); flag gate
      // admits both batch rows
      r2 = Set(Seq(10L, 2L)), idx2Grow = 2L,
      // re-delivery RE-FLAGS its pairs (documented, not idempotent
      // output) and its boundary upsert overwrites by record key
      r3 = Set(Seq(10L, 2L)), redeliverCommits = true),
    Gate("semantic-pq-q246", "id",
      seeds => seeds.map { case (i, c) => (i, vecsPq(c)) }.toDF("id", "emb"),
      (t, b, n) => ID.appendNovelSemanticPq(t, b, "id", "emb", n,
          adcThreshold1e6 = 900000L, signBits = 2, codebooks = pqCbs)
        .select(col("id")),
      r1 = Set(Seq(1L), Seq(2L), Seq(3L)), idx1 = 3L,
      r2 = Set(Seq(11L)), idx2Grow = 1L,
      r3 = Set.empty, redeliverCommits = false),
    Gate("cluster-maint-q255", "id", edgeDf,
      (t, b, n) => ID.maintainClusters(t, b, n)
        .select(col("id"), col("cluster_id")),
      // first ingest: edges (1,101),(2,102),(3,101) — the write set is
      // every label of the fresh CC (components {1,3,101}=1, {2,102}=2)
      r1 = Set(Seq(1L, 1L), Seq(3L, 1L), Seq(101L, 1L),
        Seq(2L, 2L), Seq(102L, 2L)),
      idx1 = 5L,
      // second ingest: (10,101) joins component 1, (11,103) is new —
      // write set = changed/new labels only, never untouched history
      r2 = Set(Seq(10L, 1L), Seq(11L, 11L), Seq(103L, 11L)),
      idx2Grow = 3L,
      // re-delivery: every edge contracts to a prior-rep self-loop
      r3 = Set.empty, redeliverCommits = false,
      // checkpoint-reset leg: edge (2,101) merges {2,102} into
      // component 1, delivered at batchNo=0 — BELOW the stamps already
      // stored. The floor-monotone stamp must still win precombine:
      // the final snapshot shows the merged labels, not the stale ones
      reset = Some((Seq((2L, "A")),
        Set(Seq(2L, 1L), Seq(102L, 1L)),
        Set(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(101L, 1L),
          Seq(102L, 1L), Seq(10L, 1L), Seq(11L, 11L), Seq(103L, 11L))))),
    // the q263 ingest side: label semantics IDENTICAL to the q255 row
    // (the same maintainClusters underneath), plus the persisted
    // labeled-edge relation takedowns read; the per-labels edge table
    // is memoized so the wrong-key probe and the real index each get
    // their own
    {
      val etabs = scala.collection.mutable.Map
        .empty[VersionedTable, VersionedTable]
      def edgesFor(t: VersionedTable): VersionedTable =
        etabs.getOrElseUpdate(t,
          vt(s"cme_edges_${System.identityHashCode(t)}", "edge_key"))
      Gate("cluster-maint-edges-q263", "id", edgeDf,
        (t, b, n) => ID.maintainClustersWithEdges(t, edgesFor(t), b, n)
          .select(col("id"), col("cluster_id")),
        r1 = Set(Seq(1L, 1L), Seq(3L, 1L), Seq(101L, 1L),
          Seq(2L, 2L), Seq(102L, 2L)),
        idx1 = 5L,
        r2 = Set(Seq(10L, 1L), Seq(11L, 11L), Seq(103L, 11L)),
        idx2Grow = 3L,
        r3 = Set.empty, redeliverCommits = false,
        reset = Some((Seq((2L, "A")),
          Set(Seq(2L, 1L), Seq(102L, 1L)),
          Set(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(101L, 1L),
            Seq(102L, 1L), Seq(10L, 1L), Seq(11L, 11L), Seq(103L, 11L)))))
    },
    // the maintained-sample gate: md5-derived priorities order the
    // sweep's ids 11 < 1 < 2 < 10 < 3 (pinned below by sampleOrder),
    // so with k=3 and unit weights ingest 2's entrant 11 displaces 3
    // (COW-delete) and rank-shifts 1 and 2 — the write set is exactly
    // {11@1, 1@2, 2@3}; 10 loses the cut both times it is delivered
    Gate("sample-q264", "id",
      seeds => seeds.map { case (i, _) => (i, 1L) }.toDF("id", "w"),
      (t, b, n) => ID.maintainSample(t, b, col("id"), col("w"), k = 3,
          batchNo = n)
        .select(col("id"), col("rank")),
      r1 = Set(Seq(1L, 1L), Seq(2L, 2L), Seq(3L, 3L)), idx1 = 3L,
      r2 = Set(Seq(11L, 1L), Seq(1L, 2L), Seq(2L, 3L)), idx2Grow = 0L,
      r3 = Set.empty, redeliverCommits = false),
    // the BUFFERED sample gate at k=2/m=1: cut size k+m = 3, so its
    // ingest walk is row-for-row the q264 row's at k=3 — the shared
    // maintainPrioritySample core, plus the cap column the takedown
    // spends (delete semantics pinned in BufferedSampleSpec)
    Gate("sample-buffered-q279", "id",
      seeds => seeds.map { case (i, _) => (i, 1L) }.toDF("id", "w"),
      (t, b, n) => ID.maintainSampleBuffered(t, b, col("id"), col("w"),
          k = 2, m = 1, batchNo = n)
        .select(col("id"), col("rank")),
      r1 = Set(Seq(1L, 1L), Seq(2L, 2L), Seq(3L, 3L)), idx1 = 3L,
      r2 = Set(Seq(11L, 1L), Seq(1L, 2L), Seq(2L, 3L)), idx2Grow = 0L,
      r3 = Set.empty, redeliverCommits = false))

  private def rows(df: DataFrame): Set[Seq[Long]] =
    df.collect().map(r => r.toSeq.map(_.asInstanceOf[Long])).toSet

  test("the sample row's md5-priority order assumption holds " +
    "(11 < 1 < 2 < 10 < 3 at unit weight)") {
    val byPrio = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
      .select(col("id"),
        graft.functions.md5Long(col("id").cast("string")).as("h"))
      .collect().sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    assert(byPrio == Seq(11L, 1L, 2L, 10L, 3L))
  }

  test("the dedup-on-ingest gate family shares one pinned contract " +
    "(key requirement, result pinning, re-delivery idempotence)") {
    gates.foreach { g => withClue(s"[${g.name}] ") {
      // 1. index-key requirement enforced up front
      intercept[IllegalArgumentException] {
        g.ingest(vt(s"${g.name}_wrongkey", "not_the_key"),
          g.mk(Seq((1L, "A"))), 1L)
      }
      val index = vt(s"${g.name}_idx", g.recordKey)
      // 2. first ingest: in-batch handling per the table
      val r1 = g.ingest(index, g.mk(Seq((1L, "A"), (2L, "B"), (3L, "A"))), 1L)
      assert(rows(r1) == g.r1, "first-ingest result per the table")
      assert(index.snapshot.count() == g.idx1)
      // 3. cross-batch: history semantics per the table (dup rejected,
      // seam flagged, or changed/new labels only); novelty admitted
      val b2 = g.mk(Seq((10L, "A"), (11L, "C")))
      val r2 = g.ingest(index, b2, 2L)
      val r2pin = r2.collect().toSeq // pin probe: rows as collected NOW
      assert(rows(r2) == g.r2, "second-ingest result per the table")
      assert(index.snapshot.count() == g.idx1 + g.idx2Grow)
      val n2 = index.snapshot.count()
      val commits2 = index.commits.length
      // 4. re-delivery of the same batch
      val r3 = g.ingest(index, b2, 3L)
      assert(rows(r3) == g.r3, "re-delivery result per the table")
      if (g.redeliverCommits)
        assert(index.commits.length == commits2 + 1,
          "boundary upsert overwrites by record key and always commits")
      else
        assert(index.commits.length == commits2,
          "empty admission must not commit")
      assert(index.snapshot.count() == n2, "re-delivery never grows the index")
      // 5. the ingest-2 result was PINNED before later ingests mutated
      // the snapshot: re-collecting it now must reproduce the rows
      assert(r2.collect().toSeq == r2pin, "result pinned via localCheckpoint")
      // 5b. the maintenance gate's precombine-column contract is as
      // load-bearing as the key (a cluster_id-precombined table would
      // silently lose every merge to keep-max) — enforced up front
      if (g.name.startsWith("cluster-maint"))
        intercept[IllegalArgumentException] {
          g.ingest(new VersionedTable(spark,
            Fixtures.tmpDir(s"${g.name}_wrongpc").toString, "id",
            "cluster_id", numBuckets = 4), g.mk(Seq((1L, "A"))), 1L)
        }
      // 6. checkpoint-reset precombine contract (maintenance member):
      // a write set delivered at a RESET batchNo must not lose the COW
      // precombine race against already-stored stamps
      g.reset.foreach { case (seeds, expectWrite, expectFinal) =>
        val rr = g.ingest(index, g.mk(seeds), 0L)
        assert(rows(rr) == expectWrite, "reset-batch write set")
        assert(rows(index.snapshot.select(col("id"), col("cluster_id")))
          == expectFinal,
          "floor-monotone stamp wins precombine after a counter reset")
      }
    }}
  }
}
