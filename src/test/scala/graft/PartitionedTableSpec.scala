package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup, VersionedTable}

/** Payload-partitioned VersionedTable (VERDICT r15 item 2): bucket the
  * FILES by a payload column (e.g. `cluster_id` on the dedup edge
  * store) while the record key stays the merge identity — Hudi's
  * partition-scoped (non-global) index contract. Pins: the layout
  * header open-guard, the documented stale-copy hazard a plain upsert
  * has on partition change, upsertMoved's cross-bucket move (including
  * the emptied-source-bucket manifest drop), snapshotPrunedBy's
  * file-level pruning (asserted on inputFiles), and the takedown flow
  * reading the edge relation PRUNED yet producing byte-identical
  * repairs to the key-bucketed twin.
  */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private val B = 8

  private def pvt(name: String) = new VersionedTable(spark,
    Fixtures.tmpDir(name).toString, "id", "ver", numBuckets = B,
    partitionColOpt = Some("grp"))

  private def rows(t: VersionedTable): Map[Long, (String, Long)] =
    t.snapshot.select(col("id"), col("grp"), col("ver")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  /** The table's bucket id for a partition value — the same
    * string-hash the layout uses.
    */
  private def bucketOf(v: String): Int =
    spark.range(1).select(pmod(xxhash64(lit(v)), lit(B.toLong)))
      .collect()(0).getLong(0).toInt

  private def bucketsIn(df: DataFrame): Set[Int] =
    df.inputFiles.map { f =>
      val m = "_bucket=(\\d+)".r.findFirstMatchIn(f)
      assert(m.isDefined, s"non-bucketed input file $f")
      m.get.group(1).toInt
    }.toSet

  test("partition column is persisted layout: header round-trips and " +
    "the open-guard rejects a mismatched reopen") {
    val root = Fixtures.tmpDir("pt_guard").toString
    val t = new VersionedTable(spark, root, "id", "ver", numBuckets = B,
      partitionColOpt = Some("grp"))
    t.upsert(Seq((1L, "a", 1L)).toDF("id", "grp", "ver"))
    // reopening with no partition column (or a different one) must fail
    intercept[IllegalArgumentException] {
      new VersionedTable(spark, root, "id", "ver", numBuckets = B)
        .upsert(Seq((2L, "a", 1L)).toDF("id", "grp", "ver"))
    }
    intercept[IllegalArgumentException] {
      new VersionedTable(spark, root, "id", "ver", numBuckets = B,
        partitionColOpt = Some("ver"))
        .upsert(Seq((2L, "a", 1L)).toDF("id", "grp", "ver"))
    }
    // and a key-bucketed table must refuse a partitioned reopen
    val root2 = Fixtures.tmpDir("pt_guard2").toString
    val kb = new VersionedTable(spark, root2, "id", "ver", numBuckets = B)
    kb.upsert(Seq((1L, "a", 1L)).toDF("id", "grp", "ver"))
    intercept[IllegalArgumentException] {
      new VersionedTable(spark, root2, "id", "ver", numBuckets = B,
        partitionColOpt = Some("grp"))
        .upsert(Seq((2L, "a", 1L)).toDF("id", "grp", "ver"))
    }
  }

  test("upsertMoved relocates a row across buckets; a PLAIN upsert on " +
    "a partition change leaves the stale copy (the documented " +
    "non-global-index hazard the move form exists for)") {
    // two partition values in different buckets (grp strings chosen at
    // runtime so the test never depends on hash specifics)
    val gs = (0 to 50).map(i => s"g$i")
    val a = gs.head
    val b = gs.find(g => bucketOf(g) != bucketOf(a)).get
    // the documented hazard, pinned: plain upsert of a moved row
    val hazard = pvt("pt_hazard")
    hazard.upsert(Seq((1L, a, 1L)).toDF("id", "grp", "ver"))
    hazard.upsert(Seq((1L, b, 2L)).toDF("id", "grp", "ver"))
    assert(hazard.snapshot.filter(col("id") === 1L).count() == 2L,
      "plain upsert cannot see the old bucket - stale copy survives")
    // the cure: upsertMoved with the old values
    val t = pvt("pt_move")
    t.upsert(Seq((1L, a, 1L), (2L, a, 1L)).toDF("id", "grp", "ver"))
    t.upsertMoved(Seq((1L, b, 2L)).toDF("id", "grp", "ver"),
      Seq(Tuple1(a)).toDF("grp"))
    assert(rows(t) == Map(1L -> ((b, 2L)), 2L -> ((a, 1L))),
      "moved row unique under its key, bystander untouched")
    // and the moved row physically lives in b's bucket now
    assert(bucketsIn(t.snapshotPrunedBy(Seq(Tuple1(b)).toDF("grp")))
      .contains(bucketOf(b)))
  }

  test("a source bucket emptied by a move falls out of the manifest — " +
    "its stale file cannot resurrect the moved rows") {
    val gs = (0 to 50).map(i => s"g$i")
    val a = gs.head
    val b = gs.find(g => bucketOf(g) != bucketOf(a)).get
    val t = pvt("pt_empty")
    t.upsert(Seq((1L, a, 1L)).toDF("id", "grp", "ver")) // a's bucket: 1 row
    t.upsertMoved(Seq((1L, b, 2L)).toDF("id", "grp", "ver"),
      Seq(Tuple1(a)).toDF("grp"))
    assert(rows(t) == Map(1L -> ((b, 2L))), "no resurrection")
    assert(!bucketsIn(t.snapshot).contains(bucketOf(a)),
      "emptied source bucket no longer referenced by the manifest")
  }

  test("snapshotPrunedBy opens ONLY the wanted values' buckets " +
    "(file-level pruning, pinned on inputFiles); delete requires and " +
    "uses the partition values") {
    val gs = (0 to 80).map(i => s"g$i")
    val t = pvt("pt_prune")
    t.upsert(gs.zipWithIndex.map { case (g, i) => (i.toLong, g, 1L) }
      .toDF("id", "grp", "ver"))
    val want = gs.take(2)
    val pruned = t.snapshotPrunedBy(want.map(Tuple1(_)).toDF("grp"))
    val wantBuckets = want.map(bucketOf).toSet
    assert(bucketsIn(pruned) == wantBuckets,
      "pruned read must open exactly the wanted buckets")
    assert(bucketsIn(t.snapshot).size > wantBuckets.size,
      "the full snapshot spans more buckets than the pruned read")
    // superset semantics: every wanted row present (bucket cohabitants
    // may ride along; the caller filters)
    val ids = pruned.filter(col("grp").isin(want: _*))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L))
    // delete: partition column required, and honored
    intercept[IllegalArgumentException] {
      t.delete(Seq(0L).toDF("id"))
    }
    t.delete(Seq((0L, gs(0))).toDF("id", "grp"))
    assert(t.snapshot.filter(col("id") === 0L).count() == 0L)
  }

  test("takedown over a cluster_id-PARTITIONED edge store: the " +
    "induced-subgraph read is file-pruned to the affected components' " +
    "buckets, and label+edge repairs equal the key-bucketed twin's") {
    def labelsTab(n: String) = new VersionedTable(spark,
      Fixtures.tmpDir(n).toString, "id", "batch_no", numBuckets = 4)
    def edgesKeyed(n: String) = new VersionedTable(spark,
      Fixtures.tmpDir(n).toString, "edge_key", "batch_no", numBuckets = 4)
    def edgesPart(n: String) = new VersionedTable(spark,
      Fixtures.tmpDir(n).toString, "edge_key", "batch_no", numBuckets = 8,
      partitionColOpt = Some("cluster_id"))
    // many components so the affected buckets are a strict subset:
    // paths (10c, 10c+1, 10c+2) for c in 2..12 plus the 4-node path
    // 10-11-12-13; the takedown kills ITS cut vertex 11 only — 10
    // isolates (drops out), {12,13} split off re-anchored to 12,
    // every other component carries verbatim
    val pairs = ((2 to 12).flatMap { c =>
      Seq((c * 10L, c * 10L + 1), (c * 10L + 1, c * 10L + 2))
    } ++ Seq((10L, 11L), (11L, 12L), (12L, 13L))).toDF("id_a", "id_b")
    def run(labels: VersionedTable, edges: VersionedTable)
        : (Map[Long, Long], Map[String, Long]) = {
      IncrementalDedup.maintainClustersWithEdges(labels, edges, pairs, 1L)
      IncrementalDedup.takedown(labels, edges, Seq(11L).toDF("id"), 2L)
      (labels.snapshot.select(col("id"), col("cluster_id")).collect()
         .map(r => r.getLong(0) -> r.getLong(1)).toMap,
       edges.snapshot.select(col("edge_key"), col("cluster_id")).collect()
         .map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    val (lk, ek) = run(labelsTab("ptt_lk"), edgesKeyed("ptt_ek"))
    val (lp, ep) = run(labelsTab("ptt_lp"), edgesPart("ptt_ep"))
    assert(lp == lk, "label repair identical across edge layouts")
    assert(ep == ek, "edge repair identical across edge layouts")
    // the split is real: {12,13} re-anchor to 12, the isolated 10 and
    // the deleted 11 drop out, bystander components carry verbatim
    assert(lp(12L) == 12L && lp(13L) == 12L && lp(20L) == 20L)
    assert(!lp.contains(10L) && !lp.contains(11L))
    // the pruning pin: the partitioned store's induced-subgraph read
    // (exactly what takedown issues) opens only the affected
    // components' buckets — here component 10 alone
    val ePart = edgesPart("ptt_ep2")
    val lPart = labelsTab("ptt_lp2")
    IncrementalDedup.maintainClustersWithEdges(lPart, ePart, pairs, 1L)
    val pruned = ePart.snapshotPrunedBy(Seq(10L).toDF("cluster_id"))
    val prunedBuckets = bucketsIn(pruned)
    val allBuckets = bucketsIn(ePart.snapshot)
    assert(prunedBuckets == Set(bucketOf("10")),
      "induced read opens exactly the affected cluster's bucket")
    assert(prunedBuckets.size < allBuckets.size,
      "pruning is real: the full relation spans more buckets")
  }
}
