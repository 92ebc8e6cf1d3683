package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalDedup, Sampling, VersionedTable}

/** The maintained priority sample's DELETION BUFFER (VERDICT r15
  * item 1 — the last additive-only maintained structure made
  * delete-aware): the table stores bottom-(k+m), the reported sample
  * is rank ≤ k, and up to m cumulative buffered deletions repair from
  * LOCAL state (O(k+m) IO) before one corpus recompute restores the
  * buffer. Every branch is pinned against the DIRECT recompute over
  * the surviving corpus — maintained ≡ recompute is the contract,
  * exactly as for the unbuffered q264 gate.
  */
class BufferedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val M = 2

  private def vt(name: String) = new VersionedTable(spark,
    Fixtures.tmpDir(name).toString, "id", "batch_no", numBuckets = 4)

  private def corpus(ids: Seq[Long]): DataFrame = ids.toDF("id")
    .select(col("id"), lit(1L).as("w"))

  /** Direct bottom-`cut` recompute over `ids` — the oracle for every
    * branch: (id, rank) pairs.
    */
  private def direct(ids: Seq[Long], cut: Int): Map[Long, Long] =
    Sampling.prioritySample(corpus(ids), col("id"), col("w"), cut)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

  private def state(t: VersionedTable): Map[Long, (Long, Long, Long)] =
    t.snapshot.select(col("id"), col("rank"), col("cap"), col("batch_no"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  private def ranksOf(s: Map[Long, (Long, Long, Long)]): Map[Long, Long] =
    s.map { case (id, (rank, _, _)) => id -> rank }

  private def failingCorpus: () => DataFrame =
    () => fail("corpus thunk evaluated on a local-repair branch")

  test("buffered build + add-maintenance: stored set is the exact " +
    "bottom-(k+m), reported prefix the exact bottom-k") {
    val t = vt("bs_build")
    IncrementalDedup.maintainSampleBuffered(t, corpus(1L to 12L),
      col("id"), col("w"), K, M, 1L)
    assert(ranksOf(state(t)) == direct(1L to 12L, K + M))
    assert(state(t).forall(_._2._2 == (K + M).toLong), "cap = k+m")
    // add-maintenance at the same cap: maintained ≡ recompute
    IncrementalDedup.maintainSampleBuffered(t, corpus(13L to 24L),
      col("id"), col("w"), K, M, 2L)
    assert(ranksOf(state(t)) == direct(1L to 24L, K + M))
    // the reported sample is the rank ≤ k prefix of the same cut
    val reported = t.snapshot.filter(col("rank") <= K)
      .select(col("id"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reported == direct(1L to 24L, K))
  }

  test("takedown inside the buffer repairs LOCALLY: cap shrinks, " +
    "survivors re-rank to the exact surviving bottom-cut, the corpus " +
    "thunk is never evaluated, outside-buffer deletes are no-ops") {
    val t = vt("bs_local")
    val all = (1L to 12L).toSeq
    IncrementalDedup.maintainSampleBuffered(t, corpus(all),
      col("id"), col("w"), K, M, 1L)
    val sampled = ranksOf(state(t))
    val victim = sampled.collectFirst { case (id, 2L) => id }.get
    val commits0 = t.commits.length
    // outside-buffer delete first: nothing stored is hit — no commit
    val outside = all.filterNot(sampled.contains).head
    val ws0 = IncrementalDedup.takedownSampleBuffered(t,
      Seq(outside).toDF("id"), K, M, 2L, failingCorpus, col("id"), col("w"))
    assert(ws0.isEmpty && t.commits.length == commits0,
      "outside-buffer delete must not commit")
    // buffered hit: local repair (the thunk would fail the test if hit)
    IncrementalDedup.takedownSampleBuffered(t,
      Seq(victim).toDF("id"), K, M, 2L, failingCorpus, col("id"), col("w"))
    val surv1 = all.filterNot(_ == victim)
    assert(ranksOf(state(t)) == direct(surv1, K + M - 1))
    assert(state(t).forall(_._2._2 == (K + M - 1).toLong),
      "one buffered deletion: cap = k+m-1")
    // re-delivery: the id is already gone — empty write set, no commit
    val commits1 = t.commits.length
    val ws2 = IncrementalDedup.takedownSampleBuffered(t,
      Seq(victim).toDF("id"), K, M, 3L, failingCorpus, col("id"), col("w"))
    assert(ws2.isEmpty && t.commits.length == commits1,
      "re-delivered takedown must not commit")
    // second buffered deletion still within the buffer (cap 4 -> 3 = k)
    val victim2 = ranksOf(state(t)).collectFirst { case (id, 1L) => id }.get
    IncrementalDedup.takedownSampleBuffered(t,
      Seq(victim2).toDF("id"), K, M, 4L, failingCorpus, col("id"), col("w"))
    val surv2 = surv1.filterNot(_ == victim2)
    assert(ranksOf(state(t)) == direct(surv2, K + M - 2))
    // add-maintenance AFTER repairs keeps the shrunken cap exact
    IncrementalDedup.maintainSampleBuffered(t, corpus(30L to 40L),
      col("id"), col("w"), K, M, 5L)
    assert(ranksOf(state(t)) == direct(surv2 ++ (30L to 40L), K + M - 2))
  }

  test("takedown PAST the buffer falls back to one corpus recompute " +
    "restoring cap = k+m; floor-monotone stamp on a reset counter") {
    val t = vt("bs_fallback")
    val all = (1L to 12L).toSeq
    IncrementalDedup.maintainSampleBuffered(t, corpus(all),
      col("id"), col("w"), K, M, 1L)
    // delete 3 sampled ids at once: survivors 2 < k=3 — must recompute
    val victims = ranksOf(state(t)).filter(_._2 <= 3L).keys.toSeq
    assert(victims.length == 3)
    var evaluated = false
    val thunk = () => { evaluated = true; corpus(all) } // pre-takedown corpus: the gate anti-joins this del itself
    // batchNo 0 is BELOW the stored stamp 1: the floor must win
    IncrementalDedup.takedownSampleBuffered(t,
      victims.toDF("id"), K, M, 0L, thunk, col("id"), col("w"))
    assert(evaluated, "fallback must evaluate the corpus thunk")
    val surv = all.filterNot(victims.contains)
    assert(ranksOf(state(t)) == direct(surv, K + M))
    assert(state(t).forall(_._2._2 == (K + M).toLong),
      "recompute restores the full buffer")
    assert(state(t).exists(_._2._3 == 2L),
      "reset-counter takedown stamps at stored max + 1, not 0")
  }

  test("a buffer that was never full keeps its cap through deletion " +
    "(full containment loses no exactness) and can still grow") {
    val t = vt("bs_notfull")
    IncrementalDedup.maintainSampleBuffered(t, corpus(Seq(1L, 2L, 3L)),
      col("id"), col("w"), K, M, 1L) // corpus 3 < cap 5
    assert(state(t).size == 3 && state(t).forall(_._2._2 == 5L))
    IncrementalDedup.takedownSampleBuffered(t,
      Seq(2L).toDF("id"), K, M, 2L, failingCorpus, col("id"), col("w"))
    assert(state(t).forall(_._2._2 == 5L),
      "not-full buffer keeps cap through deletion")
    assert(ranksOf(state(t)) == direct(Seq(1L, 3L), K + M))
    // growth after the deletion: new rows still enter up to the cap
    IncrementalDedup.maintainSampleBuffered(t, corpus(10L to 20L),
      col("id"), col("w"), K, M, 3L)
    assert(ranksOf(state(t)) == direct(Seq(1L, 3L) ++ (10L to 20L), K + M))
  }

  test("contract requires fail fast: record key, precombine, k/m bounds") {
    val wrongKey = new VersionedTable(spark,
      Fixtures.tmpDir("bs_wrongkey").toString, "not_id", "batch_no", 4)
    intercept[IllegalArgumentException] {
      IncrementalDedup.maintainSampleBuffered(wrongKey, corpus(Seq(1L)),
        col("id"), col("w"), K, M, 1L)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup.takedownSampleBuffered(wrongKey, Seq(1L).toDF("id"),
        K, M, 1L, failingCorpus, col("id"), col("w"))
    }
    val wrongPc = new VersionedTable(spark,
      Fixtures.tmpDir("bs_wrongpc").toString, "id", "cap", 4)
    intercept[IllegalArgumentException] {
      IncrementalDedup.maintainSampleBuffered(wrongPc, corpus(Seq(1L)),
        col("id"), col("w"), K, M, 1L)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup.maintainSampleBuffered(vt("bs_badk"),
        corpus(Seq(1L)), col("id"), col("w"), 0, M, 1L)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup.maintainSampleBuffered(vt("bs_badm"),
        corpus(Seq(1L)), col("id"), col("w"), K, -1, 1L)
    }
  }
}
