package graft

import org.apache.spark.sql.functions._

import graft.functions.{bpeTokenCount, tokenCount}
import graft.operators.{Bpe, Chunker}

/** BPE trainer/encoder: hand-derivable merge lists, the left-to-right
  * non-overlap merge semantics the oracle fold mirrors, and the seam
  * contract — packing placements actually FOLLOW the subword counts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainer picks most frequent pair with deterministic tie-break") {
    // freq-weighted: (a,b) appears in "abab"×2 → count 4 (overlapping
    // occurrences of (b,a) count 2); first merge must be (a,b)
    val merges = Bpe.train(Seq(("abab", 2L), ("cd", 1L)), 2)
    assert(merges.head == ("a", "b"))
    // after merging, "abab" → [ab, ab]: pair (ab,ab) count 2 beats (c,d) 1
    assert(merges(1) == ("ab", "ab"))
    // ties break by (left ASC, right ASC): "xy" vs "ab" both count 1
    assert(Bpe.train(Seq(("xy", 1L), ("ab", 1L)), 1).head == ("a", "b"))
  }

  test("mergeOnce is left-to-right non-overlapping") {
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(Bpe.mergeOnce(Vector("x", "a", "b", "b"), "a", "b") == Vector("x", "ab", "b"))
  }

  test("trainer stops when pairs are exhausted") {
    val merges = Bpe.train(Seq(("ab", 1L)), 10)
    assert(merges == Seq(("a", "b"))) // one merge → single symbols → stop
  }

  test("distributed trainer ≡ driver trainer on the same capped corpus") {
    val docs = Seq("the cat sat on the mat", "the cat ran", "a mat sat there",
      "cats scatter the mats", "on and on the cat sat").toDF("text")
    val driver = Bpe.trainFromCorpus(docs, "text", numMerges = 8, vocabCap = 10)
    val dist = Bpe.trainDistributed(docs, "text", numMerges = 8, vocabCap = 10)
    assert(dist.map(m => (m._1, m._2)) == driver,
      s"merge lists must be bit-identical:\n driver=$driver\n dist=$dist")
    assert(dist.forall(_._3 > 0), s"winning pair counts must ride along: $dist")
    // open-vocab mode (no cap) still terminates and stays deterministic
    val open = Bpe.trainDistributed(docs, "text", numMerges = 3, vocabCap = Int.MaxValue)
    assert(open == Bpe.trainDistributed(docs, "text", 3, Int.MaxValue))
    // exhaustion: a one-pair corpus stops after one merge
    val tiny = Seq("ab ab").toDF("text")
    assert(Bpe.trainDistributed(tiny, "text", 10, 10).map(m => (m._1, m._2))
      == Seq(("a", "b")))
  }

  test("expression encoder matches the driver trainer's segmentations") {
    val docs = Seq((1L, "abab abab cd"), (2L, "abab"), (3L, "cd cd")).toDF("doc_id", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", 4)
    // replay driver-side: expected per-word symbol counts
    val dict = Bpe.dictionary(docs, "text", 10000)
    val segs = dict.map { case (w, _) =>
      w -> merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => Bpe.mergeOnce(s, a, b)
      }
    }.toMap
    val got = docs.select($"doc_id", bpeTokenCount($"text", merges).as("n"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    def exp(t: String): Long = t.split("\\s+").filter(_.nonEmpty).map(w => segs(w).length.toLong).sum
    assert(got === Array((1L, exp("abab abab cd")), (2L, exp("abab")), (3L, exp("cd cd"))))
  }

  test("encoder handles adjacent-overlap words (the replace() trap)") {
    // merge (a,a) on "aaaa" must give 2 symbols (aa aa), not 3 — a
    // string replace over a shared separator would skip the second pair
    val df = Seq((1L, "aaaa"), (2L, "aaa")).toDF("doc_id", "text")
    val got = df.select($"doc_id", bpeTokenCount($"text", Seq(("a", "a"))).as("n"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got === Array((1L, 2L), (2L, 2L))) // aaa → [aa, a]
  }

  test("null/empty/whitespace-only texts count 0 subword tokens") {
    val df = Seq((1L, null: String), (2L, ""), (3L, " \t\n ")).toDF("doc_id", "text")
    val got = df.select(bpeTokenCount($"text", Seq(("a", "b"))))
      .as[Long].collect()
    assert(got.toSeq == Seq(0L, 0L, 0L))
  }

  test("pack placements follow the BPE counts, not whitespace counts") {
    // every doc has 4 whitespace tokens, so whitespace packing can't
    // tell them apart — but "the" trains down to 1 subword while the
    // rare "abcd" stays 4 chars, so BPE billing separates the docs
    val the = "the the the the"     // ws 4, bpe 4 after training
    val rare = "abcd abcd abcd abcd" // ws 4, bpe 16 (never merged)
    val docs = Seq((1L, the), (2L, rare), (3L, the), (4L, the)).toDF("doc_id", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", 2)
    // (h,e) wins the 12-count tie over (t,h) by left-symbol order,
    // then (t,he) completes the word
    assert(merges == Seq(("h", "e"), ("t", "he")))
    val withCounts = docs.select($"doc_id",
      tokenCount($"text").as("ws_n"),
      bpeTokenCount($"text", merges).as("bpe_n"))
    def seqIds(countCol: String): Map[Long, Long] =
      Chunker.packSequencesNoSplit(withCounts, "doc_id", countCol,
          budgetTokens = 8L, shards = 1)
        .select($"doc_id", $"seq_id").as[(Long, Long)].collect().toMap
    // ws: uniform 4/doc → two docs per 8-token sequence
    assert(seqIds("ws_n") == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // bpe: the 16-subword doc forces a reset and fills a sequence alone
    assert(seqIds("bpe_n") == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }
}
