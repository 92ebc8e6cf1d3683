package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.tokens

/** Deterministic byte-pair-encoding tokenizer — the real-subword
  * alternative behind the token-count seam (packing budgets, BM25
  * document length, chunk sizing all budget on token counts; a
  * whitespace count is a proxy, a BPE count is what trainers bill).
  *
  * Public algorithm (Sennrich et al. 2016, the GPT-2/sentencepiece
  * training shape): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair, weighted by word frequency. Both
  * training and encoding are bit-deterministic so a SQL oracle can
  * replay them end-to-end:
  *
  *  - training runs on the word-frequency DICTIONARY (distinct word →
  *    occurrence count), not the token stream — the standard trainer
  *    shortcut. The dictionary is capped at `vocabCap` word types by
  *    (freq DESC, word ASC) — deterministic, and a no-op until the
  *    corpus has more distinct words than the cap. At 100 TB the
  *    dictionary build is one groupBy over the corpus (the only
  *    shuffle in training) and the capped dictionary is driver-sized
  *    by construction; the greedy merge loop runs on the driver over
  *    ≤ vocabCap rows, exactly like every public BPE trainer.
  *  - pair counts include overlapping occurrences ("aaa" counts (a,a)
  *    twice); ties break by (count DESC, left ASC, right ASC) on
  *    codepoint order.
  *  - merge application is LEFT-TO-RIGHT NON-OVERLAPPING: "a a a a"
  *    under merge (a,a) becomes "aa aa", and "a a a" becomes "aa a".
  *  - encoding applies the merge list in training order to each word
  *    independently (words never merge across whitespace).
  *
  * Encoding is a pure column expression (scan-speed, no shuffle, no
  * UDF): each word is rendered as a separator-prefixed symbol string
  * (U+001F before every symbol — the char never occurs in text
  * tokens because tokenization splits on whitespace and U+001F is a
  * control char, and empty tokens are filtered), and each merge step
  * is one left-to-right fold over the current symbols. The fold-based
  * merge is used instead of string `replace(sep+a+sep+b, sep+ab)`
  * because adjacent occurrences share their boundary separator and a
  * single replace pass would skip every second merge ("a a a a" →
  * "aa a a", not "aa aa").
  *
  * Scale note: an alternative encode plan — dictionary-encode the
  * distinct words once and broadcast-join counts back — trades the
  * per-occurrence fold for two shuffles over the exploded corpus;
  * the expression form stays map-only and pipelines out of the scan,
  * which is the better plan at any corpus size when only counts are
  * needed.
  *
  * Reference behavior anchor: the reference pipeline batches free-text
  * clinical notes whose downstream budgets are subword-token budgets
  * (etl/transform.py:46-140); whitespace counts under-bill rare words.
  */
object Bpe {

  /** Symbol separator in the encoded representation — a control char
    * that whitespace tokenization guarantees never appears inside a
    * token (it IS whitespace-adjacent in no engine: Java \s does not
    * include U+001F, so it survives tokenization only if present in a
    * token, and tokens of natural text never contain it; documents
    * that DID contain it would merely produce extra symbol splits, not
    * corruption, because encoding only counts separators it inserted).
    */
  val Sep = "\u001f"

  /** q81 battery parameters — the oracle generator unrolls exactly
    * this many merge rounds and applies the same vocab cap, so the two
    * sides derive identical merge lists from the same corpus.
    */
  val DefaultMerges = 24
  val DefaultVocabCap = 10000

  /** Greedy merge trainer over a (word, freq) dictionary. Returns the
    * ordered merge list, possibly shorter than `numMerges` when pairs
    * are exhausted (every word reduced to a single symbol).
    */
  def train(dictionary: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var vocab: Vector[(Vector[String], Long)] =
      dictionary.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) { counts((syms(i), syms(i + 1))) += f; i += 1 }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b))
        vocab = vocab.map { case (syms, f) => (mergeOnce(syms, a, b), f) }
      }
    }
    merges.toSeq
  }

  /** One left-to-right non-overlapping merge pass over a symbol seq. */
  def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Build the word-frequency dictionary from a corpus (lowercased
    * whitespace tokens), capped deterministically. ONE shuffle (the
    * token groupBy); the capped result is collected to the driver —
    * bounded by `vocabCap` rows by construction.
    */
  def dictionary(docs: DataFrame, textCol: String, vocabCap: Int): Seq[(String, Long)] =
    docs.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq

  /** Train directly from a corpus column. */
  def trainFromCorpus(docs: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 10000): Seq[(String, String)] =
    train(dictionary(docs, textCol, vocabCap), numMerges)

  /** Distributed BPE merge training — the [[train]] loop with the
    * vocabulary kept ON THE CLUSTER. Per round: adjacent-pair
    * counting is one freq-weighted groupBy (shuffle keyed on the
    * bounded pair vocabulary), ONLY the winning pair returns to the
    * driver (a 1-row collect, the same count-desc/lexicographic
    * tie-break as [[train]]), and the merge applies via
    * [[applyMerge]] — the same fold expression the encoder uses —
    * with a per-round localCheckpoint so 24 rounds don't stack 24
    * nested folds into one codegen unit. Driver state is the merge
    * list alone (numMerges-bounded): the collected-dictionary form's
    * open-vocab wall disappears, which is the 100 TB shape — a
    * web-scale corpus's word dictionary can hold 10⁸ rows, far past
    * any driver collect, while each training round here stays a
    * distributed count/argmax/map. Pass `vocabCap` < Int.MaxValue to
    * reproduce [[trainFromCorpus]]'s capped-dictionary semantics
    * bit-identically (BpeSpec pins equality); cap Int.MaxValue trains
    * the open vocabulary.
    *
    * Returns (symA, symB, pairCount) per round, in merge order.
    */
  def trainDistributed(docs: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 10000): Seq[(String, String, Long)] = {
    val base = docs.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val capped =
      if (vocabCap == Int.MaxValue) base
      else base.orderBy(col("freq").desc, col("w").asc).limit(vocabCap)
    var vocab = capped.select(col("w"), col("freq"), charSeg(col("w")).as("seg"))
      .localCheckpoint(true)
    val merges = mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    // r16 action discipline: the per-round vocab re-checkpoint was the
    // trainer's second dispatch round-trip per merge (2·numMerges jobs
    // of ≤ vocabCap rows). Merge application now DEFERS as a shallow
    // expression fold over the last pin and re-pins every 4th round —
    // same merges bit-for-bit (application order unchanged), half the
    // actions; the fold depth stays ≤ 4 so codegen never blows up.
    var pendingFolds = 0
    while (merges.length < numMerges && !exhausted) {
      val ss = filter(split(col("seg"), Sep), s => s =!= "")
      val pairs = vocab
        .select(col("freq"), explode(when(size(ss) >= 2,
            transform(sequence(lit(0), size(ss) - 2),
              i => struct(element_at(ss, i + 1).as("a"),
                element_at(ss, i + 2).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      val winner = pairs.groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // exactly one row crosses to the driver
      if (winner.isEmpty) exhausted = true
      else {
        val (a, b, c) = (winner(0).getString(0), winner(0).getString(1),
          winner(0).getLong(2))
        merges += ((a, b, c))
        vocab = vocab.withColumn("seg", applyMerge(col("seg"), a, b))
        pendingFolds += 1
        if (pendingFolds >= 4 && merges.length < numMerges) {
          vocab = vocab.localCheckpoint(true)
          pendingFolds = 0
        }
      }
    }
    merges.toSeq
  }

  /** Separator-prefixed symbol string of one (lowercased) word after
    * applying `merges` in order. "hello" with no merges →
    * "<s>h<s>e<s>l<s>l<s>o"; a merge (l,l) rewrites the
    * "<s>l<s>l" span to "<s>ll". Pure expression: one
    * char-explode plus one fold per merge.
    */
  def encodeSeg(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSeg(word)) { case (seg, (a, b)) => applyMerge(seg, a, b) }

  /** Separator-prefixed character segmentation of a word (merge round
    * zero). */
  private[operators] def charSeg(word: Column): Column = {
    val chars = transform(
      when(length(word) <= 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), length(word) - 1)),
      i => word.substr(i + 1, lit(1)))
    when(length(word) <= 0, lit(""))
      .otherwise(concat(lit(Sep), array_join(chars, Sep)))
  }

  /** One left-to-right non-overlapping (a,b)→ab merge pass over a
    * segmentation column — the expression twin of [[mergeOnce]].
    */
  private[operators] def applyMerge(seg: Column, a: String, b: String): Column =
    aggregate(
      filter(split(seg, Sep), s => s =!= ""),
      lit(""),
      (acc, sy) =>
        when(sy === lit(b) && acc.endsWith(lit(Sep + a)),
          concat(acc.substr(lit(1), length(acc) - lit(a.length + 1)), lit(Sep + a + b)))
          .otherwise(concat(acc, lit(Sep), sy)))

  /** Subword token count of one encoded word = number of separators. */
  private def segCount(seg: Column): Column =
    (length(seg) - length(translate(seg, Sep, ""))).cast("long")

  /** BPE token count of a whole text column: sum of per-word subword
    * counts over lowercased whitespace words. Map-only — pipelines out
    * of the scan with no shuffle; cost per row is O(words × merges).
    */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(
      transform(tokens(lower(text)), w => segCount(encodeSeg(w, merges))),
      lit(0L),
      (acc, n) => acc + n)
}
