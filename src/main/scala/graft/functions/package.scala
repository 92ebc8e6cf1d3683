package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-expression builders. Everything here is pure
  * `org.apache.spark.sql.functions` composition — codegen'd, no UDFs —
  * so each helper stays inside whole-stage codegen and distributes
  * trivially.
  *
  * Cross-engine determinism note: the dedup/similarity hashes are built
  * from md5 hex (identical bytes in any engine) rather than Spark's
  * murmur3 `hash()`, so the DuckDB oracle can reproduce them exactly.
  */
package object functions {

  /** Bind an expression to a lambda variable so `body` can reference it
    * many times with a single evaluation per row. Higher-order
    * functions are interpreted, so repeating a subtree inside a lambda
    * re-evaluates it per reference (per element for indexed builds —
    * quadratic); `transform` over a singleton array evaluates `value`
    * exactly once and hands the body a bound reference.
    */
  def let(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  // ---------- text ----------

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Subword token count under a trained BPE merge list — the
    * real-tokenizer backend of the token-count seam (packing, BM25
    * document length, chunk budgets). Train with
    * [[graft.operators.Bpe.trainFromCorpus]]; pure expression, no
    * shuffle, no UDF.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.operators.Bpe.tokenCount(text, merges)

  /** [0, n) index array; empty when n <= 0 (Spark `sequence` would
    * otherwise count *down* for a negative stop).
    */
  private def indices(n: Column): Column =
    when(n <= 0, array().cast("array<int>")).otherwise(sequence(lit(0), n - 1))

  /** Word n-gram shingles in document order, duplicates kept. Cheapest
    * form — enough for minhash (min over a multiset equals min over
    * the set). Use [[shingles]] when set semantics matter.
    */
  def rawShingles(text: Column, n: Int): Column =
    let(tokens(lower(text)), ts =>
      transform(indices(size(ts) - (n - 1)),
        i => array_join(slice(ts, i + 1, lit(n)), " ")))

  /** Word n-gram shingles (distinct, sorted for set semantics). */
  def shingles(text: Column, n: Int): Column =
    array_sort(array_distinct(rawShingles(text, n)))

  /** Character n-grams of the lowercased text (distinct, sorted). */
  def charShingles(text: Column, n: Int): Column =
    let(lower(coalesce(text, lit(""))), t => {
      val grams = transform(indices(length(t) - (n - 1)),
        i => t.substr(i + 1, lit(n)))
      array_sort(array_distinct(grams))
    })

  /** 60-bit deterministic hash of a string via md5 — reproducible in
    * DuckDB as cast('0x'||substr(md5(s),1,15) as bigint). Backed by the
    * native codegen'd expression (graft.expressions.Md5Long60), which
    * is semantically identical to
    * `conv(substring(md5(c),1,15),16,10).cast("long")` but skips the
    * hex-string round-trip.
    */
  def md5Long(c: Column): Column = graft.expressions.Md5Long60(c)

  // ---------- embeddings ----------

  /** Dot product of two array<float|double> columns. Left-to-right
    * sequential fold keeps float summation order deterministic. Backed
    * by the native codegen'd expression (graft.expressions.DotFold);
    * [[dotComposed]] is the executable spec it is pinned against.
    */
  def dot(a: Column, b: Column): Column = graft.expressions.DotFold(a, b)

  /** The composed higher-order-function form of [[dot]] (interpreted;
    * kept as the readable spec for the native expression).
    */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  // ---------- quality ----------

  /** Ratio helper with empty-denominator guard (ANSI-safe). */
  def ratio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))
}
