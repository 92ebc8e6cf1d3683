package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.shingles

/** Benchmark decontamination — the train/eval overlap check an LLM
  * data pipeline runs before training: flag every corpus document that
  * shares at least `minShared` distinct word n-grams with any document
  * of an evaluation/benchmark set, so leaked eval data can be dropped
  * or quarantined.
  *
  * Scale shape: benchmark suites are bounded (≪ corpus), so their
  * distinct shingle set is broadcast; the corpus side is
  * shingle → explode → broadcast equi-join, which prunes the exploded
  * stream to benchmark-overlapping grams BEFORE the only shuffle (the
  * per-doc count on doc_id). If a benchmark ever outgrows broadcast,
  * removing the hint leaves the identical plan as a shuffle join. The
  * n-gram width is the usual contamination knob (8-13 words in
  * published pipelines); shingle sets are per-doc distinct, so the
  * count is distinct shared grams without a count(DISTINCT).
  */
object Decontaminate {

  /** (doc_id, n_shared) for every corpus doc sharing ≥ `minShared`
    * distinct word n-grams with the benchmark set.
    */
  def sharedNgrams(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      minShared: Long = 1L): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    require(minShared >= 1, s"minShared must be positive, got $minShared")
    val bsh = bench
      .select(explode(shingles(col(benchTextCol), n)).as("gram")).distinct()
    corpus
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("gram"))
      .join(broadcast(bsh), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
