package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *    set against every vector; one narrow pass + a top-k window.
  *    Correct at any corpus size as long as |queries| is broadcastable;
  *    cost O(|queries| × N × dim) spread across executors.
  *  - [[bucketedTopK]] — the scale path: coarse sign-bit quantization
  *    (IVF-style, deterministic — bucket = sign bits of the first
  *    `signBits` dimensions) restricts each query to its own cell, so
  *    the scan cost drops by ~2^signBits at some recall loss. Swap the
  *    bucket function for trained centroids without changing the plan
  *    shape.
  *
  * Ranking uses the score in fixed-point (floor(cos·10^6) — exact
  * binary-float op, no decimal-string rounding) with the neighbor id
  * as tie-break, which keeps top-k bit-reproducible across engines.
  */
object Similarity {

  /** Deterministic coarse bucket: bit j set iff embedding[j] > 0. */
  def signBucket(emb: Column, signBits: Int): Column =
    (0 until signBits).map { j =>
      when(element_at(emb, j + 1) > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fixed-point score: floor(cos·10^6) as bigint. */
  def scoreFixed(a: Column, b: Column): Column =
    floor(cosine(a, b) * lit(1000000.0)).cast("long")

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_1e6").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact cosine top-k for each query vector. `queries` and `corpus`
    * need (id, emb) shaped columns. Queries are broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        scoreFixed(col("q.emb"), col("c.emb")).as("score_1e6"))
    rank(scored, k)
  }

  /** Bucketed ANN: compare only within the query's sign bucket. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int, signBits: Int = 6): DataFrame = {
    val cb = corpus.withColumn("bucket", signBucket(col("emb"), signBits))
    val qb = queries.withColumn("bucket", signBucket(col("emb"), signBits))
    val scored = cb.as("c")
      .join(broadcast(qb.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        scoreFixed(col("q.emb"), col("c.emb")).as("score_1e6"))
    rank(scored, k)
  }
}
