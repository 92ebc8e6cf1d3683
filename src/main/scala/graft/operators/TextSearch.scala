package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.tokens

/** BM25 relevance scoring over a document corpus — the ranking /
  * importance-weighting primitive behind corpus search and
  * quality-driven data selection (rank documents by closeness to a
  * high-quality seed query or domain description, keep the top mass).
  *
  * Cross-engine determinism: classic BM25's idf is ln-based, and ln is
  * NOT bit-stable across engines/libms — so graft's variant uses a
  * rational idf in 1e6 fixed point,
  *
  *   idf_1e6 = floor((1e6 · (N − df + 0.5)) / (df + 0.5))
  *
  * (same monotonicity in df, no transcendentals), and floors each
  * per-term contribution to an integer BEFORE summing — the final
  * score is an associative integer sum, independent of partitioning
  * and engine. The q51 oracle re-derives every stat in DuckDB.
  *
  * Scale shape: tokenize → explode → filter to the query's terms
  * BEFORE any shuffle (the exploded stream shrinks to a handful of
  * terms) → df counts (groupBy over |query| terms) broadcast back →
  * per-doc tf groupBy. Corpus-level N and Σdl come from one tiny agg;
  * at 100 TB those are the same two scans a search index build does.
  */
object TextSearch {

  /** Query used by the q51 battery entry (oracle generated from it). */
  val DemoQuery = "fast table scan"

  /** Per-document BM25 score for `query`. Only documents containing at
    * least one query term appear. Output: (doc_id, bm25_1e6).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query has no terms")
    val base = docs
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).cast("long").as("dl"))
    val stats = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).collect()(0)
    val nDocs = stats.getLong(0)
    require(nDocs > 0, "bm25 needs a non-empty corpus (N and avgdl are undefined)")
    val avgdl = stats.getLong(1).toDouble / nDocs.toDouble
    val exploded = base
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = exploded.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // df(term) = #rows of tf per term (tf is one row per (doc, term)),
    // so the stats derive FROM tf instead of hanging a second
    // scan→tokenize→explode branch off the corpus — ReuseExchange
    // shares tf's shuffle between the join side and this aggregate
    val termStats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf_1e6",
        floor(lit(1000000.0) * (lit(nDocs.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).cast("long"))
    tf.join(broadcast(termStats), "term")
      .withColumn("contrib",
        floor(col("idf_1e6").cast("double") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / lit(avgdl)))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("bm25_1e6"))
  }
}
