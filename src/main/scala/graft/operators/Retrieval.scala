package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — fuse lexical (BM25) and dense (embedding-cosine)
  * rankings with reciprocal-rank fusion, the standard first-stage
  * retriever of a RAG / data-selection stack: each ranked list
  * contributes floor(10^9 / (c + rank)) per (query, doc), and the
  * fused score is the sum. RRF needs only RANKS, never the raw scores
  * — which is exactly what makes it robust to the two scorers living
  * on different scales, and what makes it bit-reproducible here: every
  * contribution is an integer quotient, so the fused score is an
  * associative integer sum, independent of partitioning and engine.
  *
  * Scale shape: each input list is already top-`depth`-per-query
  * (≤ |Q|·depth rows — tiny next to the corpus), so the fusion is a
  * union of small frames, one narrow integer projection, and a
  * groupBy over |Q|·depth keys. The heavy lifting stays in the list
  * producers (one corpus pass each — [[TextSearch.bm25Many]] /
  * [[Similarity.bruteForceTopK]]), and adding a third signal (e.g. a
  * recency or quality ranking) is another small frame in the union.
  */
object Retrieval {

  /** RRF constant from the original TREC formulation; dampens the gap
    * between the very top ranks so one list can't dominate.
    */
  val DefaultRrfC = 60

  /** Fuse ranked lists — each (query_id, doc_id, rank), rank 1-based —
    * into (query_id, rank, doc_id, rrf_1e9), the top `k` per query by
    * fused score (ties broken on doc_id). A doc absent from one list
    * simply collects no contribution from it.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = DefaultRrfC): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 1 && c >= 0, s"need k>=1, c>=0; got k=$k c=$c")
    val contribs = lists
      .map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000000L div (rank + ${c}L)").as("contrib")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_1e9").desc, col("doc_id"))
    contribs.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_1e9"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_1e9"))
  }

  /** "More like this" over a corpus with both text and embeddings:
    * seed documents act as queries on both sides — their text drives
    * the BM25 query, their vector the cosine query — and the two
    * top-`depth` lists fuse via [[rrfFuse]]. Seeds exclude themselves
    * from both lists.
    *
    * Each seed's BM25 query is capped at its `maxQueryTerms` RAREST
    * corpus terms ([[TextSearch.pruneQueryTermsByDf]] — the Lucene
    * MoreLikeThis discipline). Uncapped full-document queries keep
    * every stopword-grade term, and since those match nearly every
    * document the scored (query, doc) stream grows as seeds × corpus:
    * measured 42× runtime at 10× scale before the cap, ~linear after.
    *
    * `docs` needs (idCol, textCol); `embs` (id, emb) with ids matching
    * `docs`; `seedDocs`/`seedEmbs` are the (small, broadcastable) seed
    * slices of each. One corpus-text pass for df, one for scoring, one
    * embedding pass total.
    */
  def hybridMoreLikeThis(docs: DataFrame, idCol: String, textCol: String,
      embs: DataFrame, seedDocs: DataFrame, seedEmbs: DataFrame,
      depth: Int, k: Int, c: Int = DefaultRrfC,
      k1: Double = 1.2, b: Double = 0.75, maxQueryTerms: Int = 16): DataFrame = {
    require(depth >= 1, s"need depth>=1, got $depth")
    val seeds = TextSearch.collectQueries(
      seedDocs.select(col(idCol).cast("string").as("qid"), col(textCol).as("qtext")),
      "qid", "qtext")
    val fullPairs = seeds.flatMap { case (qid, q) =>
      TextSearch.queryTerms(q).map((qid, _)) }
    val pairs = TextSearch.pruneQueryTermsByDf(docs, idCol, textCol,
      fullPairs, maxQueryTerms)
    require(pairs.nonEmpty, "no seed term appears in the corpus")
    val bw = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_1e6").desc, col("doc_id"))
    val lexical = TextSearch.bm25ManyPairs(docs, idCol, textCol, pairs, k1, b)
      .withColumn("query_id", col("query_id").cast("long"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(bw).cast("long"))
      .filter(col("rank") <= depth)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity.bruteForceTopK(embs, seedEmbs, depth)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lexical, dense), k, c)
  }

  /** Hard-negative mining for retrieval/contrastive training: for each
    * seed document, the top-`k` BM25-scoring corpus docs that are NOT
    * near-duplicates of it — lexically confusable yet genuinely
    * different, exactly the negatives a bi-encoder learns most from.
    * Scoring near-dups as negatives poisons training (they're secretly
    * positives), so candidates sharing a MinHash-LSH cluster edge with
    * the seed are excluded BEFORE the top-k rank.
    *
    * Scale shape: the BM25 side is [[hybridMoreLikeThis]]'s lexical
    * path (df-pruned seed terms, one corpus scoring pass); the
    * exclusion list is the corpus's standard LSH pair artifact
    * restricted to pairs touching a seed (seeds are bounded, so the
    * anti-join build side is tiny) — a pipeline that already ran dedup
    * passes its pair table in for free.
    *
    * Output: (query_id, neg_id, bm25_1e6, rank), rank 1-based AFTER
    * exclusion.
    */
  def hardNegatives(docs: DataFrame, idCol: String, textCol: String,
      seedDocs: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75, maxQueryTerms: Int = 16,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    require(k >= 1, s"need k>=1, got $k")
    val seeds = TextSearch.collectQueries(
      seedDocs.select(col(idCol).cast("string").as("qid"), col(textCol).as("qtext")),
      "qid", "qtext")
    val seedIds = seeds.map(_._1.toLong)
    val fullPairs = seeds.flatMap { case (qid, q) =>
      TextSearch.queryTerms(q).map((qid, _)) }
    val pruned = TextSearch.pruneQueryTermsByDf(docs, idCol, textCol,
      fullPairs, maxQueryTerms)
    require(pruned.nonEmpty, "no seed term appears in the corpus")
    val scored = TextSearch.bm25ManyPairs(docs, idCol, textCol, pruned, k1, b)
      .withColumn("query_id", col("query_id").cast("long"))
      .filter(col("doc_id") =!= col("query_id"))
    // the exclusion list needs ONLY pairs touching a seed: band the
    // corpus once and equi-join the seeds' band keys back against it
    // (r16, guide §3.2 — pre-filter instead of the corpus-wide LSH
    // self-join this used to re-pay; the full pair table is the dedup
    // pipeline's artifact, not this miner's cost). Exclusion set is
    // IDENTICAL: a (seed, doc) pair shares a band bucket iff the
    // self-join would have produced it; duplicates from multi-band
    // collisions are harmless under the left_anti below.
    val banded = Dedup.bandedBuckets(docs, idCol, textCol, bands, rowsPerBand, n)
    val nearDups = banded.filter(col("id").isin(seedIds: _*))
      .select(col("id").as("query_id"), col("band"), col("bucket"))
      .join(banded, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("doc_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_1e6").desc, col("doc_id"))
    scored.join(nearDups, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id").as("neg_id"),
        col("bm25_1e6"), col("rank"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998): greedily pick `k` of each query's top-`depth` cosine
    * candidates, each round taking the candidate maximizing
    * relevance − max-similarity-to-already-picked — the diversified
    * retrieval a data-selection stack uses so its k exemplars aren't k
    * copies of the same passage. λ is fixed at 1/2 and the ×2-scaled
    * margin `m = rel_1e6 − max sim_1e6` is ranked directly: pure
    * integer arithmetic (associative max, exact subtraction), so both
    * engines agree on every pick including ties (margin desc, id asc —
    * the max(struct(m, −id)) first-max; the oracle's rank window).
    *
    * The greedy loop is inherently sequential in k, so it runs as k
    * unrolled DISTRIBUTED rounds: each round is one bounded join
    * (|Q|·depth candidates × ≤r picked) + one groupBy argmax — never a
    * per-query driver loop. The candidate and pairwise-sim frames
    * (≤ |Q|·depth and ≤ |Q|·depth² rows) are materialized once and
    * reused by every round; the corpus is touched only by the
    * brute-force candidate pass ([[Similarity.bruteForceTopK]] — swap
    * in ivfTopK at scale, the re-rank is producer-agnostic).
    *
    * Output: (query_id, pick_no 1..k, neighbor_id, mmr_1e6) — round-1
    * rows carry m = rel (nothing picked yet), later rounds the margin.
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame,
      depth: Int, k: Int): DataFrame = {
    require(depth >= 1 && k >= 1 && k <= depth,
      s"need 1 <= k <= depth, got k=$k depth=$depth")
    val cands = Similarity.bruteForceTopK(corpus, queries, depth)
      .select(col("query_id"), col("neighbor_id"), col("score_1e6").as("rel"))
      .localCheckpoint(true)
    val withEmb = cands.join(corpus.select(col("id"), col("emb")),
        col("neighbor_id") === col("id"))
      .select(col("query_id"), col("neighbor_id"), col("emb"))
    val x = withEmb.select(col("query_id"), col("neighbor_id").as("a"),
      col("emb").as("ea"))
    val y = withEmb.select(col("query_id"), col("neighbor_id").as("b"),
      col("emb").as("eb"))
    val sims = x.join(y, Seq("query_id")).filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        Similarity.scoreFixed(col("ea"), col("eb")).as("sim"))
      .localCheckpoint(true)
    var sel: DataFrame = null
    for (r <- 1 to k) {
      val scored =
        if (sel == null) cands.withColumn("m", col("rel"))
        else {
          val picked = sel.select(col("query_id").as("_q"), col("neighbor_id").as("_p"))
          val rem = cands.join(picked,
            cands("query_id") === col("_q") && col("neighbor_id") === col("_p"),
            "left_anti")
          val selSim = sims.join(picked,
              sims("query_id") === col("_q") && col("b") === col("_p"))
            .groupBy(sims("query_id").as("query_id"), col("a"))
            .agg(max(col("sim")).as("maxsim"))
          rem.join(selSim,
              rem("query_id") === selSim("query_id") && col("neighbor_id") === col("a"))
            .select(rem("query_id"), col("neighbor_id"), col("rel"),
              (col("rel") - col("maxsim")).as("m"))
        }
      val pick = scored.groupBy(col("query_id"))
        .agg(max(struct(col("m"), (-col("neighbor_id")).as("nid"))).as("_b"))
        .select(col("query_id"), (-col("_b.nid")).as("neighbor_id"),
          col("_b.m").as("mmr_1e6"), lit(r.toLong).as("pick_no"))
      sel = (if (sel == null) pick else sel.unionByName(pick)).localCheckpoint(true)
    }
    sel.select(col("query_id"), col("pick_no"), col("neighbor_id"), col("mmr_1e6"))
  }
}
