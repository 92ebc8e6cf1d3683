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

  /** Incremental decontamination maintenance — contamination flags
    * FOLLOW a versioned eval set (the q71/q85/q96 "summary follows
    * the table" discipline applied to benchmark hygiene): when new
    * benchmarks land in `evalVt`, only the grams those commits ADDED
    * rescan the corpus — prior flags carry, increments merge by sum.
    * Exact for additive commits because per-doc gram streams are
    * distinct and added grams are by construction disjoint from the
    * prior eval gram set (so distinct-gram counts add); benchmark
    * REMOVALS cannot un-flag on this path — recompute against the
    * snapshot for that (the q71 delete-staleness caveat, documented
    * and pinned the same way).
    *
    * Cost per maintenance run: two eval-side gram projections (eval
    * sets are small), one corpus pass pruned by the BROADCAST added
    * grams before its only shuffle (the q55 shape), and an id-keyed
    * merge of two flag tables.
    *
    * Output: (doc_id, n_shared) — every doc sharing ≥ 1 distinct gram
    * with the FULL current eval set.
    */
  def maintainEvalFlags(corpus: DataFrame, idCol: String, textCol: String,
      evalVt: VersionedTable, prevTs: String, evalTextCol: String = "text",
      n: Int = 3): DataFrame = {
    val prevEval = evalVt.asOf(prevTs)
    val prevFlags = sharedNgrams(corpus, idCol, textCol, prevEval, evalTextCol, n, 1L)
    val prevGrams = prevEval
      .select(explode(shingles(col(evalTextCol), n)).as("gram")).distinct()
    val addedGrams = evalVt.snapshot
      .select(explode(shingles(col(evalTextCol), n)).as("gram")).distinct()
      .join(prevGrams, Seq("gram"), "left_anti")
    val inc = corpus
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("gram"))
      .join(broadcast(addedGrams), "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_inc"))
    prevFlags.join(inc, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("n_shared"), lit(0L)) + coalesce(col("n_inc"), lit(0L)))
          .as("n_shared"))
  }

  /** [[sharedNgrams]] for benchmark sets too large to broadcast as
    * strings: a bloom filter over the benchmark's gram hashes (built in
    * one distributed aggregate — the driver receives only the final
    * bitset) prunes the exploded corpus stream as a plan-literal,
    * codegen'd predicate BEFORE the stream's first shuffle, and a plain
    * shuffle join against the gram set confirms survivors exactly — so
    * the result is identical to [[sharedNgrams]], bloom false positives
    * and all sizing choices only move cost, never answers.
    *
    * Why it scales where broadcast doesn't: at ~1% fpp the filter costs
    * ~1.2 bytes per distinct gram vs ~50+ bytes for the gram string —
    * a 100M-gram eval suite is a ~120 MB task literal instead of a
    * multi-GB broadcast, and the corpus-side shuffle shrinks to roughly
    * the true-overlap stream. `expectedGrams < 0` (default) sizes the
    * filter from an exact count of the (re-used, checkpointed) gram
    * set; pass an estimate to skip that job.
    *
    * Conf prerequisite at that scale: BloomFilterAggregate bounds both
    * inputs — raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems
    * (4M items default; a 100M-gram set fails analysis without it) AND
    * .maxNumBits (64M default) together, or the build errors before a
    * single row is read.
    */
  /** Span-level contamination evidence — [[sharedNgrams]] upgraded
    * from a flag to a report: per contaminated document, how MUCH of
    * it overlaps the benchmark (distinct-gram share) and a
    * deterministic sample of the overlap (the lexicographically
    * smallest shared gram), the columns a quarantine review actually
    * reads.
    *
    * Output: (doc_id, n_grams, n_shared, share_1e6, first_gram) for
    * docs with ≥ 1 shared gram.
    *
    * Scale: identical plan spine to [[sharedNgrams]] (broadcast gram
    * set prunes the exploded stream before its only shuffle); the
    * per-doc gram total comes from `size(shingles(...))` — a narrow
    * second scan, never a second explode/shuffle.
    */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    val bsh = bench
      .select(explode(shingles(col(benchTextCol), n)).as("gram")).distinct()
    val totals = corpus.select(col(idCol).as("doc_id"),
      size(shingles(col(textCol), n)).cast("long").as("n_grams"))
    corpus
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("gram"))
      .join(broadcast(bsh), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"), min(col("gram")).as("first_gram"))
      .join(totals, Seq("doc_id"))
      .withColumn("share_1e6", expr("n_shared * 1000000L DIV n_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        col("share_1e6"), col("first_gram"))
  }

  /** Eval-coverage report — [[contaminationReport]] with the direction
    * FLIPPED: for each EVAL document, the share of its distinct
    * n-gram shingles that appear anywhere in the training corpus.
    * The corpus-side report says which training docs to drop; this one
    * says which benchmark items are already compromised (and how
    * badly) — the table an eval-integrity review reads before trusting
    * a score.
    *
    * Scale shape: the corpus stream is pruned by the broadcast eval
    * gram set BEFORE any shuffle (the [[sharedNgrams]] spine); the
    * matched-gram distinct and every later join are bounded by the
    * EVAL set's gram count, never the corpus. Zero-gram eval docs
    * report share 0, not an error.
    *
    * Output: (eval_id, n_grams, n_covered, share_1e6).
    */
  def evalCoverage(corpus: DataFrame, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    // shingles() is per-doc distinct, so the pair stream needs no dedup
    val evalGrams = bench.select(col(benchIdCol).as("eval_id"),
      explode(shingles(col(benchTextCol), n)).as("gram"))
    val gramSet = evalGrams.select(col("gram")).distinct()
    val matched = corpus
      .select(explode(shingles(col(textCol), n)).as("gram"))
      .join(broadcast(gramSet), Seq("gram"))
      .distinct()
    val totals = bench.select(col(benchIdCol).as("eval_id"),
      size(shingles(col(benchTextCol), n)).cast("long").as("n_grams"))
    val covered = evalGrams.join(broadcast(matched), Seq("gram"), "left_semi")
      .groupBy(col("eval_id")).agg(count(lit(1)).as("n_covered"))
    totals.join(covered, Seq("eval_id"), "left")
      .na.fill(0L, Seq("n_covered"))
      .withColumn("share_1e6", when(col("n_grams") === 0L, lit(0L))
        .otherwise(expr("n_covered * 1000000L DIV n_grams")))
      .select(col("eval_id"), col("n_grams"), col("n_covered"),
        col("share_1e6"))
  }

  /** Stateless contamination gate — the STREAMING-SHAPED variant:
    * `flagged = ∃ gram ∈ shingles(text) ∩ gramSet`, a pure map-side
    * expression (the gram set rides along as a sorted array literal
    * bound once via `let`), so it runs identically over a batch
    * DataFrame and an append-mode stream — no state, no watermark, no
    * aggregation; the ingest-time quarantine router. Exact, not a
    * bloom: benchmark gram sets are bounded; for eval suites too big
    * for an expression literal, chain [[sharedNgramsBloom]]'s filter
    * as the prefilter and this as the confirm.
    */
  def flagByGramSet(df: DataFrame, idCol: String, textCol: String,
      gramSet: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    val sorted = gramSet.distinct.sorted
    val gate =
      if (sorted.isEmpty) lit(false)
      else graft.functions.let(typedLit(sorted), gs =>
        exists(shingles(col(textCol), n), g => array_contains(gs, g)))
    df.select(col(idCol).as("doc_id"), gate.cast("long").as("flagged"))
  }

  def sharedNgramsBloom(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      minShared: Long = 1L, fpp: Double = 0.01,
      expectedGrams: Long = -1L): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    require(minShared >= 1, s"minShared must be positive, got $minShared")
    // three consumers (count, bloom agg, confirm join) — tokenize once
    val bsh = bench
      .select(explode(shingles(col(benchTextCol), n)).as("gram")).distinct()
      .localCheckpoint()
    val items = if (expectedGrams >= 0) expectedGrams else bsh.count()
    val bits = graft.expressions.Bloom.optimalNumBits(items, fpp)
    val bytes = bsh
      .agg(graft.expressions.Bloom.agg(col("gram"), math.max(items, 1L), bits).as("bf"))
      .head().getAs[Array[Byte]](0)
    corpus
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("gram"))
      .filter(graft.expressions.Bloom.mightContain(bytes, col("gram")))
      .join(bsh, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Near-duplicate decontamination — the contamination exact-gram
    * overlap misses: eval items lightly paraphrased, re-wrapped, or
    * re-formatted inside corpus documents. MinHash-LSH across the two
    * tables proposes candidates (a band-bucket equi-join — never
    * corpus × eval), exact n-gram Jaccard verifies each candidate,
    * and pairs at/above `minJaccard1e6` emit as
    * (doc_id, bench_id, jaccard_1e6).
    *
    * Scale shape: the corpus pays one codegen'd signature pass plus a
    * shuffle keyed on (band, bucket); the (bounded) eval side's band
    * keys and shingle sets broadcast, so the corpus stream never
    * shuffles a second time for the verify — the same
    * prune-before-shuffle discipline as [[sharedNgrams]]. Jaccard
    * uses the q20 fixed-point formula, so the gate is bit-stable
    * across engines.
    */
  def nearDupContaminated(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3,
      minJaccard1e6: Long = 200000L): DataFrame = {
    require(minJaccard1e6 >= 0 && minJaccard1e6 <= 1000000L,
      s"minJaccard1e6 must be a [0, 1e6] fixed-point fraction: $minJaccard1e6")
    val cb = Dedup.bandedBuckets(corpus, idCol, textCol, bands, rowsPerBand, n)
    val bb = Dedup.bandedBuckets(bench, benchIdCol, benchTextCol, bands, rowsPerBand, n)
    val cand = cb.as("c")
      .join(broadcast(bb.as("b")),
        col("c.band") === col("b.band") && col("c.bucket") === col("b.bucket"))
      .select(col("c.id").as("doc_id"), col("b.id").as("bench_id"))
      .distinct()
    val shc = corpus.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("sh_c"))
    val shb = bench.select(col(benchIdCol).as("bench_id"),
      shingles(col(benchTextCol), n).as("sh_b"))
    cand.join(shc, "doc_id").join(broadcast(shb), "bench_id")
      .select(col("doc_id"), col("bench_id"),
        floor(graft.functions.ratio(
            size(array_intersect(col("sh_c"), col("sh_b"))),
            size(array_union(col("sh_c"), col("sh_b")))) * lit(1000000.0))
          .cast("long").as("jaccard_1e6"))
      .filter(col("jaccard_1e6") >= minJaccard1e6)
  }

  /** Leakage-free train/eval split — the split and the contamination
    * check fused: every document gets its deterministic hash split
    * ([[Sampling.splitLabel]]), then any TRAIN document sharing ≥
    * `minShared` distinct word n-grams with any held-out (non-train)
    * document is relabeled `quarantined` — so the published train set
    * provably cannot leak the eval carve-outs, and the quarantine is
    * auditable (its `n_shared` evidence rides along; clean docs carry
    * 0). Splitting before checking matters: the held-out side is the
    * SPLIT's own val/test, not an external benchmark, which is the
    * leak [[sharedNgrams]] alone cannot see.
    *
    * Scale shape: the split label is a scan-speed hash filter; the
    * held-out side is a bounded fraction of the corpus (val+test
    * ppm), so its distinct gram set broadcasts exactly like
    * [[sharedNgrams]]'s benchmark side — the train stream is pruned
    * to overlapping grams BEFORE its only shuffle. For held-out
    * slices too big to broadcast, swap the inner join for
    * [[sharedNgramsBloom]]'s prefilter; the output contract is
    * unchanged.
    *
    * Output: (doc_id, split ∈ {splits... | quarantined}, n_shared).
    */
  def decontaminatedSplit(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Long)], trainLabel: String = "train",
      n: Int = 3, minShared: Long = 1L): DataFrame = {
    require(splits.exists(_._1 == trainLabel),
      s"trainLabel '$trainLabel' must be one of the splits: $splits")
    val labeled = docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"),
      Sampling.splitLabel(col(idCol), splits).as("split"))
    val held = labeled.filter(col("split") =!= trainLabel)
    val contaminated = sharedNgrams(
      labeled.filter(col("split") === trainLabel), "doc_id", "_text",
      held, "_text", n, minShared)
    labeled.join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n_shared").isNotNull, lit("quarantined"))
          .otherwise(col("split")).as("split"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }
}
