package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Text-analysis operators for training-data curation: language-ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, shuffle-free, embarrassingly parallel).
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword
    * language-ID heuristic.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr" -> Seq("le", "la", "et", "de", "un", "est", "pour", "que", "dans", "pas"),
    "es" -> Seq("el", "la", "y", "de", "un", "es", "en", "que", "por", "los"))

  def hitsFromTokens(toks: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(wordArr, t))).cast("long")
  }

  def stopwordHits(text: Column, words: Seq[String]): Column =
    hitsFromTokens(tokens(lower(text)), words)

  /** Argmax of stopword hits over a let-bound token array. The scored
    * (hits, lang) structs are bound into an array FIRST and the fold
    * runs over lambda variables: a plain `Seq.reduce(when(b>a,b),a)`
    * expression tree references each struct several times, and
    * interpreted HOF evaluation re-computes a subtree per reference —
    * measured ~10× the whole-gate cost at 50k docs. The left fold over
    * the bound array keeps first-language-wins tie semantics and
    * evaluates each hit count exactly once.
    */
  private def argmaxLang(toks: Column): Column = {
    val scoredArr = array(stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(hitsFromTokens(toks, words).as("hits"), lit(lang).as("lang")) }: _*)
    let(scoredArr, arr =>
      let(aggregate(slice(arr, 2, stopwords.size - 1), element_at(arr, 1),
          (acc, x) => when(x.getField("hits") > acc.getField("hits"), x).otherwise(acc)),
        best => when(best.getField("hits") > 0, best.getField("lang"))
          .otherwise(lit("und"))))
  }

  /** Predicted language = argmax of stopword hits, ties broken by
    * language code order, "und" (undetermined) when nothing matched.
    * Tokenization is let-bound so the token array is built once per
    * row, not once per candidate language.
    */
  def langId(text: Column): Column =
    let(tokens(lower(text)), toks => argmaxLang(toks))

  /** Language-ID with a confidence margin: struct(predicted_lang,
    * best_hits, second_hits, n_tokens). One left fold over the same
    * let-bound scored array as [[langId]] tracks the top TWO hit
    * counts, so tie semantics match exactly: the first language in
    * code order wins a tie, and a later language tying the maximum
    * raises `second_hits` to the shared maximum (margin 0) — which is
    * precisely when the argmax label is untrustworthy. Callers derive
    * margin = best − second and any fixed-point normalization from
    * the raw longs (see q124: `(margin·1e6) div n_tokens`, exact
    * non-negative integer arithmetic, so Spark `div` and DuckDB `//`
    * agree). Map-only scan shape — codegen'd expressions, no shuffle,
    * no UDF; at 100 TB this runs at read bandwidth like the other
    * text gates.
    */
  def langIdWithMargin(text: Column): Column =
    let(tokens(lower(text)), toks => {
      val scoredArr = array(stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
        struct(hitsFromTokens(toks, words).as("hits"), lit(lang).as("lang")) }: _*)
      let(scoredArr, arr => {
        val init = struct(element_at(arr, 1).as("best"), lit(0L).as("second"))
        let(aggregate(slice(arr, 2, stopwords.size - 1), init, (acc, x) => {
            val best = acc.getField("best")
            val hits = x.getField("hits")
            when(hits > best.getField("hits"),
                struct(x.as("best"), best.getField("hits").as("second")))
              .when(hits > acc.getField("second"),
                struct(best.as("best"), hits.as("second")))
              .otherwise(acc)
          }),
          st => {
            val bh = st.getField("best").getField("hits")
            struct(
              when(bh > 0, st.getField("best").getField("lang"))
                .otherwise(lit("und")).as("predicted_lang"),
              bh.as("best_hits"),
              st.getField("second").as("second_hits"),
              size(toks).cast("long").as("n_tokens"))
          })
      })
    })

  /** Heuristic quality signals: length, token count, mean word length,
    * punctuation ratio, digit ratio, english-stopword ratio, and a
    * [0,1] composite score.
    */
  def qualitySignals(df: DataFrame, text: Column): DataFrame = {
    val len = length(coalesce(text, lit(""))).cast("long")
    val nTok = tokenCount(text)
    val punct = regexp_count(coalesce(text, lit("")), lit("[.!?,;:]")).cast("long")
    val digits = regexp_count(coalesce(text, lit("")), lit("[0-9]")).cast("long")
    val stops = stopwordHits(text, stopwords("en"))
    df.withColumn("n_chars_obs", len)
      .withColumn("n_tokens", nTok)
      .withColumn("mean_word_len", ratio(len - greatest(nTok - 1, lit(0L)), nTok))
      .withColumn("punct_ratio", ratio(punct, len))
      .withColumn("digit_ratio", ratio(digits, len))
      .withColumn("stopword_ratio", ratio(stops, nTok))
  }

  /** Intra-document repetition: the fraction of word n-grams that are
    * duplicates (1 − distinct/total) — the boilerplate/loop gate
    * ("repetition removal") corpus-quality pipelines apply alongside
    * the signals above. 0.0 for docs with fewer than n tokens (no
    * grams, nothing repeats). Fixed IEEE-754 op order (one division,
    * one subtraction), so engines reproduce it bit-identically; the
    * battery compares floor(·1e6). Narrow and shuffle-free; the gram
    * array is bound once per row (let), never re-built per reference.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column =
    let(graft.functions.rawShingles(text, n), g =>
      when(size(g) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(g)).cast("double") / size(g).cast("double")))

  /** Unrounded composite quality score in [0,1]: favors mid-length docs
    * with low digit noise and some stopword mass. Pure IEEE-754 double
    * arithmetic in a fixed order, so any engine reproduces it
    * bit-identically (the battery compares floor(raw·1e6)).
    */
  def qualityScoreRaw(text: Column): Column = {
    val len = length(coalesce(text, lit(""))).cast("double")
    val nTok = tokenCount(text).cast("double")
    val digits = regexp_count(coalesce(text, lit("")), lit("[0-9]")).cast("double")
    val stops = stopwordHits(text, stopwords("en")).cast("double")
    val lenScore = when(len >= 100 && len <= 10000, lit(1.0))
      .when(len < 100, len / 100.0)
      .otherwise(lit(10000.0) / len)
    val digitPenalty = lit(1.0) - ratio(digits, len)
    val stopScore = least(ratio(stops, nTok) * 5.0, lit(1.0))
    (lenScore + digitPenalty + stopScore) / 3.0
  }

  /** Human-facing rounded form of [[qualityScoreRaw]]. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Fused curation gates: quality score (1e-6 fixed point, the exact
    * [[qualityScoreRaw]] arithmetic) and predicted language (the exact
    * [[langId]] argmax) from ONE tokenization — the separate
    * expressions each let-bind their own token array, so a pipeline
    * that needs both would tokenize twice and score stopword hits for
    * 5 lists across 2 passes. Returns
    * struct(quality_1e6 long, predicted_lang string).
    */
  def curationGates(text: Column): Column =
    let(tokens(lower(text)), toks => {
      val len = length(coalesce(text, lit(""))).cast("double")
      val nTok = size(toks).cast("long").cast("double")
      val digits = regexp_count(coalesce(text, lit("")), lit("[0-9]")).cast("double")
      val stops = hitsFromTokens(toks, stopwords("en")).cast("double")
      val lenScore = when(len >= 100 && len <= 10000, lit(1.0))
        .when(len < 100, len / 100.0)
        .otherwise(lit(10000.0) / len)
      val digitPenalty = lit(1.0) - ratio(digits, len)
      val stopScore = least(ratio(stops, nTok) * 5.0, lit(1.0))
      val quality = floor(((lenScore + digitPenalty + stopScore) / 3.0) * 1000000.0)
        .cast("long")
      struct(quality.as("quality_1e6"), argmaxLang(toks).as("predicted_lang"))
    })

  /** Document fingerprint: 60-bit hash of the whitespace-normalized,
    * lowercased text — stable under formatting noise. md5-derived for
    * engine reproducibility.
    */
  def fingerprint(text: Column): Column =
    md5Long(regexp_replace(trim(lower(coalesce(text, lit("")))), "\\s+", " "))

  /** Rolling polynomial hash (Rabin-Karp style) over tokens:
    * h = Σ h*B + md5Long(token) (mod P). Demonstrates an order-aware
    * fingerprint; the fold stays in [0, P·B + 2^60) so ANSI-safe.
    */
  def rollingHash(text: Column, b: Long = 131L, p: Long = 1000000007L): Column =
    aggregate(tokens(lower(text)), lit(0L),
      (acc, t) => pmod(acc * b + pmod(md5Long(t), lit(p)), lit(p)))

  /** Formatting-invariant canonical form for dedup keys: lowercase,
    * punctuation stripped, whitespace collapsed, trimmed — so exact
    * dedup also collapses the re-serialized / re-wrapped / re-punctuated
    * copies that raw-byte hashing misses (the first normalization pass
    * every published dedup pipeline applies before hashing). ASCII
    * character classes on purpose, with whitespace spelled as the
    * EXPLICIT class `[ \t\n\x0B\f\r]` rather than `\s`: Java's `\s`
    * includes vertical tab (\x0B) while RE2's (the DuckDB oracle's
    * engine) does not, so `\s` is NOT engine-portable — a \x0B in a
    * document would normalize differently per engine. Swap in
    * `\p{L}\p{N}` for Unicode corpora and re-derive the oracle.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(coalesce(text, lit(""))), "[^a-z0-9 \\t\\n\\x0B\\f\\r]", ""),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Unigram LM surprisal — the perplexity-style quality signal
    * (CCNet's "score every document under a corpus LM and gate on it")
    * in engine-portable integer arithmetic: per token w,
    * surprisal(w) = floor(log2 N) − floor(log2 c_w) ≈ log2(N / c_w)
    * bits, where c_w is the token's CORPUS count and N the corpus
    * token total. Both floor-log2s are computed EXACTLY as binary
    * digit counts (`length(bin(x)) − 1` — no floating log whose
    * rounding could differ across engines), so a document's score is
    * an associative integer sum: rare-token-heavy (or out-of-domain)
    * documents score high, boilerplate scores low — gate on either
    * tail with [[Sampling.quantileGate]].
    *
    * Output: (id, n_tokens, surprisal_bits, avg_surprisal_1e6) per
    * document with ≥1 token.
    *
    * Scale: pass 1 builds the vocabulary count table (vocab-sized —
    * small even at 100 TB; Zipf means it fits a broadcast), pass 2
    * scores the token stream against the BROADCAST counts — the big
    * side never shuffles on term; the only wide exchange is the final
    * per-document groupBy. The same two-pass df-stats shape as BM25.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n")) // 1 row
    val bitsOf = (x: Column) => length(bin(x)).cast("long")
    toks.join(broadcast(counts), Seq("term"))
      .crossJoin(broadcast(total))
      .select(col("id"), (bitsOf(col("n")) - bitsOf(col("c"))).as("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s")).as("surprisal_bits"))
      .withColumn("avg_surprisal_1e6",
        expr("surprisal_bits * 1000000L DIV n_tokens"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020,
    * arXiv:1911.00359): score every document under the corpus LM
    * ([[unigramSurprisal]] — the engine-portable integer stand-in for
    * KenLM perplexity), then split EACH SOURCE at its own 1/3 and 2/3
    * perplexity percentiles into head / middle / tail. Per-source
    * calibration is the part that matters: a "hard" source would land
    * wholesale in a global tail; CCNet keeps head+middle per source
    * and drops tails. Percentiles come from
    * [[Sampling.percentileCalibrate]] (min-rank ties, (rank−1)·1e6
    * div (n−1)); bucket thresholds are exact integer compares
    * (pct·3 < 1e6, < 2e6) so engines agree on boundary docs.
    *
    * Output: (id, source, avg_surprisal_1e6, pct_1e6, bucket) for
    * every document with ≥ 1 token.
    *
    * Scale shape: surprisal's two broadcast passes + calibration's
    * counts-table windows (bounded by distinct (source, score), never
    * a corpus-wide window).
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val sur = unigramSurprisal(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("id"), col(sourceCol).as("source")), Seq("id"))
    Sampling.percentileCalibrate(sur, col("id"), col("source"),
        col("avg_surprisal_1e6"))
      .withColumnRenamed("score", "avg_surprisal_1e6")
      .withColumn("bucket",
        when(col("pct_1e6") * 3 < 1000000L, "head")
          .when(col("pct_1e6") * 3 < 2000000L, "middle")
          .otherwise("tail"))
      .select(col("id"), col("stratum").as("source"),
        col("avg_surprisal_1e6"), col("pct_1e6"), col("bucket"))
  }

  /** Feature hashing ("the hashing trick", Weinberger et al., ICML
    * 2009): tokens hash into a fixed `dim`-bucket sparse vector with a
    * ±1 sign drawn from an independent hash bit, which makes the
    * implicit inner product an unbiased estimate of the true TF inner
    * product. This is the deterministic text→vector bridge — no model,
    * no vocabulary table, any engine reproduces it bit-for-bit — that
    * lets the dense ops (cosine near-dups, clustering, ANN) run on raw
    * documents. Bucket = low log2(dim) bits of the md5-derived token
    * hash; sign = the next bit; zero-sum buckets (sign cancellation)
    * are dropped, keeping the output truly sparse.
    *
    * Output: (id, bucket, weight) sparse rows, weight = signed count.
    *
    * Scale shape: narrow explode + one (id, bucket) groupBy with
    * map-side combine — the same single-shuffle cost as token
    * counting; output is ≤ min(tokens, dim) rows per doc.
    */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two >= 2, got $dim")
    val bits = java.lang.Integer.numberOfTrailingZeros(dim)
    val toksDf = docs.select(col(idCol).as("id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val h = md5Long(col("term"))
    toksDf.select(col("id"),
        h.bitwiseAND(lit((dim - 1).toLong)).as("bucket"),
        when(shiftright(h, bits).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("id"), col("bucket"))
      .agg(sum(col("sgn")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** DSIR importance weighting (Xie et al., NeurIPS 2023,
    * arXiv:2302.03169 — Data Selection via Importance Resampling):
    * score each corpus document by how much more likely its tokens
    * are under a TARGET domain's unigram LM than under the corpus LM,
    *
    *   s(doc) = Σ_tokens [log2 p̂_T(w) − log2 p̂_C(w)]
    *
    * in exact integer arithmetic: add-one-smoothed counts, each
    * floor-log2 an exact binary digit count (`length(bin(x)) − 1`
    * style, as [[unigramSurprisal]]), plus the per-token constant
    * normalizer floor-log2(N_C+1) − floor-log2(N_T+1) so corpus-size
    * imbalance doesn't skew the sign. High = target-like; feed the
    * score to [[Sampling.quantileGate]] or hash-resample the top
    * mass — the domain-targeting step of corpus assembly.
    *
    * Output: (id, n_tokens, dsir_bits, avg_dsir_1e6) per document
    * with ≥ 1 token.
    *
    * Scale: the q88 two-pass shape with two count tables — both
    * vocab-sized broadcasts (Zipf keeps vocabularies small relative
    * to any corpus); the corpus token stream never shuffles on term;
    * the only wide exchange is the final per-document groupBy.
    */
  def dsirWeights(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String): DataFrame = {
    val toksC = corpus.select(col(idCol).as("id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val cc = toksC.groupBy(col("term")).agg(count(lit(1)).as("cc"))
    val ct = target
      .select(explode(tokens(lower(col(targetTextCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("ct"))
    val nc = cc.agg(coalesce(sum(col("cc")), lit(0L)).as("nc")) // 1 row
    val nt = ct.agg(coalesce(sum(col("ct")), lit(0L)).as("nt")) // 1 row
    val bitsOf = (x: Column) => length(bin(x)).cast("long")
    toksC.join(broadcast(cc), Seq("term"))
      .join(broadcast(ct), Seq("term"), "left")
      .crossJoin(broadcast(nc)).crossJoin(broadcast(nt))
      .select(col("id"),
        (bitsOf(coalesce(col("ct"), lit(0L)) + 1) - bitsOf(col("cc") + 1)
          + bitsOf(col("nc") + 1) - bitsOf(col("nt") + 1)).as("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s")).as("dsir_bits"))
      .withColumn("avg_dsir_1e6", expr("dsir_bits * 1000000L DIV n_tokens"))
  }

  /** DSIR selection — the RESAMPLING step of Data Selection via
    * Importance Resampling: keep the top `topShare` of documents by
    * [[dsirWeights]] average score, the band being
    * [p_(1−topShare), p_1] of the score distribution via
    * [[Sampling.quantileGate]] (one percentile aggregate broadcast
    * back onto a scan-speed filter — the corpus never re-shuffles for
    * the cut). Exact interpolated percentile (quantile_cont parity);
    * score ties at the threshold keep.
    *
    * Output: the [[dsirWeights]] columns of the kept documents.
    */
  def dsirSelect(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, topShare: Double): DataFrame = {
    require(topShare > 0.0 && topShare <= 1.0,
      s"topShare must be in (0, 1]: $topShare")
    val w = dsirWeights(corpus, idCol, textCol, target, targetTextCol)
    Sampling.quantileGate(w, col("avg_dsir_1e6"), lit(1), 1.0 - topShare, 1.0)
  }

  /** DSIR importance RESAMPLING — the probabilistic cut [[dsirSelect]]'s
    * hard quantile band is the deterministic stand-in for: each doc
    * keeps with probability proportional to its position on the
    * corpus's own [[dsirWeights]] score range, via the md5-ppm gate
    * (rate_ppm = (score − min)·1e6 div (max − min); a degenerate
    * one-score corpus keeps everything). Linear-in-score rates are
    * the exact-integer stand-in for exp-weight sampling — monotone in
    * the same scores, reproducible on any engine, and E[kept docs]
    * follows the score distribution, softening the cliff a hard
    * threshold puts at the band edge.
    *
    * Shape: the score min/max is ONE broadcast row; the gate is a
    * scan-speed filter on the scored table — no new corpus shuffle
    * beyond what dsirWeights already paid.
    *
    * Output: the [[dsirWeights]] columns + rate_ppm for kept docs.
    */
  def dsirResample(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String): DataFrame = {
    val w = dsirWeights(corpus, idCol, textCol, target, targetTextCol)
    val range = w.agg(min(col("avg_dsir_1e6")).as("_lo"),
      max(col("avg_dsir_1e6")).as("_hi"))
    w.crossJoin(broadcast(range))
      .withColumn("rate_ppm", expr(
        """CASE WHEN _hi = _lo THEN CAST(1000000 AS BIGINT)
           ELSE ((avg_dsir_1e6 - _lo) * 1000000) DIV (_hi - _lo) END"""))
      .filter(Sampling.hashBucket(col("id")) < col("rate_ppm"))
      .select(col("id"), col("n_tokens"), col("dsir_bits"),
        col("avg_dsir_1e6"), col("rate_ppm"))
  }

  /** Bigram LM surprisal — [[unigramSurprisal]]'s first-order upgrade:
    * per adjacent pair (a, b), surprisal ≈ −log2 P(b|a) estimated as
    * floor(log2 c_a) − floor(log2 c_ab) (unigram and bigram corpus
    * counts, both floor-log2s exact binary digit counts — never
    * negative since c_ab ≤ c_a). Catches locally-incoherent text
    * (shuffled words, boilerplate splices) that unigram statistics
    * can't see. Documents with < 2 tokens drop.
    *
    * Output: (id, n_bigrams, surprisal_bits, avg_surprisal_1e6).
    *
    * Scale: same two-pass shape as [[unigramSurprisal]] — count
    * tables broadcast (bigram vocab is Zipf-bounded; cap or
    * df-filter it for adversarial corpora), token stream never
    * shuffles on term, one final per-document groupBy.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("tk"))
      .filter(size(col("tk")) >= 2)
    val uni = base.select(explode(col("tk")).as("l"))
      .groupBy(col("l")).agg(count(lit(1)).as("cu"))
    val pairs = base.select(col("id"), explode(
        zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("l"), concat(a, lit(" "), b).as("bg")))).as("p"))
      .select(col("id"), col("p.l").as("l"), col("p.bg").as("bg"))
    val bgc = pairs.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val bitsOf = (x: Column) => length(bin(x)).cast("long")
    pairs.join(broadcast(bgc), Seq("bg"))
      .join(broadcast(uni), Seq("l"))
      .select(col("id"), (bitsOf(col("cu")) - bitsOf(col("cb"))).as("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("surprisal_bits"))
      .withColumn("avg_surprisal_1e6",
        expr("surprisal_bits * 1000000L DIV n_bigrams"))
  }

  /** Interpolated Kneser–Ney bigram LM estimation — the smoothing the
    * KenLM-style quality models behind CCNet-shaped pipelines use.
    * Per distinct bigram (a, b), with D = 3/4 (the textbook absolute
    * discount, chosen rational so everything stays exact):
    *
    *   P_KN(b|a) = (c(a,b) − D)/c(a·)
    *             + D·N1+(a,·)/c(a·) · N1+(·,b)/N1+(·,·)
    *
    * where c(a·) = Σ_b c(a,b), N1+(a,·) = distinct continuations of
    * a, N1+(·,b) = distinct left contexts of b (the "novel-context"
    * count that makes KN beat plain backoff), N1+(·,·) = distinct
    * bigram types. The whole expression is one exact rational —
    * num = (4·c_ab − 3)·T + 3·N1fwd·N1bwd over den = 4·c_a·T — so
    * p_kn_1e6 = num·1e6 div den reproduces bit-identically on any
    * engine; the products run in DECIMAL(38,0) so corpus sizes far
    * past BIGINT midpoints can't overflow. Σ_b P(b|a) = 1 by
    * construction (spec-pinned within floor error).
    *
    * Rows with c_ab < `minCount` are pruned AFTER all statistics are
    * taken (KenLM-style singleton pruning: the model shrinks, the
    * probabilities don't move).
    *
    * Scale shape: one shuffle to count bigrams; the three statistics
    * tables derive from the Zipf-bounded model table itself (never
    * from the token stream), join back on term keys, and the 1-row
    * type count broadcasts. At 100 TB the corpus is read once.
    */
  def kneserNeyBigrams(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L): DataFrame = {
    val base = docs
      .select(tokens(lower(col(textCol))).as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = base.select(explode(
        zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bg = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val left = bg.groupBy(col("a"))
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1_fwd"))
    val right = bg.groupBy(col("b")).agg(count(lit(1)).as("n1_bwd"))
    val types = bg.agg(count(lit(1)).as("n_types"))
    bg.join(left, Seq("a")).join(right, Seq("b"))
      .crossJoin(broadcast(types))
      .filter(col("c_ab") >= minCount)
      .withColumn("p_kn_1e6", expr(
        """CAST((((4 * c_ab - 3) * CAST(n_types AS DECIMAL(38,0))
                  + 3 * CAST(n1_fwd AS DECIMAL(38,0)) * n1_bwd) * 1000000)
           DIV (4 * c_a * CAST(n_types AS DECIMAL(38,0))) AS BIGINT)"""))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"),
        col("n1_fwd"), col("n1_bwd"), col("p_kn_1e6"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): from each window of `w`
    * consecutive word-`n`-gram hashes, select the MINIMUM hash (ties
    * → rightmost position), then keep the distinct selections. The
    * guarantee plain min-sampling lacks: every `w`-gram window
    * contributes a fingerprint, so any shared run of ≥ w + n − 1
    * tokens between two documents is detected, at an expected
    * density of only 2/(w+1) of the grams — the index-size/recall
    * dial for plagiarism- and contamination-style matching.
    *
    * One window min does all the selection work: (hash, tie-pos)
    * packs into a single BIGINT — `enc = h·2^20 + (2^20−1−pos)` — so
    * min(enc) is lexicographic (min hash, then rightmost pos).
    * Positions are assumed < 2^20 grams/doc; longer documents only
    * soften the tie-break, never the min-hash choice.
    *
    * Output: (doc_id, fp_hash, fp_pos) per selected fingerprint.
    * Scale shape: gram hashes are one codegen'd narrow pass
    * ([[Dedup.gramHashes]] — md5-derived, engine-reproducible); the
    * only shuffle is the per-doc window.
    */
  def winnowingFingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 1 && w >= 1, s"need n >= 1 and w >= 1, got n=$n w=$w")
    val g = docs.select(col(idCol).as("doc_id"),
      posexplode(Dedup.gramHashes(col(textCol), n)).as(Seq("pos", "h")))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, w - 1)
    val perDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    g.withColumn("enc", col("h") * lit(1048576L) + (lit(1048575L) - col("pos")))
      .withColumn("sel", min(col("enc")).over(frame))
      .withColumn("n", count(lit(1)).over(perDoc))
      // only rows with a FULL w-window ahead select (the final w−1
      // windows would be truncated and over-select near the tail)
      .filter(col("pos") <= col("n") - w)
      .select(col("doc_id"), expr("sel DIV 1048576").as("fp_hash"),
        (lit(1048575L) - expr("sel % 1048576")).as("fp_pos"))
      .distinct()
  }

  /** The MOSS pairing step over [[winnowingFingerprints]]: candidate
    * document pairs sharing ≥ `minShared` distinct fingerprint hashes
    * — (id_a, id_b, n_shared) with id_a < id_b. Winnowing's guarantee
    * makes this a RUN detector (any shared ≥ w+n−1-token run shares a
    * fingerprint), at fingerprint density instead of full gram
    * density — the same bucket-join shape as MinHash-LSH but with
    * position-aware evidence.
    *
    * `maxHashDf` is the boilerplate valve (q18's maxBucketSize
    * analog): a fingerprint appearing in B docs emits B²/2 pairs, so
    * corpus-scale runs cap per-hash document frequency and handle the
    * dropped template families explicitly. None (the oracle-mirrored
    * default) disables the cap.
    */
  def winnowingPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4, minShared: Long = 2L,
      maxHashDf: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be positive: $minShared")
    val fps = winnowingFingerprints(docs, idCol, textCol, n, w)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .localCheckpoint()
    val keyed = maxHashDf match {
      case None => fps
      case Some(cap) =>
        val dfs = fps.groupBy(col("fp_hash").as("fh"))
          .agg(count(lit(1)).as("_df")).filter(col("_df") <= cap)
        fps.join(dfs, fps("fp_hash") === col("fh"), "left_semi")
    }
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Corpus-wide repeated n-gram report — the "memorization risk"
    * one-pager (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" motivates removing text repeated across
    * documents; this is the report that sizes the problem BEFORE
    * running span removal, see [[Dedup.exactSubstringSpans]]): every
    * word n-gram appearing in ≥ `minDocs` distinct documents, with its
    * document frequency and total occurrence count, top `topK` by
    * (n_docs desc, n_occ desc, gram asc — unique last key, so the cut
    * is deterministic on any engine).
    *
    * Shape at scale: explode → two-level hash agg. The (gram, id)
    * pre-aggregation replaces `countDistinct` — no Expand doubling of
    * the exploded stream, and map-side partial agg compresses within-
    * doc repeats before either shuffle. The top-k cut plans as
    * TakeOrderedAndProject (no global sort).
    */
  def repeatedNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int = 6, minDocs: Long = 2L, topK: Int = 20): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    require(minDocs >= 1 && topK >= 1,
      s"need minDocs, topK >= 1, got $minDocs, $topK")
    df.select(col(idCol).as("id"),
        explode(rawShingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram"), col("id"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_c")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram"))
      .limit(topK)
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", App. A1.1): the rule-based pre-filter
    * production corpora apply BEFORE model-based scoring. Each rule is
    * an integer comparison (ratios cross-multiplied), so both engines
    * decide every flag exactly — no float thresholds:
    *
    *  - `ok_words`       word count in [minWords, maxWords]
    *  - `ok_mean_len`    mean word length in [3, 10] chars
    *      (3·n ≤ Σlen ≤ 10·n)
    *  - `ok_symbols`     symbol-to-word ratio ('#' or '...') ≤ 0.1
    *  - `ok_bullets`     ≤ 90% of lines start with a bullet ('- ', '* ')
    *  - `ok_ellipsis`    ≤ 30% of lines end with '...'
    *  - `ok_alpha`       ≥ 80% of words contain an alphabetic char
    *  - `ok_stops`       ≥ minStopHits distinct words from `stopSet`
    *  - `pass`           conjunction of all seven
    *
    * Whole-corpus shape: one narrow codegen'd pass, zero shuffles —
    * the token array binds once per row (`let`) and every rule folds
    * over it. NULL text behaves as the empty document (0 words → fails
    * `ok_words`).
    *
    * The reference pipeline's validation gates are row-level null/type
    * checks (`/root/reference/etl/validate.py`); these rules are the
    * corpus-scale analog for free-text columns.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stopSet: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with"),
      minStopHits: Long = 2L): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got [$minWords, $maxWords]")
    val tx = coalesce(col(textCol), lit(""))
    val stopArr = array(stopSet.map(lit): _*)
    // non-overlapping left-to-right occurrence count via plain (non-
    // regex) replace — identical semantics in DuckDB's replace().
    // Evaluated in the SECOND select, where only the projected `_tx`
    // survives (textCol is gone by then).
    val occurrences = (s: String) => {
      val c = col("_tx")
      ((length(c) - length(replace(c, lit(s), lit("")))).cast("long")
        / lit(s.length.toLong)).cast("long")
    }
    val out = df.select(col(idCol).as("id"), tx.as("_tx"),
        tokens(tx).as("_tk"), split(tx, "\n", -1).as("_ln"))
      .select(col("id"),
        size(col("_tk")).cast("long").as("n_words"),
        aggregate(transform(col("_tk"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("word_chars"),
        size(col("_ln")).cast("long").as("n_lines"),
        size(filter(col("_ln"), l =>
          l.startsWith("- ") || l.startsWith("* "))).cast("long")
          .as("bullet_lines"),
        size(filter(col("_ln"), l => l.endsWith("..."))).cast("long")
          .as("ellipsis_lines"),
        (occurrences("#") + occurrences("...")).as("n_symbols"),
        size(filter(col("_tk"), t => t.rlike("[A-Za-z]"))).cast("long")
          .as("alpha_words"),
        size(array_intersect(transform(col("_tk"), t => lower(t)), stopArr))
          .cast("long").as("stop_hits"))
    out.select(col("id"), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("ok_words"),
        (lit(3L) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10L) * col("n_words")).as("ok_mean_len"),
        (lit(10L) * col("n_symbols") <= col("n_words")).as("ok_symbols"),
        (lit(10L) * col("bullet_lines") <= lit(9L) * col("n_lines"))
          .as("ok_bullets"),
        (lit(10L) * col("ellipsis_lines") <= lit(3L) * col("n_lines"))
          .as("ok_ellipsis"),
        (lit(5L) * col("alpha_words") >= lit(4L) * col("n_words"))
          .as("ok_alpha"),
        (col("stop_hits") >= minStopHits).as("ok_stops"))
      .withColumn("pass",
        col("ok_words") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stops"))
  }

  /** Per-document TF-IDF keywords (top `topK` terms). IDF uses the
    * bit-length log2 surrogate ([[lmSurprisal]]'s trick): idf_bits =
    * bitlen(N) - bitlen(df) — an exact INTEGER both engines compute
    * identically, unlike `ln` whose last ulp differs between libm and
    * the JVM. score = tf · idf_bits; ties broken by term (ascending)
    * so the top-k cut is deterministic.
    *
    * Shape at scale: explode → (id, term) hash agg with map-side
    * partial combine → df by a second agg over the (already small)
    * tf relation → broadcast the 1-row corpus count → per-doc top-k
    * window partitioned by id (never a global sort).
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val bitlen = (c: Column) => length(bin(c)).cast("long")
    val tf = df.select(col(idCol).as("id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("score",
        col("tf") * (bitlen(col("n_docs")) - bitlen(col("df_docs"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("id").as("doc_id"), col("term"), col("tf"),
        col("df_docs"), col("score"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Corpus novelty (saturation) curve: bucket documents by
    * `id DIV bucketSize` and report, per bucket, how many DISTINCT
    * word n-grams appear, how many appear for the FIRST time anywhere
    * in the corpus (global min doc id lands in the bucket), the
    * running total of first-seen grams, and the novelty rate
    * (new/distinct, fixed-point 1e6). The curve that says when a
    * crawl stops contributing new content — flat cum_grams = stop
    * ingesting that source.
    *
    * Shape at scale: one explode feeds two aggregations — per-gram
    * global min (map-side combine on the gram key) and per-bucket
    * distinct grams; the per-bucket join is on bucket ids (tiny);
    * the cumulative window runs over #buckets rows (≪ data).
    */
  def noveltyCurve(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bucketSize: Long = 100L): DataFrame = {
    require(n >= 1 && bucketSize >= 1, s"need n, bucketSize >= 1")
    val grams = df.select(col(idCol).cast("long").as("id"),
        explode(rawShingles(col(textCol), n)).as("gram"))
    val perBucketDistinct = grams
      .select(expr(s"id DIV ${bucketSize}").as("bucket"), col("gram"))
      .distinct()
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_distinct"))
    val firstSeen = grams
      .groupBy(col("gram")).agg(min(col("id")).as("first_id"))
      .select(expr(s"first_id DIV ${bucketSize}").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBucketDistinct.join(firstSeen, Seq("bucket"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_grams", sum(col("n_new")).over(w))
      .withColumn("novelty_1e6",
        expr("(n_new * 1000000) DIV n_distinct"))
      .select(col("bucket"), col("n_distinct"), col("n_new"),
        col("cum_grams"), col("novelty_1e6"))
      .orderBy(col("bucket"))
  }

  /** Token frequency spectrum — the corpus's Zipf profile in integer
    * log2 bands: for each frequency band b = bitlen(count), how many
    * distinct token TYPES fall in it, how many token OCCURRENCES they
    * account for, and that band's share of the corpus (fixed-point).
    * Band 1 is the hapax band — its type count is the classic OCR-
    * garbage / boilerplate-explosion indicator; a healthy natural-
    * language corpus shows smoothly decaying type counts per band.
    *
    * Shape at scale: explode → term hash agg (map-side combined) →
    * re-agg of the (already vocabulary-sized) counts into ≤ 64 bands
    * + a broadcast 1-row total. Never touches raw text twice.
    */
  def freqSpectrum(df: DataFrame, textCol: String): DataFrame = {
    val counts = df
      .select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bands = counts
      .groupBy(length(bin(col("c"))).cast("long").as("band"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"))
    val total = bands.agg(sum(col("n_tokens")).as("_tot"))
    bands.crossJoin(broadcast(total))
      .withColumn("share_1e6", expr("(n_tokens * 1000000) DIV _tot"))
      .select(col("band"), col("n_types"), col("n_tokens"), col("share_1e6"))
      .orderBy(col("band"))
  }

  /** Token-mass concentration across sources: per-source token
    * totals + share, plus the corpus Gini coefficient of that
    * distribution in fixed point — the one-number answer to "is the
    * mixture dominated by a few feeds?" that mixture rebalancing
    * (q61) and quota splits (q146) act on. Exact integers throughout:
    * with sources ranked 1..n by (tokens asc, source asc),
    * G·1e6 = (2·Σ(rank·tok)·1e6 − (n+1)·S·1e6) DIV (n·S).
    *
    * Shape at scale: one token-count agg to |sources| rows; ranking
    * and the Gini sum are windows over that tiny relation. The
    * corpus pays one pass.
    */
  def sourceGini(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(tokenCount(col(textCol))).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens"), col("source"))
    val ranked = per
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("_rt", col("rank") * col("n_tokens"))
    val totals = ranked.agg(sum(col("n_tokens")).as("_s"),
      sum(col("_rt")).as("_srt"), count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(totals))
      .withColumn("share_1e6", expr("(n_tokens * 1000000) DIV _s"))
      .withColumn("gini_1e6",
        expr("(2 * _srt * 1000000 - (_n + 1) * _s * 1000000) DIV (_n * _s)"))
      .select(col("source"), col("n_tokens"), col("rank"),
        col("share_1e6"), col("gini_1e6"))
      .orderBy(col("rank"))
  }

  /** Pointwise-mutual-information collocations over ADJACENT word
    * pairs: ratio_1e6 = (c_ab · N · 1e6) DIV (c_a· · c_·b), the PMI
    * odds ratio in fixed point (no logarithm — exact integers on both
    * engines; the log is monotone so ranking is unchanged). Marginals
    * c_a· / c_·b come from the SAME bigram stream (left- and
    * right-position counts), so probabilities are consistent. Pairs
    * below `minCount` are dropped (PMI's low-count pathology), top
    * `topK` by (ratio desc, gram asc).
    *
    * Shape at scale: one explode of word 2-grams → hash agg per gram;
    * the left/right marginals re-aggregate the (already collapsed)
    * gram counts, and both are joined back by gram-key equi-joins.
    * Integer range: c_ab·N·1e6 stays below 2^63 while c_ab·N < 9.2e12
    * — at larger corpora scale both counts down by a common factor
    * first (ratio is scale-free).
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 10L, topK: Int = 20): DataFrame = {
    require(minCount >= 1 && topK >= 1, s"need minCount, topK >= 1")
    val pairs = df.select(explode(rawShingles(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c_ab"))
      .withColumn("l", substring_index(col("gram"), " ", 1))
      .withColumn("r", substring_index(col("gram"), " ", -1))
    val totals = pairs.agg(sum(col("c_ab")).as("n_bi"))
    val lc = pairs.groupBy(col("l")).agg(sum(col("c_ab")).as("c_l"))
    val rc = pairs.groupBy(col("r")).agg(sum(col("c_ab")).as("c_r"))
    pairs.filter(col("c_ab") >= minCount)
      .join(lc, "l").join(rc, "r")
      .crossJoin(broadcast(totals))
      .withColumn("ratio_1e6",
        expr("(c_ab * n_bi * 1000000) DIV (c_l * c_r)"))
      .select(col("gram"), col("c_ab"), col("c_l"), col("c_r"),
        col("ratio_1e6"))
      .orderBy(col("ratio_1e6").desc, col("gram"))
      .limit(topK)
  }

  /** Per-document surprisal under the corpus's own interpolated
    * Kneser–Ney bigram LM — the CCNet-style "LM perplexity" document
    * quality signal ([[kneserNeyBigrams]] builds the model; this
    * operator SCORES every document with it, backoff included, so the
    * filter-on-perplexity step of an LM-quality pipeline is one
    * battery-checked call).
    *
    * Model rows with c_ab ≥ `minCount` score through the full
    * interpolated-KN rational (q125's formula); pruned pairs (every
    * corpus bigram is by construction in the pre-prune stats, so both
    * words always have L/R rows) fall back to the interpolation's own
    * backoff mass λ(a)·P_cont(b) = (3·n1_fwd · n1_bwd · 1e6) div
    * (4·c_a · T) — the (4c_ab−3)→0 limit of the same rational, not an
    * ad-hoc floor. Probabilities clamp to ≥ 1 (the 1e-6 floor), and
    * the per-pair cost is the exact integer floor-log2 bits idiom of
    * q88: bits = 20 − bitlen(p_1e6), so 0 bits at P = 1 and both
    * engines agree to the bit (no libm log anywhere).
    *
    * Output: (doc_id, n_pairs, sum_bits, avg_millibits) for every doc
    * with ≥ 2 tokens; avg_millibits = (1000·Σbits) div n_pairs.
    *
    * Shape at scale: ONE tokenized pair pass serves both the model
    * stats and the scoring stream — pairs aggregate per (doc, a, b)
    * first (localCheckpoint'd), corpus-level stats re-aggregate from
    * that, and scoring joins the doc-pair weights against the
    * bigram-type-bounded scored-model table on (a, b); the L/R vocab
    * tables and 1-row T broadcast. No corpus re-tokenization, no
    * driver state.
    */
  def docLmBits(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount must be positive: $minCount")
    val base = docs
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("tk"))
      .filter(size(col("tk")) >= 2)
    // per-doc bigram weights: the single pair stream everything reuses
    val dp = base.select(col("doc_id"), explode(
        zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val bg = dp.groupBy(col("a"), col("b")).agg(sum(col("w")).as("c_ab"))
    val left = bg.groupBy(col("a"))
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1_fwd"))
    val right = bg.groupBy(col("b")).agg(count(lit(1)).as("n1_bwd"))
    val types = bg.agg(count(lit(1)).as("n_types"))
    val scored = bg.join(broadcast(left), Seq("a"))
      .join(broadcast(right), Seq("b"))
      .crossJoin(broadcast(types))
      .withColumn("p_1e6", expr(
        s"""greatest(CASE WHEN c_ab >= $minCount
             THEN CAST((((4 * c_ab - 3) * CAST(n_types AS DECIMAL(38,0))
                         + 3 * CAST(n1_fwd AS DECIMAL(38,0)) * n1_bwd) * 1000000)
                  DIV (4 * c_a * CAST(n_types AS DECIMAL(38,0))) AS BIGINT)
             ELSE CAST((3 * CAST(n1_fwd AS DECIMAL(38,0)) * n1_bwd * 1000000)
                  DIV (4 * CAST(c_a AS DECIMAL(38,0)) * n_types) AS BIGINT)
           END, CAST(1 AS BIGINT))"""))
      .withColumn("bits", lit(20L) - length(bin(col("p_1e6"))).cast("long"))
      .select(col("a"), col("b"), col("bits"))
    dp.join(scored, Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).cast("long").as("n_pairs"),
        sum(col("w") * col("bits")).cast("long").as("sum_bits"))
      .withColumn("avg_millibits", expr("(sum_bits * 1000) DIV n_pairs"))
  }

  /** Windowed PMI co-occurrence — [[pmiCollocations]] widened from
    * adjacent pairs to a ±`window` token window (the word2vec-style
    * co-occurrence statistic: "new york" is adjacent, "doctor …
    * hospital" is not). Pairs are UNORDERED (sorted members), built
    * map-side by `window` shifted zips — the corpus never self-joins;
    * marginals are plain unigram counts and the ratio is the exact
    * fixed-point odds ratio (log-free, ranking-equivalent to PMI, the
    * q154 idiom). TakeOrdered top-K cut.
    *
    * Output: (pair, c_ab, c_a, c_b, ratio_1e6) — top K by ratio desc,
    * pair asc.
    */
  def windowedPmi(df: DataFrame, textCol: String, window: Int = 3,
      minCount: Long = 10L, topK: Int = 20): DataFrame = {
    require(window >= 1 && minCount >= 1 && topK >= 1,
      s"need window, minCount, topK >= 1")
    val pairsCol = let(tokens(lower(col(textCol))), tk => {
      val offsets = (1 to window).map { d =>
        val n = greatest(size(tk) - d, lit(0))
        zip_with(slice(tk, lit(1), n), slice(tk, lit(d + 1), n),
          (a, b) => concat(least(a, b), lit(" "), greatest(a, b)))
      }
      offsets.reduce(concat(_, _))
    })
    val pairs = df.select(explode(pairsCol).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c_ab"))
    val toksC = df.select(explode(tokens(lower(col(textCol)))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val nPairs = pairs.agg(sum(col("c_ab")).as("n_pairs"))
    pairs.filter(col("c_ab") >= minCount)
      .withColumn("a", substring_index(col("pair"), " ", 1))
      .withColumn("b", substring_index(col("pair"), " ", -1))
      .join(broadcast(toksC.select(col("t").as("a"), col("c").as("c_a"))), "a")
      .join(broadcast(toksC.select(col("t").as("b"), col("c").as("c_b"))), "b")
      .crossJoin(broadcast(nPairs))
      .withColumn("ratio_1e6", expr("(c_ab * n_pairs * 1000000) DIV (c_a * c_b)"))
      .select(col("pair"), col("c_ab"), col("c_a"), col("c_b"), col("ratio_1e6"))
      .orderBy(col("ratio_1e6").desc, col("pair")).limit(topK)
  }

  /** [[docLmBits]] with a genuine TRAIN/HELD-OUT split — the
    * methodologically honest perplexity: the LM's stats come from
    * `train` only, and `score` docs are scored with the full unseen
    * ladder: (a, b) observed with c_ab ≥ minCount → interpolated KN;
    * both words known but the pair unseen/pruned → the backoff mass
    * λ(a)·P_cont(b); EITHER word unseen in training → the 1e-6 floor
    * (p = 1 → 19 bits), which is the one path [[docLmBits]] can never
    * take (scoring the training corpus, every word is known). Same
    * exact-integer bits idiom throughout.
    *
    * Output: (doc_id, n_pairs, sum_bits, avg_millibits) for every
    * score doc with ≥ 2 tokens.
    *
    * Shape at scale: train pairs aggregate once into the
    * bigram-type-bounded stats; score pairs aggregate per (doc, a, b)
    * and LEFT-join the scored-model table on (a, b); L/R vocab and
    * 1-row T broadcast, exactly the docLmBits plan with outer joins.
    */
  def docLmBitsHeldOut(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount must be positive: $minCount")
    def pairStream(docs: DataFrame): DataFrame = docs
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val bg = pairStream(train).groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
    val left = bg.groupBy(col("a"))
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1_fwd"))
    val right = bg.groupBy(col("b")).agg(count(lit(1)).as("n1_bwd"))
    val types = bg.agg(count(lit(1)).as("n_types"))
    val dp = pairStream(score).groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("w"))
    dp.join(bg, Seq("a", "b"), "left")
      .join(broadcast(left), Seq("a"), "left")
      .join(broadcast(right), Seq("b"), "left")
      .crossJoin(broadcast(types))
      .withColumn("p_1e6", expr(
        s"""greatest(CASE
             WHEN c_ab IS NOT NULL AND c_ab >= $minCount
             THEN CAST((((4 * c_ab - 3) * CAST(n_types AS DECIMAL(38,0))
                         + 3 * CAST(n1_fwd AS DECIMAL(38,0)) * n1_bwd) * 1000000)
                  DIV (4 * c_a * CAST(n_types AS DECIMAL(38,0))) AS BIGINT)
             WHEN c_a IS NOT NULL AND n1_bwd IS NOT NULL
             THEN CAST((3 * CAST(n1_fwd AS DECIMAL(38,0)) * n1_bwd * 1000000)
                  DIV (4 * CAST(c_a AS DECIMAL(38,0)) * n_types) AS BIGINT)
             ELSE CAST(1 AS BIGINT)
           END, CAST(1 AS BIGINT))"""))
      .withColumn("bits", lit(20L) - length(bin(col("p_1e6"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).cast("long").as("n_pairs"),
        sum(col("w") * col("bits")).cast("long").as("sum_bits"))
      .withColumn("avg_millibits", expr("(sum_bits * 1000) DIV n_pairs"))
  }

  /** Per-document word entropy — the lexical-diversity quality signal
    * (a doc whose mass sits on a few repeated words is template/spam;
    * the Gopher-adjacent signal repetitionRatio's n-grams don't
    * capture for unigram loops). Exact integers only: per-word bits =
    * floor-log2(n) − floor-log2(c_w) via binary digit counts (the q88
    * idiom), sum weighted by c_w; plus the type/token ratio in ppm.
    *
    * Entirely MAP-SIDE — one higher-order-function pass per row, no
    * explode, no shuffle: the per-doc distinct/count loop is O(types ·
    * tokens) inside codegen, bounded by document length. The cheapest
    * possible plan for a per-doc signal.
    *
    * Output: (doc_id, n_tokens, n_types, sum_bits, ttr_ppm).
    */
  def wordEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bitlen = (c: Column) => length(bin(c)).cast("long")
    val body = let(tokens(lower(col(textCol))), tk => {
      val n = size(tk).cast("long")
      val sumBits = aggregate(array_distinct(tk), lit(0L), (acc, w) => {
        val c = size(filter(tk, t => t === w)).cast("long")
        acc + c * (bitlen(n) - bitlen(c))
      })
      struct(n.as("n_tokens"),
        size(array_distinct(tk)).cast("long").as("n_types"),
        when(n === 0, lit(0L)).otherwise(sumBits).as("sum_bits"),
        // integral quotient via exact double floor (operands ≪ 2^53,
        // the Similarity.idiv argument): ≡ DuckDB // on this domain
        when(n === 0, lit(0L)).otherwise(
          floor(size(array_distinct(tk)).cast("double") * lit(1000000.0)
            / n.cast("double")).cast("long")).as("ttr_ppm"))
    })
    docs.select(col(idCol).as("doc_id"), body.as("_e"))
      .select(col("doc_id"), col("_e.n_tokens"), col("_e.n_types"),
        col("_e.sum_bits"), col("_e.ttr_ppm"))
  }

  /** Per-document sentence statistics — the Gopher-family document
    * shape signal at SENTENCE granularity (a doc of one run-on
    * "sentence" or of hundreds of three-word fragments fails
    * different quality bars than token counts can see). Sentences =
    * [.!?]+-delimited segments with ≥ 1 token; per doc: count, total
    * words, longest sentence, average words per sentence in ppm.
    * Entirely map-side (nested HOFs, zero exchanges).
    *
    * Output: (doc_id, n_sentences, n_words, max_words, avg_words_ppm).
    */
  def sentenceStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val body = let(
      filter(transform(split(coalesce(col(textCol), lit("")), "[.!?]+"),
          s => size(tokens(s)).cast("long")), c => c > 0),
      wc => {
        val n = size(wc).cast("long")
        val total = coalesce(aggregate(wc, lit(0L), (a, c) => a + c), lit(0L))
        struct(n.as("n_sentences"), total.as("n_words"),
          coalesce(array_max(wc), lit(0L)).as("max_words"),
          when(n === 0, lit(0L)).otherwise(
            floor(total.cast("double") * lit(1000000.0) / n.cast("double"))
              .cast("long")).as("avg_words_ppm"))
      })
    docs.select(col(idCol).as("doc_id"), body.as("_s"))
      .select(col("doc_id"), col("_s.n_sentences"), col("_s.n_words"),
        col("_s.max_words"), col("_s.avg_words_ppm"))
  }

  /** Closed-vocabulary coverage per source: token-occurrence share
    * OUTSIDE the corpus's own top-`topV` vocabulary — the OOV-rate
    * table a tokenizer/vocab decision is made from (a source whose
    * mass lives in the vocab tail pays fertility and UNK costs first).
    * Vocabulary = top-V terms by (count desc, term asc) — a
    * deterministic cut on both engines.
    *
    * Shape at scale: the token stream aggregates to per-(source,
    * term) counts FIRST (one shuffle bounded by |sources|·|vocab
    * observed|, checkpointed), the stats re-aggregate from that, and
    * the top-V vocab is a TakeOrdered cut broadcast back onto the
    * counts — the corpus is never re-tokenized and never joins on
    * term at full stream width.
    *
    * Output: (source, n_tokens, n_oov, n_oov_types, oov_ppm).
    */
  def vocabCoverage(docs: DataFrame, sourceCol: String, textCol: String,
      topV: Int = 1000): DataFrame = {
    require(topV >= 1, s"need topV >= 1, got $topV")
    val ts = docs.select(col(sourceCol).as("source"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val vocab = ts.groupBy(col("term")).agg(sum(col("cnt")).as("tc"))
      .orderBy(col("tc").desc, col("term")).limit(topV)
      .select(col("term"), lit(1L).as("in_vocab"))
    ts.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).cast("long").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("cnt")).otherwise(lit(0L)))
          .cast("long").as("n_oov"),
        sum(when(col("in_vocab").isNull, lit(1L)).otherwise(lit(0L)))
          .cast("long").as("n_oov_types"))
      .withColumn("oov_ppm", expr(
        "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_oov * 1000000) DIV n_tokens END"))
      .orderBy(col("source"))
  }
}
