package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.model.Seeds
import graft.operators.{Dedup, Scrubber, Similarity, TextAnalysis}

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2 plus the LLM-data-pipeline operators, each with an
  * equivalent DuckDB oracle in `oracleSql`.
  *
  * Cross-engine determinism rules used throughout (Spark vs DuckDB):
  *  - money/value sums in fixed-point: sum(floor(x·100)) as bigint —
  *    floor on a double is an exact binary op in both engines, unlike
  *    decimal-string rounding;
  *  - hashes are md5-derived (identical bytes in any engine), never
  *    Spark-internal murmur3;
  *  - every query ends with a total ORDER BY (unique key last);
  *  - timestamps are emitted as formatted strings, never raw;
  *  - counts/sizes cast to bigint on both sides.
  */
object SparkEntry {

  /** Table-plan cache: file listing + schema read happen once per
    * (session, dir, table) instead of once per query — the 40-query
    * battery otherwise pays the FileIndex/ParquetFooter round trip 40
    * times. Caches only the logical plan (no data is pinned). Keys are
    * session REFERENCES (a recycled identity hash can never serve
    * another session's plan), and the cache is size-bounded: cached
    * Datasets strongly reference their session, so weak-key eviction
    * alone would never fire — past the bound the cache clears, which
    * also releases any stopped sessions' plans.
    */
  private val MaxCachedSessions = 8
  private val tableCache: java.util.Map[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())

  private def cached(spark: SparkSession, dir: String, name: String)
      (mk: => DataFrame): DataFrame = {
    if (tableCache.size > MaxCachedSessions) tableCache.clear()
    tableCache.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())
      .computeIfAbsent((dir, name), _ => mk)
  }

  /** events.ts has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (arrives as BIGINT ns under
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ). Both readers branch on the actual
    * schema so a regenerated input changes NOTHING downstream:
    * `t()` always serves a µs-precision TimestampType column, and
    * `tRaw()` always serves the ns-long contract the integer-µs
    * queries divide down from. Sessions run with
    * spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast is a pure
    * reinterpretation (identical micros), matching DuckDB's
    * epoch_us(ts) on the same file.
    */
  private def tsAsTimestamp(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // DIV keeps the division integral (a double roundtrip would
        // lose ns bits).
        timestamp_micros(expr("ts DIV 1000"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast("timestamp")
      case _: org.apache.spark.sql.types.TimestampType => col("ts")
      case dt => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $dt (expected ns-long or timestamp)")
    }

  private def tsAsNanosLong(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp")) * lit(1000L)
      case _: org.apache.spark.sql.types.TimestampType =>
        unix_micros(col("ts")) * lit(1000L)
      case dt => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $dt (expected ns-long or timestamp)")
    }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cached(spark, dir, name) {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") df.withColumn("ts", tsAsTimestamp(df))
      else df
    }

  /** Raw variant: events.ts normalized to ns-long for the µs-integer
    * queries (`ts DIV 1000` sites); other tables pass through. */
  private def tRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    cached(spark, dir, s"raw:$name") {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") df.withColumn("ts", tsAsNanosLong(df))
      else df
    }

  /** sum(floor(expr*100)) → bigint "cents" — deterministic across engines. */
  private def cents(c: Column): Column = sum(floor(c * 100).cast("long"))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qPricingSummary(spark, "/root/testdata/sf0.001")

  // =====================================================================
  // Reference-parity operators (SURVEY.md §2) over the testdata tables
  // =====================================================================

  /** A: groupBy aggregation with map-side partial agg (TPC-H Q1 shape). */
  private def qPricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        cents(col("l_quantity")).as("sum_qty_c"),
        cents(col("l_extendedprice")).as("sum_base_c"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_c"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** P4/O3: status filter + top-k (TakeOrderedAndProject). */
  private def qStatusTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .orderBy(col("price_c").desc, col("o_orderkey"))
      .limit(25)

  /** P1/P2: canonical projection — rename/select + literal source col. */
  private def qCanonicalProjection(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey").as("patient_id"),
        col("c_name").as("patient_name"),
        col("c_mktsegment").as("segment"),
        lit("customer_src").as("source"))
      .orderBy(col("patient_id"))

  /** F1/F2: the 7-rule PHI regex fold (sequential, rule_id order). */
  private def qScrubDocuments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        Scrubber.applyRules(col("text"), Seeds.phiRulesV1).as("scrubbed"))
      .orderBy(col("doc_id"))

  /** F6: sha-256 content hash (provenance chain). */
  private def qShaChain(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("text_sha256"))
      .orderBy(col("doc_id"))

  /** A/rollup: per-source/status-style rollup (provenance analog). */
  private def qRollupCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"), col("lang"))

  /** §2.6 window: latest-event-per-key (row_number over desc order). */
  private def qWindowLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"),
        col("o_orderkey").as("latest_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("latest_ts"))
      .orderBy(col("o_custkey"))
  }

  /** §2.4 join: dim join + agg (lineage-style correlation). No user
    * broadcast hint on `customer`: it scales linearly with SF (150k×SF
    * rows), so forcing a driver-side build would OOM at cluster scale.
    * AQE still picks a broadcast join at small SF on its own; at 100 TB
    * it degrades gracefully to a shuffle join.
    */
  private def qJoinRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(cents(col("o_totalprice")).as("revenue_c"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** P3/F-coalesce: first-non-empty fallback chain (HL7 SSN pattern). */
  private def qCoalesceFallback(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        coalesce(nullif(col("event_type"), lit("")), lit("unknown")).as("event_type_filled"))
      .orderBy(col("event_id"))

  /** §2.8 set op: unionByName across canonical-shaped sources. */
  private def qUnionSources(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "customer").select(col("c_custkey").as("id"),
      col("c_name").as("name"), lit("customer").as("source"))
    val b = t(s, dir, "supplier").select(col("s_suppkey").as("id"),
      col("s_name").as("name"), lit("supplier").as("source"))
    a.unionByName(b).orderBy(col("source"), col("id"))
  }

  /** A4/O6: distinct + order (commit-times query shape). */
  private def qDistinctTypes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("event_type")).distinct()
      .orderBy(col("event_type"))

  /** P6/P7: validation predicates — violation counts per rule. */
  private def qValidationProbe(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull || col("text") === "", 1L).otherwise(0L)).as("n_empty_text"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)).as("n_len_mismatch"),
      sum(when(col("lang").isin("en", "de", "fr", "es", "zh"), 0L).otherwise(1L)).as("n_bad_lang"))

  /** A5: sampled error retention (first-N in key order). */
  private def qErrorSamples(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("n_chars") =!= length(col("text")))
      .select(col("doc_id"),
        concat(lit("len_mismatch:"), col("n_chars"), lit(":"), length(col("text"))).as("error"))
      .orderBy(col("doc_id"))
      .limit(20)

  /** F9: UTC timestamp formatting (batch-id / version-dir pattern). */
  private def qDateFormat(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyyMMddHHmmss").as("version_ts"),
        concat_ws("_", col("o_orderpriority"), col("o_orderkey")).as("batch_id"))
      .orderBy(col("o_orderkey"))

  /** F10: JSON field extraction from a string column. */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_value"))
      .orderBy(col("event_id"))

  /** S7/F5: positional field extraction + positional replacement on a
    * delimited string (the HL7 PID pattern, demonstrated on tokens).
    */
  private def qPositionalFields(s: SparkSession, dir: String): DataFrame = {
    val parts = split(col("text"), " ")
    t(s, dir, "documents")
      .select(col("doc_id"),
        get(parts, lit(3)).as("field_3"),
        array_join(
          transform(parts, (x, i) => when(i === 2, lit("[MASKED]")).otherwise(x)),
          " ").as("masked_text"))
      .orderBy(col("doc_id"))
  }

  // =====================================================================
  // LLM-data-pipeline operators (dedup / similarity / text / multimodal)
  // =====================================================================

  /** Exact dedup by content hash. */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("content_hash"))

  /** MinHash+LSH candidate pairs (16 hashes, 4 bands × 4 rows). */
  private def qMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(s, dir, "documents"),
        "doc_id", "text", bands = 4, rowsPerBand = 4, n = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** 16-bit SimHash fingerprints. */
  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(t(s, dir, "documents"), col("doc_id"), col("text"), 16)
      .select(col("id").as("doc_id"), col("simhash").as("simhash16"))
      .orderBy(col("doc_id"))

  /** Exact 3-gram Jaccard on a deterministic candidate subset. */
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") % 29 === 0)
    val ids = docs.select(col("doc_id").as("id"))
    val pairs = ids.as("a").join(ids.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    Dedup.ngramJaccard(docs, "doc_id", "text", pairs, 3)
      .select(col("id_a"), col("id_b"),
        floor(col("jaccard") * 1000000.0).cast("long").as("jaccard_1e6"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** LSH threshold-calibration sweep (q134): exact 3-gram Jaccard of
    * every LSH candidate pair, binned per 0.1, with the
    * cumulative-from-above pair counts — the table that picks the
    * confirm-threshold for a dedup run (how many pairs survive at
    * ≥0.7? ≥0.8?) BEFORE committing to one. Candidates only — the
    * sweep costs one pass over the existing LSH artifact, never n².
    * The 11-row bin table's cumulative window is driver-trivial.
    */
  private def qJaccardSweep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select(col("id_a"), col("id_b"))
    val binned = Dedup.ngramJaccard(docs, "doc_id", "text", pairs, 3)
      .select(floor(col("jaccard") * 1000000.0).cast("long").as("j1e6"))
      .select(expr("least(j1e6 DIV 100000, 9L)").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
    binned
      .withColumn("n_at_or_above", sum(col("n_pairs")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("bin").desc)))
      .select((col("bin") * 100000L).as("bin_lo_1e6"), col("n_pairs"),
        col("n_at_or_above"))
      .orderBy(col("bin_lo_1e6"))
  }

  /** Formatting-invariant exact dedup (TextAnalysis.normalizeForDedup
    * + Dedup.exact): re-punctuated / re-wrapped copies collapse into
    * one group — the normalization pass raw-byte hashing misses.
    */
  private def qDedupNormalized(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), col("doc_id"),
        graft.operators.TextAnalysis.normalizeForDedup(col("text")))
      .orderBy(col("content_hash"))

  /** Asymmetric n-gram containment (Dedup.ngramContainment) over the
    * q20 candidate pairs: |A∩B|/|A| and /|B| — the partial-duplication
    * signal Jaccard under-scores when lengths differ.
    */
  private def qNgramContainment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") % 29 === 0)
    val ids = docs.select(col("doc_id").as("id"))
    val pairs = ids.as("a").join(ids.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    Dedup.ngramContainment(docs, "doc_id", "text", pairs, 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Fuzzy entity resolution (operators.FuzzyJoin.editDistancePairs):
    * customer-name pairs within 2 edits, blocked on shared character
    * trigrams. Names are 18 chars (> q·(maxDist+1)), so the pigeonhole
    * recall contract makes the blocked result EQUAL the oracle's
    * direct all-pairs formulation. Fixed slice (id-capped) — an entity
    * registry being linked doesn't grow with the fact data.
    */
  private def qFuzzyNames(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.editDistancePairs(
        t(s, dir, "customer")
          .filter(col("c_custkey") % 31 === 0 && col("c_custkey") < 7500),
        "c_custkey", "c_name", maxDist = 2)
      .orderBy(col("id_a"), col("id_b"))

  /** Bounded-state top-k per group (expressions.TopKPairs, a native
    * TypedImperativeAggregate): top-3 events by cents per event_type.
    * The window formulation sorts every row; this keeps ≤3 pairs per
    * group in partial state and combines map-side — only |groups|·k
    * pairs cross the shuffle. The oracle IS the window formulation:
    * both must rank identically.
    */
  private def qTopKAgg(s: SparkSession, dir: String): DataFrame =
    tRaw(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"))
      .agg(graft.expressions.TopKPairs(col("cents"), col("event_id"), 3).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.v").as("cents"), col("col.id").as("event_id"))
      .orderBy(col("event_type"), col("rank"))

  /** CUBE aggregation over (source, lang) — all four grouping levels
    * in one pass, grouping_id disambiguating roll-up nulls from data
    * nulls.
    */
  private def qCubeCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .cube(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("source").asc_nulls_first, col("lang").asc_nulls_first)

  private def embCorpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding").as("emb"))

  /** Brute-force exact cosine top-5 for a broadcast query set. */
  private def qAnnBruteForce(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(
        embCorpus(s, dir),
        embCorpus(s, dir).filter(col("id") % 200 === 0 && col("id") < 2000), k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score_1e6"))
      .orderBy(col("query_id"), col("rank"))

  /** Sign-bit-bucketed ANN (IVF-style coarse quantization). */
  private def qAnnBucketed(s: SparkSession, dir: String): DataFrame =
    Similarity.bucketedTopK(
        embCorpus(s, dir),
        embCorpus(s, dir).filter(col("id") % 200 === 0 && col("id") < 2000), k = 3, signBits = 6)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score_1e6"))
      .orderBy(col("query_id"), col("rank"))

  /** Embedding near-dup pairs above cosine 0.95 within sign buckets. */
  private def qEmbeddingNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.95, signBits = 8)
      .orderBy(col("id_a"), col("id_b"))

  /** Token counting (whitespace tokenizer). */
  private def qTokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))

  /** Quality signals: ratios from exact integer counts. */
  private def qQualitySignals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_obs"),
        tokenCount(col("text")).as("n_tokens"),
        regexp_count(col("text"), lit("[.!?,;:]")).cast("long").as("n_punct"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("n_digits"),
        TextAnalysis.stopwordHits(col("text"), TextAnalysis.stopwords("en")).as("n_stopwords"))
      .orderBy(col("doc_id"))

  /** Language-ID heuristic (stopword argmax). */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  /** Language-ID confidence margin (q124): predicted language plus the
    * gap between the best and runner-up stopword-hit counts, normalized
    * to 1e-6 fixed point per token. margin_1e6 = 0 flags docs where the
    * argmax label is a coin flip (tie) or vacuous (no tokens) — the
    * rows a curation pipeline routes to a heavier classifier. One
    * tokenization per row inside the fused struct; the division runs on
    * named columns with `div` (exact non-negative integer floor
    * division, matching DuckDB `//`). Map-only, shuffle-free.
    */
  private def qLangMargin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langIdWithMargin(col("text")).as("m"))
      .select(col("doc_id"), col("lang"),
        col("m.predicted_lang").as("predicted_lang"),
        col("m.best_hits").as("best_hits"),
        (col("m.best_hits") - col("m.second_hits")).as("margin"),
        col("m.n_tokens").as("n_tokens"))
      .withColumn("margin_1e6",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("(margin * 1000000) div n_tokens")))
      .orderBy(col("doc_id"))

  /** Document fingerprints: normalized-content hash + rolling hash. */
  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp60"),
        TextAnalysis.rollingHash(col("text")).as("rolling_fp"))
      .orderBy(col("doc_id"))

  /** Multimodal plumbing: opaque binary payload + stub-decoded typed
    * metadata + pseudo-features (deterministic from payload bytes).
    */
  private def qMultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val h = md5(payload)
    t(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(payload).cast("long").as("payload_bytes"),
        (conv(substring(h, 1, 4), 16, 10).cast("long") % 3840 + 1).as("width"),
        (conv(substring(h, 5, 4), 16, 10).cast("long") % 2160 + 1).as("height"),
        floor((conv(substring(h, 9, 4), 16, 10).cast("double") / 65536.0) * 1000000.0)
          .cast("long").as("feat0_1e6"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual image hash over a REAL codec round-trip (q206): each
    * doc becomes an 8×8 grayscale BMP (pixel bytes = md5-derived from
    * the text, written by the JDK's own encoder), the payload decodes
    * back through javax.imageio, and the aHash computes from the
    * DECODED raster — so the battery exercises the synthesize→encode→
    * decode→fingerprint pipeline end to end with a full hash gate: BMP
    * is lossless (MultimodalSpec round-trip pin), so the oracle
    * re-derives every pixel arithmetically from the same md5 chain,
    * no codec needed. Near-dup image pairing from these hashes is the
    * simhash banding verbatim. See Multimodal.imageAHash/synthGrayBmp.
    */
  private def qImageAHash(s: SparkSession, dir: String): DataFrame = {
    // pixel bytes chain off ONE full-text md5 seed (the 64 per-pixel
    // hashes then run over a 32-char hex string, not the document —
    // measured 91→75 s at 500k docs; the residual cost is the ImageIO
    // encode+decode itself, i.e. the real-codec work this row exists
    // to exercise)
    val gray = let(md5(coalesce(col("text"), lit(""))), seed =>
      transform(sequence(lit(0), lit(63)), i =>
        md5Long(concat(seed, lit("|"), i.cast("string")))
          .bitwiseAND(lit(255L))))
    val withGray = t(s, dir, "documents").select(col("doc_id"), gray.as("_gray"))
    val withPayload = graft.operators.Multimodal.synthGrayBmp(withGray, "_gray", 8, 8)
    graft.operators.Multimodal.decodeImageAHash(withPayload)
      .select(col("doc_id"), col("ahash"), col("width"), col("height"))
      .orderBy(col("doc_id"))
  }

  /** Audio-envelope fingerprint over a REAL codec round-trip (q207):
    * each doc becomes a 128-sample 8-bit PCM WAV (sample bytes
    * md5-derived from the text, written by the JDK's own audio
    * encoder), the payload decodes back through
    * javax.sound.sampled.AudioSystem, and the 64-block envelope hash
    * computes from the DECODED samples — the audio twin of q206 and
    * the closure of the last audio-sample stub: PCM WAV is lossless
    * (MultimodalSpec round-trip pin), so the oracle re-derives every
    * sample arithmetically from the same md5 chain, no codec needed.
    * Near-dup audio pairing from these fingerprints is the simhash
    * banding verbatim. See Multimodal.audioEnvelopeHash/synthPcmWav.
    */
  private def qAudioEnvelope(s: SparkSession, dir: String): DataFrame = {
    // sample bytes chain off ONE full-text md5 seed (the q206 lesson:
    // per-sample hashes run over a 32-char hex string, not the
    // document; the residual cost is the WAV encode+decode itself —
    // the real-codec work this row exists to exercise). '|a' keeps
    // the chain disjoint from q206's pixel chain.
    val samples = let(md5(coalesce(col("text"), lit(""))), seed =>
      transform(sequence(lit(0), lit(127)), i =>
        md5Long(concat(seed, lit("|a"), i.cast("string")))
          .bitwiseAND(lit(255L))))
    val withSamples = t(s, dir, "documents").select(col("doc_id"), samples.as("_pcm"))
    val withPayload = graft.operators.Multimodal.synthPcmWav(withSamples, "_pcm", 8000)
    graft.operators.Multimodal.decodeAudioFingerprint(withPayload)
      .select(col("doc_id"), col("afp"), col("n_samples"), col("sample_rate_hz"))
      .orderBy(col("doc_id"))
  }

  /** Audio near-dup candidate pairing, decode → fingerprint → band →
    * pair end to end (q208): the q207 real-codec fingerprints feed
    * Dedup.fingerprintPairs — the modality-independent banding core —
    * with 16-bit band strides masked to a DATA-DERIVED width
    * (suggestSimhashParams' log2 law, the q82 idiom), so expected
    * candidate mass stays linear as the corpus grows. maxHamming=64
    * keeps every bucket-cohabiting candidate (the q23 rationale: the
    * synthetic fingerprints are hash-random, so true near-dup Hamming
    * never occurs at oracle SF — the hash must cover band assignment
    * AND the full Hamming arithmetic, not just survivors).
    */
  private def qAudioNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (bits, bands) = graft.operators.Dedup.suggestSimhashParams(docs.count(), bands = 4)
    val maskBits = bits / bands
    val samples = let(md5(coalesce(col("text"), lit(""))), seed =>
      transform(sequence(lit(0), lit(127)), i =>
        md5Long(concat(seed, lit("|a"), i.cast("string")))
          .bitwiseAND(lit(255L))))
    val fp = graft.operators.Multimodal.decodeAudioFingerprint(
        graft.operators.Multimodal.synthPcmWav(
          docs.select(col("doc_id"), samples.as("_pcm")), "_pcm", 8000))
      .select(col("doc_id"), col("afp"))
    graft.operators.Dedup.fingerprintPairs(fp, "doc_id", "afp",
        bands = 4, strideBits = 16, maskBits = maskBits, maxHamming = 64)
      .withColumn("mask_bits", lit(maskBits.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Image near-dup candidate pairing (q209): q206's real-codec
    * aHashes through the SAME Dedup.fingerprintPairs core as q208 —
    * one banding implementation serves text simhash, audio envelope,
    * and image aHash fingerprints. Parameters and rationale identical
    * to q208 (adaptive mask width, every candidate kept).
    */
  private def qImageNearDup(s: SparkSession, dir: String): DataFrame = {
    val (pairs, maskBits) = imageFingerprintPairs(s, dir)
    pairs.withColumn("mask_bits", lit(maskBits.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The q209 pipeline sans presentation: real-codec image aHashes
    * through the shared fingerprint-pairing core, adaptive mask width
    * — returned with the chosen width so q209/q212 stay one code path.
    */
  /** The q206 synthesize→encode→decode→aHash chain as a reusable
    * frame: (doc_id, ahash) through the REAL codec round-trip —
    * CACHED per (session, dir) and materialized once
    * (VERDICT r11 item 3, the q190 fixture discipline): codec cost
    * regresses on q206 (whose timed body IS the decode), while the
    * consumers — q209 pairing, q212/q216 clustering, q214 admission —
    * time banding/CC/admission, so the tripwire sees codec and
    * clustering drift independently. Deterministic in `dir`, so
    * Verify output is unchanged.
    */
  private def imageAHashes(s: SparkSession, dir: String): DataFrame =
    fixtureFor(s, dir, "imageAHashes") {
      imageAHashesOf(t(s, dir, "documents")).localCheckpoint(true)
    }

  private def imageAHashesOf(docs: DataFrame): DataFrame = {
    val gray = let(md5(coalesce(col("text"), lit(""))), seed =>
      transform(sequence(lit(0), lit(63)), i =>
        md5Long(concat(seed, lit("|"), i.cast("string")))
          .bitwiseAND(lit(255L))))
    graft.operators.Multimodal.decodeImageAHash(
        graft.operators.Multimodal.synthGrayBmp(
          docs.select(col("doc_id"), gray.as("_gray")), "_gray", 8, 8))
      .select(col("doc_id"), col("ahash"))
  }

  private def imageFingerprintPairs(s: SparkSession, dir: String): (DataFrame, Int) = {
    val (bits, bands) = graft.operators.Dedup.suggestSimhashParams(
      t(s, dir, "documents").count(), bands = 4)
    val maskBits = bits / bands
    (graft.operators.Dedup.fingerprintPairs(imageAHashes(s, dir), "doc_id", "ahash",
      bands = 4, strideBits = 16, maskBits = maskBits, maxHamming = 64), maskBits)
  }

  /** Incremental multimodal admission, batch form (q214): the q204
    * two-batch pattern in fingerprint space — even doc_ids ingest
    * first (empty history admits all distinct fingerprints), odd
    * doc_ids then admit against the committed index through
    * IncrementalDedup.appendNovelFingerprint: exact-fp identity OR
    * any masked-band collision rejects (maxHamming=64 keeps every
    * collision, the q208 rationale — hash-random fingerprints never
    * reach near-dup Hamming at oracle SF, so the gate must pin the
    * band-collision path, not a no-op). The output is the index
    * snapshot: who got in, carrying which batch stamp.
    */
  private def qIncMedia(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q214_incmedia_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "media_id", "batch_no",
      numBuckets = 8)
    val (bits, bands) = graft.operators.Dedup.suggestSimhashParams(
      t(s, dir, "documents").count(), bands = 4)
    val maskBits = bits / bands
    // batches filter the CACHED decoded table (one decode total, paid
    // by the imageAHashes fixture): the timed row is the two-batch
    // fingerprint admission itself, not the codec (VERDICT r11 item 3)
    val fps = imageAHashes(s, dir)
    graft.operators.IncrementalDedup.appendNovelFingerprint(vt,
      fps.filter(col("doc_id") % 2 === 0), "doc_id", "ahash", 1L,
      maxHamming = 64, maskBits = maskBits)
    graft.operators.IncrementalDedup.appendNovelFingerprint(vt,
      fps.filter(col("doc_id") % 2 === 1), "doc_id", "ahash", 2L,
      maxHamming = 64, maskBits = maskBits)
    vt.snapshot.select(col("media_id"), col("fp"), col("batch_no"))
      .orderBy(col("media_id"))
  }

  /** Image dup-mass histogram (q212): the q209 candidate graph
    * clustered by pointer-doubling connected components (the q36
    * machinery on fingerprint edges), summarized clusters-per-size —
    * the image analog of q132's duplication-mass report, closing the
    * pair → cluster → report chain for the multimodal dedup family.
    * The hash-random fingerprints make the candidate graph DENSE
    * (avg degree ~2·bands), so the corpus collapses to one giant
    * component — deliberately the opposite stress from q36's sparse
    * clusters: the oracle's recursive reachability only matches if
    * the pointer-doubling iteration actually reaches fixpoint across
    * the whole component, not just short chains.
    */
  private def qImageDupClusters(s: SparkSession, dir: String): DataFrame = {
    val (pairs, _) = imageFingerprintPairs(s, dir)
    graft.operators.Dedup.clusterSizeHistogram(
        graft.operators.Dedup.connectedComponents(pairs))
      .orderBy(col("cluster_size"))
  }

  /** q212's dense-graph cure (q216): the SAME cluster histogram
    * through Dedup.bucketConnectedComponents — components over the
    * doc–bucket bipartite graph (n·bands membership edges) instead of
    * the Σ C(|bucket|,2) pairwise candidate edges. Identical output
    * by construction (every bucket cohabitant pairs in q212's
    * maxHamming=64 graph, and any two docs in a bucket connect
    * through the bucket node here), so the two rows share one oracle
    * — and the slope table shows which formulation survives a dense
    * corpus.
    */
  private def qImageDupClusters2(s: SparkSession, dir: String): DataFrame = {
    val (bits, bands) = graft.operators.Dedup.suggestSimhashParams(
      t(s, dir, "documents").count(), bands = 4)
    val banded = graft.operators.Dedup.fingerprintBands(
      imageAHashes(s, dir), "doc_id", "ahash",
      bands = 4, strideBits = 16, maskBits = bits / bands)
    graft.operators.Dedup.clusterSizeHistogram(
        graft.operators.Dedup.bucketConnectedComponents(banded))
      .orderBy(col("cluster_size"))
  }

  /** Real audio resample over the codec round-trip (q210): the q207
    * WAVs decode through the JDK codec, decimate 2:1 with exact
    * box-filter averaging (the anti-aliasing low-pass), re-encode at
    * 4 kHz, decode AGAIN, and fingerprint — two full codec
    * round-trips plus a real DSP step, all hash-gated: the oracle
    * re-derives the decimated samples arithmetically
    * (⌊(s_2i+s_2i+1)/2⌋ — DuckDB's `//` truncates and the levels are
    * non-negative, so both engines floor identically). See
    * Multimodal.resampleWavBytes.
    */
  private def qAudioResample(s: SparkSession, dir: String): DataFrame = {
    val samples = let(md5(coalesce(col("text"), lit(""))), seed =>
      transform(sequence(lit(0), lit(127)), i =>
        md5Long(concat(seed, lit("|a"), i.cast("string")))
          .bitwiseAND(lit(255L))))
    val wav = graft.operators.Multimodal.synthPcmWav(
      t(s, dir, "documents").select(col("doc_id"), samples.as("_pcm")), "_pcm", 8000)
    val resampled = graft.operators.Multimodal.resampleWavs(wav, factor = 2)
    graft.operators.Multimodal.decodeAudioFingerprint(resampled, payloadCol = "resampled")
      .select(col("doc_id"), col("afp"), col("n_samples"), col("sample_rate_hz"))
      .orderBy(col("doc_id"))
  }

  /** Real MP4 demux to frame byte ranges (q211): each doc becomes a
    * REAL ISO-BMFF file (8 md5-hex frames in 3-frame chunks with
    * 8-byte inter-chunk padding, full stts/stsc/stsz/stco sample
    * table, written box-by-box), and the engine walks the boxes back
    * — expanding the stsc run list (two runs: 3,3 then the 2-frame
    * tail) against the stco chunk offsets and variable stsz sizes —
    * to slice every frame's true bytes. The padding makes chunk
    * offsets NON-derivable from frame sizes alone, so the hash gate
    * pins the actual stco/stsc walk; frame content round-trips
    * through md5Long of the sliced bytes. This is the container-level
    * frame extraction a video pipeline runs before any codec — only
    * the codec itself stays stubbed. See Multimodal.mp4SampleTable.
    */
  private def qVideoFrames(s: SparkSession, dir: String): DataFrame = {
    val frames = let(md5(coalesce(col("text"), lit(""))), seed =>
      transform(sequence(lit(0), lit(7)), i =>
        md5(concat(seed, lit("|v"), i.cast("string")))))
    val mp4 = graft.operators.Multimodal.synthMp4(
      t(s, dir, "documents").select(col("doc_id"), frames.as("_frames")),
      "_frames", timescale = 1000, frameDurTicks = 40,
      chunkFrames = 3, interChunkPad = 8)
    graft.operators.Multimodal.demuxMp4Frames(mp4)
      .select(col("doc_id"), explode(col("frames")).as("f"))
      .select(col("doc_id"),
        col("f.frame_no").cast("long").as("frame_no"),
        col("f.frame_off").as("frame_off"),
        col("f.frame_len").as("frame_len"),
        md5Long(decode(col("f.data"), "US-ASCII")).as("frame_fp"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** Streaming-shaped windowed aggregation (1h tumbling windows) —
    * identical logic runs under Structured Streaming (see
    * graft.streaming); batch mode here for the oracle.
    */
  private def qWindowedEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), cents(col("value")).as("sum_value_c"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value_c"))
      .orderBy(col("window_start"), col("event_type"))

  /** §2.5-beyond: rollup (grouping sets) with explicit null ordering. */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), cents(col("l_quantity")).as("sum_qty_c"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** §2.4: semi/anti joins (EXISTS / NOT EXISTS shapes). */
  private def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey").as("id"), lit("has_orders").as("bucket"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey").as("id"), lit("no_orders").as("bucket"))
    semi.unionByName(anti).orderBy(col("id"))
  }

  /** As-of join: latest 'click' at or before each event, per user —
    * single-shuffle union+window formulation (operators.AsOf). Runs on
    * raw int64 nanos so both engines compare exact integers.
    */
  private def qAsOfPrevClick(s: SparkSession, dir: String): DataFrame = {
    // µs precision: DuckDB truncates parquet TIMESTAMP(NANOS) to µs on
    // read, so both engines compare the same int64 microseconds.
    val raw = tRaw(s, dir, "events") // ts read as long ns
      .withColumn("ts", expr("ts DIV 1000"))
    val clicks = raw.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_us"))
    graft.operators.AsOf.joinPrior(
        raw.select(col("event_id"), col("user_id"), col("ts")),
        clicks, key = "user_id", ts = "ts", valueCol = "click_us", outCol = "prev_click_us")
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"), col("prev_click_us"))
      .orderBy(col("event_id"))
  }

  /** Dedup keep-list: the corpus after exact dedup (min doc_id wins). */
  private def qDedupKeep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val keep = Dedup.exact(docs, col("doc_id"), col("text")).select(col("keep_id"))
    docs.join(keep, docs("doc_id") === keep("keep_id"), "left_semi")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** A2/A3 as a relational aggregate: per-rule fired-row counts over
    * the whole corpus, computed from staged fold intermediates (the
    * same sequential-fold semantics as the scrubber, exposed as
    * analytics: "which PHI rules fire how often").
    */
  private def qScrubRuleHits(s: SparkSession, dir: String): DataFrame = {
    val rules = Seeds.phiRulesV1
    // stage t0..t7: t_{i+1} = rule_i applied to t_i
    val staged = rules.zipWithIndex.foldLeft(
      t(s, dir, "documents").withColumn("t0", col("text"))) {
      case (df, (r, i)) =>
        df.withColumn(s"t${i + 1}",
          Scrubber.applyRules(col(s"t$i"), Seq(r)))
    }
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(col(s"t$i") =!= col(s"t${i + 1}"), 1L).otherwise(0L))
        .as(s"n_${r.ruleId.toLowerCase}")
    }
    staged.agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch surface (§2.5-beyond): HLL distinct-count and approximate
    * quantiles. Sketch values differ across engines by construction, so
    * the oracle-checkable output is (a) the exact companion aggregates
    * (identical in both engines) and (b) engine-computed error-bound
    * flags — Spark asserts |approx−exact| within the sketch's
    * configured tolerance and emits 1/0; DuckDB emits literal 1. Any
    * sketch regression breaks the hash match.
    */
  private def qSketches(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"),
      percentile(col("l_extendedprice"), lit(0.5)).as("p50x"),
      percentile(col("l_extendedprice"), lit(0.99)).as("p99x"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("a_orders"),
      approx_count_distinct(col("l_partkey"), 0.02).as("a_parts"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a_p50"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("a_p99"))
    .select(
      col("exact_orders"), col("exact_parts"),
      floor(col("p50x") * 100).cast("long").as("p50_exact_c"),
      floor(col("p99x") * 100).cast("long").as("p99_exact_c"),
      (abs(col("a_orders") - col("exact_orders")).cast("double")
        <= col("exact_orders").cast("double") * 0.1).cast("long").as("hll_orders_ok"),
      (abs(col("a_parts") - col("exact_parts")).cast("double")
        <= col("exact_parts").cast("double") * 0.1).cast("long").as("hll_parts_ok"),
      (abs(col("a_p50") - col("p50x")) <= col("p50x") * 0.05).cast("long").as("p50_ok"),
      (abs(col("a_p99") - col("p99x")) <= col("p99x") * 0.05).cast("long").as("p99_ok"))

  /** Composite quality score (TextAnalysis.qualityScoreRaw) in 1e-6
    * fixed point — deterministic double arithmetic in both engines.
    */
  private def qQualityScore(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        floor(TextAnalysis.qualityScoreRaw(col("text")) * 1000000.0)
          .cast("long").as("quality_1e6"))
      .orderBy(col("doc_id"))

  /** HL7 composite-component access (Readers.hl7Component, S7 family):
    * component c of a ^-delimited field, ANSI-safe null when absent —
    * demonstrated on a composite synthesized from document text so the
    * battery exercises the exact split/index semantics.
    */
  private def qHl7Component(s: SparkSession, dir: String): DataFrame = {
    val composite = regexp_replace(substring(col("text"), 1, 40), " ", "^")
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.sources.Readers.hl7Component(composite, 1).as("comp1"),
        graft.sources.Readers.hl7Component(composite, 2).as("comp2"),
        graft.sources.Readers.hl7Component(composite, 5).as("comp5"))
      .orderBy(col("doc_id"))
  }

  /** Gap-based sessionization as pure window functions (the SQL twin
    * of streaming.EventStream.sessionize): new session when the gap to
    * the previous event of the same user exceeds 30 min; session id =
    * running count of session starts. All-integer µs arithmetic.
    */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tRaw(s, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"), col("value"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        cents(col("value")).as("sum_value_c"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Near-dup clusters: connected components over the MinHash-LSH pair
    * graph — each involved doc labeled with its cluster's min doc_id.
    */
  private def qDupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
    Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Incremental cluster maintenance (q249): q36's labeling produced
    * by MAINTENANCE instead of recompute — prior = CC over the pairs
    * among even doc_ids (the first ingest), delta = every pair
    * touching an odd doc_id (the second), labels updated through the
    * contracted rep graph (Dedup.maintainComponents: history never
    * shuffles; the fixpoint runs on touched reps + new ids only). The
    * oracle is q36's FULL recursive reachability over all pairs, so
    * maintained ≡ full recompute is the hash contract itself.
    */
  private def qMaintainClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(true)
    val even = pairs.filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0)
    val delta = pairs.filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
    Dedup.maintainComponents(Dedup.connectedComponents(even), delta)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Cluster-maintenance write set (q250): q249's ingest expressed as
    * the rows a COW upsert would touch — Dedup.maintainComponentsDelta
    * over the same even-prior/odd-delta split. The oracle re-derives
    * it independently as (full recompute) MINUS (prior labels), so the
    * "only changed or new labels" contract is itself hash-gated.
    */
  private def qMaintainClustersDelta(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(true)
    val even = pairs.filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0)
    val delta = pairs.filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
    Dedup.maintainComponentsDelta(Dedup.connectedComponents(even), delta)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Cluster-maintenance ingest GATE (q255): the q249/q250 maintenance
    * run through the seventh dedup-on-ingest family member,
    * IncrementalDedup.maintainClusters — the label table IS the index
    * (record key "id", precombine "batch_no"), and three ingests
    * hash-gate the gate's two hardest contract points IN the output:
    * ingest 2 arrives with a RESET batch counter (batchNo=0, as a
    * fresh checkpoint or replayed orchestration would), so only the
    * floor-monotone stamp (max with stored max(batch_no)+1 = 2) keeps
    * its labels from losing the COW precombine race against ingest 1's
    * rows — a naive stamp makes every merged cluster_id read stale and
    * the hash go red; ingest 3 RE-DELIVERS the same delta, whose edges
    * contract to self-loops → zero rows, no commit — any spurious
    * admission would stamp batch_no=3+ into the final snapshot. The
    * oracle re-derives labels by full recursive reachability (q36
    * verbatim — maintained ≡ recompute) and the stamp from the
    * prior-vs-full label diff: 1 where the even-only labeling already
    * agreed, else 2, never 3.
    */
  private def qMaintainGate(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q255_cmg_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "id", "batch_no",
      numBuckets = 8)
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(true)
    val even = pairs.filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0)
    val delta = pairs.filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
    graft.operators.IncrementalDedup.maintainClusters(vt, even, 1L)
    graft.operators.IncrementalDedup.maintainClusters(vt, delta, 0L) // reset
    graft.operators.IncrementalDedup.maintainClusters(vt, delta, 3L) // redeliver
    // total over any corpus (ADVICE r14): a corpus with no even-even
    // pair commits nothing at ingest 1 (floor stays 0, stamps read 0 —
    // the oracle's ELSE branch), and a pair-free corpus never commits
    // at all — fall back to the empty labeled frame instead of letting
    // snapshot throw. Battery data exercises the 1/2-stamp regime.
    vt.snapshotOpt
      .map(_.select(col("id").as("doc_id"), col("cluster_id"),
        col("batch_no")))
      .getOrElse(s.range(0).select(col("id").as("doc_id"),
        col("id").as("cluster_id"), col("id").as("batch_no")))
      .orderBy(col("doc_id"))
  }

  /** Deletion-aware cluster repair (q262, VERDICT r15 item 1): the
    * TAKEDOWN flow on the clustering lever — q36's labeling, then
    * doc_id % 7 == 0 docs are removed and the labels are REPAIRED
    * component-scoped (Dedup.repairComponentsAfterDelete over the
    * persisted labelEdges relation: affected components = the deleted
    * nodes' labels, CC re-runs on their surviving induced edges
    * ALONE, untouched components carry verbatim — history never
    * shuffles, the fixpoint never sees it). The oracle recomputes IN
    * FULL — recursive reachability over the pair set with every
    * deleted-endpoint pair dropped — so repair ≡ full recompute over
    * the surviving edges is the hash contract itself. The %5 cut is
    * chosen to EXERCISE every repair outcome in the hash at battery
    * data: it deletes cluster reps (forcing survivor RELABELING — at
    * sf0.01 the {45,267,413} clique re-anchors to 267), isolates pair
    * peers (row REMOVAL), and leaves bystander clusters verbatim;
    * splits proper are pinned synthetically in TakedownRepairSpec.
    */
  private def qRepairAfterDelete(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(true)
    val labels = Dedup.connectedComponents(pairs).localCheckpoint(true)
    val le = Dedup.labelEdges(pairs, labels)
    val deleted = t(s, dir, "documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))
    Dedup.repairComponentsAfterDelete(labels, le, deleted)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Takedown ingest GATE (q263): q262's repair run through the LAKE —
    * ingest 1 persists labels AND the labeled edge relation
    * (IncrementalDedup.maintainClustersWithEdges, the write-set
    * discipline takedowns read); the takedown at batch 2 COW-deletes
    * the removed/isolated label rows, upserts the moved labels under
    * the floor-monotone stamp, and repairs the edge index; batch 3
    * RE-DELIVERS the same takedown — the ids are already gone, so
    * write sets are empty and nothing commits (any spurious admission
    * would stamp 3+ into the snapshot). The oracle re-derives the
    * final labels by FULL recursive reachability over the filtered
    * pair set (repair ≡ recompute) and the stamp from the
    * full-vs-filtered label diff: 1 where the takedown moved nothing,
    * else 2, never 3.
    */
  private def qTakedownGate(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q263_tdg_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val labels = new graft.operators.VersionedTable(s, root + "/labels",
      "id", "batch_no", numBuckets = 8)
    val edges = new graft.operators.VersionedTable(s, root + "/edges",
      "edge_key", "batch_no", numBuckets = 8)
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(true)
    graft.operators.IncrementalDedup.maintainClustersWithEdges(
      labels, edges, pairs, 1L)
    val deleted = t(s, dir, "documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))
      .localCheckpoint(true)
    graft.operators.IncrementalDedup.takedown(labels, edges, deleted, 2L)
    graft.operators.IncrementalDedup.takedown(labels, edges, deleted, 3L)
    labels.snapshotOpt
      .map(_.select(col("id").as("doc_id"), col("cluster_id"),
        col("batch_no")))
      .getOrElse(s.range(0).select(col("id").as("doc_id"),
        col("id").as("cluster_id"), col("id").as("batch_no")))
      .orderBy(col("doc_id"))
  }

  /** Takedown gate on a cluster_id-PARTITIONED edge store (q280,
    * VERDICT r15 item 2): q263's exact flow with the persisted edge
    * relation's FILES bucketed by `cluster_id` instead of `edge_key` —
    * the layout repairParts' scaladoc always promised. The takedown's
    * induced-subgraph read goes through snapshotPrunedBy: only the
    * affected components' buckets are OPENED at all (file-level
    * pruning, pinned on inputFiles in PartitionedTableSpec), closing
    * the one history-scale term the flow had left — at 100 TB a
    * takedown reads the touched components' file groups, never the
    * corpus-scale edge relation. Writes stay move-aware (upsertMoved:
    * a relabel crosses buckets; emptied source buckets fall out of
    * the manifest). The oracle is q263's verbatim — layout must never
    * change results, so the two rows hash-equal by contract.
    */
  private def qTakedownPruned(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q280_tdp_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val labels = new graft.operators.VersionedTable(s, root + "/labels",
      "id", "batch_no", numBuckets = 8)
    val edges = new graft.operators.VersionedTable(s, root + "/edges",
      "edge_key", "batch_no", numBuckets = 8,
      partitionColOpt = Some("cluster_id"))
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(true)
    graft.operators.IncrementalDedup.maintainClustersWithEdges(
      labels, edges, pairs, 1L)
    val deleted = t(s, dir, "documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))
      .localCheckpoint(true)
    graft.operators.IncrementalDedup.takedown(labels, edges, deleted, 2L)
    graft.operators.IncrementalDedup.takedown(labels, edges, deleted, 3L)
    labels.snapshotOpt
      .map(_.select(col("id").as("doc_id"), col("cluster_id"),
        col("batch_no")))
      .getOrElse(s.range(0).select(col("id").as("doc_id"),
        col("id").as("cluster_id"), col("id").as("batch_no")))
      .orderBy(col("doc_id"))
  }

  /** Takedown EVERYWHERE — the composition row (q281, VERDICT r15
    * item 1): one corpus takedown (doc_id/vec_id % 5 == 0) driven
    * through EVERY maintained structure in a single flow — cluster
    * labels + the cluster_id-partitioned edge store (q280's takedown),
    * the inverted-index postings (maintainPostings over the corpus
    * table's CDC diff), the per-lang rollup (maintainRollupCdc), the
    * buffered priority sample (q279's takedownSampleBuffered), and the
    * IVF-PQ ANN index (maintainPqIndex following the embeddings
    * table's delete). Each structure's final state is emitted as
    * (structure, k, v) rows and the oracle RECOMPUTES every one of
    * them from the surviving corpus alone — maintained ≡ recompute on
    * all six, in one hash. Per-takedown work stays structure-bounded
    * throughout: component-scoped CC over the file-pruned induced
    * edges, diff-driven postings/rollup touch only changed keys/
    * groups, the sample repairs from its O(k+m) buffer, and the index
    * drops exactly the deleted ids' rows — nothing history-scale
    * shuffles anywhere in the flow.
    */
  private def qTakedownEverywhere(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q281_tde_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    def vt(sub: String, key: String, pre: String,
        part: Option[String] = None) =
      new graft.operators.VersionedTable(s, s"$root/$sub", key, pre,
        numBuckets = 8, partitionColOpt = part)
    val docs = t(s, dir, "documents")
    val deletedDocs = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id")).localCheckpoint(true)
    // shared inputs pin BEFORE the fork below
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .localCheckpoint(true)
    // The six maintained structures form FOUR independent maintenance
    // flows over disjoint tables (labels+edges | corpus→postings+rollup
    // | sample | embeddings→PQ-index). Run them as concurrent driver
    // jobs (r16, guide §2.6 — actions are only sequential because the
    // driver calls them sequentially): each flow is a chain of many
    // small commits/actions whose dispatch tails the other flows'
    // tasks back-fill. Results are identical — the flows share no
    // table, the shared input frames are pinned above, and every
    // operator takes its session from its frames.
    val labels = vt("labels", "id", "batch_no")
    val edges = vt("edges", "edge_key", "batch_no", Some("cluster_id"))
    val cvt = vt("corpus", "doc_id", "ver")
    val svt = vt("sample", "id", "batch_no")
    val evt = vt("emb", "id", "ver")
    val ivt = vt("pqidx", "id", "ver")
    val aggs = Seq("n_docs" -> count(lit(1)),
      "sum_chars" -> sum(col("n_chars")))
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // 1+2: labels + cluster_id-partitioned edges, takedown-repaired
    val fClusters = Future {
      graft.operators.IncrementalDedup.maintainClustersWithEdges(
        labels, edges, pairs, 1L)
      graft.operators.IncrementalDedup.takedown(labels, edges, deletedDocs, 2L)
    }
    // 3+4: corpus table feeds postings + rollup through its CDC diff
    val fCorpus = Future {
      val c1 = cvt.upsert(docs.select(col("doc_id"), col("text"), col("lang"),
        col("n_chars"), lit(1L).as("ver")))
      val postings1 = graft.operators.TextSearch
        .postingRows(cvt.snapshot, "doc_id", "text").localCheckpoint(true)
      val rollup1 = graft.operators.RollupMaintenance
        .fullRollup(cvt, "lang", aggs).localCheckpoint(true)
      cvt.delete(deletedDocs.select(col("id").as("doc_id")))
      val head = cvt.commits.head
      val postings = graft.operators.TextSearch
        .maintainPostings(cvt, c1, head, postings1, "text")
      val rollup = graft.operators.RollupMaintenance
        .maintainRollupCdc(cvt, c1, head, rollup1, "lang", aggs)
      (postings, rollup)
    }
    // 5: buffered sample repaired from local state (q279's gate)
    val fSample = Future {
      graft.operators.IncrementalDedup.maintainSampleBuffered(svt, docs,
        col("doc_id"), col("n_chars"), k = 48, m = 16, batchNo = 1L)
      graft.operators.IncrementalDedup.takedownSampleBuffered(svt,
        deletedDocs, k = 48, m = 16, batchNo = 2L, corpus = () => docs,
        key = col("doc_id"), weight = col("n_chars"))
    }
    // 6: the IVF-PQ index follows the embeddings table's delete
    val fPq = Future {
      val emb = embCorpus(s, dir)
      val e1 = evt.upsert(emb.withColumn("ver", lit(1L)))
      val frozen = evt.snapshot.select(col("id"), col("emb"))
      val coarse = Similarity.trainCentroids(frozen, k = 8, iters = 2)
      val books = Similarity.trainPqCodebooks(frozen, m = 2, k = 4, iters = 2)
      ivt.upsert(Similarity.encodeIvfPq(frozen, coarse, books)
        .join(evt.snapshot.select(col("id"), col("ver")), Seq("id")))
      evt.delete(emb.filter(col("id") % 5 === 0).select(col("id")))
      Similarity.maintainPqIndex(ivt, evt, e1, coarse, books)
    }
    val (postings, rollup) =
      try {
        import scala.concurrent.duration.Duration
        Await.result(fClusters, Duration.Inf)
        val pr = Await.result(fCorpus, Duration.Inf)
        Await.result(fSample, Duration.Inf)
        Await.result(fPq, Duration.Inf)
        pr
      } finally pool.shutdown()
    // tall (structure, k, v) union — (structure, k) is a key in every
    // block, so the output order is total and engine-independent
    val sLab = labels.snapshot.select(lit("labels").as("structure"),
      col("id").cast("string").as("k"), col("cluster_id").as("v"))
    val sEdg = edges.snapshot.select(lit("edges").as("structure"),
      col("edge_key").as("k"), col("cluster_id").as("v"))
    val sPos = postings.select(lit("postings").as("structure"),
      concat_ws(":", col("term"), col("doc_id")).as("k"),
      col("tf").as("v"))
    val sRol = rollup.select(lit("rollup_n").as("structure"),
        col("lang").as("k"), col("n_docs").as("v"))
      .unionByName(rollup.select(lit("rollup_sum").as("structure"),
        col("lang").as("k"), col("sum_chars").cast("long").as("v")))
    val sSam = svt.snapshot.filter(col("rank") <= 48)
      .select(lit("sample").as("structure"),
        col("id").cast("string").as("k"), col("rank").as("v"))
    val sPq = ivt.snapshot.select(lit("pq").as("structure"),
      col("id").cast("string").as("k"),
      (col("cid").cast("long") * 10000L +
        element_at(col("codes"), 1).cast("long") * 100L +
        element_at(col("codes"), 2).cast("long")).as("v"))
    sLab.unionByName(sEdg).unionByName(sPos).unionByName(sRol)
      .unionByName(sSam).unionByName(sPq)
      .orderBy(col("structure"), col("k"))
  }

  /** Maintained weighted sample as a lake gate (q264, VERDICT r15
    * item 7): q233's maintenance discipline made PHYSICAL — the k=64
    * priority sample lives on a VersionedTable; ingest 1 cuts the
    * even-doc_id corpus, ingest 2 feeds the odds (entrants and
    * rank-shifted rows upsert at the floor-monotone stamp, rows that
    * fell out of the k-set are COW-DELETED — per-ingest IO tracks the
    * sample churn, never the corpus), and ingest 3 re-delivers the
    * odds (deterministic md5 priorities: every re-added row either
    * reproduces its stored row or loses the cut as it originally did
    * — empty write set, no commit, so any stamp 3+ is a red hash).
    * The oracle re-derives the final k-set by DIRECT recompute over
    * the full corpus (maintained ≡ recompute, the q233 contract) and
    * the stamp from the even-only-vs-full cut diff: 1 where the row
    * (id, rank) survived unchanged, else 2.
    */
  private def qSampleGate(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q264_smg_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "id", "batch_no",
      numBuckets = 8)
    val docs = t(s, dir, "documents")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 =!= 0)
    def ingest(b: DataFrame, n: Long): Unit = {
      graft.operators.IncrementalDedup.maintainSample(vt, b,
        col("doc_id"), col("n_chars"), k = 64, batchNo = n)
      ()
    }
    ingest(even, 1L)
    ingest(odd, 2L)
    ingest(odd, 3L) // redeliver: empty write set, no commit
    vt.snapshot
      .select(col("id"), col("weight"), col("prio"), col("rank"),
        col("batch_no"))
      .orderBy(col("rank"))
  }

  /** Buffered maintained sample + takedown (q279, VERDICT r15 item 1):
    * q264's maintenance gate with the k+m DELETION BUFFER — the table
    * stores bottom-(k=48 + m=16) by md5 priority, the reported sample
    * is rank ≤ 48, and the %5 takedown at batch 3 repairs from LOCAL
    * state when ≤ 16 buffered rows are hit (survivors re-ranked, cap
    * shrinks to 64−h, O(k+m) IO) or falls back to ONE bottom-64
    * recompute over the surviving corpus past the buffer — the corpus
    * thunk is evaluated only on that branch. Batch 4 RE-DELIVERS the
    * takedown: the ids are already gone, zero hits, zero commits (a
    * spurious commit would stamp 4+ into the snapshot — hash-red).
    * The oracle replays the SAME walk: it computes the buffered cut,
    * counts the hits h, takes the same branch (local iff 1 ≤ h ≤ 16),
    * and derives per-row stamps from which physical write each row
    * last took — maintained ≡ replayed recompute on every branch.
    */
  private def qSampleTakedownGate(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q279_stg_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "id", "batch_no",
      numBuckets = 8)
    val docs = t(s, dir, "documents")
    def ingest(b: DataFrame, n: Long): Unit = {
      graft.operators.IncrementalDedup.maintainSampleBuffered(vt, b,
        col("doc_id"), col("n_chars"), k = 48, m = 16, batchNo = n)
      ()
    }
    ingest(docs.filter(col("doc_id") % 2 === 0), 1L)
    ingest(docs.filter(col("doc_id") % 2 =!= 0), 2L)
    val deleted = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id")).localCheckpoint(true)
    def takedown(n: Long): Unit = {
      graft.operators.IncrementalDedup.takedownSampleBuffered(vt, deleted,
        k = 48, m = 16, batchNo = n, corpus = () => docs,
        key = col("doc_id"), weight = col("n_chars"))
      ()
    }
    takedown(3L)
    takedown(4L) // redeliver: zero hits, no commit
    vt.snapshot
      .select(col("id"), col("weight"), col("prio"), col("rank"),
        col("cap"), col("batch_no"))
      .orderBy(col("rank"))
  }

  /** Duplication-mass histogram (q132): q36's LSH cluster labeling,
    * then clusters-per-size and docs-tied-up — the "is dedup worth it"
    * one-pager. See Dedup.clusterSizeHistogram.
    */
  private def qDupMassHist(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text")
    Dedup.clusterSizeHistogram(Dedup.connectedComponents(pairs))
      .orderBy(col("cluster_size"))
  }

  /** String-function surface: edit distance, replace, padding,
    * reversal — all integer/deterministic semantics in both engines.
    */
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        levenshtein(substring(col("text"), 1, 12), col("lang")).cast("long").as("lev_to_lang"),
        regexp_replace(substring(col("text"), 1, 30), "the", "THE").as("replaced"),
        lpad(col("lang"), 5, "_").as("padded"),
        reverse(substring(col("text"), 1, 10)).as("rev10"))
      .orderBy(col("doc_id"))

  /** Exact interpolated median (percentile) in fixed-point. */
  private def qExactMedian(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(floor(percentile(col("l_extendedprice"), lit(0.5)) * 100).cast("long").as("median_price_c"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Pivot (wide aggregation): per-user-bucket event-type counts with
    * an explicit value list, so the output schema is static and the
    * oracle can mirror it with CASE sums.
    */
  private def qPivotEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("user_bucket", col("user_id") % 10)
      .groupBy(col("user_bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_bucket"))

  /** Range (tolerance) join via bucket replication (operators.AsOf
    * .joinWithin): events paired with same-user purchases within ±2
    * minutes, aggregated per event — one equi-join on (key, bucket),
    * never a per-key quadratic range explosion. All-integer µs.
    */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val tolUs = 120L * 1000000
    val ev = tRaw(s, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"))
    val purchases = tRaw(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts DIV 1000").as("pts_us"),
        col("event_id").as("p_event_id"))
    graft.operators.AsOf.joinWithin(ev, purchases, "user_id",
        col("ts_us"), col("pts_us"), tolUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_nearby"), min(col("p_event_id")).as("first_p"))
      .orderBy(col("event_id"))
  }

  /** End-to-end corpus curation (operators.Curation): exact dedup →
    * near-dup cluster pruning → quality + language gates, composed from
    * the individually-oracle-verified operators.
    */
  private def qCuration(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.curate(t(s, dir, "documents"))
      .select(col("doc_id"), col("quality_1e6"), col("predicted_lang"))
      .orderBy(col("doc_id"))

  /** SimHash banded near-dup pairs (Dedup.simhashPairs): 32-bit
    * fingerprints, 4 × 8-bit bands, Hamming ≤ 3 verify.
    */
  private def qSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** q45's maxBucketSize cure (q205): the SKEW-CAP path, hash-gated —
    * buckets whose population exceeds the cap are dropped wholesale
    * before any pair forms (the boilerplate-family guard: one 10^6-doc
    * template cluster would otherwise emit ~10^12 candidate pairs;
    * run exact dedup first, cap the rest — the ScaleProbe 3.9 s path,
    * previously probe-only). At sf0.01 the cap=8 drops 63 of 305
    * buckets (max population 86), so the oracle pins the cap
    * semantics, not a no-op.
    */
  private def qSimhashCapped(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 3, maxBucketSize = Some(8))
      .orderBy(col("id_a"), col("id_b"))

  /** q45's adaptive twin: band width chosen by
    * Dedup.suggestSimhashParams from the CORPUS COUNT, so candidate
    * pairs stay ~linear as the corpus grows (the 101→9.1 s ScaleProbe
    * result, now oracle-gated). The oracle re-derives the identical
    * width from count(*) with the same integer ceil-log2, computes the
    * full 60-bit fingerprint, and masks — bit j's majority vote is
    * independent of the total width, so the masked fingerprint equals
    * the narrow one. Different SFs choose different widths (500 docs →
    * 8-bit bands, 5 000 → 12-bit).
    */
  private def qSimhashAdaptive(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (bits, bands) = Dedup.suggestSimhashParams(docs.count(), bands = 4)
    Dedup.simhashPairs(docs, "doc_id", "text", bits, bands, maxHamming = 3)
      .withColumn("bits", lit(bits.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q23's adaptive twin: sign-bucket width from
    * Dedup.suggestSignBits(count, dim) — the q45-analog cliff cure,
    * oracle-gated the same way (30-bit bucket masked to the chosen
    * width; each bit is one component's sign, so masking ≡ narrower
    * bucketing).
    */
  private def qNearDupsAdaptive(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val bits = Dedup.suggestSignBits(embs.count(), dim = 64)
    // threshold -1 keeps EVERY bucket-cohabiting pair: the synthetic
    // embeddings never reach real near-dup cosine (q23 is 0 rows), so
    // gating the adaptive widths needs the full candidate set — the
    // hash then covers both the bucket assignment AND the scores
    Dedup.embeddingNearDups(embs, "vec_id", "embedding",
        threshold = -1.0, signBits = bits)
      .withColumn("bits", lit(bits.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Adaptive sign-bucket audit (q219): q23's REAL threshold path
    * (0.95) under count(*)-derived bit width, summarized as one row —
    * chosen bits, occupied buckets, worst bucket population, exact
    * candidate-pair mass Σ C(pop,2), and the thresholded near-dup
    * count. q84 gates the full adaptive candidate stream; this row
    * gates the GEOMETRY the adaptive law buys (pair mass stays ~linear
    * in n because bits track log2 n) plus the production threshold,
    * and stays non-trivial at every SF even when dup_pairs = 0.
    */
  private def qSignBitsAudit(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val bits = Dedup.suggestSignBits(embs.count(), dim = 64)
    val pops = embs
      .select(Similarity.signBucket(col("embedding"), bits).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("pop"))
    val geo = pops.agg(
      lit(bits.toLong).as("bits"),
      count(lit(1)).as("n_buckets"),
      max(col("pop")).as("max_pop"),
      expr("sum(pop * (pop - 1)) div 2").as("cand_pairs"))
    val dups = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
        threshold = 0.95, signBits = bits)
      .agg(count(lit(1)).as("dup_pairs"))
    geo.crossJoin(broadcast(dups)) // both sides are 1-row aggregates
  }

  /** K8/S9 in the battery: the bucketed COW upsert merge itself
    * (operators.VersionedTable — Hudi recordkey/precombine semantics,
    * reference hudi/register_hudi.py:44-96). Builds a three-commit
    * table in a scratch dir from `documents` — base (pre=1), a
    * precombine-TIE update on doc_id%5 (latest-write-wins), a
    * newer-precombine update on doc_id%7 (pre=2) — then queries the
    * merged snapshot. The oracle folds the same three commits with one
    * lexicographic row_number over (pre DESC, commit seq DESC): a
    * sequential pairwise max-precombine merge equals the global
    * lexicographic max when each commit has one row per key.
    */
  private def qCowMerge(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // deterministic per-(process, sfDir) scratch root, wiped and
    // rebuilt each call: repeated Verify/Bench runs leave at most one
    // dir per SF per process (a fresh createTempDirectory per call
    // would leak them), and the pid keeps concurrent JVMs on the same
    // SF dir from wiping each other's table mid-query
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q46_cow_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre", numBuckets = 8)
    vt.upsert(docs.select(col("doc_id"),
      substring(col("text"), 1, 30).as("txt"), lit(1L).as("pre")))
    vt.upsert(docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"),
      concat(lit("tie:"), substring(col("text"), 1, 20)).as("txt"), lit(1L).as("pre")))
    vt.upsert(docs.filter(col("doc_id") % 7 === 0).select(col("doc_id"),
      concat(lit("new:"), substring(col("text"), 1, 20)).as("txt"), lit(2L).as("pre")))
    vt.snapshot.select(col("doc_id"), col("txt"), col("pre")).orderBy(col("doc_id"))
  }

  /** COW delete (VersionedTable.delete): base + tie-update commits,
    * then a key-set delete (doc_id % 3) and a mixed re-insert/update
    * upsert (doc_id % 4, higher precombine) — exercises delete →
    * re-insert interplay end-to-end. The oracle merges commits 1+2
    * lexicographically, removes the deleted slice, then merges the
    * final commit on top.
    *
    * Bench shape (VERDICT r15 item 4): the two-commit BASE table is
    * scenery, not the measured operator — built once per (session,
    * dir) as an immutable template (the q190 discipline) and seeded
    * into each evaluation by file copy, so the timed window holds the
    * seed copy + the delete + the re-insert upsert + the merged read.
    * Re-writing the full base corpus through Spark on every
    * evaluation was the variance term the driver artifact showed
    * (BENCH_r15 4.68 s vs the archive's 1.54 s on IO-churn epochs).
    */
  private def qCowDelete(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tmpl = fixtureFor(s, dir, "q66") {
      val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q66_cow0_" + ProcessHandle.current().pid() + "_" +
          Integer.toHexString(dir.hashCode))
      graft.util.Fs.deleteRecursively(p)
      val vt = new graft.operators.VersionedTable(s, p.toString, "doc_id",
        "pre", numBuckets = 8)
      vt.upsert(docs.select(col("doc_id"),
        substring(col("text"), 1, 30).as("txt"), lit(1L).as("pre")))
      vt.upsert(docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"),
        concat(lit("tie:"), substring(col("text"), 1, 20)).as("txt"),
        lit(1L).as("pre")))
      p
    }
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q66_cow_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode) + "_" + q66Seq.incrementAndGet())
    graft.util.Fs.deleteRecursively(root)
    graft.util.Fs.copyRecursively(tmpl, root)
    val vt = new graft.operators.VersionedTable(s, root.toString, "doc_id",
      "pre", numBuckets = 8)
    vt.delete(docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    vt.upsert(docs.filter(col("doc_id") % 4 === 0).select(col("doc_id"),
      concat(lit("b3:"), substring(col("text"), 1, 20)).as("txt"), lit(2L).as("pre")))
    val out = vt.snapshot.select(col("doc_id"), col("txt"), col("pre"))
      .orderBy(col("doc_id")).localCheckpoint(true)
    graft.util.Fs.deleteRecursively(root) // scratch doesn't accumulate
    out
  }
  private val q66Seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Key-skew report (operators.Diagnostics.keySkewReport): the top-20
    * hottest user_ids with row shares plus the per-key count
    * distribution — the pre-join measurement that picks between plain
    * shuffle, AQE skew handling, and an explicit salted join.
    */
  private def qKeySkew(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.keySkewReport(
        tRaw(s, dir, "events"), col("user_id"), topK = 20)
      .orderBy(col("rank"))

  /** Commit-to-commit change feed (VersionedTable.diff): updates,
    * inserts, and deletes between the base commit and the head,
    * classified by a key-level snapshot comparison — the CDC view the
    * lake can serve without per-commit change logs. The oracle replays
    * the merge/delete pipeline and takes the same FULL OUTER diff.
    */
  private def qCommitDiff(s: SparkSession, dir: String): DataFrame = {
    // the four-commit table is scenery for the MEASURED operator (the
    // diff read) and diff mutates nothing — build it once per
    // (session, dir) like q85/q96/q131/q190 (VERDICT r15 item 4: the
    // per-evaluation rebuild was the driver artifact's variance term)
    val (vt, c1, head) = fixtureFor(s, dir, "q72") {
      val docs = t(s, dir, "documents")
      val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q72_diff_" + ProcessHandle.current().pid() + "_" +
          Integer.toHexString(dir.hashCode)).toString
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre", numBuckets = 8)
      val c1 = vt.upsert(docs.select(col("doc_id"),
        substring(col("text"), 1, 20).as("txt"), lit(1L).as("pre")))
      vt.upsert(docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"),
        concat(lit("upd:"), substring(col("text"), 1, 15)).as("txt"), lit(2L).as("pre")))
      vt.upsert(docs.filter(col("doc_id") % 11 === 0).select(
        (col("doc_id") + 1000000L).as("doc_id"), lit("fresh").as("txt"), lit(1L).as("pre")))
      val head = vt.delete(docs.filter(col("doc_id") % 9 === 0).select(col("doc_id")))
      (vt, c1, head)
    }
    vt.diff(c1, head).orderBy(col("doc_id"))
  }

  /** Release-delta report (q131): q72's commit replay with `source`
    * carried as payload, then the per-source insert/update/delete
    * counts between release commits — the corpus release note. See
    * VersionedTable.releaseDelta.
    */
  private def qReleaseDelta(s: SparkSession, dir: String): DataFrame = {
    val (vt, c1, head) = fixtureFor(s, dir, "q131") {
      val docs = t(s, dir, "documents")
      val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q131_delta_" + ProcessHandle.current().pid() + "_" +
          Integer.toHexString(dir.hashCode)).toString
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre", numBuckets = 8)
      val c1 = vt.upsert(docs.select(col("doc_id"), col("source").as("src"),
        substring(col("text"), 1, 20).as("txt"), lit(1L).as("pre")))
      vt.upsert(docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"),
        col("source").as("src"),
        concat(lit("upd:"), substring(col("text"), 1, 15)).as("txt"), lit(2L).as("pre")))
      vt.upsert(docs.filter(col("doc_id") % 11 === 0).select(
        (col("doc_id") + 1000000L).as("doc_id"), lit("newfeed").as("src"),
        lit("fresh").as("txt"), lit(1L).as("pre")))
      val head = vt.delete(docs.filter(col("doc_id") % 9 === 0).select(col("doc_id")))
      (vt, c1, head)
    }
    vt.releaseDelta(c1, head, "src")
      .select(col("src").as("source"), col("change_type"), col("n"))
      .orderBy(col("source"), col("change_type"))
  }

  /** Incremental rollup maintenance (operators.RollupMaintenance):
    * a per-language summary bootstrapped at commit 1, then REFRESHED
    * from commit 2's incremental delta (touched groups recomputed —
    * including the OLD groups of moved keys — untouched groups carried
    * verbatim). The oracle is the full recompute of the merged final
    * state: incremental maintenance must equal it exactly.
    */
  private def qRollupMaintain(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q71_roll_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre", numBuckets = 8)
    val base = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      graft.functions.tokenCount(col("text")).as("n_tokens"), lit(1L).as("pre"))
    val aggs = Seq("n_docs" -> count(lit(1)), "sum_tokens" -> sum(col("n_tokens")))
    val c1 = vt.upsert(base)
    val summary1 = graft.operators.RollupMaintenance.fullRollup(vt, "lang", aggs)
      .localCheckpoint()
    // commit 2 MOVES every 7th doc to lang 'xx' and grows its tokens
    vt.upsert(base.filter(col("doc_id") % 7 === 0)
      .withColumn("lang", lit("xx"))
      .withColumn("n_tokens", col("n_tokens") + 5)
      .withColumn("pre", lit(2L)))
    graft.operators.RollupMaintenance.maintainRollup(vt, c1, summary1, "lang", aggs)
      .orderBy(col("lang"))
  }

  /** Near-duplicate decontamination (Decontaminate.nearDupContaminated):
    * MinHash-LSH candidates across corpus ↔ eval slice (band-bucket
    * equi-join), exact 3-gram Jaccard verify at ≥ 0.2 — catches
    * paraphrased/reformatted eval leakage that exact-gram overlap
    * (q55) misses. The oracle replays signatures, banding, the cross
    * join, and the q20 Jaccard formula.
    */
  private def qNearDupDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // a WIDER eval slice than q55's (%5, not %97): near-dup leakage
    // needs the slice to intersect the corpus's near-dup families to
    // gate anything at every SF
    val isEval = col("doc_id") % 5 === 0 && col("doc_id") < 5000
    graft.operators.Decontaminate.nearDupContaminated(
        docs.filter(!isEval), "doc_id", "text",
        docs.filter(isEval), "doc_id", "text")
      .orderBy(col("doc_id"), col("bench_id"))
  }

  /** SQ8 scalar-quantized ANN (Similarity.sqTrain/sqEncode/sqTopK):
    * per-dimension 8-bit codes against trained [lo, hi] bounds,
    * candidates reconstructed and dot-scored in pure BIGINT — the
    * FAISS ScalarQuantizer storage path. The oracle re-derives
    * bounds, codes, reconstructions, and the MIPS ranking.
    */
  private def qSq8Ann(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val bounds = Similarity.sqTrain(corpus)
    val codes = Similarity.sqEncode(corpus, bounds)
    Similarity.sqTopK(codes, bounds,
        corpus.filter(col("id") % 200 === 0 && col("id") < 2000), k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score_1e12"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Epoch-weighted mixture materialization (Sampling.epochMixture):
    * fractional per-source repeat factors — floor(w) full copies plus
    * one hash-gated extra — as (doc_id, source, copy_no). The oracle
    * replays the same generated VALUES weights, md5-ppm gate, and
    * range() fan-out.
    */
  private def qEpochMixture(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.epochMixture(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"), graft.operators.Sampling.DemoEpochsPpm)
      .orderBy(col("doc_id"), col("copy_no"))

  /** Span-level exact-substring duplication report
    * (Dedup.duplicatedSpans): every token position covered by a
    * corpus-repeated 5-gram, merged into maximal spans per doc — the
    * ExactSubstr dedup signal at word-gram granularity. The oracle
    * replays positions, counts, and the island merge as one window
    * chain.
    */
  private def qDupSpans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.duplicatedSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))

  /** Deterministic fixed-N per-stratum head (Sampling.stratifiedHead):
    * 5 docs per source by smallest (md5, key) — count-based eval
    * carve-outs, engine/partitioning-independent. Oracle mirrors the
    * rank window.
    */
  private def qStratifiedHead(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedHead(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"), nPer = 5)
      .orderBy(col("source"), col("pick_rank"))

  /** Per-source corpus health report (Diagnostics.corpusHealth):
    * docs / distinct content / token totals / exact fixed-point
    * median length — the dataset-card numbers.
    */
  private def qCorpusHealth(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.corpusHealth(
        t(s, dir, "documents"), col("source"), col("doc_id"), col("text"))
      .orderBy(col("source"))

  /** DSIR importance weights (TextAnalysis.dsirWeights): exact
    * integer log2-ratio of target-domain vs corpus unigram
    * likelihoods, add-one smoothed — the domain-targeting score of
    * Data Selection via Importance Resampling. The target is the
    * short-document slice (n_chars < 150): the one driver-data
    * carve-out whose token distribution genuinely differs from the
    * corpus's (a lang/id-hash slice of the uniform synthetic vocab
    * cancels to all-zero scores — a degenerate gate). Oracle mirrors
    * the bin() digit-count arithmetic.
    */
  private def qDsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.TextAnalysis.dsirWeights(
        docs, "doc_id", "text", docs.filter(col("n_chars") < 150), "text")
      .orderBy(col("id"))
  }

  /** Winnowing fingerprints (TextAnalysis.winnowingFingerprints):
    * MOSS-style min-in-window gram-hash selection (ties rightmost)
    * with the guarantee that every shared ≥ w+n−1-token run is
    * caught at ~2/(w+1) index density. Oracle replays the packed
    * (hash, tie-pos) window min.
    */
  private def qWinnowing(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.winnowingFingerprints(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 4)
      .orderBy(col("doc_id"), col("fp_pos"))

  /** Winnowing match pairs (TextAnalysis.winnowingPairs): documents
    * sharing ≥ 3 distinct q103 fingerprints — the MOSS pairing step;
    * run detection at fingerprint density. The df valve rides at 50
    * (oracle-mirrored): boilerplate fingerprints in >50 docs emit
    * B²/2 pairs each and are the q104 scale cliff — measured 62× at
    * 10× data uncapped vs ~linear capped; driver-SF results are
    * identical (max df there is 6).
    */
  private def qWinnowingPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.winnowingPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 4, minShared = 3L,
        maxHashDf = Some(50))
      .orderBy(col("id_a"), col("id_b"))

  /** Exact phrase search (TextSearch.phraseSearch): positional-index
    * base-vote joins — token at pos p matching phrase slot j votes
    * for start p−j; full slot coverage = match. The oracle replays
    * the votes from a generated VALUES slot table.
    */
  private def qPhraseSearch(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.phraseSearch(
        t(s, dir, "documents"), "doc_id", "text",
        graft.operators.TextSearch.DemoPhrases)
      .orderBy(col("phrase"), col("doc_id"))

  /** Duplicated-span REMOVAL (Dedup.removeDuplicatedSpans): q97's
    * spans cut out of the corpus and residual tokens reassembled in
    * order — the ExactSubstr cut step. The oracle replays the cut as
    * an anti-join of the token stream against exploded span ranges.
    */
  private def qDupSpanRemove(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.removeDuplicatedSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))

  /** Semantic dedup (Dedup.semanticDedup): the SemDeDup recipe —
    * trained coarse cells (the q49 quantizer, re-derived identically
    * by the oracle's unrolled k-means CTEs) bound candidate pairs,
    * cosine ≥ 0.95 edges cluster via connected components, min id
    * represents each group. Training AND grouping are
    * cross-engine-checked.
    */
  private def qSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val cents = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    graft.operators.Dedup.semanticDedup(corpus, cents, threshold1e6 = 950000L)
      .orderBy(col("id"))
  }

  /** Incremental inverted-index maintenance (TextSearch.maintainPostings):
    * q71/q85's "summary follows the versioned corpus" pattern applied
    * to the q70 index — postings refreshed from the change feed across
    * an upsert → DELETE → upsert replay, never rescanning the corpus.
    * The oracle recomputes postings of the replayed final state:
    * maintained ≡ full recompute is the contract.
    */
  private def qIndexMaintain(s: SparkSession, dir: String): DataFrame = {
    val (vt, c1, c4, postings1) = fixtureFor(s, dir, "q96") {
      val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q96_idx_" + ProcessHandle.current().pid() + "_" +
          Integer.toHexString(dir.hashCode)).toString
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre", numBuckets = 8)
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"), lit(1L).as("pre"))
      val c1 = vt.upsert(base)
      val postings1 = graft.operators.TextSearch.postingRows(vt.snapshot, "doc_id", "text")
        .localCheckpoint()
      // commit 2 rewrites every 7th doc; commit 3 deletes every 5th;
      // commit 4 rewrites every 4th (re-inserting the %20 deletions)
      vt.upsert(base.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" zz yy")))
        .withColumn("pre", lit(2L)))
      vt.delete(base.filter(col("doc_id") % 5 === 0).select(col("doc_id")))
      val c4 = vt.upsert(base.filter(col("doc_id") % 4 === 0)
        .withColumn("text", concat(col("text"), lit(" qq")))
        .withColumn("pre", lit(3L)))
      (vt, c1, c4, postings1)
    }
    graft.operators.TextSearch.maintainPostings(vt, c1, c4, postings1, "text")
      .orderBy(col("term"), col("doc_id"))
  }

  /** Dedup-on-ingest (IncrementalDedup.appendNovel): the corpus split
    * into two batches (even then odd doc_ids) replayed through a
    * content-hash index in a VersionedTable — batch 2 re-admits
    * nothing batch 1 contributed; within-batch dups keep their min
    * id. The oracle replays the same priority (batch, then id) as one
    * window.
    */
  private def qIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q94_inc_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "h", "batch_no", numBuckets = 8)
    val docs = t(s, dir, "documents")
    graft.operators.IncrementalDedup.appendNovel(vt,
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 1L)
    graft.operators.IncrementalDedup.appendNovel(vt,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", 2L)
    vt.snapshot.select(col("h"), col("doc_id"), col("batch_no"))
      .orderBy(col("h"))
  }

  /** Stateless contamination gate (Decontaminate.flagByGramSet): the
    * eval gram set rides as a sorted expression literal, so the SAME
    * operator gates an append-mode stream (StreamingSpec) — here it
    * flags the q55 corpus slice, oracle-checked per doc.
    */
  private def qContaminationGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // bounded benchmark gram set, collected once (what a deployed
    // stream job bakes into the query as a literal)
    val grams = docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000)
      .select(explode(graft.functions.shingles(col("text"), 3)).as("g"))
      .distinct().collect().map(_.getString(0)).toSeq
    graft.operators.Decontaminate.flagByGramSet(
        docs.filter(!(col("doc_id") % 97 === 0 && col("doc_id") < 5000)),
        "doc_id", "text", grams, n = 3)
      .orderBy(col("doc_id"))
  }

  /** Adaptive-k semantic dedup (the q86 cure, oracle-gated like
    * q82/q84): cell count = Dedup.suggestSemanticCells(n) — exact
    * integer floor-√n, clamp [8, 4096] — derived from the corpus
    * count on BOTH engines (the oracle re-derives k from its own
    * count(*) and seeds `LIMIT`-free via a row_number filter), so the
    * √n-cells scale story is a hash gate, not just a probe. Different
    * SFs choose different k (8 / 14 / 44 at sf0.001/0.01/0.1).
    */
  private def qSemanticAdaptive(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val k = graft.operators.Dedup.suggestSemanticCells(corpus.count())
    val cents = Similarity.trainCentroids(corpus, k = k, iters = 2)
    graft.operators.Dedup.semanticDedup(corpus, cents, threshold1e6 = 950000L)
      .orderBy(col("id"))
  }

  /** Span-level contamination report (Decontaminate.contaminationReport):
    * q55's eval slice and gram width, but per-doc overlap SHARE and a
    * deterministic sample gram — the quarantine-review columns.
    */
  private def qContaminationReport(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Decontaminate.contaminationReport(
        docs.filter(!(col("doc_id") % 97 === 0 && col("doc_id") < 5000)), "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000), "text", n = 3)
      .orderBy(col("doc_id"))
  }

  /** Pairwise source content-overlap matrix
    * (Diagnostics.sourceGramOverlap): shared distinct 3-grams per
    * source pair — the feed-redundancy diagnostic.
    */
  private def qSourceOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.sourceGramOverlap(
        t(s, dir, "documents"), col("text"), col("source"), n = 3)
      .orderBy(col("source_a"), col("source_b"))

  /** Temperature-flattened mixture sampling (Sampling.temperatureSample):
    * per-source rates derived FROM THE DATA (α=0.5 via exact integer
    * √-weights, fixed 200-row budget), membership a pure hash filter.
    * The oracle re-derives the identical rates from its own counts.
    */
  private def qTemperatureSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temperatureSample(t(s, dir, "documents"),
        col("doc_id"), col("source"), budget = 200L)
      .select(col("doc_id"), col("source"), col("rate_ppm"))
      .orderBy(col("doc_id"))

  /** Bigram LM surprisal (TextAnalysis.bigramSurprisal): first-order
    * conditional surprisal from exact integer floor-log2 of
    * unigram/bigram corpus counts — the local-coherence quality
    * signal.
    */
  private def qBigramSurprisal(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.bigramSurprisal(
        t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bigrams"),
        col("surprisal_bits"), col("avg_surprisal_1e6"))
      .orderBy(col("doc_id"))

  /** CCNet perplexity buckets (q129): per-source head/middle/tail split
    * at the source's own 1/3 and 2/3 surprisal percentiles — the CCNet
    * keep/drop partition. See TextAnalysis.ccnetBuckets.
    */
  private def qCcnetBuckets(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.ccnetBuckets(
        t(s, dir, "documents"), "doc_id", "text", "source")
      .select(col("id").as("doc_id"), col("source"),
        col("avg_surprisal_1e6"), col("pct_1e6"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Feature-hashed sparse TF vectors (q130): signed hashing-trick
    * featurization into 64 buckets — the model-free text→vector
    * bridge. See TextAnalysis.hashedTf.
    */
  private def qHashedTf(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.hashedTf(
        t(s, dir, "documents"), "doc_id", "text", dim = 64)
      .select(col("id").as("doc_id"), col("bucket"), col("weight"))
      .orderBy(col("doc_id"), col("bucket"))

  /** Kneser–Ney bigram LM estimation (q125): the KenLM-shaped trainer —
    * per surviving bigram, discounted ML mass plus continuation-prob
    * backoff as ONE exact rational, 1e-6 fixed point; singleton rows
    * pruned after statistics. See TextAnalysis.kneserNeyBigrams.
    */
  private def qKneserNey(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.kneserNeyBigrams(
        t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("a"), col("b"))

  /** Corpus-health heatmap (q136): joint log2-length × quality-decile
    * counts. See Diagnostics.healthHeatmap.
    */
  private def qHealthHeatmap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.healthHeatmap(t(s, dir, "documents"), "text")
      .orderBy(col("len_bits"), col("q_decile"))

  /** Source-divergence matrix (q135): add-one-smoothed unigram KL per
    * ordered source pair in exact integer floor-log2 bits — which
    * feeds are distributionally interchangeable. See
    * Diagnostics.sourceDivergence.
    */
  private def qSourceDivergence(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.sourceDivergence(
        t(s, dir, "documents"), "doc_id", "text", "source")
      .orderBy(col("source_a"), col("source_b"))

  /** ANALYZE-style column statistics (q126): one Expand-based pass over
    * documents computing per-column row/non-null/exact-NDV/min/max —
    * the stats that decide broadcast joins and bucketing counts. See
    * Diagnostics.columnStats.
    */
  private def qColumnStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.columnStats(
        t(s, dir, "documents"),
        Seq("doc_id", "lang", "n_chars", "source", "text"))
      .orderBy(col("column_name"))

  /** Curation gate-attrition funnel (q127): every document attributed
    * to the first curateV2 gate that kills it (exact dup → near dup →
    * quality → language → repetition → contamination → pass), with
    * per-gate counts and corpus shares. Eval slice = q57's
    * doc_id % 97 = 0. See Curation.attritionFunnel.
    */
  private def qAttrition(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Curation.attritionFunnel(docs,
        docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000))
      .orderBy(col("gate"))
  }

  /** Paragraph/segment-level dedup (Dedup.segmentDedup): the corpus is
    * segmented by the q47 chunker (32-token windows, zero overlap — the
    * flat-text stand-in for newline paragraphs), duplicated segments
    * are dropped corpus-wide (first (id, seg_no) occurrence wins), and
    * documents are reassembled from their survivors.
    */
  private def qSegmentDedup(s: SparkSession, dir: String): DataFrame = {
    val segs = graft.operators.Chunker.chunkByTokens(
        t(s, dir, "documents"), "text", 32, 0)
      .select(col("doc_id").as("id"), col("chunk_no").as("seg_no"),
        col("chunk").as("seg"))
    graft.operators.Dedup.segmentDedup(segs)
      .select(col("id").as("doc_id"), col("text_dedup"), col("n_kept"), col("n_segs"))
      .orderBy(col("doc_id"))
  }

  /** Unigram LM surprisal (TextAnalysis.unigramSurprisal): integer
    * floor-log2 perplexity proxy — corpus-count table broadcast onto
    * the token stream, per-doc associative bit sums. The CCNet-style
    * LM quality gate, engine-portable.
    */
  private def qLmSurprisal(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.unigramSurprisal(
        t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_tokens"),
        col("surprisal_bits"), col("avg_surprisal_1e6"))
      .orderBy(col("doc_id"))

  /** CDC rollup maintenance (RollupMaintenance.maintainRollupCdc):
    * q71's summary maintained across an upsert → DELETE → upsert
    * replay — the delete-aware refresh whose touched groups come from
    * the change feed, so the delete that [[maintainRollup]] is
    * documented to miss is applied. The oracle is the full recompute
    * of the replayed final state: maintained ≡ recomputed is the
    * whole contract.
    */
  private def qRollupCdc(s: SparkSession, dir: String): DataFrame = {
    val aggs = Seq("n_docs" -> count(lit(1)), "sum_tokens" -> sum(col("n_tokens")))
    val (vt, c1, head, summary1) = fixtureFor(s, dir, "q85") {
      val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q85_cdc_" + ProcessHandle.current().pid() + "_" +
          Integer.toHexString(dir.hashCode)).toString
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre", numBuckets = 8)
      val base = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        graft.functions.tokenCount(col("text")).as("n_tokens"), lit(1L).as("pre"))
      val c1 = vt.upsert(base)
      val summary1 = graft.operators.RollupMaintenance.fullRollup(vt, "lang", aggs)
        .localCheckpoint()
      // commit 2 moves every 7th doc to lang 'xx' (+5 tokens)
      vt.upsert(base.filter(col("doc_id") % 7 === 0)
        .withColumn("lang", lit("xx"))
        .withColumn("n_tokens", col("n_tokens") + 5)
        .withColumn("pre", lit(2L)))
      // commit 3 DELETES every 5th doc (shrinks several groups)
      vt.delete(base.filter(col("doc_id") % 5 === 0).select(col("doc_id")))
      // commit 4 re-inserts/updates every 4th doc as lang 'yy' (+9)
      val head = vt.upsert(base.filter(col("doc_id") % 4 === 0)
        .withColumn("lang", lit("yy"))
        .withColumn("n_tokens", col("n_tokens") + 9)
        .withColumn("pre", lit(3L)))
      (vt, c1, head, summary1)
    }
    graft.operators.RollupMaintenance.maintainRollupCdc(
        vt, c1, head, summary1, "lang", aggs)
      .orderBy(col("lang"))
  }

  /** Token-window chunking (operators.Chunker): 64-token windows with
    * 16-token overlap — the map-only splitting stage of an embedding
    * pipeline, no shuffle, no UDF.
    */
  private def qChunking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunker.chunkByTokens(t(s, dir, "documents"), "text", 64, 16)
      .select(col("doc_id"), col("chunk_no"), col("chunk"), col("chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_no"))

  /** Deterministic stratified hash sample (operators.Sampling): per-lang
    * parts-per-million mixture rates, membership a pure function of
    * doc_id — reproducible across engines and partitionings.
    */
  private def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(t(s, dir, "documents"),
        col("lang"), col("doc_id"), graft.operators.Sampling.DemoRates)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** ANN with a TRAINED coarse quantizer (Similarity.trainCentroids +
    * ivfTopK): deterministic fixed-point Lloyd's k-means (k=8, 2
    * rounds, seeds = the 8 lowest-id vectors), queries probe their 2
    * nearest cells, exact cosine ranks within cells. The oracle
    * re-derives the identical centroids through unrolled CTEs, so
    * training AND search are cross-engine-checked.
    */
  private def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val cents = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    Similarity.ivfTopK(corpus, corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
        cents, k = 3, nprobe = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score_1e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** MMR diversified re-rank (q133): greedy maximal-marginal-relevance
    * over each eval query's top-6 cosine candidates, 3 picks, λ=1/2 as
    * the exact integer margin rel − max-sim-to-picked. See
    * Retrieval.mmrRerank.
    */
  private def qMmr(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    graft.operators.Retrieval.mmrRerank(corpus,
        corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
        depth = 6, k = 3)
      .orderBy(col("query_id"), col("pick_no"))
  }

  /** Cluster-cohesion report (q128): q49's trained coarse quantizer,
    * then per cell the member count and mean/worst member-to-centroid
    * fixed cosine — the nprobe-sizing diagnostic. See
    * Similarity.clusterCohesion.
    */
  private def qClusterCohesion(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val cents = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    Similarity.clusterCohesion(corpus, cents).orderBy(col("cid"))
  }

  /** Deterministic train/val/test split (operators.Sampling.splitLabel):
    * cumulative hash-bucket ranges partition the corpus 80/10/10 —
    * reproducible on any engine, no coordination, prefix-stable.
    */
  private def qSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.operators.Sampling.splitLabel(col("doc_id"),
          graft.operators.Sampling.DemoSplits).as("split"))
      .orderBy(col("doc_id"))

  /** BM25 relevance scoring (operators.TextSearch): rational
    * fixed-point idf (no transcendentals — ln is not bit-stable across
    * engines), integer contribution sums. The data-selection ranking
    * primitive of corpus curation.
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.bm25(t(s, dir, "documents"), "doc_id", "text",
        graft.operators.TextSearch.DemoQuery)
      .orderBy(col("bm25_1e6").desc, col("doc_id"))

  /** Multi-query BM25 (operators.TextSearch.bm25Many): k seed queries
    * scored in ONE corpus pass — per-(doc, term) contributions are
    * query-independent, so they are computed once over the union term
    * set and fanned out per query by a broadcast (query_id, term) join.
    */
  private def qBm25Multi(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextSearch.bm25Many(t(s, dir, "documents"), "doc_id", "text",
        graft.operators.TextSearch.DemoQueries)
      .orderBy(col("query_id"), col("bm25_1e6").desc, col("doc_id"))

  /** Sequence packing (operators.Chunker.packSequences): documents
    * laid out per md5 shard in key order and cut every 512 tokens —
    * GPT-style concatenate-and-pack, all-integer placement.
    */
  private def qPacking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunker.packSequences(
        t(s, dir, "documents").select(col("doc_id"),
          graft.functions.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 512L, shards = 4)
      .select(col("doc_id"), col("shard"), col("seq_id"), col("seq_offset"))
      .orderBy(col("doc_id"))

  /** No-split sequence packing (operators.Chunker.packSequencesNoSplit):
    * greedy first-fit in key order per shard — a document that would
    * cross the 512-token budget starts a new sequence. The oracle
    * replays the same recurrence as a DuckDB recursive CTE.
    */
  private def qPackingNoSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunker.packSequencesNoSplit(
        t(s, dir, "documents").select(col("doc_id"),
          graft.functions.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 512L, shards = 4)
      .select(col("doc_id"), col("shard"), col("seq_id"), col("seq_offset"))
      .orderBy(col("doc_id"))

  /** BPE token counts (operators.Bpe): deterministic corpus-trained
    * byte-pair encoding — the real-subword backend of the token-count
    * seam. Training collects the capped word-frequency dictionary (one
    * groupBy, driver loop over ≤ vocabCap rows); encoding is a pure
    * per-row expression. The oracle replays the identical trainer as
    * unrolled merge-round CTEs and bills each word occurrence its
    * subword count.
    */
  private def qBpeTokens(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = graft.operators.Bpe.trainFromCorpus(docs, "text",
      graft.operators.Bpe.DefaultMerges, graft.operators.Bpe.DefaultVocabCap)
    docs.select(col("doc_id"),
        graft.functions.tokenCount(col("text")).as("ws_tokens"),
        graft.functions.bpeTokenCount(col("text"), merges).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Distributed BPE merge training (q213): the q81 trainer with the
    * vocabulary kept on the cluster — per round one freq-weighted
    * pair-count shuffle, a 1-row argmax collect, and a distributed
    * merge fold (Bpe.trainDistributed). The checked output is the
    * TRAINING TRACE (round, winning pair, weighted count), so the
    * oracle pins every round's argmax, not just the final encoding;
    * q81/q114 already pin the downstream encodings. This is the
    * open-vocab scale path: the collected-dictionary trainer walls at
    * driver memory when a web-scale corpus's word dictionary passes
    * 10⁸ rows; here driver state is the merge list alone.
    */
  private def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = graft.operators.Bpe.trainDistributed(t(s, dir, "documents"),
      "text", graft.operators.Bpe.DefaultMerges, graft.operators.Bpe.DefaultVocabCap)
    merges.zipWithIndex
      .map { case ((a, b, c), i) => (i.toLong + 1L, a, b, c) }
      .toDF("round", "sym_a", "sym_b", "pair_count")
      .orderBy(col("round"))
  }

  /** KMV mergeability (q215): per-source k-min sketches plus a
    * `_merged` row rebuilt ONLY from those k-sets — losslessly equal
    * to the direct global sketch, the algebra that lets 1000
    * executors (or ingest days) each keep a k-set and still answer
    * corpus-wide distinct by shipping sources·k longs. See
    * Sketches.kmvPerSourceMerge.
    */
  private def qKmvMerge(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvPerSourceMerge(
      t(s, dir, "documents"), "text", "source")

  /** Count-min mergeability (q217): per-source sketches merged by
    * counter addition — every merged estimate is BIT-EQUAL to the
    * direct global sketch's (min over linearly-summing counters).
    * The PORTABLE form (md5-hashed cells, counters as rows — see
    * Sketches.cmsPortableMerge) makes the estimates and ALL flags,
    * including the probabilistic upper bound, deterministic integer
    * functions both engines compute — the round-11 residual (an
    * asserted `cms_upper_ok = 1`) is gone: a legitimately-out-of-
    * bound item still hash-matches. The Spark-native binary-merge
    * variant (Sketches.cmsPerSourceMerge) stays spec-pinned.
    */
  private def qCmsMerge(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.cmsPortableMerge(
      t(s, dir, "documents"), "text", "source")

  /** Versioned-lake schema evolution (q218): commit 2 upserts rows
    * carrying a column commit 1 never had — the add-column migration
    * every long-lived lake table eventually performs. The engine path
    * is upsert's `unionByName(allowMissingColumns)` merge plus
    * mergeSchema snapshot reads: untouched buckets keep their old
    * files (no rewrite — the evolution is METADATA-cheap), and the
    * snapshot surfaces the union schema with nulls for pre-evolution
    * rows. The oracle replays both commits and the precombine merge
    * in SQL.
    */
  private def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q218_evo_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "doc_id", "batch_no",
      numBuckets = 8)
    val docs = t(s, dir, "documents")
    vt.upsert(docs.select(col("doc_id"), col("lang"), lit(1L).as("batch_no")))
    vt.upsert(docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), lit("xx").as("lang"),
        tokenCount(col("text")).as("n_tokens"), lit(2L).as("batch_no")))
    vt.snapshot
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("batch_no"))
      .orderBy(col("doc_id"))
  }

  /** Schema-migration lifecycle (q220): q218 widened to the full set of
    * migrations a long-lived table performs. Commit 1 writes n_tok as
    * INT; commit 2 upserts every 5th doc with a BIGINT n_tok beyond
    * Int.MaxValue (implicit widening — VersionedTable's per-writer
    * grouped-union read coerces table-wide where parquet mergeSchema
    * refuses mixed int/long files); then dropColumn("lang") and
    * renameColumn("n_tok", "tok_count") migrate the live schema as
    * full-rewrite commits. Output = final snapshot + engine-computed
    * schema-contract flags: the pre-evolution commit still time-travels
    * to int + lang; the live snapshot reads long + renamed + no lang.
    * Flags are deterministic contracts (the q217 merged_eq_direct
    * idiom). See VersionedTable.readGrouped/dropColumn/renameColumn.
    */
  private def qSchemaMigrations(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q220_mig_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre",
      numBuckets = 4)
    val docs = t(s, dir, "documents")
    val c1 = vt.upsert(docs.select(col("doc_id"), col("lang"),
      tokenCount(col("text")).cast("int").as("n_tok"), lit(1L).as("pre")))
    vt.upsert(docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"),
      lit("xx").as("lang"),
      (tokenCount(col("text")) + lit(3000000000L)).as("n_tok"),
      lit(2L).as("pre")))
    vt.dropColumn("lang")
    vt.renameColumn("n_tok", "tok_count")
    val old = vt.asOf(c1); val snap = vt.snapshot
    val flags = Seq((
      if (old.columns.contains("lang")) 1L else 0L,
      if (old.schema("n_tok").dataType == IntegerType) 1L else 0L,
      if (!snap.columns.contains("lang") && snap.columns.contains("tok_count")) 1L
      else 0L,
      if (snap.schema("tok_count").dataType == LongType) 1L else 0L)).toList
    val flagsDf = s.createDataFrame(flags).toDF(
      "old_has_lang", "old_n_tok_int", "live_migrated", "live_wide")
    snap.select(col("doc_id"), col("tok_count"))
      .crossJoin(broadcast(flagsDf)) // 1-row schema-contract flags
      .orderBy(col("doc_id"))
  }

  /** Mergeable quantile sketch (q221): per-source bottom-k-by-hash
    * uniform samples of n_chars plus the `_merged` sketch rebuilt only
    * from those k-sets — the KMV trick (q215) carried to order
    * statistics, completing the sketch-algebra family (HLL q35, KMV
    * q215, CMS q217). merged_eq_direct is COMPUTED (merged k-set vs
    * the direct global bottom-k); the rank-band flags audit each
    * estimate against the exact population rank interval. See
    * Sketches.quantileSketchMerge.
    */
  private def qQuantileMerge(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.quantileSketchMerge(
      t(s, dir, "documents"), "doc_id", col("n_chars"), "source")

  /** Incremental sketch maintenance on the versioned lake (q222): the
    * per-source bottom-k quantile sample follows the table — commit 1
    * seeds the sketch from the snapshot, commit 2 (adds only) updates
    * it from `vt.incremental(c1)` ALONE (the change feed, never a
    * table re-scan), and the lossless-merge law makes the maintained
    * sample EXACTLY equal a full recompute (engine-computed
    * `maintained_eq_full`, the q85/q188 maintained≡recomputed idiom;
    * deletes force recompute — the q188 additive-only caveat). Output:
    * per-source m_sample + p50/p90 estimates read from the MAINTAINED
    * sample. See Sketches.maintainQuantileSamples.
    */
  private def qSketchMaintain(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 64
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q222_skm_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "doc_id", "pre",
      numBuckets = 8)
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    def hashed(df: DataFrame): DataFrame = df.select(col("source"),
      graft.functions.md5Long(col("doc_id").cast("string")).as("h"),
      col("n_chars").cast("long").as("v"))
    val c1 = vt.upsert(docs.filter(col("doc_id") % 3 =!= 0)
      .withColumn("pre", lit(1L)))
    // the persisted sketch table: ≤ sources·k rows
    val sketch1 = graft.operators.Sketches.bottomKBySource(
      hashed(vt.snapshot), k).localCheckpoint(true)
    vt.upsert(docs.filter(col("doc_id") % 3 === 0).withColumn("pre", lit(2L)))
    val maintained = graft.operators.Sketches.maintainQuantileSamples(
      sketch1, vt.incremental(c1), "doc_id", col("n_chars"), "source", k)
      .localCheckpoint(true)
    val full = graft.operators.Sketches.bottomKBySource(hashed(vt.snapshot), k)
    val eq = maintained.groupBy(col("source"), col("h"), col("v"))
      .agg(count(lit(1)).as("_cm"))
      .join(full.groupBy(col("source"), col("h"), col("v"))
        .agg(count(lit(1)).as("_cf")), Seq("source", "h", "v"), "full_outer")
      .agg(coalesce(sum(when(coalesce(col("_cm"), lit(0L)) =!=
          coalesce(col("_cf"), lit(0L)), 1L).otherwise(0L)), lit(0L)).as("_bad"))
      .select(when(col("_bad") === 0L, 1L).otherwise(0L)
        .as("maintained_eq_full"))
    val mPer = maintained.groupBy(col("source")).agg(count(lit(1)).as("m_sample"))
    val ws = Window.partitionBy(col("source")).orderBy(col("v"), col("h"))
    maintained.withColumn("_srn", row_number().over(ws)).join(mPer, "source")
      .groupBy(col("source"), col("m_sample"))
      .agg(
        max(when(col("_srn") === expr("(50 * m_sample + 99) DIV 100"),
          col("v"))).as("est_p50"),
        max(when(col("_srn") === expr("(90 * m_sample + 99) DIV 100"),
          col("v"))).as("est_p90"))
      .crossJoin(broadcast(eq)) // 1-row engine-computed equality flag
      .select(col("source"), col("m_sample"), col("est_p50"), col("est_p90"),
        col("maintained_eq_full"))
      .orderBy(col("source"))
  }

  /** Sketch-thresholded quantile gate (q223): keep docs whose n_chars
    * sits within the [p10, p90] of their source, thresholds estimated
    * from the per-source bottom-k sample instead of approx_percentile —
    * reproducible on any engine (the oracle re-derives the identical
    * thresholds), scan-speed gate. See Sampling.sketchQuantileGate.
    */
  private def qSketchGate(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.sketchQuantileGate(t(s, dir, "documents"),
        col("doc_id"), col("n_chars"), col("source"), 10, 90)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pass"),
        min(col("n_chars")).cast("long").as("min_kept"),
        max(col("n_chars")).cast("long").as("max_kept"))
      .orderBy(col("source"))

  /** KMV pairwise source Jaccard (q224): all |sources|² content
    * similarities answered from the per-source k-min gram sketches
    * alone (Broder's min-wise estimator on bottom-k sets), with the
    * exact Jaccard from one distinct-gram self-join as the audit leg
    * and an all-integer 3σ band flag computed on BOTH engines. The
    * sketch family's fourth duty: distinct (q215), frequency (q217),
    * quantiles (q221), similarity (q224). See
    * Sketches.kmvPairwiseJaccard.
    */
  private def qKmvJaccard(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvPairwiseJaccard(
      t(s, dir, "documents"), "text", "source")

  /** Sparse pairwise Jaccard (q226): q224's many-sources cure — the
    * pair frontier from the k-set self-join (only pairs that can score
    * nonzero materialize; disjoint pairs never build a union). Dense
    * q224 stays pinned as the full-matrix baseline, the q212/q216
    * pairing. See Sketches.kmvPairwiseJaccard(candidatesOnly = true).
    */
  private def qKmvJaccardSparse(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvPairwiseJaccard(
      t(s, dir, "documents"), "text", "source", candidatesOnly = true)

  /** Compressed-frame decode through the REAL codec seam (q227): each
    * doc becomes a REAL MP4 whose 4 samples are REAL deflate-compressed
    * 8×8 PNG frames (pixels md5-derived), the engine demuxes the
    * container (the q211 stco/stsc/stsz walk), decodes every frame
    * through FrameDecoder.ImageIo — javax.imageio running an actual
    * compressed-image codec, not the test fake — and per-frame aHashes
    * the decoded raster. PNG is lossless, so the oracle re-derives
    * each frame's pixels arithmetically from the md5 chain and the
    * hash gate covers synth → PNG encode → container mux → demux →
    * PNG decode → luma → aHash end to end. The one remaining stub in
    * the multimodal tier (compressed VIDEO codecs, e.g. H.264) stays
    * behind the same seam; this row proves the seam carries a real
    * codec with zero operator changes.
    * See Multimodal.{synthGrayFrames,synthMp4FromBytes,frameAHashesWith},
    * FrameDecoder.ImageIo.
    */
  /** The q227 synthesized-MP4 corpus (4 real PNG frames per doc inside
    * a real container), cached per (session, dir) — scenery for q227
    * (which times demux → REAL PNG decode → aHash) and the input to
    * the q228 frame-hash fixture. Deterministic in dir.
    */
  private def mp4Fixture(s: SparkSession, dir: String): DataFrame =
    fixtureFor(s, dir, "q227mp4") {
      val grays = let(md5(coalesce(col("text"), lit(""))), seed =>
        transform(sequence(lit(0), lit(3)), f =>
          transform(sequence(lit(0), lit(63)), i =>
            md5Long(concat(seed, lit("|f"), f.cast("string"), lit("|"),
              i.cast("string"))).bitwiseAND(lit(255L)))))
      graft.operators.Multimodal.synthMp4FromBytes(
        graft.operators.Multimodal.synthGrayFrames(
          t(s, dir, "documents").select(col("doc_id"), grays.as("_grays")),
          "_grays", 8, 8),
        "_frames", timescale = 1000, frameDurTicks = 40,
        chunkFrames = 3, interChunkPad = 8)
        .select(col("doc_id"), col("payload"))
        .localCheckpoint(true)
    }

  private def qFrameDecode(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.frameAHashesWith(mp4Fixture(s, dir),
        graft.operators.FrameDecoder.ImageIo, "payload", "doc_id")
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        col("frame_hash"))
      .orderBy(col("doc_id"), col("frame_no"))

  /** Video-level near-dup candidates (q228): each video is its SET of
    * real-codec per-frame aHashes (the q227 chain — demuxed from the
    * real MP4, decoded by FrameDecoder.ImageIo); videos pair when any
    * frame collides in a banded bucket, scored by distinct shared
    * (band, bucket) cells. Mask width re-derived from count(*)·4
    * frames on BOTH engines (the q82/q219 adaptive law), so expected
    * bucket population — and with it the candidate frontier — stays
    * constant as the corpus grows. The decoded hash table is a cached
    * fixture (decode cost regresses on q227; this row times banding +
    * pairing — the q206/q216 split discipline).
    * See Dedup.fingerprintOverlapPairs.
    */
  private def qVideoNearDup(s: SparkSession, dir: String): DataFrame = {
    val (bits, _) = graft.operators.Dedup.suggestSimhashParams(
      t(s, dir, "documents").count() * 4, bands = 4)
    val maskBits = bits / 4
    val fh = fixtureFor(s, dir, "q228framehashes") {
      graft.operators.Multimodal.frameAHashesWith(mp4Fixture(s, dir),
          graft.operators.FrameDecoder.ImageIo, "payload", "doc_id")
        .select(col("doc_id"), col("frame_hash"))
        .localCheckpoint(true)
    }
    graft.operators.Dedup.fingerprintOverlapPairs(fh, "doc_id", "frame_hash",
        bands = 4, strideBits = 16, maskBits = maskBits)
      .withColumn("mask_bits", lit(maskBits.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** JL cosine-preservation sweep (q230): the error a signed random
    * projection (Achlioptas ±1, training-free) costs at 8/16/32
    * projected dims, measured on the adjacent-id pair stream against
    * exact cosine — the dimensionality-lever calibration table next to
    * PQ's q179 and the sign-bucket audits (q23/q219). One projection
    * pass serves all three widths (prefix slices ARE the narrower
    * projections); everything downstream is narrow + bounded.
    * See Similarity.{rpSigns,rpProjExpr,rpErrorSweep}.
    */
  private def qRpErrorSweep(s: SparkSession, dir: String): DataFrame =
    Similarity.rpErrorSweep(embCorpus(s, dir), Seq(8, 16, 32), dim = 64)

  /** RP-compressed shortlist + exact refine, recall-audited (q231):
    * the q167 refine discipline on the dimensionality lever — 16
    * projected integer dims (4× less arithmetic, 4× less index IO than
    * 64 floats) shortlist 32 candidates per query, true cosine
    * re-ranks the top 3, and each answer carries an `in_exact` flag
    * against the brute-force top 3 so the compression's recall is
    * hash-gated in the same row (the q169/q191 audit idiom).
    * See Similarity.{rpRefineTopK,rpScoreFixed}.
    */
  private def qRpRefine(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val queries = corpus.filter(col("id") % 200 === 0 && col("id") < 2000)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("_hit"))
    Similarity.rpRefineTopK(corpus, queries, k = 3, kShort = 32,
        outDims = 16, dim = 64)
      .join(exact, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("score_1e6"), coalesce(col("_hit"), lit(0L)).as("in_exact"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding health report (q235): the data-quality screen the
    * vector pipeline reads before any ANN/dedup pass commits — per
    * label, NULL/wrong-width/NaN/zero-norm counts plus the fixed-point
    * norm² envelope of the healthy rows (an envelope far from 1e12
    * flags an unnormalized or truncated batch). One scan, |labels|
    * rows; DECIMAL(38,0) mean (BIGINT norm² sums overflow past ~9M
    * unit vectors). See Diagnostics.embeddingHealth.
    */
  private def qEmbeddingHealth(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.embeddingHealth(
        t(s, dir, "embeddings"), col("label").cast("long"),
        col("embedding"), dim = 64)
      .withColumnRenamed("stratum", "label")
      .orderBy(col("label"))

  /** Per-stratum weighted sample (q234): prioritySample's scale form
    * for mixture construction — 8 docs per source by the SAME md5 DIV
    * n_chars priority as q150/q233 (shared definition), cut by the
    * bounded-state TopKPairs aggregate so only |sources|·8 pairs cross
    * the shuffle with map-side combine, never a per-stratum sort
    * window or a global TakeOrdered.
    * See Sampling.prioritySampleByStratum.
    */
  private def qPrioritySampleByStratum(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.prioritySampleByStratum(
        t(s, dir, "documents"), col("source"), col("doc_id"),
        col("n_chars"), k = 8)
      .select(col("stratum").as("source"), col("rank"),
        col("id").as("doc_id"), col("prio"))
      .orderBy(col("source"), col("rank"))

  /** Maintained weighted sample (q233): the q222 maintenance
    * discipline applied to the weighted (priority-sampling) lever. The
    * corpus arrives as two batches (doc_id parity); the k=64 priority
    * sample is cut on batch 1, then MAINTAINED with batch 2 ALONE —
    * k + |feed| rows re-cut, never a corpus re-scan — and compared
    * row-for-row against the direct sample of the whole corpus.
    * Deterministic priorities make maintained ≡ full an IDENTITY (not
    * an approximation), and the flag is computed on both engines.
    * See Sampling.{prioritySample,maintainPrioritySample}.
    */
  private def qMaintainPrioritySample(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val prior = graft.operators.Sampling.prioritySample(
        docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("n_chars"), k)
      .localCheckpoint(true) // the persisted k-set: what a real feed reads
    val maintained = graft.operators.Sampling.maintainPrioritySample(
        prior, docs.filter(col("doc_id") % 2 =!= 0),
        col("doc_id"), col("n_chars"), k)
      .localCheckpoint(true)
    val full = graft.operators.Sampling.prioritySample(
      docs, col("doc_id"), col("n_chars"), k)
    val eq = maintained.groupBy(col("id"), col("prio"), col("rank"))
      .agg(count(lit(1)).as("_cm"))
      .join(full.groupBy(col("id"), col("prio"), col("rank"))
        .agg(count(lit(1)).as("_cf")), Seq("id", "prio", "rank"), "full_outer")
      .agg(coalesce(sum(when(coalesce(col("_cm"), lit(0L)) =!=
          coalesce(col("_cf"), lit(0L)), 1L).otherwise(0L)), lit(0L)).as("_bad"))
      .select(when(col("_bad") === 0L, 1L).otherwise(0L)
        .as("maintained_eq_full"))
    maintained.crossJoin(broadcast(eq)) // 1-row engine-computed flag
      .select(col("id"), col("weight"), col("prio"), col("rank"),
        col("maintained_eq_full"))
      .orderBy(col("rank"))
  }

  /** Boundary-stitch fragment detection (q232): every document is
    * split into two fragments overlapping by exactly w=3 tokens — the
    * seam a pagination/chunked-export/recrawl pipeline leaves — and
    * the operator must recover each (first-half → second-half) stitch
    * from the seam alone, plus whatever cross-document seams
    * duplicated texts share. No dedup family can see these pairs (the
    * fragments share only 3 tokens); fragmenting is a narrow fixture
    * expression, detection is ONE tail-key = head-key equi-join.
    * See Dedup.boundaryOverlapPairs.
    */
  /** The q232/q236 fragment corpus: every ≥8-token document split into
    * two fragments overlapping by exactly 3 tokens. Shared by the
    * detection row and the reassembly row so the two cannot drift.
    */
  private[graft] def stitchFrags(s: SparkSession, dir: String): DataFrame =
    stitchFragsAt(s, dir, 3)

  /** The seam-width law's ONE derivation for this corpus — vocab from
    * one distinct-token aggregate, nKeys = the fragment corpus's
    * head+tail key population (4·docs) — shared by q253, q261, and
    * ScaleProbe's seamwidth leg so the three cannot measure different
    * laws while their oracles assume one (code-review finding).
    */
  private[graft] def seamWidthLawFor(s: SparkSession, dir: String)
      : graft.operators.Dedup.SeamWidthLaw =
    seamWidthLawOf(tokenizedDocs(s, dir))

  /** The corpus tokenized ONCE, eagerly pinned (VERDICT r14 item 4):
    * the stitch-law rows q253/q261 each feed THREE tokenization
    * consumers — the width law's vocab scan, the fragment fixture
    * build, and the seam detector — and the r14 slope study measured
    * detection as tokenization-bound, so paying the split per stage
    * triples the dominant term. One localCheckpoint materializes the
    * token arrays; law, fixture, and detector all read the pinned
    * blocks. Hash-neutral by construction ([[graft.functions.tokens]]
    * splits on whitespace and drops empties, so re-tokenizing a
    * space-joined token array is the identity — the *Tok detector
    * variants skip that identity round-trip).
    */
  private[graft] def tokenizedDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), tokens(lower(col("text"))).as("_tk"))
      .localCheckpoint(true)

  /** [[seamWidthLawFor]] from the shared tokenized projection. */
  private[graft] def seamWidthLawOf(tok: DataFrame)
      : graft.operators.Dedup.SeamWidthLaw = {
    val vocab = tok.select(explode(col("_tk")).as("_t"))
      .agg(countDistinct(col("_t"))).collect()(0).getLong(0)
    graft.operators.Dedup.suggestSeamWidth(
      vocabSize = vocab, nKeys = 4L * tok.count())
  }

  /** [[stitchFrags]] at an arbitrary seam width — q253 builds the
    * fixture at the width [[graft.operators.Dedup.suggestSeamWidth]]
    * picks (a fragment pair overlapping exactly w tokens is only
    * detectable at width w, so the fixture must follow the law).
    */
  private[graft] def stitchFragsAt(s: SparkSession, dir: String,
      w: Int): DataFrame =
    stitchFragTokensOf(
        t(s, dir, "documents")
          .select(col("doc_id"), tokens(lower(col("text"))).as("_tk")), w)
      .select(col("fid"), array_join(col("_tk"), " ").as("text"))

  /** [[stitchFragsAt]] kept in TOKEN-ARRAY form — the fragment corpus
    * as (fid, _tk) slices of the shared tokenized projection, never
    * re-joined to strings, for the *Tok detector path (q253/q261). */
  private[graft] def stitchFragTokensOf(tok: DataFrame, w: Int): DataFrame = {
    val staged = tok
      .filter(size(col("_tk")) >= 2 * w + 2)
      .withColumn("_n", size(col("_tk")))
      .withColumn("_m", expr("_n DIV 2"))
    staged.select(explode(array(
        struct((col("doc_id") * 2).as("fid"),
          slice(col("_tk"), lit(1), col("_m") + w).as("_tk2")),
        struct((col("doc_id") * 2 + 1).as("fid"),
          slice(col("_tk"), col("_m") + 1, col("_n") - col("_m"))
            .as("_tk2")))).as("f"))
      .select(col("f.fid").as("fid"), col("f._tk2").as("_tk"))
  }

  private def qStitchPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.boundaryOverlapPairs(
        stitchFrags(s, dir), "fid", "text", 3)
      .orderBy(col("id_a"), col("id_b"))

  /** Stitch hot-seam cap law (q242): q232's detector routed through
    * boundaryOverlapPairsAuto — maxKeyDf derived from the seam-key df
    * histogram (at most 0.1% of keys droppable, floor 4) instead of
    * caller-supplied (VERDICT r12 item 3), the law columns appended so
    * the selection is hash-gated. The oracle re-derives the histogram,
    * the order-statistic cap, and the per-side hot-key drops in SQL.
    * At battery data organic seam dfs sit at 1–2, so the law caps
    * nothing and the pair set equals q232's; the gen legs in
    * BASELINE.md measure the capped templated-seam regime.
    * See Dedup.suggestStitchMaxKeyDf.
    */
  private def qStitchDfLaw(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.boundaryOverlapPairsAuto(
        stitchFrags(s, dir), "fid", "text", 3)
      .orderBy(col("id_a"), col("id_b"))

  /** Seam-width law (q253): the VOCAB-SATURATION lever (VERDICT r13
    * item 2) — q232's regime where a tiny vocabulary makes every seam
    * key's df grow with the corpus (broad organic growth the q242
    * df-cap law correctly refuses to cut). suggestSeamWidth picks the
    * smallest w whose key space vocab^w keeps expected seam-key df ≤ 2
    * (vocab from one distinct-token aggregate, nKeys = the fragment
    * corpus's head+tail key population = 4·docs), the FIXTURE is built
    * at that width (a pair overlapping exactly w tokens is only
    * detectable at w), and detection runs at the law's w. The law
    * columns ride every pair row so the selection — exact saturating
    * integer power loop, replayed in SQL via a recursive CTE with the
    * same Long.Max cap — is hash-gated along with the pair set. The
    * gen-sf10 slope legs in BASELINE.md measure the collapse this
    * width buys against the fixed-w=3 q232 baseline.
    * See Dedup.suggestSeamWidth.
    */
  private def qSeamWidthLaw(s: SparkSession, dir: String): DataFrame = {
    val tok = tokenizedDocs(s, dir)
    val law = seamWidthLawOf(tok)
    graft.operators.Dedup.boundaryOverlapPairsTok(
        stitchFragTokensOf(tok, law.w), "fid", "_tk", law.w)
      .withColumn("vocab_size", lit(law.vocabSize))
      .withColumn("n_keys", lit(law.nKeys))
      .withColumn("needed_key_space", lit(law.neededKeySpace))
      .withColumn("seam_w", lit(law.w.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Composed stitch laws (q261): the two levers the q242/q253
    * scaladocs claim COMPOSE, exercised together and hash-gated as
    * one selection — [[graft.operators.Dedup.suggestSeamWidth]] picks
    * the width for the corpus's vocab-saturation regime (organic df
    * back to ~2), then the detection runs through
    * boundaryOverlapPairsAuto so the df-cap order-statistic valve
    * guards whatever TEMPLATE spikes survive at that width. At
    * battery data the valve is inert at the law width (organic dfs
    * 1–2, the q242 precedent) so the pair set equals q253's — the row
    * pins the composition's selection arithmetic: the oracle replays
    * the saturating-power width loop AND the df histogram/cum/cap
    * walk over the law-width keys in one SQL body, and every law
    * column of both levers rides the rows (the df-law's n_keys is the
    * seam-key population at width w; the width-law's inputs are
    * vocab_size/needed_key_space/seam_w — distinct audit columns, no
    * overlap). Collision assumption shared with the q242 precedent
    * (ADVICE r14): the engine's df histogram/cap/valve operate on
    * md5Long seam-key hashes while the oracle aggregates raw key
    * strings — an md5Long collision would merge two keys' dfs on the
    * engine side only. 64-bit hash over ≤ millions of battery keys:
    * astronomically unlikely, and the pair-forming join re-checks the
    * exact token sequence either way (the q45 verify discipline).
    */
  private def qSeamLawsComposed(s: SparkSession, dir: String): DataFrame = {
    val tok = tokenizedDocs(s, dir)
    val law = seamWidthLawOf(tok)
    graft.operators.Dedup.boundaryOverlapPairsAutoTok(
        stitchFragTokensOf(tok, law.w), "fid", "_tk", law.w)
      .withColumn("vocab_size", lit(law.vocabSize))
      .withColumn("needed_key_space", lit(law.neededKeySpace))
      .withColumn("seam_w", lit(law.w.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Stitch detection on ingest (q239): q232's seam detector as the
    * fifth dedup-on-ingest member — the fragment corpus arrives as two
    * batches (first halves, then second halves); each ingest checks
    * within itself and BOTH directions against the boundary index
    * (head/tail w-token keys per admitted fragment — never the text),
    * flags its stitch pairs, and appends. The two-ingest union must
    * equal the batch operator on the whole corpus, each pair found
    * exactly once at the ingest where its later side arrived — the
    * oracle re-derives the pair set AND the ingest attribution from
    * fid parity. See IncrementalDedup.detectStitches.
    */
  private def qStitchIngest(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q239_sti_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "fid", "batch_no",
      numBuckets = 8)
    val frags = stitchFrags(s, dir)
    val p1 = graft.operators.IncrementalDedup.detectStitches(
        vt, frags.filter(col("fid") % 2 === 0), "fid", "text", 3, 1L)
      .withColumn("ingest_no", lit(1L))
    val p2 = graft.operators.IncrementalDedup.detectStitches(
        vt, frags.filter(col("fid") % 2 =!= 0), "fid", "text", 3, 2L)
      .withColumn("ingest_no", lit(2L))
    p1.unionByName(p2)
      .select(col("ingest_no"), col("id_a"), col("id_b"), col("overlap"))
      .orderBy(col("ingest_no"), col("id_a"), col("id_b"))
  }

  /** Stitch reassembly (q236): the cut step after q232's detection —
    * unambiguous fragment pairs merge back into one document, seam
    * kept once, and every reassembled row is hash-gated against the
    * ORIGINAL document it came from (`matches_original` computed on
    * both engines: reassembly of an even-id first-half must reproduce
    * the source text token-for-token; pairs born of cross-document
    * boilerplate seams score 0 or are excluded by the degree filter).
    * The detect → filter-unambiguous → rebuild → equals-original chain
    * is the whole fragment story in one gated row.
    * See Dedup.stitchReassemble.
    */
  private def qStitchReassemble(s: SparkSession, dir: String): DataFrame = {
    val rebuilt = graft.operators.Dedup.stitchReassemble(
      stitchFrags(s, dir), "fid", "text", 3)
    val orig = t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(tokens(lower(col("text"))), " ").as("_orig"))
    rebuilt.withColumn("doc_id", expr("id_a DIV 2"))
      .join(orig, Seq("doc_id"))
      .select(col("doc_id"), col("id_a"), col("id_b"),
        when(col("text") === col("_orig"), 1L).otherwise(0L)
          .as("matches_original"))
      .orderBy(col("doc_id"), col("id_a"), col("id_b"))
  }

  /** AMS join-size estimate (q240): |events ⋈ events| on user_id — the
    * self-join whose size is the skew question — estimated from one
    * m=32-sketch aggregate pass per side (sign_j = bit j of ONE
    * md5Long per row; estimate = exact lower median of the 32
    * X_A·X_B products), next to the exact Σ fA·fB companion and the
    * engine-computed AMS variance-bound flag (est−exact)² ≤ 18·F2·F2.
    * The sketch family's fifth duty: sizing a join without running
    * it. See Sketches.amsJoinSizeReport.
    */
  private def qAmsJoinSize(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"))
    graft.operators.Sketches.amsJoinSizeReport(
      ev, col("user_id"), ev, col("user_id"))
  }

  /** AMS m-selection law audit (q241): the q240 report sized by
    * suggestAmsM for a 50% relative-error target — m = ⌈2/ε²⌉ = 8
    * instead of the default 32 — with the law columns appended so the
    * selection is itself hash-gated (the q229 idiom; the oracle
    * re-derives m from the target in SQL integer math and replays the
    * 8-row sketch). See Sketches.suggestAmsM for the variance
    * derivation and the 60-bit structural cap.
    */
  private def qAmsMLaw(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"))
    graft.operators.Sketches.amsJoinSizeReportAuto(
      ev, col("user_id"), ev, col("user_id"), targetRelErrPpm = 500000L)
  }

  /** AMS estimate-only path (q243): the production sizing call —
    * (n_a, n_b, est_join) from ONE aggregate pass per side, no
    * key-level state. This is the call a planner makes to size a join
    * BEFORE running it; the q240 report is its validation harness
    * (exact + F2 audit legs, bounded by distinct keys). Same events
    * self-join and m as q240, so est_join pins to the report's value.
    * FLAT in distinct keys by construction — slope legs in BASELINE
    * round-13.
    */
  private def qAmsEstimate(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"))
    graft.operators.Sketches.amsJoinEstimate(
      ev, col("user_id"), ev, col("user_id"))
  }

  /** Bloom semi-join pruning audit (q245): the runtime-filter
    * technique — urgent orders' keys hashed into a portable m-bit
    * Bloom (m from suggestBloomBits, k = 5 md5Long rows), lineitem
    * pruned by a pure map-side literal-array test (the fact side never
    * shuffles or joins — plan-pinned), with the exactly-counted
    * false-positive and no-false-negative audit both engines replay
    * bit-identically. See Sketches.bloomPrune/bloomPruneAudit.
    */
  private def qBloomPrune(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.bloomPruneAudit(
      t(s, dir, "lineitem").select(col("l_orderkey")), col("l_orderkey"),
      t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")), col("o_orderkey"))

  /** KMV key-overlap report (q251): the planner trilogy's distinct-key
    * read (AMS row-product size q240, Bloom prune q245, THIS —
    * "how many distinct keys do these relations share") — customer
    * keys vs orders' customer keys from one bottom-256 md5 sketch per
    * side; Broder J on the union k-set × the q215 union estimate gives
    * the intersection, exact audits ride one distinct-key equi-join,
    * the 3σ flag computed on both engines. See Sketches.kmvKeyOverlap.
    */
  private def qKmvKeyOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvKeyOverlap(
      t(s, dir, "customer"), col("c_custkey"),
      t(s, dir, "orders"), col("o_custkey"))

  /** KMV key-overlap, estimate-only (q252): the production sizing call
    * — q251's sketch legs alone (two column-pruned distinct +
    * TakeOrdered(k) passes, nothing bounded by distinct keys), the
    * q240→q243 split applied to the distinct-key read. Same inputs as
    * q251, so every estimate column pins to the report's values.
    */
  private def qKmvKeyOverlapEst(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvKeyOverlapEstimate(
      t(s, dir, "customer"), col("c_custkey"),
      t(s, dir, "orders"), col("o_custkey"))

  /** Bloom prune, relation form (q247): the past-2³⁰-bits regime of
    * q245 — identical suggestBloomBits m and md5 double-hash probes,
    * but the words live as a (word, bits) RELATION joined on word
    * index instead of a broadcast literal, so m is unbounded (the
    * ≳10⁸-dim-key scale point; the literal form requires it out).
    * Survivors aggregate per returnflag in floor-cent quantities, so
    * the row hash-gates the pruned SET through the relation path;
    * OperatorsSpec pins relation ≡ literal on the same bits. See
    * Sketches.bloomPruneRelation.
    */
  private def qBloomPruneRel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.bloomPruneRelation(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"),
        col("l_returnflag")),
      col("l_orderkey"),
      t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")), col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_keys"),
        sum(floor(col("l_quantity") * 100).cast("long")).as("qty_c"))
      .orderBy(col("l_returnflag"))

  /** TPC-H Q21 shape (q248): suppliers who kept orders waiting — the
    * sole LATE shipper (shipdate > orderdate + 60 days) on a
    * multi-supplier completed order, numwait counting their late
    * lines. The reference formulation is EXISTS + NOT EXISTS — two
    * extra fact self-joins (a semi and an anti, each a full lineitem
    * shuffle); the engine REWRITES it as a TWO-LEVEL aggregate:
    * per-(order, supplier) late-line counts first (the one wide
    * exchange, map-side combined), then per-order over the distinct
    * pairs only (supplier count, late-supplier count, the sole late
    * supplier via null-skipping max) — deliberately NOT a single
    * groupBy with two countDistincts, whose Expand triples the rows
    * entering the wide exchange (measured slower than the naive form
    * at sf0.1: 4.6 s vs 2.4 s; the two-level form wins — BASELINE
    * round-13 Q21 study). Survivors (n_supp ≥ 2 ∧ n_late_supp = 1)
    * regroup by the sole supplier; supplier dim broadcasts at the
    * end. The DuckDB oracle runs the textbook EXISTS/NOT-EXISTS form,
    * so the rewrite's equivalence is itself hash-gated. Plan-pinned:
    * exactly one lineitem scan, no semi/anti join, no Expand,
    * TakeOrdered top-100.
    *
    * ROUTING (ADVICE r13): the rewrite's win is a PAST-BROADCASTABILITY
    * property. Below ~10M fact rows AQE broadcasts both textbook
    * self-join sides and the naive EXISTS/NOT-EXISTS form is measured
    * CHEAPER (1.49 s naive vs 1.95 s rewrite at sf0.1; 4.43 vs 5.75 at
    * gen-sf1 — BASELINE round-13 Q21 study); past broadcastability each
    * EXISTS leg becomes its own fact-wide shuffle and the one-exchange
    * rewrite wins. Users below the threshold should route on fact size,
    * the same regime rule as bloomPrune literal-vs-relation; the
    * battery pins the rewrite because the 100-TB regime is the design
    * point.
    */
  private def qWaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    // ONE explicit fact-wide exchange on l_orderkey: HashPartitioning(k)
    // satisfies ClusteredDistribution for BOTH downstream groupBys
    // ((k, s) and (k)), so the two aggregate levels run exchange-free
    // on top of it — without this, the broadcast orders join leaves the
    // fact unpartitioned and each groupBy pays its own fact-wide
    // shuffle (measured: 2 exchanges → 1, gen-sf1 plan dump)
    val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("l_shipdate") > col("o_orderdate") +
        expr("INTERVAL 60 DAYS"), 1L).otherwise(0L)).as("_late_lines"))
    val soleLate = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("_ns"),
        sum(when(col("_late_lines") > 0L, 1L).otherwise(0L)).as("_nl"),
        max(when(col("_late_lines") > 0L, col("l_suppkey"))).as("_supp"),
        sum(col("_late_lines")).as("_order_late_lines"))
      .filter(col("_ns") >= 2L && col("_nl") === 1L)
    soleLate.groupBy(col("_supp"))
      .agg(sum(col("_order_late_lines")).as("numwait"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q17 shape (q257): small-quantity-order revenue — the
    * correlated SCALAR-AVG member of the planner-rewrite set: revenue
    * locked up in orders whose quantity sits below 20% of that part's
    * average. The textbook form re-executes a correlated
    * per-partkey avg subquery for every brand-filtered line; the
    * engine folds the threshold into the SAME pass as the filter via
    * a partkey window over the broadcast-part-pruned fact — ONE fact
    * scan, ONE exchange (the window's), no per-part re-execution, no
    * join-back of a separate aggregate. The 20%-of-avg predicate is
    * EXACT integer arithmetic (5·qty_c·n < sum_qty_c ⟺ qty <
    * 0.2·avg), so both engines replay it without float drift; output
    * is floor-cents of sum(price)/7 (the Q17 yearly convention). The
    * DuckDB oracle runs the textbook correlated-subquery form
    * verbatim, hash-gating the decorrelation. Note the window's avg
    * is over the part's BRAND-FILTERED lines — identical to the
    * textbook's all-lines avg because partkey determines brand, a
    * fact the rewrite exploits to avoid a second unfiltered scan.
    * Plan-pinned (PlanQualitySpec): one lineitem scan, brand filter
    * pushed to the part scan, part side broadcast.
    */
  private def qSmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val brandParts = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        floor(col("l_quantity") * 100).cast("long").as("_qc"),
        floor(col("l_extendedprice") * 100).cast("long").as("_pc"))
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val byPart = Window.partitionBy(col("l_partkey"))
    l.withColumn("_sq", sum(col("_qc")).over(byPart))
      .withColumn("_n", count(lit(1)).over(byPart))
      .filter(col("_qc") * col("_n") * 5 < col("_sq"))
      .agg(coalesce(sum(col("_pc")), lit(0L)).as("_t"))
      .select(expr("_t DIV 7").as("avg_yearly_c"))
  }

  /** TPC-H Q22 shape (q256): dormant wealthy customers — the
    * GLOBAL-SCALAR + ANTI-JOIN member of the planner-rewrite set:
    * customers whose balance exceeds the positive-balance average and
    * who placed no order after the cutoff, counted per nation group.
    * (The testdata has no c_phone and every customer has SOME order,
    * so the twin keeps Q22's exact shape with nationkey%5 standing in
    * for the phone prefix and "no RECENT order" for "no order" —
    * cutoff 2000-09-01 keeps the anti-join's textbook selectivity.)
    * The scalar threshold is ONE bounded aggregate broadcast to the
    * customer scan (bal_c·n_pos > sum_pos_c — exact integers, no
    * float average), and the NOT EXISTS is a left-anti against the
    * date-pruned orders projection: at scale the anti-join shuffles
    * customer keys against a fact slice the scan already cut to the
    * window, and AQE broadcasts it whenever the window is short. The
    * oracle runs the textbook correlated scalar-subquery +
    * NOT-EXISTS form verbatim.
    */
  private def qDormantCustomers(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2000-09-01").cast("timestamp")
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("long").as("_bc"))
    val posAvg = cust.filter(col("_bc") > 0L)
      .agg(sum(col("_bc")).as("_s"), count(lit(1)).as("_n"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= cut).select(col("o_custkey"))
    cust.crossJoin(broadcast(posAvg)) // 1-row scalar, broadcast by design
      .filter(col("_bc") * col("_n") > col("_s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 5).cast("long").as("cgrp"))
      .agg(count(lit(1)).as("n_cust"), sum(col("_bc")).as("bal_c"))
      .orderBy(col("cgrp"))
  }

  /** TPC-H Q15 shape (q258): top-revenue supplier — the VIEW +
    * GLOBAL-SCALAR-MAX member of the planner-rewrite set: quarterly
    * per-supplier revenue, keep the supplier(s) achieving the maximum.
    * The textbook form materializes a revenue view and re-reads it
    * under a scalar max subquery; the engine states both sides over
    * the SAME aggregate subtree and lets Catalyst's ReuseExchange
    * evaluate the scan + revenue exchange ONCE — the 1-row max then
    * broadcasts back onto the aggregate's own output (plan-pinned:
    * one lineitem scan, a ReusedExchange node, no shuffle join). The
    * date cut pushes to the scan; revenue is floor-cents per line
    * (the q244 convention) so the max-equality is exact integer
    * arithmetic on both engines — a float-revenue twin would make
    * "equals the max" engine-dependent.
    */
  private def qTopSupplier(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val rev = t(s, dir, "lineitem")
      // the explicit key not-null mirrors what the supplier join infers
      // on the rows branch, so BOTH references to this aggregate
      // canonicalize identically and the exchange is reused (without
      // it the scans differ by one inferred IsNotNull and AQE plans
      // the lineitem scan twice — measured, see the plan pin)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_suppkey").isNotNull)
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long").as("_rc"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("_rc")).as("total_revenue_c"))
    rev.crossJoin(broadcast(rev.agg(max(col("total_revenue_c")).as("_mx"))))
      .filter(col("total_revenue_c") === col("_mx"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_c"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q2 shape (q259): min-cost supplier per part — the
    * PER-GROUP correlated-MIN member of the planner-rewrite set:
    * among suppliers offering a size-15 part, keep those matching
    * that part's minimum supply cost. partsupp is the q254 derived
    * twin (distinct (partkey, suppkey) lineitem pairs with a
    * deterministic integer cost both engines replay). The textbook
    * form re-executes a correlated per-part MIN; the engine runs
    * dedup-then-window: the broadcast size-filter cuts the fact
    * first, the pair dedup exchanges on (partkey, suppkey) WITH
    * map-side partial dedup — the fact slice shuffles at ~1/line-
    * multiplicity, not full volume — and the per-part min window
    * re-exchanges only the deduped pair relation (bounded by
    * |partsupp| ≪ fact); supplier and nation dims broadcast last.
    * The q248-style single-exchange alternative (repartition on
    * partkey serving both the dedup grouping and the window) was
    * measured a WASH locally (ScaleProbe q2shape, 3.25 vs 3.23 s at
    * gen-sf10) but plans the dedup's partial aggregate ABOVE the
    * repartition, forfeiting map-side combine — at cluster scale
    * that trades a small second exchange for shuffling the fact at
    * full multiplicity, so the standard form wins where it matters.
    */
  private def qMinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val sized = t(s, dir, "part")
      .filter(col("p_size") === 15).select(col("p_partkey"))
    val pairs = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"))
      .dropDuplicates(Seq("l_partkey", "l_suppkey"))
      .withColumn("cost_c",
        (col("l_partkey") * 11 + col("l_suppkey") * 17) % 1000 + 1)
    val byPart = Window.partitionBy(col("l_partkey"))
    pairs.withColumn("_mn", min(col("cost_c")).over(byPart))
      .filter(col("cost_c") === col("_mn"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("cost_c"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** TPC-H Q11 shape (q260): important stock — the
    * FRACTION-OF-GLOBAL-SUM HAVING member that completes the
    * correlated/scalar planner-rewrite set (Q2/Q3/Q15/Q17/Q18/Q20/
    * Q21/Q22 + this): per-part stock value held by one nation's
    * suppliers, keeping parts whose value exceeds 0.1% of that
    * nation's total. partsupp is the shared derived twin (distinct
    * lineitem pairs; value = the q259 cost × the q254 availqty, both
    * deterministic integer functions). The textbook form computes the
    * global total in a scalar subquery over a SECOND partsupp pass;
    * the engine derives BOTH the groups and the total from one
    * aggregate subtree — nation-filtered pair dedup (map-side
    * partial, the q259 shuffle argument) then the per-part sum over
    * the deduped relation, the 1-row total broadcasts back onto the
    * groups, and AQE's exchange reuse evaluates the fact scan +
    * dedup exchange once (the q258 runtime-reuse pattern). The
    * 0.1% threshold is exact integer math (value_c·1000 > total_c).
    */
  private def qImportantStock(s: SparkSession, dir: String): DataFrame = {
    // generator-aware constants (GenFilters): NATION_7 on driver
    // testdata (what the oracle pins), GERMANY on gen data — so the
    // ScaleProbe slope legs run this function verbatim (r14 item 6)
    val gf = graft.util.GenFilters.forDir(s, dir)
    val natSupp = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")
        .filter(col("n_name") === gf.nationName).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val grouped = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"))
      .dropDuplicates(Seq("l_partkey", "l_suppkey"))
      .withColumn("_v",
        ((col("l_partkey") * 11 + col("l_suppkey") * 17) % 1000 + 1) *
          (((col("l_partkey") * 7 + col("l_suppkey") * 13) % 50 + 1) * 100))
      .groupBy(col("l_partkey")).agg(sum(col("_v")).as("value_c"))
    grouped.crossJoin(broadcast(grouped.agg(sum(col("value_c")).as("_t"))))
      .filter(col("value_c") * 1000 > col("_t"))
      .select(col("l_partkey").as("p_partkey"), col("value_c"))
      .orderBy(col("value_c").desc, col("p_partkey"))
  }

  /** TPC-H Q13 shape (q265, VERDICT r15 item 3): customer order-count
    * DISTRIBUTION — the one planner pattern the rewrite set still
    * lacked on the OUTER side: a left-outer join whose RIGHT-side
    * predicate lives in the JOIN CONDITION (filtering orders in a
    * WHERE would silently convert the join to inner and drop the
    * zero-order customers — the null-group bucket, Q13's entire
    * point), feeding a TWO-LEVEL aggregate where count(o_orderkey)
    * counts nulls as 0 so unmatched customers land in the c_count=0
    * group. The priority cut (NOT LIKE '4-%') is the generator-
    * portable twin of the textbook comment cut — same domain in both
    * generators, so the gen slope legs run verbatim.
    *
    * Plan shape: the join shuffles both sides on custkey and the
    * first aggregate REUSES that partitioning (no exchange between
    * join and per-customer count — partial aggregation would be pure
    * overhead on unique keys); only the tiny second aggregate
    * (≤ |distinct counts| groups) re-shuffles. Outer-join
    * preservation + single-exchange-into-agg are plan-pinned.
    */
  private def qCustOrderDist(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    c.join(o, col("c_custkey") === col("o_custkey") &&
        !col("o_orderpriority").like("4-%"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q19 shape (q266, VERDICT r15 item 3): discounted revenue
    * under a DISJUNCTIVE join predicate — three OR'd conjunct bundles,
    * each constraining BOTH sides (brand+size on part, quantity on
    * lineitem), the planner pattern where a naive plan evaluates the
    * whole disjunction post-join while the plan you want pushes each
    * side's IMPLIED disjunction below the join: Catalyst's conjunctive-
    * normal-form extraction derives `(p_brand=#12 AND p_size≤5) OR
    * (p_brand=#23 AND p_size≤10) OR (p_brand=#15 AND p_size≤15)` onto
    * the part scan and the quantity-range union onto the lineitem
    * scan, so both scans cut BEFORE the join and the residual OR only
    * re-checks the cross terms. Brands #12/#23/#15 exist in BOTH
    * generators (GenFilters' portability discipline — the slope legs
    * run verbatim). Pinned in PlanQualitySpec: the brand/size
    * disjunction reaches the part scan's PushedFilters and the
    * quantity disjunction the lineitem scan's.
    */
  private def qDisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long").as("_rc"))
    val branch1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#15" &&
      col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
    l.join(p, col("l_partkey") === col("p_partkey") &&
        (branch1 || branch2 || branch3))
      .agg(coalesce(sum(col("_rc")), lit(0L)).as("revenue_c"),
        count(lit(1)).as("n_lines"))
  }

  /** Deterministic commit/receipt-offset twins for the TPC-H columns
    * the testdata lacks (`l_commitdate`/`l_receiptdate`, Q4/Q12):
    * commit offset (3k+5n) mod 31 − 15 ∈ [−15,15] days from shipdate,
    * receipt offset (k+2n) mod 14 + 1 ∈ [1,14] — pure integer
    * functions of the line keys that both engines replay exactly
    * (the q254 partsupp-twin discipline). "Received after commit"
    * (Q4's lateness, Q12's first predicate) is then just
    * `commitOff < receiptOff`; "shipped before commit" is
    * `commitOff > 0`. l_linenumber is INT and l_orderkey BIGINT in
    * both engines, so the mixed arithmetic widens identically.
    */
  private def commitOff: Column =
    (col("l_orderkey") * 3 + col("l_linenumber") * 5) % 31 - 15
  private def receiptOff: Column =
    (col("l_orderkey") + col("l_linenumber") * 2) % 14 + 1

  /** TPC-H Q4 shape (q267): order-priority checking — the EXISTS
    * member of the planner-rewrite set: the textbook form re-executes
    * a correlated EXISTS per order; the engine expresses it as ONE
    * left-SEMI join (orders quarter-filtered at the scan, lateness a
    * key-derived predicate on lineitem — see commitOff/receiptOff),
    * so each order is tested once against the late set with no
    * correlated re-execution and no row duplication before the
    * priority count. At scale both sides shuffle on orderkey (the
    * quarter cut is ~4% of orders; the late set ~72% of lineitem —
    * neither broadcastable at 100 TB) and the 5-group aggregate is
    * map-side partial. Pinned: LeftSemi in the plan, the date window
    * in the orders scan's PushedFilters.
    */
  private def qPriorityLateCount(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-07-01").cast("timestamp")
    val hi = lit("1996-10-01").cast("timestamp")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val late = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
      .filter(commitOff < receiptOff)
      .select(col("l_orderkey"))
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6 shape (q275): forecast revenue — the SCAN-ONLY member:
    * zero joins, all three predicates (date window, discount band,
    * quantity cap) land in the lineitem scan's PushedFilters
    * (plan-pinned), and the single global aggregate is map-side
    * partial into a 1-row exchange. The whole query is one
    * WholeStageCodegen span over the scan — the shape that proves the
    * engine pays a 100 TB fact table only the cut columns' I/O
    * (ReadSchema: 4 of 11 columns). Discount bounds are cast-exact:
    * both engines compare the parquet DOUBLE against the same binary64
    * literals, so the band edges (0.05/0.07 are not exactly
    * representable) select identically.
    */
  private def qForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(coalesce(sum(floor(col("l_extendedprice") * col("l_discount")
          * lit(100.0)).cast("long")), lit(0L)).as("revenue_c"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q7 shape (q268): bilateral volume shipping — the
    * SYMMETRIC-OR join-pair member: the nation pair constraint
    * `(supp=A ∧ cust=B) ∨ (supp=B ∧ cust=A)` can't push into either
    * join alone, but its IMPLIED disjunctions can: both dim sides are
    * pre-cut to the two named nations (supplier side broadcast; the
    * customer side cuts orders to ~8% BEFORE the fact join), so the
    * residual OR only re-checks the cross terms on survivors — the
    * q266 CNF-extraction discipline applied to join inputs instead of
    * scans. Join order is explicit: orders⨝customer first (both cut),
    * then the date-filtered fact against that ~8% spine — Catalyst has
    * no CBO stats here and would otherwise join the full orders table.
    * Nation names come from GenFilters (NATION_7/NATION_8 ↔
    * GERMANY/FRANCE — the textbook pair) so gen slope legs run
    * verbatim.
    */
  private def qVolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val gf = graft.util.GenFilters.forDir(s, dir)
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val n2 = t(s, dir, "nation")
      .filter(col("n_name").isin(gf.nationName, gf.nation2Name))
      .select(col("n_nationkey"), col("n_name"))
    val sn = t(s, dir, "supplier")
      .join(broadcast(n2), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cn = t(s, dir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val oc = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long").as("_rc"))
    l.join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(oc, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === gf.nationName &&
          col("cust_nation") === gf.nation2Name) ||
        (col("supp_nation") === gf.nation2Name &&
          col("cust_nation") === gf.nationName))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("_rc")).as("revenue_c"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape (q269): national market share — the widest join
    * in the battery (part, supplier, lineitem, orders, customer,
    * nation×2, region: 8 relations) and the conditional-share
    * aggregate. The engine emits BOTH integer sums (nation_vol_c /
    * total_vol_c) instead of their ratio — hash-exact across engines
    * where a double division wouldn't be. Funnel order: the ECONOMY%
    * part cut (~17%) broadcasts onto the fact first (the most
    * selective edge), the region-cut customer spine cuts orders
    * BEFORE the fact join (q268's discipline), and the supplier→
    * nation classifier — needed only for the CASE numerator, never as
    * a filter — broadcasts LAST onto the survivors. Region/nation
    * names from GenFilters (ASIA/NATION_7 ↔ EUROPE/GERMANY).
    */
  private def qMarketShare(s: SparkSession, dir: String): DataFrame = {
    val gf = graft.util.GenFilters.forDir(s, dir)
    val lo = lit("1995-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val p = t(s, dir, "part")
      .filter(col("p_type").like("ECONOMY%")).select(col("p_partkey"))
    val reg = t(s, dir, "region")
      .filter(col("r_name") === gf.regionName).select(col("r_regionkey"))
    val cnat = t(s, dir, "nation")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val c = t(s, dir, "customer")
      .join(broadcast(cnat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val sn = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val oc = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_year"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long").as("_rc"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(oc, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === gf.nationName, col("_rc"))
          .otherwise(lit(0L))).as("nation_vol_c"),
        sum(col("_rc")).as("total_vol_c"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape (q270): product-type profit — the
    * EVERY-FACT-ROW-SURVIVES join member (no date cut: the whole fact
    * joins through part/supplier/orders) with a derived-cost twin:
    * ps_supplycost has no table here, so cost-in-cents is the integer
    * spread (11p+19s) mod 900 + 100 both engines replay (q254's
    * discipline, different spread so rows don't correlate with
    * q254's availqty). Profit is exact in 10⁻⁴-dollar units:
    * floor-cents(revenue)·100 − floor(q·100)·cost_c — all-integer, no
    * double drift. The part-name cut broadcasts onto the fact first;
    * supplier→nation broadcasts next; the orders join — needed only
    * for year() — shuffles LAST on the already part-cut survivors
    * (~13%), not the full fact. Group by (nation, year): 25×7 groups,
    * map-side partial.
    */
  private def qProductProfit(s: SparkSession, dir: String): DataFrame = {
    val gf = graft.util.GenFilters.forDir(s, dir)
    val p = t(s, dir, "part")
      .filter(col("p_name").contains(gf.smallPartPrefix))
      .select(col("p_partkey"))
    val sn = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long") * 100 -
          floor(col("l_quantity") * 100).cast("long") *
            ((col("l_partkey") * 11 + col("l_suppkey") * 19) % 900 + 100))
          .as("_amt"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("_amt")).as("profit_u"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q10 shape (q271): returned-item top customers — the
    * AGGREGATE-THEN-JOIN-DIMS member: the textbook groups by all four
    * customer attributes through the join; the engine aggregates
    * revenue per custkey FIRST (one exchange over the returnflag- and
    * quarter-cut fact) and joins the customer/nation attributes onto
    * the ≤|customer| aggregate rows after — at 100 TB the wide
    * attribute columns never enter the shuffle. Equivalence holds
    * because custkey determines the other group keys (the oracle runs
    * the textbook grouped form). Top-20 by revenue with custkey
    * tie-break is TakeOrderedAndProject, never a global sort
    * (plan-pinned).
    */
  private def qReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-10-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long").as("_rc"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val agg = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("_rc")).as("revenue_c"))
    val c = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        col("n_name").as("nation"),
        floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
    agg.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("nation"),
        col("acctbal_c"), col("revenue_c"))
      .orderBy(col("revenue_c").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape (q272): shipmode priority classes — the
    * TWO-CLASS CONDITIONAL AGGREGATE member, on derived twins for the
    * three missing columns: shipmode is a key-indexed pick from the 7
    * TPC-H modes ((5k+3n) mod 7), commit/receipt via
    * commitOff/receiptOff, and the receipt-year predicate does REAL
    * date arithmetic (year(shipdate + receiptOff days) = 1996) so the
    * shape keeps Q12's date-window character rather than collapsing
    * to pure key math. All four predicates cut the fact BEFORE its
    * one join with orders (mode ~2/7, offsets ~then-half, year ~1/6);
    * the CASE split on o_orderpriority happens in the 2-group
    * aggregate, map-side partial.
    */
  private def qShipmodePriority(s: SparkSession, dir: String): DataFrame = {
    val modes = array(lit("MAIL"), lit("SHIP"), lit("AIR"), lit("RAIL"),
      lit("TRUCK"), lit("FOB"), lit("REG AIR"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .withColumn("_mode", element_at(modes,
        ((col("l_orderkey") * 5 + col("l_linenumber") * 3) % 7)
          .cast("int") + 1))
      .withColumn("_roff", receiptOff.cast("int"))
      .filter(col("_mode").isin("MAIL", "SHIP") &&
        commitOff < col("_roff") && commitOff > 0 &&
        year(date_add(to_date(col("l_shipdate")), col("_roff"))) === 1996)
      .select(col("l_orderkey"), col("_mode"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("_mode").as("shipmode"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("shipmode"))
  }

  /** TPC-H Q14 shape (q273): promotion effect — the
    * CONDITIONAL-SHARE-OVER-ONE-JOIN member: one month of the fact
    * (window pushed to the scan) against the broadcast part dim, CASE
    * on p_type LIKE 'PROMO%' — a literal that exists VERBATIM in both
    * generators (driver p_type ∈ {PROMO,…}; gen 'PROMO ANODIZED
    * STEEL' etc), so no GenFilters indirection is needed. Emits both
    * integer sums instead of the textbook's 100·promo/total double
    * (the q269 hash-exactness discipline). Single-row result,
    * map-side partial into a 1-row exchange.
    */
  private def qPromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-09-01").cast("timestamp")
    val hi = lit("1996-10-01").cast("timestamp")
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long").as("_rc"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(coalesce(sum(when(col("p_type").like("PROMO%"), col("_rc"))
          .otherwise(lit(0L))), lit(0L)).as("promo_revenue_c"),
        coalesce(sum(col("_rc")), lit(0L)).as("total_revenue_c"))
  }

  /** TPC-H Q16 shape (q274): supplier-part counts — the
    * COUNT-DISTINCT + NOT-IN member on the derived pair set: the
    * textbook counts distinct suppliers per (brand,type,size) from
    * partsupp minus a complaint set; partsupp's twin is lineitem's
    * (partkey,suppkey) pair set (q254's discipline) and the complaint
    * set is suppkey ≡ 0 (mod 7) — key-derived, nonempty in both
    * generators (supplier has no comment column to grep). The engine
    * skips the oracle's explicit DISTINCT pair materialization
    * entirely: count(DISTINCT suppkey) over the un-deduped join is
    * the same set, one exchange cheaper — the equivalence is
    * hash-gated against the textbook form. Part cut broadcasts onto
    * the fact; NOT IN is a broadcast left-ANTI join (the complaint
    * set is provably non-null, so NOT IN ≡ anti without the null
    * trap). Plan-pinned: LeftAnti present, no pair-dedup exchange.
    */
  private def qSupplierPartCnt(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#13" &&
        !col("p_type").like("MEDIUM%") &&
        col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    val complaints = t(s, dir, "supplier")
      .filter(col("s_suppkey") % 7 === 0).select(col("s_suppkey"))
    t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Bucketed co-located fact join (q276): the LAYOUT lever none of
    * the join shapes exercise — pay the orderkey shuffle ONCE at
    * write time (Layout.writeBucketedAt: 8 buckets, bucket-sorted,
    * external path under the graft_* scratch convention), then the
    * recurring lineitem⨝orders join needs NO exchange on either side:
    * the planner reads the matching bucket specs and sort-merges
    * bucket-to-bucket. This is the "same big join runs every day"
    * answer at 100 TB — the layout amortizes the shuffle across every
    * downstream run, and a bucket-key filter prunes to 1/8 of the
    * files without any index (both properties plan-pinned in
    * LayoutSpec on this exact shape, broadcast disabled so the
    * no-exchange claim is about bucketing). The battery row pays the
    * two bucketed writes per evaluation — that write cost IS the
    * operator — then aggregates the joined slice; the oracle runs the
    * same join as plain SQL over the raw parquet (layout must never
    * change results).
    */
  private def qBucketedColocated(s: SparkSession, dir: String): DataFrame = {
    val tag = ProcessHandle.current().pid() + "_" +
      Integer.toHexString(dir.hashCode)
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q276_bkt_" + tag).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        floor(col("l_quantity") * 100).cast("long").as("_qc"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val (lTbl, oTbl) = (s"graft_q276_l_$tag", s"graft_q276_o_$tag")
    // the two bucketed writes are independent tables — overlap them as
    // concurrent driver jobs (r16, guide §2.6); ~90% of the row's wall
    // IS these writes, and one write's straggler tail back-fills with
    // the other's tasks
    locally {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fL = Future(graft.operators.Layout.writeBucketedAt(l, lTbl,
        "l_orderkey", 8, s"$root/l"))
      val fO = Future(graft.operators.Layout.writeBucketedAt(o, oTbl,
        "o_orderkey", 8, s"$root/o"))
      try { Await.result(fL, Duration.Inf); Await.result(fO, Duration.Inf) }
      finally pool.shutdown()
    }
    val out = s.table(lTbl)
      .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("_qc")).as("qty_c_sum"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
      .localCheckpoint(true)
    // scratch hygiene (ADVICE r15): the catalog entries and bucketed
    // files are per-evaluation scaffolding — pin the result, then drop
    // both tables and the root so long-lived sessions don't accumulate
    // catalog entries or tmp files across battery evaluations
    s.sql(s"DROP TABLE IF EXISTS $lTbl")
    s.sql(s"DROP TABLE IF EXISTS $oTbl")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    out
  }

  /** Salted skew join (q277): the MITIGATION lever next to q73's
    * measurement — events (the skew-bearing fact q73's report exists
    * for) joins its per-user tier dim through Layout.saltedJoin: the
    * dim replicates 8× (one copy per salt), the fact scatters each
    * row to a deterministic salt (xxhash64 of the row — no rand(), so
    * retries/speculative tasks agree), and the join key becomes
    * (user_id, _salt), splitting any hot user across 8 reducers —
    * bounding the hot partition by construction, where AQE's skew
    * split is heuristic (and where AQE fires, it should be preferred:
    * the saltprobe study in BASELINE measured salting as pure
    * overhead until the hot partition's single-task time dominates
    * the job wall; the targeted saltedJoinHot form bounds that
    * overhead to the measured hot keys). The oracle runs the PLAIN join —
    * salting must never change results (each fact row matches exactly
    * one replica of its key). Per-row floor-cents before the sum keep
    * the aggregate integer-exact across engines.
    */
  /** Skew-advisory law (q278): Diagnostics.skewJoinAdvice — q73's
    * measurement and the saltprobe study's decision rule composed
    * into one oracle-replayable LAW row (the q241/q242/q253 law-row
    * discipline): per hot key, broadcast when the dim fits the 1000-
    * row cap, shuffle while the key stays within 5× the mean
    * shuffle-partition size (AQE's multiplier — the regime the study
    * measured salting as pure overhead), salt past that with
    * ceil(n/meanPart) clamped [2,64] (saltedJoinHot's parameter). On
    * battery data the branches split by SF — 150 users at sf0.01 fit
    * the cap (broadcast), 1500 at sf0.1 do not and the uniform ~100-
    * row keys sit far under 5× mean (shuffle) — and the oracle
    * replays the same integer walk either way; the third branch
    * (aqe_or_salt — AQE preferred, salt as the measured-never-winning
    * no-AQE escape hatch, see the r16 saltprobe2 study) is pinned
    * synthetically in OperatorsSpec.
    */
  private def qSkewAdvisor(s: SparkSession, dir: String): DataFrame = {
    val ev = tRaw(s, dir, "events")
    // COUNT(DISTINCT user_id) semantics to match the oracle: a NULL
    // user_id must not count as a distinct dim row (ADVICE r15 — the
    // battery generators never emit one, but the branch cap is
    // off-by-one sensitive on a null-bearing table)
    val dimRows = ev.filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    graft.operators.Diagnostics.skewJoinAdvice(ev, col("user_id"),
        dimRows, broadcastRowCap = 1000L, partitions = 32, topK = 20)
      .orderBy(col("rank"))
  }

  private def qSaltedSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = tRaw(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("_vc"))
    val tiers = ev.select(col("user_id")).distinct()
      .withColumn("tier", (col("user_id") % 5).cast("long"))
    graft.operators.Layout.saltedJoin(ev, tiers, "user_id", salt = 8)
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_events"), sum(col("_vc")).as("value_c"))
      .orderBy(col("tier"))
  }

  /** TPC-H Q20 shape (q254): suppliers with excess stock — the
    * CORRELATED NESTED-AGGREGATE member that completes the
    * planner-rewrite set next to Q3 (q244) / Q18 (q238) / Q21 (q248):
    * keep suppliers in one nation holding some 'small%' part whose
    * available stock exceeds half of that (part, supplier) pair's
    * 1996-shipped quantity. The testdata has no partsupp table, so
    * both engines derive the SAME twin: the pair set is the distinct
    * (l_partkey, l_suppkey) pairs of lineitem and ps_availqty_c is a
    * deterministic spread over the keys ((7·p + 13·s) mod 50 + 1, in
    * cents) — pure integer functions both engines replay exactly.
    *
    * The textbook formulation re-executes a correlated
    * per-(partkey, suppkey) SUM subquery inside an IN chain — per-pair
    * re-execution that a row-at-a-time engine pays ~|partsupp| times.
    * The engine REWRITES it as ONE aggregate: part-filtered lineitem
    * groups by (partkey, suppkey) with the window quantity as a
    * CONDITIONAL sum in the same pass — the pair set and the
    * correlated sum fall out of a single fact scan and a single
    * exchange, no second distinct pass, no correlated re-execution.
    * NULL semantics ride for free: a pair with no 1996 lines gets a
    * NULL window sum, and `2·avail > NULL` is false — exactly the
    * textbook subquery's empty-SUM behavior. Survivor suppkeys
    * (bounded by the supplier dim) distinct, then the supplier and
    * nation dims broadcast. The DuckDB oracle runs the textbook
    * correlated form verbatim, so the decorrelation's equivalence is
    * itself hash-gated. Plan-pinned (PlanQualitySpec): exactly ONE
    * lineitem scan, no correlated re-execution.
    */
  private def qExcessStock(s: SparkSession, dir: String): DataFrame = {
    val winLo = lit("1996-01-01").cast("timestamp")
    val winHi = lit("1997-01-01").cast("timestamp")
    // generator-aware constants (GenFilters, r14 item 6): small%/
    // NATION_7 on driver testdata (the oracle's pins), forest%/GERMANY
    // on gen data — the slope legs run this function verbatim
    val gf = graft.util.GenFilters.forDir(s, dir)
    val smallParts = t(s, dir, "part")
      .filter(col("p_name").like(gf.smallPartPrefix + "%"))
      .select(col("p_partkey"))
    // the part semi-join sits BELOW the aggregate: the name filter cuts
    // the fact before its one wide exchange, not after
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
        floor(col("l_quantity") * 100).cast("long").as("_qc"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
    val ps = l.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(when(col("l_shipdate") >= winLo && col("l_shipdate") < winHi,
        col("_qc"))).as("_wq"))
      .withColumn("_avail_c",
        ((col("l_partkey") * 7 + col("l_suppkey") * 13) % 50 + 1) * 100)
      .filter(col("_avail_c") * 2 > col("_wq"))
    ps.select(col("l_suppkey")).distinct()
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
        .filter(col("n_name") === gf.nationName)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"), col("s_suppkey"))
  }

  /** TPC-H Q3 shape (q244): shipping priority — the selective-filter
    * three-way join funnel that complements q238's HAVING funnel: both
    * date predicates push to the parquet scans (plan-pinned), the
    * market-segment filter cuts customer ~5× before its join, revenue
    * aggregates in floor-cents (one wide per-(order, date, priority)
    * exchange), and the top-10 is TakeOrdered, never a global sort.
    * At scale the joins shuffle on their keys and AQE broadcasts
    * whichever funnel side collapses below the threshold.
    */
  private def qShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-03-15").cast("timestamp")
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = t(s, dir, "orders").filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long").as("_rc"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("_rc")).as("revenue_c"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue_c"))
      .orderBy(col("revenue_c").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q18 shape (q238): large-volume orders — the groupBy-HAVING
    * funnel: lineitem aggregates ONCE to per-order floor-cent
    * quantities, the > 250 HAVING cut keeps ~1% of orders, and only
    * those survivors join customer/orders (AQE broadcasts the tiny
    * survivor side) before a top-20 TakeOrdered. At scale the one wide
    * exchange is the per-order aggregate; everything downstream
    * operates on HAVING survivors.
    */
  private def qBigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        floor(col("l_quantity") * 100).cast("long").as("_qc"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("_qc")).as("total_qty_c"))
      .filter(col("total_qty_c") > 25000L)
    big
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty_c"))
      .orderBy(col("total_qty_c").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Saturated-mask precision valve (q237): q228's pairing with
    * minShared = 2 — the battery-pinned cure for the regime where the
    * adaptive mask hits its band-width cap (≳65k frames) and
    * SINGLE-band random collisions grow ~n²/2^maskBits: a random pair
    * overwhelmingly shares exactly one cell, a true near-dup video
    * shares many, so score ≥ 2 cuts the collision floor quadratically.
    * Measured at gen-sf1 (200k frames, mask saturated at 15 bits):
    * 6.70M pairs → 13.7k (487×). The q228 row stays as the pinned
    * single-cell frontier baseline.
    * See Dedup.fingerprintOverlapPairs(minShared).
    */
  private def qVideoNearDup2(s: SparkSession, dir: String): DataFrame = {
    val (bits, _) = graft.operators.Dedup.suggestSimhashParams(
      t(s, dir, "documents").count() * 4, bands = 4)
    val maskBits = bits / 4
    val fh = fixtureFor(s, dir, "q228framehashes") {
      graft.operators.Multimodal.frameAHashesWith(mp4Fixture(s, dir),
          graft.operators.FrameDecoder.ImageIo, "payload", "doc_id")
        .select(col("doc_id"), col("frame_hash"))
        .localCheckpoint(true)
    }
    graft.operators.Dedup.fingerprintOverlapPairs(fh, "doc_id", "frame_hash",
        bands = 4, strideBits = 16, maskBits = maskBits, minShared = 2)
      .withColumn("mask_bits", lit(maskBits.toLong))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Frontier-law audit (q229): kmvPairwiseJaccardAuto's selection law
    * re-derived on BOTH engines — n_sources from a column-pruned
    * distinct count, use_sparse = n ≥ 64 (the measured crossover,
    * BASELINE round-11 probe) — emitted next to the sketch estimates
    * the auto path serves, so the default-route choice is itself
    * hash-gated (the q219 adaptive-audit idiom applied to the q224/
    * q226 pair). At the battery's 20 sources the law picks the dense
    * frontier; the row's rows are therefore q224's sketch columns
    * with the law columns appended.
    */
  private def qJaccardFrontierLaw(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nSources = docs.select(col("source")).distinct().count()
    val useSparse = graft.operators.Sketches.suggestJaccardFrontier(nSources)
    graft.operators.Sketches.kmvPairwiseJaccard(docs, "text", "source",
        candidatesOnly = useSparse)
      .select(col("src_a"), col("src_b"), col("m_union_k"), col("j_num"),
        col("est_ppm"))
      .withColumn("n_sources", lit(nSources))
      .withColumn("use_sparse", lit(if (useSparse) 1L else 0L))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Robust outlier report (q225): per-source median + MAD of n_chars
    * from the bottom-k sample (both order statistics never touch the
    * data), then a scan-speed count of docs beyond 3 MADs — the
    * heavy-tail-proof version of a mean/stddev length gate. See
    * Diagnostics.robustOutlierReport.
    */
  private def qRobustOutliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.robustOutlierReport(t(s, dir, "documents"),
      col("doc_id"), col("n_chars"), col("source"))

  /** Benchmark decontamination (operators.Decontaminate.sharedNgrams):
    * every 97th document plays the eval set; the rest of the corpus is
    * checked for shared word 3-grams (distinct per doc) against it.
    */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // FIXED eval slice (no-op at driver SFs, where max doc_id = 4999):
    // a benchmark suite's size doesn't grow with the training corpus
    graft.operators.Decontaminate.sharedNgrams(
        docs.filter(!(col("doc_id") % 97 === 0 && col("doc_id") < 5000)), "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000), "text", n = 3)
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered decontamination
    * (operators.Decontaminate.sharedNgramsBloom): same contract as q55
    * on a different eval slice (doc_id % 89 = 0), but the corpus gram
    * stream is pruned by a distributed-built bloom filter below its
    * first shuffle and confirmed by a plain (non-broadcast) join — the
    * plan shape for eval suites too large to broadcast as strings. The
    * oracle is the exact q55 formula: the bloom stage is
    * semantics-free by construction.
    */
  private def qDecontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Decontaminate.sharedNgramsBloom(
        docs.filter(!(col("doc_id") % 89 === 0 && col("doc_id") < 5000)), "doc_id", "text",
        docs.filter(col("doc_id") % 89 === 0 && col("doc_id") < 5000), "text", n = 3)
      .orderBy(col("doc_id"))
  }

  /** Inverted index (TextSearch.buildInvertedIndex/postings): the
    * offline term-bucketed index build plus a query-time posting
    * lookup for the demo query's terms — the oracle recomputes the
    * postings straight from the corpus, so the persisted index content
    * is what's checked.
    */
  private def qInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val table = "graft_q70_idx_" + Integer.toHexString(dir.hashCode)
    graft.operators.TextSearch.buildInvertedIndex(
      t(s, dir, "documents"), "doc_id", "text", table, buckets = 8)
    graft.operators.TextSearch.postings(s, table,
        graft.operators.TextSearch.DemoQuery.toLowerCase.split("\\s+").toSeq)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .orderBy(col("term"), col("doc_id"))
  }

  /** Z-order (Morton) values (operators.Layout.zValue): the
    * bit-interleave that drives the zorderWrite clustering layout,
    * checked term-for-term against the oracle's unrolled shift/mask
    * sum. The layout itself (range-partition on zv → per-file
    * bounding boxes tight in both dims) is pinned in LayoutSpec.
    */
  private def qZorder(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"),
      pmod(col("doc_id"), lit(65536L)).as("x"),
      pmod(length(coalesce(col("text"), lit(""))).cast("long"), lit(65536L)).as("y"))
    base.select(col("doc_id"), col("x"), col("y"),
        graft.operators.Layout.zValue(col("x"), col("y"), 16).cast("long").as("zv"))
      .orderBy(col("doc_id"))
  }

  /** Quantile gate (operators.Sampling.quantileGate): keep documents
    * whose token count lies inside the per-language [p05, p95] band —
    * winsorization against truncated fragments and concatenation
    * artifacts. Exact interpolated percentile on both engines (the q39
    * parity result).
    */
  private def qQuantileGate(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.quantileGate(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          graft.functions.tokenCount(col("text")).as("n_tokens")),
        col("n_tokens"), col("lang"), 0.05, 0.95)
      .orderBy(col("doc_id"))

  /** Repetition gate (TextAnalysis.repetitionRatio): duplicate word
    * 3-gram fraction per document in 1e6 fixed point.
    */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        floor(graft.operators.TextAnalysis.repetitionRatio(col("text"), 3) *
          lit(1000000.0)).cast("long").as("rep_1e6"))
      .orderBy(col("doc_id"))

  /** Curation v2 (operators.Curation.curateV2): the q44 composite plus
    * the repetition cap and benchmark decontamination (eval slice =
    * doc_id % 97 = 0) — the full production gate stack in one plan.
    */
  private def qCurationV2(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Curation.curateV2(docs,
      docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000))
      .select(col("doc_id"), col("quality_1e6"), col("predicted_lang"))
      .orderBy(col("doc_id"))
  }

  /** PQ + ADC search (Similarity.trainPqCodebooks/pqEncode/pqAdcTopK):
    * 64-dim embeddings compress to 2 per-subspace cell codes; queries
    * score candidates from a broadcast m×k cosine LUT — the
    * memory-bound ANN path. Training AND codes are cross-engine-checked
    * (the oracle re-derives both per-subspace codebooks).
    */
  private def qPqAdc(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    val codes = Similarity.pqEncode(corpus, books)
    Similarity.pqAdcTopK(codes, corpus.filter(col("id") % 200 === 0 && col("id") < 2000), books, k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_1e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ (Similarity.ivfPqTopK): coarse cells prune candidates,
    * ADC scores them from PQ codes — the production ANN composition,
    * with coarse quantizer, codebooks, codes, and scoring all
    * re-derived by the oracle.
    */
  private def qIvfPq(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val coarse = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    Similarity.ivfPqTopK(corpus, corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
        coarse, books, k = 3, nprobe = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_1e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Residual IVF-PQ (Similarity.trainResidualCodebooks/
    * ivfPqResidualTopK): q59's composition with codes quantizing
    * residuals and a per-(query, probed-cell) LUT — the standard
    * FAISS-shaped refinement that buys recall at equal nprobe. Coarse
    * quantizer, residual codebooks, codes, and scoring all re-derived
    * by the oracle.
    */
  private def qIvfPqResidual(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val coarse = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    val books = Similarity.trainResidualCodebooks(corpus, coarse, m = 2, k = 4, iters = 2)
    Similarity.ivfPqResidualTopK(corpus,
        corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
        coarse, books, k = 3, nprobe = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_1e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Ordered conversion funnel (operators.EventAnalytics.funnel):
    * view → click → purchase, each stage strictly after the user's
    * first completion of the previous one; one shuffle (the user),
    * chained window mins, epoch-µs outputs.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.funnel(
        tRaw(s, dir, "events").select(col("user_id"), col("event_type"),
          expr("ts DIV 1000").as("ts_us")),
        "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
      .select(col("user_id"), col("stage_reached"),
        col("t_view").as("view_us"), col("t_click").as("click_us"),
        col("t_purchase").as("purchase_us"))
      .orderBy(col("user_id"))

  /** Event-type Markov transition matrix (q137): consecutive-pair
    * counts per user stream with exact fixed-point row probabilities —
    * the behavioral bigram LM. See EventAnalytics.transitionMatrix.
    */
  private def qTransitionMatrix(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.transitionMatrix(
        tRaw(s, dir, "events").select(col("event_id"), col("user_id"),
          col("event_type"), expr("ts DIV 1000").as("ts_us")),
        "user_id", "event_type", "ts_us", "event_id")
      .orderBy(col("from_type"), col("to_type"))

  /** Per-user event cap (q138): at most 20 events per user, selected
    * by id-hash order through the bounded-state TopKPairs aggregate —
    * the dominating-key rate limiter. See Sampling.perKeyCap.
    */
  private def qUserCap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.perKeyCap(
        tRaw(s, dir, "events"), col("user_id"), col("event_id"), maxPerKey = 20)
      .select(col("key").as("user_id"), col("keep_rank"),
        col("id").as("event_id"))
      .orderBy(col("user_id"), col("keep_rank"))

  /** Rolling 7-day active users (EventAnalytics.rollingActive): per
    * observed day, exact DAU and distinct users over the window ending
    * that day — dedup to (user, day), bounded ×7 fan-out, semi-join to
    * observed days. The sketch-mode twin (HLL per day, union over the
    * window) is spec-pinned against this exact series.
    */
  private def qRollingActive(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.rollingActive(
        tRaw(s, dir, "events").select(col("user_id"),
          expr("ts DIV 1000").as("ts_us")),
        "user_id", "ts_us", windowDays = 7)
      .orderBy(col("day"))

  /** Curriculum ordering (Sampling.curriculumOrder): global 1..n
    * training-order ordinal — short (easy) length-bins first,
    * id-hash pseudo-shuffle within each bin — realized as per-
    * (bin, shard) ranks plus a tiny broadcast offset table, never a
    * global sort.
    */
  private def qCurriculum(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.curriculumOrder(
        tRaw(s, dir, "documents"),
        col("doc_id"), expr("length(bin(coalesce(n_chars, 0)))"), shards = 8)
      .select(col("id").as("doc_id"), col("bin").as("len_bits"), col("ordinal"))
      .orderBy(col("ordinal"))

  /** Click→purchase last-click attribution (q141): the BATCH twin of
    * streaming.StreamingAttribution — the same interval-join +
    * rank-tail code path the watermarked stream-stream join runs,
    * executed on the events table (StreamingSpec pins stream ≡ batch).
    * Unattributed purchases survive with NULL click columns.
    */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    // ts arrives as nanos-long (nanosAsLong) → real TIMESTAMP for the
    // watermark-typed join path, back to epoch-µs for the oracle
    val ev = tRaw(s, dir, "events")
      .withColumn("_ts", expr("timestamp_micros(ts DIV 1000)"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("_ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("_ts").as("purchase_ts"))
    graft.streaming.StreamingAttribution.lastClick(
        graft.streaming.StreamingAttribution.attributeClicks(
          clicks, purchases, windowSec = 1800L))
      .select(col("user_id"), col("purchase_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("click_id"), unix_micros(col("click_ts")).as("click_us"))
      .orderBy(col("purchase_id"))
  }

  /** PageRank centrality over the near-dup candidate graph (q142):
    * three exact fixed-point supersteps of Graph.pageRank on the q18
    * LSH pairs — which document anchors each mirror cluster. Every
    * step is floor-division integer arithmetic, so ranks are
    * bit-identical across partitionings and engines.
    */
  private def qPageRank(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.pageRank(
        Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text"),
        "id_a", "id_b", iters = 3)
      .select(col("node").as("doc_id"), col("pr").as("pr_1e6"))
      .orderBy(col("doc_id"))

  /** Day-over-day event-mix drift (q143): KL(day ‖ previous day) of
    * the event-type distribution in exact millibits — the stream-shape
    * monitor. See Diagnostics.temporalDrift.
    */
  private def qEventDrift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.temporalDrift(
        tRaw(s, dir, "events"),
        expr("(ts DIV 1000) div 86400000000"), col("event_type"))
      .select(col("bucket").as("day"), col("kl_mbits"))
      .orderBy(col("day"))

  /** Source-centroid cosine matrix (q144): per-source mean embedding
    * (integer-sum fixed point) + pairwise centroid cosine — the
    * semantic complement of q135's lexical source divergence. See
    * Similarity.sourceCentroidMatrix.
    */
  private def qSourceCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.sourceCentroidMatrix(
        t(s, dir, "documents"), "doc_id", "source", embCorpus(s, dir))
      .orderBy(col("source_a"), col("source_b"))

  /** Mutual-best record linkage (q145): q76's q-gram-blocked edit
    * distance as a TWO-table join (overlapping customer slices), then
    * FuzzyJoin.mutualBestMatch keeps only pairs that are each other's
    * closest candidate — the one-to-one "sure match" tier.
    */
  private def qMutualBest(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    // maxGramDf pins the hot-gram skew valve into the plan. Both
    // slices are id-capped (< 7500 → ≤ 241 + 441 rows at ANY sf), so
    // 1000 sits above every possible combined gram frequency: the cap
    // drops nothing here (the all-pairs oracle needs no mirror) while
    // guaranteeing boilerplate grams can't quadratically flood the
    // blocking buckets if the slice predicate is ever widened.
    graft.operators.FuzzyJoin.mutualBestMatch(
        graft.operators.FuzzyJoin.editDistanceJoin(
          cust.filter(col("c_custkey") % 31 === 0 && col("c_custkey") < 7500),
          "c_custkey", "c_name",
          cust.filter(col("c_custkey") % 17 === 0 && col("c_custkey") < 7500),
          "c_custkey", "c_name", maxDist = 2, maxGramDf = Some(1000L)))
      .orderBy(col("id_l"))
  }

  /** Exact-quota stratified split (q146): exactly ⌊n_s·10%⌋ held-out
    * docs per source in id-hash order — the count-exact eval split the
    * q50 per-row coin flip can't promise. See Sampling.quotaSplit.
    */
  private def qQuotaSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.quotaSplit(
        t(s, dir, "documents"), col("doc_id"), col("source"),
        heldoutPpm = 100000L, shards = 8)
      .select(col("id").as("doc_id"), col("stratum").as("source"), col("heldout"))
      .orderBy(col("doc_id"))

  /** Eval-coverage report (q147): q91 flipped — per EVAL doc, the
    * share of its distinct shingles already present in the training
    * corpus: the benchmark-integrity table. Same q55 eval slice. See
    * Decontaminate.evalCoverage.
    */
  private def qEvalCoverage(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Decontaminate.evalCoverage(
        docs.filter(!(col("doc_id") % 97 === 0 && col("doc_id") < 5000)), "text",
        docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000),
        "doc_id", "text", n = 3)
      .orderBy(col("eval_id"))
  }

  /** Trailing 1-hour window stats (EventAnalytics.trailingStats):
    * per event, the user's event count and cents-sum over the last
    * hour — per-row RANGE frames on integer µs, tie-order-proof.
    */
  private def qTrailingWindow(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.trailingStats(
        tRaw(s, dir, "events").select(col("event_id"), col("user_id"),
          expr("ts DIV 1000").as("ts_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        col("user_id"), col("ts_us"), col("cents"), backUs = 3600000000L)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("n_win"), col("sum_win").as("cents_win"))
      .orderBy(col("event_id"))

  /** Recency-decayed spend (EventAnalytics.decayedSum): per user,
    * cents halved per day of age (integer shifts — no pow/exp, exact
    * on every engine), saturating at 30 halvings. Scan + one groupBy.
    */
  private def qDecayedSum(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.decayedSum(
        tRaw(s, dir, "events").select(col("user_id"),
          expr("ts DIV 1000").as("ts_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        col("user_id"), col("ts_us"), col("cents"),
        halfLifeUs = 86400000000L)
      .select(col("key").as("user_id"), col("decayed_sum").as("decayed_c"))
      .orderBy(col("user_id"))

  /** Equi-depth histogram (Diagnostics.equiDepthHistogram): 10 cent
    * deciles over events — percentile-bound buckets, no global sort.
    */
  private def qEquiDepthHist(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.equiDepthHistogram(
        tRaw(s, dir, "events").select(
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        col("cents"), buckets = 10)
      .select(col("bucket"), col("n"), col("lo").as("lo_c"), col("hi").as("hi_c"))
      .orderBy(col("bucket"))

  /** Cohort retention (operators.EventAnalytics.retentionCohorts):
    * first-event-day cohorts × active-day offsets, distinct users per
    * cell.
    */
  private def qRetention(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.retentionCohorts(
        tRaw(s, dir, "events").select(col("user_id"),
          expr("ts DIV 1000").as("ts_us")),
        "user_id", "ts_us")
      .orderBy(col("cohort_day"), col("day_offset"))

  /** Heavy hitters (operators.Sketches.heavyHitters): top-20 corpus
    * tokens, exact counts next to the PORTABLE count-min estimate and
    * its error contract (estimate ≥ exact always; ≤ exact + ⌈eps·N⌉
    * whp) — estimate and both flags are replayed by the DuckDB oracle
    * from the same md5Long cell hash (the q217 idiom; VERDICT r12
    * item 2 closed).
    */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.heavyHitters(
        t(s, dir, "documents").select(
          explode(tokens(lower(col("text")))).as("token")),
        col("token"), topN = 20)
      .orderBy(col("rank"))

  /** Mixture rebalance (operators.Sampling.rebalanceToMixture): the
    * corpus downsampled per-language toward the demo target mixture —
    * the binding stratum keeps everything, the rest keep
    * s·T div n ppm of their rows by the same md5-ppm filter as q48.
    */
  private def qMixture(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.rebalanceToMixture(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        graft.operators.Sampling.DemoMixturePpm)
      .select(col("doc_id"), col("lang"), col("rate_ppm"))
      .orderBy(col("doc_id"))

  /** Hybrid retrieval (operators.Retrieval.hybridMoreLikeThis): seed
    * documents query the corpus lexically (BM25 over their own tokens)
    * and densely (cosine over their embeddings); reciprocal-rank
    * fusion sums integer quotients 1e9 div (60 + rank) over the two
    * top-20 lists.
    */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val embs = embCorpus(s, dir)
    // FIXED seed set (identical ids at every sf ≥ 0.01): a retrieval
    // workload's query count doesn't grow with the corpus — seeds ∝
    // corpus made q60's work quadratic in sf (measured 30×+ at 10×)
    graft.operators.Retrieval.hybridMoreLikeThis(
        docs, "doc_id", "text", embs,
        docs.filter(col("doc_id") % 200 === 0 && col("doc_id") < 5000),
        embs.filter(col("id") % 200 === 0 && col("id") < 2000),
        depth = 20, k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic corpus sharding (Layout.shardAssign): md5-mod
    * shard ids + in-shard hash-rank positions — the dataloader
    * "global shuffle + fixed-N shards" layout; concatenating shards
    * in (shard_id, shard_pos) order is a reproducible global
    * permutation. Oracle mirrors the mod and the rank window.
    */
  private def qShardLayout(s: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.shardAssign(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), numShards = 8)
      .select(col("doc_id"), col("shard_id"), col("shard_pos"))
      .orderBy(col("shard_id"), col("shard_pos"))

  /** Length-bucketed batching (Chunker.lengthBatches +
    * paddingReport): per-shard descending-length batches of 32 and
    * the exact padding waste of each — the sorted-batching layout
    * that pads each batch to its own max. Oracle replays the rank
    * window and the per-batch aggregate.
    */
  private def qLengthBatches(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.tokenCount(col("text")).as("ntok"))
    val assigned = graft.operators.Chunker.lengthBatches(
      docs, "doc_id", "ntok", batchSize = 32, shards = 4)
    graft.operators.Chunker.paddingReport(assigned, "ntok")
      .orderBy(col("shard"), col("batch_no"))
  }

  /** Vocabulary head / Zipf report (Diagnostics.vocabReport): top-50
    * terms with corpus share and cumulative share in 1e9 fixed point
    * — tokenizer-planning numbers. Oracle mirrors the TakeOrdered cut
    * and the bounded cumsum window.
    */
  private def qVocabReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.vocabReport(
        t(s, dir, "documents"), col("text"), topK = 50)
      .orderBy(col("rank"))

  /** Leakage-free split (Decontaminate.decontaminatedSplit): the q50
    * hash split fused with a train-vs-heldout 3-gram contamination
    * check — contaminated train docs relabel `quarantined` with
    * their shared-gram evidence. Oracle composes the q50 CASE with
    * the q55 gram-join formula.
    */
  private def qDecontaminatedSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Decontaminate.decontaminatedSplit(
        t(s, dir, "documents"), "doc_id", "text",
        graft.operators.Sampling.DemoSplits)
      .orderBy(col("doc_id"))

  /** Cluster-balanced sampling (Sampling.clusterBalance): the q49
    * coarse quantizer's cells as strata, uniform target shares —
    * semantic-space topic balancing. The oracle re-derives the cells
    * via the shared k-means CTEs, the shares via the same div/mod
    * split, and the kept set via the md5-ppm gate.
    */
  private def qClusterBalance(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val cents = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    val assigned = Similarity.assignCells(corpus, cents)
      .select(col("id"), col("cid"))
    graft.operators.Sampling.clusterBalance(assigned, col("id"), col("cid"))
      .select(col("id"), col("cid").cast("long").as("cid"), col("rate_ppm"))
      .orderBy(col("id"))
  }

  /** DSIR selection (TextAnalysis.dsirSelect): the resampling cut —
    * the top quartile of q105's scores via the quantile-gate band
    * [p25, p100]. Oracle = the shared q105 CTE chain + quantile_cont
    * thresholds (the q39 parity).
    */
  private def qDsirSelect(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.TextAnalysis.dsirSelect(
        docs, "doc_id", "text", docs.filter(col("n_chars") < 150), "text",
        topShare = 0.25)
      .orderBy(col("id"))
  }

  /** Tokenizer fertility report (Diagnostics.tokenizerFertility):
    * per-source subwords-per-word and chars-per-subword under the
    * q81 corpus-trained BPE merges. Oracle reuses the unrolled BPE
    * CTE chain and mirrors the ratio arithmetic.
    */
  private def qTokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = graft.operators.Bpe.trainFromCorpus(docs, "text",
      graft.operators.Bpe.DefaultMerges, graft.operators.Bpe.DefaultVocabCap)
    graft.operators.Diagnostics.tokenizerFertility(
        docs, col("source"), col("text"), merges)
      .orderBy(col("source"))
  }

  /** Quality-aware dedup representative (Dedup.keepBestOfCluster):
    * q36's LSH clusters keep their highest-q41-score member instead
    * of the min id — production near-dedup keeps the cleanest copy.
    * Oracle composes the q36 reachability CTEs with the shared q41
    * quality CTE and the same (score desc, id) rank.
    */
  private def qClusterBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val clusters = Dedup.connectedComponents(
      Dedup.minhashLshPairs(docs, "doc_id", "text"))
    val scored = docs.select(col("doc_id").as("id"),
      floor(TextAnalysis.qualityScoreRaw(col("text")) * 1000000.0)
        .cast("long").as("score"))
    Dedup.keepBestOfCluster(scored, clusters)
      .select(col("id").as("doc_id"), col("cluster_id"),
        col("score").as("quality_1e6"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** Content-defined chunk dedup (Dedup.cdcDedupReport): rolling-hash
    * cut points (3-gram hash ≡ 0 mod 16) chunk each doc, then chunk
    * hashes dedup globally — the sub-document duplication view
    * (boilerplate/quotes/partial copies) that document-level dedup
    * can't see, edit-resilient where fixed windows misalign. Oracle
    * replays cuts → spans → chunk md5s with DuckDB list ops and the
    * shared gram-hash CTEs.
    */
  private def qCdcDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.cdcDedupReport(t(s, dir, "documents"), "doc_id", "text", mask = 16)
      .select(col("id").as("doc_id"), col("n_chunks"), col("n_words"),
        col("dup_chunks"), col("dup_words"))
      .orderBy(col("doc_id"))

  /** Token-budget selection (Sampling.tokenBudgetSelect): keep the
    * best-quality docs until 40% of the corpus tokens are spent — the
    * final data-selection cut of a pretraining mix. The oracle is the
    * straight global ordered-prefix-sum formulation; the engine must
    * reproduce it bin-by-bin with only the boundary bin paying a rank
    * window (never a global sort).
    */
  private def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents").select(col("doc_id"),
      floor(TextAnalysis.qualityScoreRaw(col("text")) * 1000000.0)
        .cast("long").as("q"),
      graft.functions.tokenCount(col("text")).as("ntok"))
    graft.operators.Sampling.tokenBudgetSelect(scored, col("doc_id"), col("q"),
        col("ntok"), budgetNum = 2L, budgetDen = 5L)
      .select(col("id").as("doc_id"), col("score").as("quality_1e6"),
        col("ntok"), col("selected"))
      .orderBy(col("doc_id"))
  }

  /** Curation v3 (Curation.curateV3): the q57 pipeline where near-dup
    * clusters keep their best-quality member (q115's rank) and the
    * clean survivors take the final 40%-of-tokens budget cut (q117) —
    * the full corpus-construction story in one composite. The oracle
    * chains the shared dedup-cluster, gate, bench-gram, repetition,
    * and budget-prefix CTEs.
    */
  private def qCurationV3(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Curation.curateV3(docs,
        docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000))
      .select(col("doc_id"), col("quality_1e6"), col("predicted_lang"),
        col("ntok"))
      .orderBy(col("doc_id"))
  }

  /** Hard-negative mining (Retrieval.hardNegatives): per seed, the
    * top-10 BM25 candidates that are NOT MinHash-LSH near-dups of the
    * seed — the bi-encoder training negatives. Oracle composes q60's
    * pruned-seed-term BM25 chain with q18's LSH pair CTEs and ranks
    * after the exclusion.
    */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Retrieval.hardNegatives(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 200 === 0 && col("doc_id") < 5000), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** MinHash estimator audit (Dedup.minhashJaccardEstimate): for each
    * LSH candidate pair, the signature-agreement Jaccard estimate next
    * to the exact shingle Jaccard. Oracle replays both from q18's SIG
    * and PAIRS CTEs plus q20's exact formula.
    */
  private def qMinhashEstimate(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashJaccardEstimate(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))

  /** Source near-dup matrix (Diagnostics.sourceNearDupMatrix): LSH
    * candidate pairs per unordered source pair — whole-document
    * duplication pressure between feeds (the gram-level q92 sees only
    * shared phrases). Oracle joins q18's PAIRS to sources twice.
    */
  private def qSourceNearDups(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.sourceNearDupMatrix(
        t(s, dir, "documents"), "doc_id", "text", "source")
      .orderBy(col("source_a"), col("source_b"))

  /** Per-source score calibration (Sampling.percentileCalibrate):
    * q41 quality mapped onto each source's own percentile scale. The
    * oracle is the direct rank-window formulation; the engine must
    * reproduce it from (stratum, score) counts with no corpus-wide
    * window.
    */
  private def qScoreCalibration(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        floor(TextAnalysis.qualityScoreRaw(col("text")) * 1000000.0)
          .cast("long").as("q"))
    graft.operators.Sampling.percentileCalibrate(scored, col("doc_id"),
        col("source"), col("q"))
      .select(col("id").as("doc_id"), col("stratum").as("source"),
        col("score").as("quality_1e6"), col("pct_1e6"))
      .orderBy(col("doc_id"))
  }

  /** Boilerplate removal (Dedup.deboilerplate): chunks occurring more
    * than twice corpus-wide drop; each doc reassembles from its
    * surviving chunks in order — sub-document dedup with document
    * reconstruction. Oracle reuses q116's chunk chain + string_agg in
    * chunk order.
    */
  private def qDeboilerplate(s: SparkSession, dir: String): DataFrame =
    Dedup.deboilerplate(t(s, dir, "documents"), "doc_id", "text", maxDf = 2L)
      .select(col("id").as("doc_id"), col("clean_text"), col("kept_chunks"))
      .orderBy(col("doc_id"))

  /** Gopher rule gate (q148): the integer-exact rule-based pre-filter
    * (word-count bounds, mean word length, symbol/bullet/ellipsis
    * ratios, alpha-word share, required stopwords). Bounds 40..120
    * split the ~54-token battery corpus; stop set {the, a} matches its
    * vocabulary. See TextAnalysis.gopherRules.
    */
  private def qGopherRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.gopherRules(
        t(s, dir, "documents"), "doc_id", "text",
        minWords = 40L, maxWords = 120L,
        stopSet = Seq("the", "a"), minStopHits = 2L)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** Repeated n-gram report (q149): every word 6-gram shared by ≥ 2
    * documents — doc frequency + total occurrences, top 20. The
    * "memorization risk" sizing report run before q97/q101's span
    * removal. See TextAnalysis.repeatedNgrams.
    */
  private def qRepeatedNgrams(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.repeatedNgrams(
        t(s, dir, "documents"), "doc_id", "text",
        n = 6, minDocs = 2L, topK = 20)

  /** Priority sample (q150): k = 25 docs weighted by token count —
    * Duffield–Lund–Thorup priority sampling, rank = md5-hash DIV
    * weight, k smallest win. See Sampling.prioritySample.
    */
  private def qPrioritySample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), graft.functions.tokenCount(col("text")).as("w"))
    graft.operators.Sampling.prioritySample(
        docs, col("doc_id"), col("w") + 1L, k = 25)
      .select(col("id").as("doc_id"), col("weight"), col("prio"), col("rank"))
      // contractual order (oracle: ORDER BY prio, doc_id ≡ rank) — the
      // limit+window above only orders incidentally
      .orderBy(col("rank"))
  }

  /** Daily anomaly flags (q151): trailing-7-day integer z-test on
    * per-type daily event counts. See EventAnalytics.dailyAnomalies.
    */
  private def qDailyAnomaly(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.dailyAnomalies(
        t(s, dir, "events"), "event_type", "ts",
        lookback = 7, minPrev = 4, sigma = 2)

  /** TF-IDF keywords (q152): top-3 terms per document, bit-length
    * log2 idf. See TextAnalysis.tfidfKeywords.
    */
  private def qTfidfKeywords(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.tfidfKeywords(
        t(s, dir, "documents"), "doc_id", "text", topK = 3)

  /** Corpus novelty curve (q153): first-seen word-3-gram saturation
    * per 100-doc bucket. See TextAnalysis.noveltyCurve.
    */
  private def qNoveltyCurve(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.noveltyCurve(
        t(s, dir, "documents"), "doc_id", "text",
        n = 3, bucketSize = 100L)

  /** PMI collocations (q154): top-20 adjacent word pairs by the
    * fixed-point PMI odds ratio. See TextAnalysis.pmiCollocations.
    */
  private def qPmiCollocations(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.pmiCollocations(
        t(s, dir, "documents"), "text", minCount = 10L, topK = 20)

  /** ANN recall@3 (q155): the bucketed path audited against the
    * brute-force ground truth, per query. See Similarity.recallAtK.
    */
  private def qAnnRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.recallAtK(
        embCorpus(s, dir),
        embCorpus(s, dir).filter(col("id") % 200 === 0 && col("id") < 2000),
        k = 3, signBits = 6)

  /** User feature snapshot (q156): per-user activity/session/spend/
    * recency features off the event stream. See
    * EventAnalytics.userFeatures.
    */
  private def qUserFeatures(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.userFeatures(
        tRaw(s, dir, "events")
          .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
            col("value"), col("event_type")),
        "user_id", "ts_us", "value", "event_type")

  /** Token frequency spectrum (q157): Zipf profile in log2 bands.
    * See TextAnalysis.freqSpectrum.
    */
  private def qFreqSpectrum(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.freqSpectrum(t(s, dir, "documents"), "text")

  /** Source token-mass Gini (q159): per-source shares + corpus
    * concentration coefficient. See TextAnalysis.sourceGini.
    */
  private def qSourceGini(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.sourceGini(
        t(s, dir, "documents"), "source", "text")

  /** Audience overlap (q160): exact pairwise segment intersections +
    * HLL inclusion–exclusion within-bound flags. See
    * Sketches.audienceOverlap.
    */
  private def qAudienceOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.audienceOverlap(
        tRaw(s, dir, "events"), "event_type", "user_id")

  /** Gram matrix (q161): upper-triangle Σ xᵢ·xⱼ over the first 8
    * embedding dims, exact fixed-point — the normal-equations
    * primitive. See Similarity.gramMatrix.
    */
  private def qGramMatrix(s: SparkSession, dir: String): DataFrame =
    Similarity.gramMatrix(embCorpus(s, dir), dims = 8)

  /** Dup-graph triangles (q162): node-ordered triangle enumeration
    * over the q18 LSH candidate pairs — tight-cluster vs hub-spokes
    * density probe. See Graph.triangles.
    */
  private def qDupTriangles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.triangles(
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text"))

  /** Sample-trained semantic dedup (q163): Similarity.trainCentroids'
    * own scaladoc contract — "train on a hash sample at real scale,
    * the quantizer needs a representative sample, not the corpus" —
    * finally executable as a hash-gated battery row. The quantizer
    * trains on the deterministic md5-ppm 25% sample
    * (Sampling.hashSample), k still sized to the FULL corpus
    * (suggestSemanticCells(n) — cells serve the assignment corpus,
    * not the trainer), then the full corpus is assigned and deduped
    * exactly like q93. The oracle derives the identical sample, seeds
    * (k lowest-id SAMPLED vectors), and both Lloyd rounds, so sampled
    * training agrees bit-for-bit across engines. At 100 TB this is
    * the shape that runs: training cost scales with the sample while
    * assignment stays the narrow map-side pass.
    */
  private def qSemanticSampled(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val train = graft.operators.Sampling.hashSample(corpus, col("id"), 250000L)
    val k = graft.operators.Dedup.suggestSemanticCells(corpus.count())
    val cents = Similarity.trainCentroids(train, k = k, iters = 2)
    graft.operators.Dedup.semanticDedup(corpus, cents, threshold1e6 = 950000L)
      .orderBy(col("id"))
  }

  /** Two-level hierarchical semantic dedup (q164): the linear-total
    * architecture semanticDedup's scaladoc documents — k1 trained
    * coarse cells, then EVERY cell trains its own k2 sub-quantizer in
    * one distributed pass (Similarity.trainSubCentroids — the
    * quantizer is a DataFrame, zero driver state), pairs only within
    * a (cid, cid2) subcell. k1 = k2 = ⌊√⌈n/32⌉⌋ keeps subcell
    * populations CONSTANT as n grows (q93's √n flat cells grow their
    * populations as √n — the measured 4.8× slope this form beats).
    * The oracle derives both levels: seeds, two Lloyd rounds each,
    * and the assignment tie-breaks, all exact-integer — hash-gated
    * like q93. See Dedup.semanticDedup2.
    */
  private def qSemantic2Level(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val k = graft.operators.Dedup.suggestSemantic2Params(corpus.count())
    val cents1 = Similarity.trainCentroids(corpus, k = k, iters = 2)
    graft.operators.Dedup.semanticDedup2(corpus, cents1, k2 = k, iters = 2,
        threshold1e6 = 950000L)
      .orderBy(col("id"))
  }

  /** Three-level hierarchical semantic dedup (q203): the
    * bounded-fanout tree the q164 scaladoc names as the truly-linear
    * shape — measured 23.1 s vs two-level's 35.0 s at 200k vectors
    * (level-1 train+assign 4.0 s vs 10.0 s; the n·√(n/32) level-1
    * term shrinks to n·(n/32)^⅓). k per level = smallest c with
    * c³ ≥ ⌈n/32⌉, re-derived by the oracle from its own count(*).
    * See Dedup.semanticDedup3.
    */
  private def qSemantic3Level(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val k = graft.operators.Dedup.suggestSemantic3Params(corpus.count())
    val cents1 = Similarity.trainCentroids(corpus, k = k, iters = 2)
    graft.operators.Dedup.semanticDedup3(corpus, cents1, k, iters = 2,
        threshold1e6 = 950000L)
      .orderBy(col("id"))
  }

  /** Document LM surprisal (q165): every doc scored under the
    * corpus's own interpolated Kneser–Ney bigram LM, backoff mass
    * included — the CCNet-style perplexity quality filter as one
    * battery row. Exact integer floor-log2 bits (q88 idiom) over
    * q125's rational probabilities. See TextAnalysis.docLmBits.
    */
  private def qDocLmBits(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.docLmBits(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** PC1 outlier report (q166): dominant gram-matrix eigenvector by
    * 3 rounds of exact fixed-point power iteration (driver-side
    * BigInt over the dim²-bounded q161 gram result), then the top-10
    * docs by |projection| — the embedding-space outlier review list.
    * See Similarity.powerIterationPc1/pc1Outliers.
    */
  private def qPc1Outliers(s: SparkSession, dir: String): DataFrame =
    Similarity.pc1Outliers(embCorpus(s, dir), dims = 8, iters = 3, k = 10)
      .orderBy(col("rank"))

  /** IVF-PQ + exact refine (q167): the q59 compressed index serves a
    * kShort=10 ADC shortlist, true embeddings re-score only those
    * rows, exact cosine re-ranks the final top-3 — FAISS's
    * RefineFlat accuracy-recovery step. See Similarity.ivfPqRefineTopK.
    */
  private def qIvfPqRefine(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val coarse = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    Similarity.ivfPqRefineTopK(corpus,
        corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
        coarse, books, k = 3, kShort = 10, nprobe = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score_1e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH band-plan sweep (q168): measured candidate-pair workload of
    * every (bands, rows) split of the 16-perm signature on the real
    * corpus — the cost table read before choosing a banding at scale.
    * See Dedup.lshBandSweep.
    */
  private def qLshBandSweep(s: SparkSession, dir: String): DataFrame =
    Dedup.lshBandSweep(t(s, dir, "documents"), "doc_id", "text")

  /** Refine recall lift (q169): per query, exact-top-k survival in
    * the plain IVF-PQ ADC ranking vs the refined ranking — the
    * measured "does refine buy the recall back" table, per-query
    * denominators. kShort = 100: at this m=2×k=4 code budget the
    * ADC top-3 misses every exact neighbor (measured 0 recall at
    * kShort = 10 too — the shortlist must OUT-SIZE the code noise),
    * while the 100-deep shortlist + exact re-rank recovers recall up
    * to the nprobe cell ceiling — both effects visible in one table.
    * See Similarity.refineRecallReport.
    */
  private def qRefineRecall(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val coarse = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    Similarity.refineRecallReport(corpus,
        corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
        coarse, books, k = 3, kShort = 100, nprobe = 2)
      .orderBy(col("query_id"))
  }

  /** Vocab/OOV coverage (q170): per-source token mass outside the
    * corpus's own top-10 vocabulary — the tokenizer/vocab-sizing
    * table (topV = 10 so the synthetic 30-word vocabulary has a
    * real tail; a production run sizes topV to the tokenizer).
    * See TextAnalysis.vocabCoverage.
    */
  private def qVocabCoverage(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.vocabCoverage(
      t(s, dir, "documents"), "source", "text", topV = 10)

  /** Dedup savings (q171): per-source token mass before dedup, after
    * exact dedup, after LSH near-dup pruning — the dedup-ROI
    * one-pager attributed to the feed that pays for it.
    * See Diagnostics.dedupSavings.
    */
  private def qDedupSavings(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.dedupSavings(
      t(s, dir, "documents"), "doc_id", "source", "text")

  /** SimHash Hamming histogram (q172): the banded candidate stream
    * bucketed by exact Hamming distance with cumulative counts — the
    * maxHamming calibration table (q134's analog for the simhash
    * family). Band width is ADAPTIVE (Dedup.suggestSimhashParams from
    * count(*), the q82 pattern): the unfiltered candidate stream is
    * exactly the ~n²/2^bandBits population the q45 cliff is made of,
    * so a fixed-width histogram would be its own scale cliff (measured
    * 77× at 10× data at fixed 8-bit bands; adaptive re-measured
    * ~linear). The oracle re-derives the width from its own count(*).
    * See Dedup.simhashHammingHistogram.
    */
  private def qSimhashHamming(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (bits, bands) = Dedup.suggestSimhashParams(docs.count(), bands = 4)
    Dedup.simhashHammingHistogram(docs, "doc_id", "text", bits, bands)
      .withColumn("bits", lit(bits.toLong))
  }

  /** Incremental NEAR-dup dedup-on-ingest (q173): q94's two-batch
    * replay with the admission test upgraded to MinHash similarity
    * against the signature index — batch 2 docs sharing an LSH band
    * with batch 1's admitted docs at ≥ 50% signature agreement are
    * turned away without any historical text. The oracle replays both
    * batches: in-batch exact firsts, then the band-collision +
    * agreement rejection against batch 1's admitted set.
    * See IncrementalDedup.appendNovelNearDup.
    */
  private def qIncNearDup(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q173_incnd_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "doc_id", "batch_no",
      numBuckets = 8)
    val docs = t(s, dir, "documents")
    graft.operators.IncrementalDedup.appendNovelNearDup(vt,
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 1L)
    graft.operators.IncrementalDedup.appendNovelNearDup(vt,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", 2L)
    vt.snapshot.select(col("doc_id"), col("h"), col("batch_no"))
      .orderBy(col("doc_id"))
  }

  /** Incremental SEMANTIC dedup-on-ingest (q204): q173's replay in
    * embedding space — batch 2 vectors sharing an adaptive sign
    * bucket (suggestSignBits, the q84 derivation) with batch 1's
    * admitted set at ≥ 0.20 cosine are turned away; the admitted
    * vectors ARE the index. The 0.20 demonstration threshold exists
    * because the synthetic embeddings are near-orthogonal (max
    * cross-batch in-bucket cosine ≈ 0.32; a production 0.95 gate
    * would reject nothing here and leave the reject path un-hashed) —
    * at sf0.01 it turns away 21 of 250 batch-2 vectors, so the oracle
    * pins BOTH paths. See IncrementalDedup.appendNovelSemantic.
    */
  private def qIncSemantic(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q204_incsem_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "id", "batch_no",
      numBuckets = 8)
    val embs = t(s, dir, "embeddings")
    val bits = Dedup.suggestSignBits(embs.count(), dim = 64)
    graft.operators.IncrementalDedup.appendNovelSemantic(vt,
      embs.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", 1L,
      simThreshold1e6 = 200000L, signBits = bits)
    graft.operators.IncrementalDedup.appendNovelSemantic(vt,
      embs.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", 2L,
      simThreshold1e6 = 200000L, signBits = bits)
    vt.snapshot.select(col("id"), col("bucket"), col("batch_no"))
      .orderBy(col("id"))
  }

  /** Incremental SEMANTIC dedup-on-ingest over a PQ-CODED index
    * (q246): q204's replay with the index at its documented real-scale
    * storage point — m=2/k=4 PQ codes instead of raw vectors (the q58
    * codebooks, deterministic integer k-means on the full corpus, so
    * both engines replay the codes), verify by ADC against the
    * admitted codes alone. Batch-2 vectors sharing an adaptive sign
    * bucket with batch-1's admitted set at mean per-subspace ADC
    * cosine ≥ 0.20 are turned away; the oracle re-derives training,
    * codes, buckets, the per-query LUT and the reject set, and the
    * snapshot's code columns are themselves hash-gated.
    * See IncrementalDedup.appendNovelSemanticPq.
    */
  private def qIncSemanticPq(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q246_incpq_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "id", "batch_no",
      numBuckets = 8)
    val embs = t(s, dir, "embeddings")
    val bits = Dedup.suggestSignBits(embs.count(), dim = 64)
    val cbs = Similarity.trainPqCodebooks(
      embs.select(col("vec_id").as("id"), col("embedding").as("emb")),
      m = 2, k = 4, iters = 2)
    graft.operators.IncrementalDedup.appendNovelSemanticPq(vt,
      embs.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", 1L,
      adcThreshold1e6 = 200000L, signBits = bits, codebooks = cbs)
    graft.operators.IncrementalDedup.appendNovelSemanticPq(vt,
      embs.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", 2L,
      adcThreshold1e6 = 200000L, signBits = bits, codebooks = cbs)
    vt.snapshot.select(col("id"), col("bucket"),
        element_at(col("codes"), 1).cast("long").as("code0"),
        element_at(col("codes"), 2).cast("long").as("code1"),
        col("batch_no"))
      .orderBy(col("id"))
  }

  /** k-center coreset (q174): greedy farthest-point selection of 3
    * diverse anchors (seed = lowest id), each round one distributed
    * argmin over the coverage frame — with the coverage-radius curve
    * in the output. See Similarity.kCenterSelect.
    */
  private def qKCenter(s: SparkSession, dir: String): DataFrame =
    Similarity.kCenterSelect(embCorpus(s, dir), k = 3)

  /** Semantic cosine histogram (q175): the within-cell candidate
    * pairs bucketed by fixed cosine with cumulative ≥ counts — the
    * threshold calibration table for semantic dedup (the q134/q172
    * analog for embeddings). Cell count is ADAPTIVE
    * (suggestSemanticCells = ⌊√n⌋, the q93 derivation, re-derived by
    * the oracle from its own count(*)): the histogram enumerates the
    * same ~n²/k within-cell population the dedup would, so a fixed k
    * is its own cliff (measured 31× at 10× data at k=8; adaptive
    * re-measured ~5×). See Dedup.semanticCosineHistogram.
    */
  private def qSemanticCosHist(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val k = graft.operators.Dedup.suggestSemanticCells(corpus.count())
    val cents = Similarity.trainCentroids(corpus, k = k, iters = 2)
    graft.operators.Dedup.semanticCosineHistogram(corpus, cents)
  }

  /** Semantic cosine histogram over SUBCELLS (q201): q175's
    * calibration table re-run over q164's (cid, cid2) two-level
    * population — constant subcell sizes make the enumerated pair
    * mass LINEAR in the corpus where the flat-cell q175 form is
    * n^1.5 by construction (measured 26.8× at 10× data). Both rows
    * stay in the battery: q175 calibrates the flat dedup's own
    * candidate stream, q201 is the corpus-scale production form.
    * See Dedup.semanticCosineHistogram2.
    */
  private def qSemanticCosHist2(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val k = graft.operators.Dedup.suggestSemantic2Params(corpus.count())
    val cents1 = Similarity.trainCentroids(corpus, k = k, iters = 2)
    graft.operators.Dedup.semanticCosineHistogram2(corpus, cents1, k2 = k, iters = 2)
  }

  /** Per-source attrition funnel (q176): q127's first-fail gate
    * attribution grouped by source with within-source shares — the
    * actionable per-feed loss table. See Curation.attritionFunnelBySource.
    */
  private def qAttritionBySource(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Curation.attritionFunnelBySource(docs,
      docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000), "source")
  }

  /** Held-out LM perplexity (q177): the KN bigram LM trained on the
    * even-id half, the odd-id half scored with the full unseen
    * ladder (interpolated → backoff → unseen-word floor) — the
    * honest train/test perplexity q165 can't show.
    * See TextAnalysis.docLmBitsHeldOut.
    */
  private def qLmHeldOut(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.TextAnalysis.docLmBitsHeldOut(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Word entropy / lexical diversity (q178): exact-integer per-doc
    * word entropy + type/token ratio, entirely map-side (one HOF
    * pass, zero shuffles). See TextAnalysis.wordEntropy.
    */
  private def qWordEntropy(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.wordEntropy(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** PQ quantization-error report (q179): per-vector cosine to the PQ
    * reconstruction, bucketed — the code-budget calibration table at
    * the error's source (q169 measures the recall symptom downstream).
    * See Similarity.pqErrorReport.
    */
  private def qPqError(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    Similarity.pqErrorReport(corpus, books)
  }

  /** Dup-graph degree histogram (q180): node-degree distribution of
    * the q18 LSH candidate graph with cumulative ≥ counts — the
    * hub-node screen read before any pair-expensive pass.
    * See Graph.degreeHistogram.
    */
  private def qDupDegreeHist(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.degreeHistogram(
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text"))

  /** Per-user event entropy (q181): exact-integer behavioral
    * diversity — the one-number bot/instrumentation-loop screen
    * (q137's transition matrix, collapsed). See
    * EventAnalytics.userEventEntropy.
    */
  private def qUserEntropy(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.userEventEntropy(
        tRaw(s, dir, "events"), "user_id", "event_type")
      .orderBy(col("user_id"))

  /** DSIR importance resampling (q182): q105's scores turned into
    * per-doc keep rates on the corpus's own score range, gated by the
    * md5-ppm coin — the probabilistic cut next to q113's hard band.
    * See TextAnalysis.dsirResample.
    */
  private def qDsirResample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.TextAnalysis.dsirResample(
        docs, "doc_id", "text", docs.filter(col("n_chars") < 150), "text")
      .orderBy(col("id"))
  }

  /** Char-class profile (q183): per-source letters/digits/punct/
    * whitespace/other byte split — the mojibake/markup alarm before
    * any tokenizer runs. See Diagnostics.charClassProfile.
    */
  private def qCharClassProfile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.charClassProfile(
      t(s, dir, "documents"), "source", "text")

  /** SimHash precision audit (q184): every Hamming-verified pair next
    * to its exact 3-gram Jaccard — the false-positive side of the
    * simhash gate (q172 is the recall side). Band width ADAPTIVE from
    * count(*) (the q82 derivation; measured 82× at 10× data at fixed
    * 8-bit bands — the audit walks the same candidate stream the
    * dedup would, the q172/q175 lesson a third time).
    * See Dedup.simhashPrecisionAudit.
    */
  private def qSimhashPrecision(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (bits, bands) = Dedup.suggestSimhashParams(docs.count(), bands = 4)
    Dedup.simhashPrecisionAudit(docs, "doc_id", "text", bits, bands)
      .withColumn("bits", lit(bits.toLong))
  }

  /** Sentence stats (q185): map-side per-doc sentence counts/lengths —
    * the Gopher-family shape signal at sentence granularity.
    * See TextAnalysis.sentenceStats.
    */
  private def qSentenceStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.sentenceStats(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Packing budget sweep (q186): exact sequence counts + tail waste
    * for candidate context lengths from per-shard token totals alone —
    * no placement run, any corpus size. See Chunker.packingBudgetSweep.
    */
  private def qPackingSweep(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunker.packingBudgetSweep(
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.tokenCount(col("text")).as("n_tokens")),
      "doc_id", "n_tokens", budgets = Seq(128L, 256L, 512L, 1024L), shards = 4)

  /** Windowed PMI (q187): ±3-token co-occurrence collocations — the
    * word2vec-style statistic beyond q154's adjacent pairs; pairs
    * built by map-side shifted zips, corpus never self-joins.
    * See TextAnalysis.windowedPmi.
    */
  private def qWindowedPmi(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.windowedPmi(t(s, dir, "documents"), "text")

  /** Incremental decontamination (q188): contamination flags FOLLOW a
    * versioned eval set — a second benchmark commit rescans the
    * corpus for only the grams it ADDED; prior flags carry. The
    * oracle recomputes flags against the FINAL eval state directly,
    * so maintained ≡ full is the hash contract (the q71 discipline
    * for benchmark hygiene). See Decontaminate.maintainEvalFlags.
    */
  private def qIncDecontam(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q188_dec_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode)).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val vt = new graft.operators.VersionedTable(s, root, "doc_id", "ver",
      numBuckets = 4)
    val docs = t(s, dir, "documents")
    val s1 = col("doc_id") % 97 === 0 && col("doc_id") < 5000
    val s2 = col("doc_id") % 89 === 0 && col("doc_id") < 5000
    vt.upsert(docs.filter(s1).select(col("doc_id"), col("text"), lit(1L).as("ver")))
    vt.upsert(docs.filter(s2 && !s1)
      .select(col("doc_id"), col("text"), lit(2L).as("ver")))
    graft.operators.Decontaminate.maintainEvalFlags(
        docs.filter(!s1 && !s2), "doc_id", "text", vt,
        prevTs = vt.commits.last, n = 3) // commits is newest-first; .last = commit 1 (the prev snapshot)
      .orderBy(col("doc_id"))
  }

  /** Source KS distance (q189): exact integer Kolmogorov–Smirnov gap
    * between each source's token-length CDF and the corpus's — the
    * feed-drift alarm. See Diagnostics.sourceKsDistance.
    */
  private def qSourceKs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.sourceKsDistance(
      t(s, dir, "documents"), "source", "text")

  /** Incremental ANN-index maintenance (q190): the PQ index follows
    * the versioned vector corpus — commit 2's inserts re-encode, its
    * deletes drop index rows, untouched buckets carry; quantizers
    * frozen at the commit-1 training. Oracle = full re-encode of the
    * final corpus state under the same frozen quantizers (maintained
    * ≡ full, the q96 discipline for vectors).
    * See Similarity.encodeIvfPq/maintainPqIndex.
    */
  /** q190's fixture — the versioned corpus at its FINAL state
    * (commits 1+2+delete), the frozen commit-1 quantizers, and the
    * commit-1 index rows — is scenery, not the measured operator;
    * build it once per (session, dir) so warm bench runs (warmup +
    * RUNS>1 min) time the maintenance pass itself. Every cached piece
    * is deterministic in `dir`, so Verify output is unchanged.
    */
  private final case class Q190Fixture(cvt: graft.operators.VersionedTable,
      ts1: String, coarse: Seq[(Int, Seq[Double])],
      books: Seq[Seq[(Int, Seq[Double])]], ivtTemplate: java.nio.file.Path)
  private val q190Seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Maintenance bench rows (q85/q96/q131/q190) first build immutable
    * multi-commit fixture tables; that scenery is not the measured
    * operator. Build once per (session, dir, tag) — every fixture is
    * deterministic in `dir`, so Verify output is unchanged; warm bench
    * runs (warmup pass + RUNS>1 min) then time the maintenance itself.
    */
  private val fixtureCache =
    new scala.collection.concurrent.TrieMap[(String, String, String), AnyRef]
  private def fixtureFor[A <: AnyRef](s: SparkSession, dir: String, tag: String)(
      build: => A): A =
    fixtureCache.getOrElseUpdate((s.sparkContext.applicationId, dir, tag),
      build).asInstanceOf[A]

  private def q190Fixture(s: SparkSession, dir: String): Q190Fixture =
    fixtureFor(s, dir, "q190") {
      val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q190_cvt_" + ProcessHandle.current().pid() + "_" +
          Integer.toHexString(dir.hashCode))
      graft.util.Fs.deleteRecursively(root)
      val corpus = embCorpus(s, dir)
      val cvt = new graft.operators.VersionedTable(s, root.toString, "id", "ver",
        numBuckets = 8)
      cvt.upsert(corpus.filter(col("id") % 2 === 0).withColumn("ver", lit(1L)))
      val ts1 = cvt.commits.head // exactly one commit exists here
      val frozen = cvt.snapshot.select(col("id"), col("emb"))
      val coarse = Similarity.trainCentroids(frozen, k = 8, iters = 2)
      val books = Similarity.trainPqCodebooks(frozen, m = 2, k = 4, iters = 2)
      // pristine commit-1 index table, written ONCE; per-call runs
      // seed from it by file copy (no Spark write inside the timed row)
      val tmpl = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q190_ivt0_" + ProcessHandle.current().pid() + "_" +
          Integer.toHexString(dir.hashCode))
      graft.util.Fs.deleteRecursively(tmpl)
      new graft.operators.VersionedTable(s, tmpl.toString, "id", "ver",
          numBuckets = 8)
        .upsert(Similarity.encodeIvfPq(frozen, coarse, books)
          .join(cvt.snapshot.select(col("id"), col("ver")), Seq("id")))
      cvt.upsert(corpus.filter(col("id") % 2 === 1).withColumn("ver", lit(2L)))
      cvt.delete(corpus.filter(col("id") % 10 === 0).select(col("id")))
      Q190Fixture(cvt, ts1, coarse, books, tmpl)
    }

  private def qIndexMaintainAnn(s: SparkSession, dir: String): DataFrame = {
    val fx = q190Fixture(s, dir)
    // the index table is MUTATED by maintenance, so each call gets a
    // fresh one seeded from the cached commit-1 rows; only this seed
    // write + the maintenance pass are inside the timed lambda
    val ip = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_q190_ivt_" + ProcessHandle.current().pid() + "_" +
        Integer.toHexString(dir.hashCode) + "_" + q190Seq.incrementAndGet())
    graft.util.Fs.deleteRecursively(ip)
    graft.util.Fs.copyRecursively(fx.ivtTemplate, ip)
    val ivt = new graft.operators.VersionedTable(s, ip.toString, "id", "ver",
      numBuckets = 8)
    Similarity.maintainPqIndex(ivt, fx.cvt, fx.ts1, fx.coarse, fx.books)
    val out = ivt.snapshot.select(col("id"), col("cid").cast("long").as("cid"),
        element_at(col("codes"), 1).cast("long").as("c0"),
        element_at(col("codes"), 2).cast("long").as("c1"))
      .orderBy(col("id")).localCheckpoint(true)
    graft.util.Fs.deleteRecursively(ip) // scratch doesn't accumulate across runs
    out
  }

  /** Recall curve (q191): recall@k of the sign-bucket ANN path at
    * k ∈ {1,3,5,10} from one pair of rankings — q155 widened to the
    * curve a k/nprobe decision reads. See Similarity.recallCurve.
    */
  private def qRecallCurve(s: SparkSession, dir: String): DataFrame =
    Similarity.recallCurve(embCorpus(s, dir),
      embCorpus(s, dir).filter(col("id") % 200 === 0 && col("id") < 2000),
      ks = Seq(1, 3, 5, 10), signBits = 6)

  /** Per-doc gate verdicts (q192): the q127 funnel's verdict table
    * row-by-row — the "why is doc X missing" provenance record.
    * See Curation.gateVerdicts.
    */
  private def qGateVerdicts(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Curation.gateVerdicts(docs,
        docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000))
      .orderBy(col("doc_id"))
  }

  /** KMV distinct-gram estimate (q193): the k-minimum-values sketch
    * next to its exact companion with the 3σ/√k bound flag — the
    * third sketch family after HLL (q35) and count-min (q62).
    * See Sketches.kmvDistinctGrams.
    */
  private def qKmvDistinct(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvDistinctGrams(t(s, dir, "documents"), "text")

  /** KMV production form (q202): the sketch alone — bounded
    * per-partition k-set state, ≤ partitions·k longs shuffled, no
    * exact-distinct audit pass (q193 keeps that companion; its slope
    * IS the audit's full distinct). See Sketches.kmvSketchGrams.
    */
  private def qKmvSketch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvSketchGrams(t(s, dir, "documents"), "text")

  /** MRR-by-label audit (q194): mean reciprocal rank of the first
    * same-label neighbor, exact vs sign-bucket path — the IR-metric
    * cost of compression in one row pair. See Similarity.mrrByLabel.
    */
  private def qMrrByLabel(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    Similarity.mrrByLabel(corpus,
      t(s, dir, "embeddings").select(col("vec_id").as("id"), col("label")),
      corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
      k = 5, signBits = 6)
  }

  /** Correlation report (q195): exact-integer r² (ppm) + sign between
    * token count and the q41 quality score — "is my quality score
    * just length" as one engine-exact number (score pre-scaled DIV
    * 1000; r is scale-invariant). See Diagnostics.corrReport.
    */
  private def qCorrReport(s: SparkSession, dir: String): DataFrame = {
    val xy = t(s, dir, "documents").select(
      graft.functions.tokenCount(col("text")).as("x"),
      graft.operators.TextAnalysis.curationGates(col("text")).as("_g"))
      .select(col("x"), expr("_g.quality_1e6 DIV 1000").as("y"))
    graft.operators.Diagnostics.corrReport(xy, col("x"), col("y"))
  }

  /** Inter-arrival bands (q196): per event type, log₂-µs gap
    * histogram of each user's consecutive events — the burstiness /
    * bot profile. See EventAnalytics.interArrivalBands.
    */
  private def qInterArrival(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.interArrivalBands(
      tRaw(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), expr("ts DIV 1000").as("ts_us")),
      "user_id", "event_type", "ts_us", "event_id")

  /** Dataset card (q197): the one-row corpus release header — docs,
    * tokens, distinct content / exact-dup share, floor-mean quality,
    * majority language. See Diagnostics.datasetCard.
    */
  private def qDatasetCard(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.datasetCard(t(s, dir, "documents"), "text")

  /** Bucket balance audit (q198): per-bucket shares + the max/mean
    * imbalance ppm for the 16-bucket key-hash layout — the hot-key
    * pre-check before committing a bucket count.
    * See Layout.bucketBalanceAudit.
    */
  private def qBucketBalance(s: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.bucketBalanceAudit(
      t(s, dir, "documents"), col("doc_id"), numBuckets = 16)

  /** Pipeline run report (q199): the end-to-end curation → split →
    * packing capstone in one row — raw/after-exact/after-near/curated
    * counts, curated token mass, train/val/test sizes, and the exact
    * packed-sequence count at budget 512. One funnel pass + one
    * survivor projection. See Curation.pipelineReport.
    */
  private def qPipelineReport(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Curation.pipelineReport(docs,
      docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000))
  }

  /** Local-supplier volume (q200): the TPC-H Q5 shape — the battery's
    * deepest join tree (region → nation → customer → orders →
    * lineitem → supplier with the classic supplier-in-customer-nation
    * condition and a one-year date band). Only the genuinely bounded
    * dims (region: 5 rows, nation: 25 rows) carry a user broadcast
    * hint; customer and supplier scale linearly with SF, so their join
    * strategy is left to AQE — broadcast at small SF, shuffle join at
    * cluster scale (a forced hint would be a driver-OOM at 100 TB).
    * The date filter pushes to the orders scan; revenue is the
    * per-row floor-cents integer sum (engine-exact doubles).
    */
  private def qLocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    t(s, dir, "orders")
      .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01'" +
        " AND o_orderdate < TIMESTAMP '1997-01-01'"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long")).cast("long").as("revenue_c"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue_c").desc, col("n_name"))
  }

  /** Cluster purity (q158): the q49 trained quantizer audited against
    * ground-truth labels. See Similarity.cellPurity.
    */
  private def qCellPurity(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val cents = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    Similarity.cellPurity(corpus,
      t(s, dir, "embeddings").select(col("vec_id").as("id"), col("label")),
      cents)
  }

  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (qPricingSummary _),
    "q02_status_topk" -> (qStatusTopK _),
    "q03_canonical_projection" -> (qCanonicalProjection _),
    "q04_scrub_documents" -> (qScrubDocuments _),
    "q05_sha_chain" -> (qShaChain _),
    "q06_rollup_counts" -> (qRollupCounts _),
    "q07_window_latest" -> (qWindowLatest _),
    "q08_join_revenue" -> (qJoinRevenue _),
    "q09_coalesce_fallback" -> (qCoalesceFallback _),
    "q10_union_sources" -> (qUnionSources _),
    "q11_distinct_types" -> (qDistinctTypes _),
    "q12_validation_probe" -> (qValidationProbe _),
    "q13_error_samples" -> (qErrorSamples _),
    "q14_date_format" -> (qDateFormat _),
    "q15_json_extract" -> (qJsonExtract _),
    "q16_positional_fields" -> (qPositionalFields _),
    "q17_dedup_exact" -> (qDedupExact _),
    "q18_minhash_lsh_pairs" -> (qMinhashLsh _),
    "q19_simhash" -> (qSimhash _),
    "q20_ngram_jaccard" -> (qNgramJaccard _),
    "q21_ann_brute_force" -> (qAnnBruteForce _),
    "q22_ann_bucketed" -> (qAnnBucketed _),
    "q23_embedding_near_dups" -> (qEmbeddingNearDups _),
    "q24_token_count" -> (qTokenCount _),
    "q25_quality_signals" -> (qQualitySignals _),
    "q26_lang_id" -> (qLangId _),
    "q27_fingerprint" -> (qFingerprint _),
    "q28_multimodal_meta" -> (qMultimodalMeta _),
    "q29_windowed_events" -> (qWindowedEvents _),
    "q30_rollup" -> (qRollup _),
    "q31_semi_anti" -> (qSemiAnti _),
    "q32_asof_prev_click" -> (qAsOfPrevClick _),
    "q33_dedup_keep" -> (qDedupKeep _),
    "q34_scrub_rule_hits" -> (qScrubRuleHits _),
    "q35_sketches" -> (qSketches _),
    "q36_dup_clusters" -> (qDupClusters _),
    "q37_sessionize" -> (qSessionize _),
    "q38_string_funcs" -> (qStringFuncs _),
    "q39_exact_median" -> (qExactMedian _),
    "q40_pivot_events" -> (qPivotEvents _),
    "q41_quality_score" -> (qQualityScore _),
    "q42_hl7_component" -> (qHl7Component _),
    "q43_range_join" -> (qRangeJoin _),
    "q44_curation" -> (qCuration _),
    "q45_simhash_pairs" -> (qSimhashPairs _),
    "q46_cow_merge" -> (qCowMerge _),
    "q47_chunking" -> (qChunking _),
    "q48_stratified_sample" -> (qStratifiedSample _),
    "q49_ann_ivf" -> (qAnnIvf _),
    "q50_split" -> (qSplit _),
    "q51_bm25" -> (qBm25 _),
    "q52_packing" -> (qPacking _),
    "q53_bm25_multi" -> (qBm25Multi _),
    "q54_packing_nosplit" -> (qPackingNoSplit _),
    "q55_decontaminate" -> (qDecontaminate _),
    "q56_repetition" -> (qRepetition _),
    "q57_curation_v2" -> (qCurationV2 _),
    "q58_pq_adc" -> (qPqAdc _),
    "q59_ivf_pq" -> (qIvfPq _),
    "q60_hybrid_rrf" -> (qHybridRrf _),
    "q61_mixture_rebalance" -> (qMixture _),
    "q62_heavy_hitters" -> (qHeavyHitters _),
    "q63_funnel" -> (qFunnel _),
    "q64_retention" -> (qRetention _),
    "q65_decontaminate_bloom" -> (qDecontaminateBloom _),
    "q66_cow_delete" -> (qCowDelete _),
    "q67_quantile_gate" -> (qQuantileGate _),
    "q68_trailing_window" -> (qTrailingWindow _),
    "q69_zorder" -> (qZorder _),
    "q70_inverted_index" -> (qInvertedIndex _),
    "q71_rollup_maintain" -> (qRollupMaintain _),
    "q72_commit_diff" -> (qCommitDiff _),
    "q73_key_skew" -> (qKeySkew _),
    "q74_dedup_normalized" -> (qDedupNormalized _),
    "q75_ngram_containment" -> (qNgramContainment _),
    "q76_fuzzy_names" -> (qFuzzyNames _),
    "q77_cube_counts" -> (qCubeCounts _),
    "q78_topk_agg" -> (qTopKAgg _),
    "q79_decayed_sum" -> (qDecayedSum _),
    "q80_equidepth_hist" -> (qEquiDepthHist _),
    "q81_bpe_tokens" -> (qBpeTokens _),
    "q82_simhash_adaptive" -> (qSimhashAdaptive _),
    "q84_near_dups_adaptive" -> (qNearDupsAdaptive _),
    "q83_ivf_pq_residual" -> (qIvfPqResidual _),
    "q85_rollup_cdc" -> (qRollupCdc _),
    "q86_semantic_dedup" -> (qSemanticDedup _),
    "q87_segment_dedup" -> (qSegmentDedup _),
    "q88_lm_surprisal" -> (qLmSurprisal _),
    "q89_temperature_sample" -> (qTemperatureSample _),
    "q90_bigram_surprisal" -> (qBigramSurprisal _),
    "q91_contamination_report" -> (qContaminationReport _),
    "q92_source_overlap" -> (qSourceOverlap _),
    "q93_semantic_adaptive" -> (qSemanticAdaptive _),
    "q94_incremental_dedup" -> (qIncrementalDedup _),
    "q95_contamination_gate" -> (qContaminationGate _),
    "q96_index_maintain" -> (qIndexMaintain _),
    "q97_dup_spans" -> (qDupSpans _),
    "q98_epoch_mixture" -> (qEpochMixture _),
    "q99_sq8_ann" -> (qSq8Ann _),
    "q100_near_dup_decontaminate" -> (qNearDupDecontaminate _),
    "q101_dup_span_removal" -> (qDupSpanRemove _),
    "q102_phrase_search" -> (qPhraseSearch _),
    "q103_winnowing" -> (qWinnowing _),
    "q104_winnowing_pairs" -> (qWinnowingPairs _),
    "q105_dsir_weights" -> (qDsirWeights _),
    "q106_stratified_head" -> (qStratifiedHead _),
    "q107_corpus_health" -> (qCorpusHealth _),
    "q108_shard_layout" -> (qShardLayout _),
    "q109_length_batches" -> (qLengthBatches _),
    "q110_vocab_report" -> (qVocabReport _),
    "q111_decontaminated_split" -> (qDecontaminatedSplit _),
    "q112_cluster_balance" -> (qClusterBalance _),
    "q113_dsir_select" -> (qDsirSelect _),
    "q114_tokenizer_fertility" -> (qTokenizerFertility _),
    "q115_cluster_best" -> (qClusterBest _),
    "q116_cdc_dedup" -> (qCdcDedup _),
    "q117_token_budget" -> (qTokenBudget _),
    "q118_curation_v3" -> (qCurationV3 _),
    "q119_hard_negatives" -> (qHardNegatives _),
    "q120_minhash_estimate" -> (qMinhashEstimate _),
    "q121_source_near_dups" -> (qSourceNearDups _),
    "q122_score_calibration" -> (qScoreCalibration _),
    "q123_deboilerplate" -> (qDeboilerplate _),
    "q124_lang_margin" -> (qLangMargin _),
    "q125_kneser_ney" -> (qKneserNey _),
    "q126_column_stats" -> (qColumnStats _),
    "q127_gate_attrition" -> (qAttrition _),
    "q128_cluster_cohesion" -> (qClusterCohesion _),
    "q129_ccnet_buckets" -> (qCcnetBuckets _),
    "q130_hashed_tf" -> (qHashedTf _),
    "q131_release_delta" -> (qReleaseDelta _),
    "q132_dup_mass" -> (qDupMassHist _),
    "q133_mmr_rerank" -> (qMmr _),
    "q134_jaccard_sweep" -> (qJaccardSweep _),
    "q135_source_divergence" -> (qSourceDivergence _),
    "q136_health_heatmap" -> (qHealthHeatmap _),
    "q137_markov_matrix" -> (qTransitionMatrix _),
    "q138_user_cap" -> (qUserCap _),
    "q139_rolling_active" -> (qRollingActive _),
    "q140_curriculum" -> (qCurriculum _),
    "q141_attribution" -> (qAttribution _),
    "q142_pagerank" -> (qPageRank _),
    "q143_event_drift" -> (qEventDrift _),
    "q144_source_centroids" -> (qSourceCentroids _),
    "q145_mutual_best" -> (qMutualBest _),
    "q146_quota_split" -> (qQuotaSplit _),
    "q147_eval_coverage" -> (qEvalCoverage _),
    "q148_gopher_rules" -> (qGopherRules _),
    "q149_repeated_ngrams" -> (qRepeatedNgrams _),
    "q150_priority_sample" -> (qPrioritySample _),
    "q151_daily_anomaly" -> (qDailyAnomaly _),
    "q152_tfidf_keywords" -> (qTfidfKeywords _),
    "q153_novelty_curve" -> (qNoveltyCurve _),
    "q154_pmi_collocations" -> (qPmiCollocations _),
    "q155_ann_recall" -> (qAnnRecall _),
    "q156_user_features" -> (qUserFeatures _),
    "q157_freq_spectrum" -> (qFreqSpectrum _),
    "q158_cell_purity" -> (qCellPurity _),
    "q159_source_gini" -> (qSourceGini _),
    "q160_audience_overlap" -> (qAudienceOverlap _),
    "q161_gram_matrix" -> (qGramMatrix _),
    "q162_dup_triangles" -> (qDupTriangles _),
    "q163_semantic_sampled" -> (qSemanticSampled _),
    "q164_semantic_2level" -> (qSemantic2Level _),
    "q165_doc_lm_bits" -> (qDocLmBits _),
    "q166_pc1_outliers" -> (qPc1Outliers _),
    "q167_ivf_pq_refine" -> (qIvfPqRefine _),
    "q168_lsh_band_sweep" -> (qLshBandSweep _),
    "q169_refine_recall" -> (qRefineRecall _),
    "q170_vocab_coverage" -> (qVocabCoverage _),
    "q171_dedup_savings" -> (qDedupSavings _),
    "q172_simhash_hamming" -> (qSimhashHamming _),
    "q173_inc_near_dup" -> (qIncNearDup _),
    "q174_kcenter_coreset" -> (qKCenter _),
    "q175_semantic_cos_hist" -> (qSemanticCosHist _),
    "q176_attrition_by_source" -> (qAttritionBySource _),
    "q177_lm_heldout" -> (qLmHeldOut _),
    "q178_word_entropy" -> (qWordEntropy _),
    "q179_pq_error" -> (qPqError _),
    "q180_dup_degree_hist" -> (qDupDegreeHist _),
    "q181_user_entropy" -> (qUserEntropy _),
    "q182_dsir_resample" -> (qDsirResample _),
    "q183_char_classes" -> (qCharClassProfile _),
    "q184_simhash_precision" -> (qSimhashPrecision _),
    "q185_sentence_stats" -> (qSentenceStats _),
    "q186_packing_sweep" -> (qPackingSweep _),
    "q187_windowed_pmi" -> (qWindowedPmi _),
    "q188_inc_decontam" -> (qIncDecontam _),
    "q189_source_ks" -> (qSourceKs _),
    "q190_index_maintain_ann" -> (qIndexMaintainAnn _),
    "q191_recall_curve" -> (qRecallCurve _),
    "q192_gate_verdicts" -> (qGateVerdicts _),
    "q193_kmv_distinct" -> (qKmvDistinct _),
    "q194_mrr_by_label" -> (qMrrByLabel _),
    "q195_corr_report" -> (qCorrReport _),
    "q196_interarrival" -> (qInterArrival _),
    "q197_dataset_card" -> (qDatasetCard _),
    "q198_bucket_balance" -> (qBucketBalance _),
    "q199_pipeline_report" -> (qPipelineReport _),
    "q200_local_supplier_volume" -> (qLocalSupplierVolume _),
    "q201_semantic_cos_hist2" -> (qSemanticCosHist2 _),
    "q202_kmv_sketch" -> (qKmvSketch _),
    "q203_semantic_3level" -> (qSemantic3Level _),
    "q204_inc_semantic" -> (qIncSemantic _),
    "q205_simhash_capped" -> (qSimhashCapped _),
    "q206_image_ahash" -> (qImageAHash _),
    "q207_audio_envelope" -> (qAudioEnvelope _),
    "q208_audio_neardup" -> (qAudioNearDup _),
    "q209_image_neardup" -> (qImageNearDup _),
    "q210_audio_resample" -> (qAudioResample _),
    "q211_video_frames" -> (qVideoFrames _),
    "q212_image_dup_clusters" -> (qImageDupClusters _),
    "q213_bpe_train" -> (qBpeTrain _),
    "q214_inc_media" -> (qIncMedia _),
    "q215_kmv_merge" -> (qKmvMerge _),
    "q216_image_dup_clusters2" -> (qImageDupClusters2 _),
    "q217_cms_merge" -> (qCmsMerge _),
    "q218_schema_evolution" -> (qSchemaEvolution _),
    "q219_signbits_audit" -> (qSignBitsAudit _),
    "q220_schema_migrations" -> (qSchemaMigrations _),
    "q221_quantile_merge" -> (qQuantileMerge _),
    "q222_sketch_maintain" -> (qSketchMaintain _),
    "q223_sketch_gate" -> (qSketchGate _),
    "q224_kmv_jaccard" -> (qKmvJaccard _),
    "q225_robust_outliers" -> (qRobustOutliers _),
    "q226_kmv_jaccard_sparse" -> (qKmvJaccardSparse _),
    "q227_frame_decode" -> (qFrameDecode _),
    "q228_video_neardup" -> (qVideoNearDup _),
    "q229_jaccard_frontier_law" -> (qJaccardFrontierLaw _),
    "q230_rp_error_sweep" -> (qRpErrorSweep _),
    "q231_rp_refine" -> (qRpRefine _),
    "q232_stitch_pairs" -> (qStitchPairs _),
    "q233_maintain_prio_sample" -> (qMaintainPrioritySample _),
    "q234_prio_sample_stratum" -> (qPrioritySampleByStratum _),
    "q235_embedding_health" -> (qEmbeddingHealth _),
    "q236_stitch_reassemble" -> (qStitchReassemble _),
    "q237_video_neardup2" -> (qVideoNearDup2 _),
    "q238_big_orders" -> (qBigOrders _),
    "q239_stitch_ingest" -> (qStitchIngest _),
    "q240_ams_join_size" -> (qAmsJoinSize _),
    "q241_ams_m_law" -> (qAmsMLaw _),
    "q242_stitch_df_law" -> (qStitchDfLaw _),
    "q243_ams_estimate" -> (qAmsEstimate _),
    "q244_shipping_priority" -> (qShippingPriority _),
    "q245_bloom_prune" -> (qBloomPrune _),
    "q246_inc_semantic_pq" -> (qIncSemanticPq _),
    "q247_bloom_prune_rel" -> (qBloomPruneRel _),
    "q248_waiting_suppliers" -> (qWaitingSuppliers _),
    "q249_maintain_clusters" -> (qMaintainClusters _),
    "q250_maintain_clusters_delta" -> (qMaintainClustersDelta _),
    "q251_kmv_key_overlap" -> (qKmvKeyOverlap _),
    "q252_kmv_key_overlap_est" -> (qKmvKeyOverlapEst _),
    "q253_seam_width_law" -> (qSeamWidthLaw _),
    "q254_excess_stock" -> (qExcessStock _),
    "q255_maintain_gate" -> (qMaintainGate _),
    "q256_dormant_customers" -> (qDormantCustomers _),
    "q257_small_qty_revenue" -> (qSmallQtyRevenue _),
    "q258_top_supplier" -> (qTopSupplier _),
    "q259_min_cost_supplier" -> (qMinCostSupplier _),
    "q260_important_stock" -> (qImportantStock _),
    "q261_seam_laws_composed" -> (qSeamLawsComposed _),
    "q262_repair_after_delete" -> (qRepairAfterDelete _),
    "q263_takedown_gate" -> (qTakedownGate _),
    "q264_sample_gate" -> (qSampleGate _),
    "q265_cust_order_dist" -> (qCustOrderDist _),
    "q266_disjunctive_revenue" -> (qDisjunctiveRevenue _),
    "q267_priority_late_count" -> (qPriorityLateCount _),
    "q268_volume_shipping" -> (qVolumeShipping _),
    "q269_market_share" -> (qMarketShare _),
    "q270_product_profit" -> (qProductProfit _),
    "q271_returned_items" -> (qReturnedItems _),
    "q272_shipmode_priority" -> (qShipmodePriority _),
    "q273_promo_revenue" -> (qPromoRevenue _),
    "q274_supplier_part_cnt" -> (qSupplierPartCnt _),
    "q275_forecast_revenue" -> (qForecastRevenue _),
    "q276_bucketed_colocated" -> (qBucketedColocated _),
    "q277_salted_skew_join" -> (qSaltedSkewJoin _),
    "q278_skew_advisor" -> (qSkewAdvisor _),
    "q279_sample_takedown_gate" -> (qSampleTakedownGate _),
    "q280_takedown_pruned" -> (qTakedownPruned _),
    "q281_takedown_everywhere" -> (qTakedownEverywhere _))

  def oracleSql: Map[String, String] = OracleSql.all
}
