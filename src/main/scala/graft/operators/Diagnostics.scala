package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the measurements that decide layout
  * and join strategy before anyone burns a cluster-day discovering
  * them the hard way.
  */
object Diagnostics {

  /** Key-skew report for a prospective join/partition key: the top-K
    * hottest keys with their row share, alongside the per-key count
    * distribution (p50 / p99 / max) and the distinct-key count — the
    * numbers that decide between a plain shuffle join, AQE skew
    * handling, and an explicit [[Layout.saltedJoin]].
    *
    * Scale shape: one shuffle (the key groupBy with map-side partial
    * aggregation), then a TakeOrdered for the top-K (never a global
    * sort) and a single-row stats aggregate broadcast onto the K rows.
    * The rank window runs over only the K survivors. Exact percentile
    * here is over per-key COUNTS (cardinality = distinct keys); for
    * billion-key domains switch the percentile to approx_percentile —
    * the report stays the same shape.
    *
    * Output: (rank, key, n, share_1e6, n_keys, p50_n, p99_n, max_n).
    */
  /** Equi-depth histogram WITHOUT a global sort: bucket bounds come
    * from one exact interpolated-percentile aggregate (≡ DuckDB
    * quantile_cont — the battery's established parity), broadcast back
    * onto a scan-speed bucket-assignment filter + groupBy. The ntile
    * formulation this replaces is a single-partition global sort —
    * unusable at scale; here the only full pass is the percentile agg
    * over the (pruned) value column. Rows with NULL values are
    * dropped. Output: (bucket, n, lo, hi) — observed min/max per
    * bucket, `buckets` rows at most (empty buckets emit no row).
    */
  def equiDepthHistogram(df: DataFrame, value: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val bounds = df.agg(percentile(value, typedLit(ps)).as("_bs"))
    val assigned = df.withColumn("_v", value).filter(col("_v").isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("_bucket",
        (0 until buckets - 1).foldRight(lit((buckets - 1).toLong)) { (i, acc) =>
          when(col("_v") <= element_at(col("_bs"), i + 1), lit(i.toLong)).otherwise(acc)
        })
    assigned.groupBy(col("_bucket").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("_v")).as("lo"), max(col("_v")).as("hi"))
  }

  /** ANALYZE-style per-column statistics — row count, non-null count,
    * exact NDV, and min/max (rendered as strings so heterogeneous
    * column types share one report schema): the numbers that drive
    * broadcast-vs-shuffle decisions, bucketing counts, and skew
    * alarms. One pass over the table: the multi-column exact
    * count(DISTINCT) aggregate plans as a single Expand-based
    * aggregation (rows fan out ×|cols| in-flight but the source is
    * read once — the same plan Spark's own ANALYZE ... FOR COLUMNS
    * runs). For billion-row interactive use swap the exact NDV for
    * approx_count_distinct — the HLL error contract is the q35 /
    * [[Sketches]] pattern; here exact is what the oracle can replay.
    *
    * Output: (column_name, n_rows, n_nonnull, n_distinct, min_value,
    * max_value), one row per requested column.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      count_distinct(col(c)).as(s"ndv_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, ndv_$c, min_$c, max_$c").mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, n_distinct, min_value, max_value)")
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Robust per-group outlier report (q225): median and MAD estimated
    * from the group's bottom-k-by-hash sample
    * ([[Sketches.bottomKBySource]], q221 — ceil-rank order statistics,
    * reproducible on any engine), then one scan-speed pass counts rows
    * beyond `nMads`·MAD of the median. Median/MAD resist the heavy
    * tails that make mean/stddev gates useless on document-length
    * distributions (one 100 MB crawl artifact moves a mean, not a
    * median), and computing BOTH from the ≤ groups·k sample keeps the
    * robust pass as cheap as the naive one: the two "medians" (value,
    * then absolute deviation) never touch the data — only the final
    * count does, with ≤ |groups| threshold rows broadcast.
    *
    * A constant group has MAD 0 — any deviation flags, the correct
    * degenerate reading. NULL values count into n_docs but never into
    * n_outliers (a missing measurement is not an outlying one).
    *
    * Output: (source, n_docs, med_est, mad_est, n_outliers) per group.
    */
  def robustOutlierReport(docs: DataFrame, id: Column, value: Column,
      group: Column, k: Int = 128, nMads: Int = 3): DataFrame = {
    require(k >= 2 && nMads >= 1, s"need k >= 2, nMads >= 1: $k, $nMads")
    import org.apache.spark.sql.expressions.Window
    import graft.functions.md5Long
    val base = docs.select(group.as("_ro_g"), value.cast("long").as("_ro_v"),
      md5Long(id.cast("string")).as("_ro_h"))
    val samples = Sketches.bottomKBySource(base.filter(col("_ro_v").isNotNull)
        .select(col("_ro_g").as("source"), col("_ro_h").as("h"),
          col("_ro_v").as("v")), k)
      .localCheckpoint(true) // ≤ groups·k rows, walked twice
    val mPer = samples.groupBy(col("source")).agg(count(lit(1)).as("_m"))
    def ceilRank(pct: Int) = expr(s"($pct * _m + 99) DIV 100")
    val med = samples.withColumn("_rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("v"), col("h"))))
      .join(mPer, "source")
      .filter(col("_rn") === ceilRank(50))
      .select(col("source"), col("v").as("med_est"))
    // second order statistic, same sample: median absolute deviation
    val mad = samples.join(med, "source")
      .withColumn("_dev", abs(col("v") - col("med_est")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("_dev"), col("h"))))
      .join(mPer, "source")
      .filter(col("_rn") === ceilRank(50))
      .select(col("source"), col("med_est"), col("_dev").as("mad_est"))
    base.join(broadcast(mad), col("_ro_g") <=> col("source"))
      .groupBy(col("source"), col("med_est"), col("mad_est"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_ro_v").isNotNull &&
          abs(col("_ro_v") - col("med_est")) > lit(nMads.toLong) * col("mad_est"),
          1L).otherwise(0L)).as("n_outliers"))
      .select(col("source"), col("n_docs"), col("med_est"), col("mad_est"),
        col("n_outliers"))
      .orderBy(col("source"))
  }

  /** Source-divergence matrix: add-one-smoothed KL(a‖b) between each
    * ordered pair of sources' unigram distributions, in the battery's
    * exact integer floor-log2 "bits" arithmetic (binary digit counts —
    * no floating log, so any engine reproduces it bit-for-bit):
    *
    *   s'_x(w) = bits(N_x + V) − bits(c_x(w) + 1)
    *   KL(a‖b) ≈ Σ_{w: c_a(w)>0} c_a(w)·(s'_b(w) − s'_a(w)) / N_a
    *
    * — the "which feeds are interchangeable, which add new
    * distribution mass" table that mixture design reads before
    * weighting sources. Coarse (log2 granularity) but ordinal-stable;
    * the quotient is offset-positive (`(num + 63·N_a)·1000 div N_a −
    * 63000`, millibits) so Spark DIV ≡ DuckDB // despite the
    * floor-log2 approximation admitting small negative sums.
    *
    * Scale shape: one (source, term) count shuffle (vocab-bounded);
    * the a-side count table fans out only ×(|sources|−1) against a
    * broadcast source list; per-pair aggregate is |sources|² rows.
    */
  def sourceDivergence(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    import graft.functions.tokens
    val toksDf = docs.select(col(sourceCol).as("source"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val counts = toksDf.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val vdf = counts.agg(count_distinct(col("term")).as("v"))
    val aSide = counts.select(col("source").as("source_a"), col("term"),
      col("c").as("ca"))
    val bCounts = counts.select(col("source").as("source_b"), col("term"),
      col("c").as("cb"))
    val bits = (x: Column) => length(bin(x)).cast("long")
    val expanded = aSide
      .join(broadcast(totals.select(col("source").as("source_b"), col("n").as("nb"))),
        col("source_a") =!= col("source_b"))
      .join(bCounts, Seq("source_b", "term"), "left")
      .na.fill(0L, Seq("cb"))
      .join(broadcast(totals.select(col("source").as("source_a"), col("n").as("na"))),
        Seq("source_a"))
      .crossJoin(broadcast(vdf))
      .select(col("source_a"), col("source_b"), col("na"),
        (col("ca") * ((bits(col("nb") + col("v")) - bits(col("cb") + 1)) -
          (bits(col("na") + col("v")) - bits(col("ca") + 1)))).as("contrib"))
    expanded.groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("contrib")).as("_num"), first(col("na")).as("_na"))
      .withColumn("kl_mbits",
        expr("((_num + 63 * _na) * 1000) DIV _na - 63000"))
      .select(col("source_a"), col("source_b"), col("kl_mbits"))
  }

  /** Temporal drift series: add-one-smoothed KL(bucket ‖ previous
    * bucket) of a categorical distribution across consecutive ordered
    * buckets — the "did the stream change shape overnight" monitor
    * (event-mix drift, source-mix drift, label drift) that catches
    * upstream breakage before any single count alarms. Same exact
    * integer floor-log2 bits arithmetic and offset-positive millibit
    * quotient as [[sourceDivergence]], so the series is bit-identical
    * on every engine; buckets with no predecessor bucket (the first,
    * or any bucket following a gap) emit nothing.
    *
    * Scale shape: one (bucket, category) count shuffle (bounded by
    * buckets × |categories|); the consecutive-bucket join fans each
    * count row to at most ONE neighbor — |buckets| output rows.
    */
  def temporalDrift(df: DataFrame, bucket: Column, category: Column): DataFrame = {
    val counts = df.select(bucket.cast("long").as("bucket"), category.as("cat"))
      .groupBy(col("bucket"), col("cat")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("bucket")).agg(sum(col("c")).as("n"))
    val vdf = counts.agg(count_distinct(col("cat")).as("v"))
    val bits = (x: Column) => length(bin(x)).cast("long")
    val cur = counts.select(col("bucket"), col("cat"), col("c").as("ca"))
    val prev = counts.select((col("bucket") + 1L).as("bucket"), col("cat"),
      col("c").as("cb"))
    val expanded = cur
      .join(broadcast(totals.select((col("bucket") + 1L).as("bucket"),
        col("n").as("nb"))), Seq("bucket"))
      .join(prev, Seq("bucket", "cat"), "left")
      .na.fill(0L, Seq("cb"))
      .join(broadcast(totals), Seq("bucket"))
      .crossJoin(broadcast(vdf))
      .select(col("bucket"), col("n").as("na"),
        (col("ca") * ((bits(col("nb") + col("v")) - bits(col("cb") + 1)) -
          (bits(col("n") + col("v")) - bits(col("ca") + 1)))).as("contrib"))
    expanded.groupBy(col("bucket"))
      .agg(sum(col("contrib")).as("_num"), first(col("na")).as("_na"))
      .withColumn("kl_mbits",
        expr("((_num + 63 * _na) * 1000) DIV _na - 63000"))
      .select(col("bucket"), col("kl_mbits"))
  }

  /** Corpus-health heatmap: the joint (log2 length-bucket × quality
    * decile) document counts — the 2-D picture that separates "short
    * docs are low quality" from "we have two disjoint populations",
    * which no pair of 1-D histograms can distinguish. Buckets are
    * exact integer arithmetic: len_bits = binary digit count of the
    * char length (the battery's floor-log2 idiom), q_decile =
    * quality_1e6 div 100000 with the perfect-score row clamped into
    * decile 9. One scan, one bounded (≤ ~64×10 group) aggregate.
    */
  def healthHeatmap(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
        length(bin(length(coalesce(col(textCol), lit(""))).cast("long")))
          .cast("long").as("len_bits"),
        floor(TextAnalysis.qualityScoreRaw(col(textCol)) * lit(1000000.0))
          .cast("long").as("_q"))
      .select(col("len_bits"), expr("least(_q DIV 100000, 9L)").as("q_decile"))
      .groupBy(col("len_bits"), col("q_decile"))
      .agg(count(lit(1)).as("n_docs"))

  def keySkewReport(df: DataFrame, key: Column, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum(col("n")).as("_total"),
      count(lit(1)).as("n_keys"),
      percentile(col("n"), lit(0.5)).as("p50_n"),
      percentile(col("n"), lit(0.99)).as("p99_n"),
      max(col("n")).as("max_n"))
    // key tie-break pinned NULLS LAST explicitly: Spark's asc default
    // is nulls-first while the DuckDB oracle's is nulls-last, so a
    // null key tied on count at the top-K boundary would otherwise
    // rank differently per engine
    val top = counts.orderBy(col("n").desc, col("key").asc_nulls_last).limit(topK)
    top.crossJoin(broadcast(stats))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("key").asc_nulls_last))
          .cast("long"))
      .withColumn("share_1e6", expr("n * 1000000 div _total"))
      .select(col("rank"), col("key"), col("n"), col("share_1e6"),
        col("n_keys"), col("p50_n"), col("p99_n"), col("max_n"))
  }

  /** Join-strategy advisory LAW over the skew report's measurement
    * (the saltprobe study's decision rule, made an operator): for the
    * topK hottest keys, recommend — per key — how the recurring join
    * on `key` should run. Pure integer arithmetic the oracle replays:
    *
    *  - `broadcast` when the dim side fits the row cap: key skew is
    *    irrelevant if there is no shuffle at all;
    *  - `shuffle` when the key's row count stays within 5× the mean
    *    shuffle-partition size (AQE's own skew multiplier): the
    *    straggler can't dominate, and the study measured salting as
    *    pure overhead in that regime;
    *  - `aqe_or_salt` past that: PREFER AQE's skew join, with the
    *    salt count that would level the hot key back to
    *    mean-partition size — ceil(n / meanPart), clamped to [2, 64],
    *    the parameter saltedJoinHot takes — as the escape hatch for
    *    engines/paths where AQE cannot fire (disabled, non-equi
    *    salvage, pre-AQE engines).
    *
    * The third branch's preference is MEASURED, not asserted, and the
    * measurement is of salting LOSING: the round-15 saltprobe study
    * (narrow rows) and the round-16 saltprobe2 study (the shapes the
    * first study named as unreached — ~100-byte string payloads
    * through the join, and a many-to-many hot key with 4× output
    * multiplicity; BASELINE.md round-16) found NO local[32] cell
    * where either salted form beat AQE-on — or even AQE-OFF: at this
    * executor count the hot partition's single task never dominates
    * the job wall, while salting always pays its dim replication and
    * wider shuffle. So the advisory never recommends salting over a
    * live AQE; the salt parameter is emitted for the documented
    * no-AQE regime, which local[32] cannot measure (a straggler only
    * dominates when the cluster is wide enough that one task IS the
    * critical path).
    *
    * meanPart floors at 1 so the law is total over tiny inputs.
    */
  def skewJoinAdvice(df: DataFrame, key: Column, dimRows: Long,
      broadcastRowCap: Long, partitions: Int, topK: Int = 20): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum(col("n")).as("_total"))
    val top = counts.orderBy(col("n").desc, col("key").asc_nulls_last)
      .limit(topK)
    top.crossJoin(broadcast(stats))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc,
          col("key").asc_nulls_last)).cast("long"))
      .withColumn("mean_part_n",
        greatest(lit(1L), expr(s"_total div $partitions")))
      .withColumn("advice",
        when(lit(dimRows) <= lit(broadcastRowCap), lit("broadcast"))
          .when(col("n") <= col("mean_part_n") * 5, lit("shuffle"))
          .otherwise(lit("aqe_or_salt")))
      .withColumn("salt",
        when(col("advice") === "aqe_or_salt",
          least(lit(64L), greatest(lit(2L),
            expr("(n + mean_part_n - 1) div mean_part_n"))))
          .otherwise(lit(0L)))
      .select(col("rank"), col("key"), col("n"), col("mean_part_n"),
        col("advice"), col("salt"))
  }

  /** Pairwise source content-overlap matrix: for every pair of
    * sources, how many DISTINCT word n-grams they share — the
    * redundancy diagnostic that decides whether two feeds are worth
    * ingesting separately (a crawl that is 80%-contained in another is
    * mostly paying dedup to throw itself away).
    *
    * Plan: distinct (gram, source) pairs (the one big shuffle), then a
    * gram-keyed self-join emits only source pairs — per-gram fan-out
    * is bounded by |sources|² (sources are a handful even at 100 TB),
    * never by corpus size — and a pair-keyed count. Output:
    * (source_a, source_b, n_shared_grams), source_a < source_b.
    */
  def sourceGramOverlap(docs: DataFrame, textCol: Column, source: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    val gs = docs
      .select(explode(graft.functions.shingles(textCol, n)).as("gram"),
        source.as("source"))
      .distinct()
    val l = gs.as("l"); val r = gs.as("r")
    l.join(r, col("l.gram") === col("r.gram") && col("l.source") < col("r.source"))
      .groupBy(col("l.source").as("source_a"), col("r.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Near-dup leakage matrix between sources: the corpus's MinHash-LSH
    * candidate pairs ([[Dedup.minhashLshPairs]]) aggregated by
    * unordered source pair — which feeds duplicate WHICH. The
    * gram-level view ([[sourceGramOverlap]]) sees shared boilerplate
    * phrases; this sees whole-document duplication pressure — the
    * number a corpus builder reads before deciding which source to
    * dedup against which. Diagonal rows (same source twice) count
    * intra-source near-dups.
    *
    * Scale shape: the pair stream is the dedup pipeline's existing
    * artifact (bounded by duplicate mass); two id→source joins and one
    * bounded |sources|² groupBy on top.
    *
    * Output: (source_a, source_b, n_pairs), source_a ≤ source_b.
    */
  def sourceNearDupMatrix(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, bands: Int = 4, rowsPerBand: Int = 4,
      n: Int = 3): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, idCol, textCol, bands, rowsPerBand, n)
    val src = docs.filter(col(sourceCol).isNotNull)
      .select(col(idCol).as("_nid"), col(sourceCol).as("_nsrc"))
    pairs
      .join(src.withColumnRenamed("_nid", "id_a").withColumnRenamed("_nsrc", "src_a"),
        Seq("id_a"))
      .join(src.withColumnRenamed("_nid", "id_b").withColumnRenamed("_nsrc", "src_b"),
        Seq("id_b"))
      .groupBy(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-source corpus health report — the dataset-card numbers a
    * training-data release publishes per feed: document count,
    * distinct-content count (its complement is the exact-dup rate),
    * token total, and the interpolated median document length in 1e6
    * fixed point (≡ DuckDB quantile_cont, the q39 parity).
    *
    * One groupBy over bounded strata; count(DISTINCT md5) keeps the
    * per-group state at one 128-bit hash per distinct text (Spark
    * plans it as a two-phase expand/agg — fine for bounded sources;
    * swap in approx_count_distinct for open-ended strata). Median is
    * exact over per-doc token counts (value domain is small); use
    * percentile_approx for unbounded domains.
    *
    * Output: (source, n_docs, n_distinct, sum_tokens, p50_tokens_1e6).
    */
  def corpusHealth(docs: DataFrame, source: Column, id: Column,
      text: Column): DataFrame = {
    val tc = graft.functions.tokenCount(text)
    docs.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(text)).as("n_distinct"),
        sum(tc).as("sum_tokens"),
        floor(percentile(tc, lit(0.5)) * 1000000).cast("long").as("p50_tokens_1e6"))
  }

  /** Tokenizer fertility report — the numbers that evaluate a
    * tokenizer against a corpus, per source: whitespace word count,
    * subword token count under a BPE merge table
    * ([[graft.functions.bpeTokenCount]]), character count, and the
    * two derived ratios in 1e6 fixed point — fertility (subwords per
    * word; lower = the vocab fits the domain) and characters per
    * subword (compression; higher = fewer tokens per byte). The
    * dataset-card / tokenizer-selection table.
    *
    * One groupBy over bounded strata; the BPE encode is the map-only
    * expression encoder (O(words × merges) per row, no shuffle, no
    * UDF). Sources with zero words/tokens yield NULL ratios instead
    * of a divide error.
    *
    * Output: (source, n_docs, ws_tokens, bpe_tokens, n_chars,
    * fertility_1e6, chars_per_tok_1e6).
    */
  def tokenizerFertility(docs: DataFrame, source: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame =
    docs.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.tokenCount(text)).as("ws_tokens"),
        sum(graft.functions.bpeTokenCount(text, merges)).as("bpe_tokens"),
        sum(length(text).cast("long")).as("n_chars"))
      .withColumn("fertility_1e6",
        when(col("ws_tokens") === 0, lit(null).cast("long"))
          .otherwise(expr("bpe_tokens * 1000000 div ws_tokens")))
      .withColumn("chars_per_tok_1e6",
        when(col("bpe_tokens") === 0, lit(null).cast("long"))
          .otherwise(expr("n_chars * 1000000 div bpe_tokens")))

  /** Vocabulary head report (the Zipf curve's top) — per top-K term:
    * rank, occurrence count, corpus share, and CUMULATIVE share, all
    * in 1e9 fixed point. The dataset-card / tokenizer-planning
    * numbers: how heavy is the head (a BPE vocab's worth of mass),
    * how long is the tail.
    *
    * Scale shape: explode + one term-keyed groupBy (map-side partial
    * combine), a 1-row total broadcast, a TakeOrdered top-K — never a
    * global sort — and the rank/cumsum window runs over ONLY the K
    * survivors (bounded, like [[keySkewReport]]'s). Terms are
    * lowercased whitespace tokens ([[graft.functions.tokens]]).
    * Ties break by term so the cut and the cumsum are total orders on
    * any engine.
    *
    * Output: (rank, term, n, share_1e9, cum_share_1e9).
    */
  def vocabReport(docs: DataFrame, text: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = docs.select(explode(graft.functions.tokens(lower(text))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_total"))
    val top = counts.orderBy(col("n").desc, col("term")).limit(topK)
    val w = Window.orderBy(col("n").desc, col("term"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("_cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("share_1e9", expr("n * 1000000000 div _total"))
      .withColumn("cum_share_1e9", expr("_cum * 1000000000 div _total"))
      .select(col("rank"), col("term"), col("n"), col("share_1e9"),
        col("cum_share_1e9"))
  }

  /** Per-source character-class profile: how each feed's CHARACTERS
    * (UTF-16 units as counted by `length`, not raw bytes — a
    * multi-byte-heavy feed is profiled per character, and the oracle
    * parity is on characters too) split across letters / digits / the
    * q25 punctuation class / whitespace / OTHER — the
    * mojibake-and-markup alarm (a source whose `other` share jumps is
    * mis-decoded, binary-contaminated, or markup-heavy before any
    * tokenizer sees it). Counts are exact via class-delete regexp
    * lengths, entirely map-side; one |sources|-bounded aggregate;
    * other_ppm is the one-number alarm column.
    *
    * Output: (source, n_chars, n_letters, n_digits, n_punct, n_space,
    * n_other, other_ppm).
    */
  def charClassProfile(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val cnt = (cls: String) => length(regexp_replace(t, cls, "")).cast("long")
    val perDoc = docs.select(col(sourceCol).as("source"),
      length(t).cast("long").as("c"),
      (length(t) - cnt("[A-Za-z]")).cast("long").as("l"),
      (length(t) - cnt("[0-9]")).cast("long").as("d"),
      (length(t) - cnt("[.!?,;:]")).cast("long").as("p"),
      (length(t) - cnt("[\\s]")).cast("long").as("w"))
    perDoc.groupBy(col("source"))
      .agg(sum(col("c")).as("n_chars"), sum(col("l")).as("n_letters"),
        sum(col("d")).as("n_digits"), sum(col("p")).as("n_punct"),
        sum(col("w")).as("n_space"))
      .withColumn("n_other",
        expr("n_chars - n_letters - n_digits - n_punct - n_space"))
      .withColumn("other_ppm", expr(
        "CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_other * 1000000) DIV n_chars END"))
      .orderBy(col("source"))
  }

  /** Per-source length-distribution drift: the exact Kolmogorov–
    * Smirnov statistic (max CDF gap, in ppm) between each source's
    * token-length distribution and the corpus's — the feed-drift
    * alarm that catches "source X started sending truncated docs"
    * before any quality gate moves. All-integer: the gap compares
    * cdf_s·N vs cdf_c·n_s in DECIMAL(38,0) (no ratios until the final
    * ppm), so engines agree to the bit and counts can be petascale.
    *
    * Shape: one (source, len) count shuffle; the CDF windows run over
    * the |sources|·|distinct lens| GRID (bounded — lengths are
    * bucketable if ever unbounded), never the corpus.
    *
    * Output: (source, n_docs, ks_ppm) ordered by source.
    */
  def sourceKsDistance(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    import graft.functions.tokenCount
    val base = docs.select(col(sourceCol).as("source"),
      tokenCount(col(textCol)).as("len"))
    val sc = base.groupBy(col("source"), col("len")).agg(count(lit(1)).as("sc"))
    val lens = sc.select(col("len")).distinct()
    val sources = sc.groupBy(col("source")).agg(sum(col("sc")).as("n_s"))
    val cc = sc.groupBy(col("len")).agg(sum(col("sc")).as("cc"))
    val total = base.agg(count(lit(1)).as("n_tot"))
    val w = Window.partitionBy(col("source")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sources.crossJoin(broadcast(lens))
      .join(sc, Seq("source", "len"), "left")
      .join(broadcast(cc), Seq("len"))
      .crossJoin(broadcast(total))
      .withColumn("cdf_s", sum(coalesce(col("sc"), lit(0L))).over(w))
      .withColumn("cdf_c", sum(col("cc")).over(w))
      .withColumn("gap", expr(
        "abs(CAST(cdf_s AS DECIMAL(38,0)) * n_tot - CAST(cdf_c AS DECIMAL(38,0)) * n_s)"))
      .groupBy(col("source"))
      .agg(first(col("n_s")).cast("long").as("n_docs"),
        max(col("gap")).as("_g"), first(col("n_tot")).as("_nt"))
      .withColumn("ks_ppm",
        expr("CAST((_g * 1000000) DIV (CAST(n_docs AS DECIMAL(38,0)) * _nt) AS BIGINT)"))
      .select(col("source"), col("n_docs"), col("ks_ppm"))
      .orderBy(col("source"))
  }

  /** Exact-integer correlation report between two integer columns —
    * r² in ppm plus the sign, from one aggregation pass (n, Σx, Σy,
    * Σxy, Σx², Σy² in DECIMAL(38,0); r²_ppm = cov²·1e6 div
    * (varx·vary), sign = sign(cov); zero variance on either side
    * reports 0). THE sanity check before trusting a quality score:
    * "is my score just measuring length?" answers with one number,
    * engine-exact (no float covariance drift). Callers pre-scale
    * wide-range columns (r is scale-invariant; products must fit
    * DECIMAL(38,0) — e.g. a 1e6-fixed score divides to 1e3 first).
    *
    * Output: 1 row (n, r2_ppm, sign).
    */
  def corrReport(df: DataFrame, xCol: Column, yCol: Column): DataFrame =
    df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(col("n").cast("long").as("n"),
        expr("""CAST(CASE
            WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0
              OR n * syy - CAST(sy AS DECIMAL(38,0)) * sy = 0 THEN 0
            ELSE ((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)
                  * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000)
                 DIV ((n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
                      * (n * syy - CAST(sy AS DECIMAL(38,0)) * sy))
          END AS BIGINT)""").as("r2_ppm"),
        expr("""CAST(CASE WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy > 0 THEN 1
            WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy < 0 THEN -1
            ELSE 0 END AS BIGINT)""").as("sign"))

  /** One-row dataset card — the header numbers of a corpus release
    * (HF dataset-card style): docs, tokens, distinct content and the
    * exact-dup share, floor-mean quality, majority language and its
    * share. One per-doc projection pass (content hash + token count +
    * the fused q41/q26 gates struct), then two bounded aggregates and
    * a TakeOrdered(1) language mode (count desc, lang asc — the
    * deterministic tie).
    *
    * Output: 1 row (n_docs, n_tokens, n_distinct_content,
    * exact_dup_ppm, mean_quality_1e6, majority_lang, majority_ppm).
    */
  def datasetCard(docs: DataFrame, textCol: String): DataFrame = {
    import graft.functions.tokenCount
    val perDoc = docs.select(md5(col(textCol)).as("h"),
        tokenCount(col(textCol)).as("ntok"),
        TextAnalysis.curationGates(col(textCol)).as("_g"))
      .select(col("h"), col("ntok"), col("_g.quality_1e6").as("q"),
        col("_g.predicted_lang").as("lang"))
      .localCheckpoint()
    val tot = perDoc.agg(count(lit(1)).as("n_docs"),
      sum(col("ntok")).as("n_tokens"),
      countDistinct(col("h")).as("n_distinct_content"),
      sum(col("q")).as("_sq"))
    val top = perDoc.groupBy(col("lang")).agg(count(lit(1)).as("_ln"))
      .orderBy(col("_ln").desc, col("lang")).limit(1)
      .select(col("lang").as("majority_lang"), col("_ln"))
    tot.crossJoin(broadcast(top))
      .select(col("n_docs"), col("n_tokens"), col("n_distinct_content"),
        expr("((n_docs - n_distinct_content) * 1000000) DIV n_docs")
          .as("exact_dup_ppm"),
        expr("_sq DIV n_docs").as("mean_quality_1e6"),
        col("majority_lang"),
        expr("(_ln * 1000000) DIV n_docs").as("majority_ppm"))
  }

  /** Per-source dedup savings: token mass before dedup, after exact
    * dedup (min-id keeper per content hash), and after LSH near-dup
    * cluster pruning (min-id survivor per connected component, the
    * q44 chain) — the "was the dedup pass worth the cluster-day"
    * one-pager, attributed per source so the answer names the feed
    * that pays for it. retained_ppm is exact integer.
    *
    * Shape: the (doc, source, token-count) base materializes once
    * (localCheckpoint); keeper/survivor sets are id-only semi/anti
    * joins against it; the expensive LSH stage runs over KEEPERS only
    * (exact-dup mass never pays signature cost — the q44 staging).
    * Sources whose docs all drop report 0, not a missing row.
    *
    * Output: (source, n_docs, n_tokens, tokens_after_exact,
    * tokens_after_neardup, retained_ppm).
    */
  def dedupSavings(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String): DataFrame = {
    import graft.functions.tokens
    val base = docs.select(col(idCol).as("doc_id"),
        col(sourceCol).as("source"), col(textCol).as("text"),
        size(tokens(col(textCol))).cast("long").as("n_tok"))
      .localCheckpoint()
    val keepIds = base.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val keep = base.join(keepIds, Seq("doc_id"), "left_semi").localCheckpoint()
    val dropped = Dedup.connectedComponents(
        Dedup.minhashLshPairs(keep, "doc_id", "text"))
      .filter(col("id") =!= col("cluster_id")).select(col("id").as("doc_id"))
    val surv = keep.join(dropped, Seq("doc_id"), "left_anti")
    val before = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val afterExact = keep.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("tokens_after_exact"))
    val afterNear = surv.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("tokens_after_neardup"))
    before.join(afterExact, Seq("source"), "left")
      .join(afterNear, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("tokens_after_exact"), lit(0L)).as("tokens_after_exact"),
        coalesce(col("tokens_after_neardup"), lit(0L)).as("tokens_after_neardup"))
      .withColumn("retained_ppm", expr(
        "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (tokens_after_neardup * 1000000) DIV n_tokens END"))
      .orderBy(col("source"))
  }

  /** Embedding-column health report — the data-quality screen the
    * vector pipeline reads BEFORE any ANN/dedup pass commits: per
    * stratum, counts of NULL embeddings, wrong-width rows, NaN-carrying
    * rows and zero-norm rows (each one a guard path or a crash inside
    * a cosine), plus the fixed-point norm² envelope (min/max/floor-
    * mean) of the healthy rows — an envelope far from 1e12 (unit norm
    * at the 1e6 component scale) flags an unnormalized or truncated
    * batch before it poisons an index.
    *
    * Health classes are evaluated lazily (a NaN row never reaches the
    * norm arithmetic — ANSI-safe), and ALL norm² arithmetic runs in
    * DECIMAL(38,0): a component with |v| ≳ 3040 has a fixed-point
    * square past Long.Max, so a BIGINT fold would make exactly the
    * unnormalized batches this screen exists to flag THROW instead of
    * appear in the report (ADVICE r12). Per-row norm² is exact to
    * |v| ≤ ~3·10¹³ per component (square ≤ 10³⁸ ≥ sum headroom for any
    * real dim); the emitted min/max/mean SATURATE at Long.Max — a
    * saturated reading is ~9.2·10¹⁸, seven orders past the 1e12 unit
    * envelope, so the flag semantics are unchanged. The mean divides
    * DECIMAL(38,0) sums (the corrReport idiom). One scan, |strata|
    * output rows.
    */
  def embeddingHealth(embs: DataFrame, stratum: Column, emb: Column,
      dim: Int): DataFrame = {
    require(dim >= 1, s"need dim >= 1, got $dim")
    val isNull = emb.isNull
    val badDim = !isNull && (size(emb) =!= dim)
    val nanFree = !exists(emb, v => isnan(v.cast("double")))
    val hasNan = !isNull && (size(emb) === dim) && !nanFree
    val healthy = !isNull && (size(emb) === dim) && nanFree
    // DECIMAL(38,0) fold: each square is computed at decimal width
    // (x.cast first — a LONG x*x would overflow before the cast)
    val norm2 = aggregate(
      transform(emb, v => floor(v.cast("double") * lit(1000000.0)).cast("long")),
      lit(0L).cast("decimal(38,0)"),
      (acc, x) => acc + x.cast("decimal(38,0)") * x.cast("decimal(38,0)"))
    val longMax = lit(Long.MaxValue).cast("decimal(38,0)")
    embs.select(stratum.as("stratum"),
        when(isNull, 1L).otherwise(0L).as("_null"),
        when(badDim, 1L).otherwise(0L).as("_bad"),
        when(hasNan, 1L).otherwise(0L).as("_nan"),
        when(healthy, norm2).as("_n2")) // null on every unhealthy row
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("_null")).as("n_null"),
        sum(col("_bad")).as("n_bad_dim"),
        sum(col("_nan")).as("n_nan"),
        sum(when(col("_n2") === 0L, 1L).otherwise(0L)).as("n_zero_norm"),
        least(min(col("_n2")), longMax).cast("long").as("min_norm2"),
        least(max(col("_n2")), longMax).cast("long").as("max_norm2"),
        count(col("_n2")).as("_nh"),
        sum(col("_n2")).as("_s"))
      .withColumn("mean_norm2", expr(
        "CAST(CASE WHEN _nh = 0 THEN NULL ELSE " +
          "least(_s DIV _nh, 9223372036854775807) END AS BIGINT)"))
      .select(col("stratum"), col("n_vecs"), col("n_null"), col("n_bad_dim"),
        col("n_nan"), col("n_zero_norm"), col("min_norm2"), col("max_norm2"),
        col("mean_norm2"))
  }
}
