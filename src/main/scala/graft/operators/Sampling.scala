package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.md5Long

/** Deterministic (hash-split) sampling for corpus construction.
  *
  * Training-data pipelines need samples that are REPRODUCIBLE — the
  * same key must land in the same split regardless of run, engine,
  * partitioning, or cluster size — which `rand()`/`df.sample` cannot
  * guarantee. Here membership is a pure function of the row key: the
  * md5-derived 60-bit hash mod 1e6, compared against a
  * parts-per-million rate. Properties that matter at 100 TB:
  *
  *  - a plain filter: no shuffle, no state, stays inside whole-stage
  *    codegen and runs at scan speed;
  *  - rates NEST: the 20% sample is a strict subset of the 50% sample,
  *    so growing a training mix never invalidates earlier work;
  *  - per-stratum rates express mixture weighting (the domain-mix step
  *    of corpus assembly) in one pass over the data.
  */
object Sampling {

  /** Deterministic per-key contribution cap — keep at most `maxPerKey`
    * rows per key, chosen by an id-hash order (an unbiased fixed-size
    * sample of each key's rows, stable across runs and engines): the
    * rate limiter that stops a dominating user / crawler / template
    * from owning a training mix or a per-key aggregate. Implemented on
    * the bounded-state [[graft.expressions.TopKPairs]] aggregate, so
    * only |keys|·maxPerKey pairs cross the shuffle with map-side
    * combine — a hot key costs its partial buffers, never a full
    * per-key sort (the row_number window this replaces sorts every
    * row of the hottest key on one task).
    *
    * Output: (key, keep_rank 1..maxPerKey, id) — rank follows the
    * (hash desc, id asc) order of the aggregate.
    */
  def perKeyCap(df: DataFrame, key: Column, id: Column,
      maxPerKey: Int): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    df.select(key.as("key"), id.as("id"))
      .withColumn("_h", md5Long(col("id").cast("string")))
      .groupBy(col("key"))
      .agg(graft.expressions.TopKPairs(col("_h"), col("id"), maxPerKey).as("_top"))
      .select(col("key"), posexplode(col("_top")))
      .select(col("key"), (col("pos") + 1).cast("long").as("keep_rank"),
        col("col.id").as("id"))
  }

  /** Rate denominator: rates are parts-per-million. */
  val Ppm = 1000000L

  /** Demo mixture used by the q48 battery entry (and mirrored in its
    * DuckDB oracle from this same map, so the two cannot drift).
    */
  val DemoRates: Map[String, Long] = Map(
    "de" -> 1000000L, "en" -> 300000L, "es" -> 100000L, "fr" -> 500000L)

  /** Uniform [0, 1e6) bucket from a key — deterministic across engines
    * (DuckDB mirror: cast('0x'||substr(md5(k),1,15) as bigint) %
    * 1000000).
    */
  def hashBucket(key: Column): Column = pmod(md5Long(key.cast("string")), lit(Ppm))

  /** Keep rows whose key hashes under `ppm` parts-per-million. */
  def hashSample(df: DataFrame, key: Column, ppm: Long): DataFrame = {
    require(ppm >= 0 && ppm <= Ppm, s"ppm must be in [0, $Ppm], got $ppm")
    df.filter(hashBucket(key) < ppm)
  }

  /** Multi-way deterministic split (train/val/test): each key's hash
    * bucket falls into exactly one cumulative ppm range, so the splits
    * PARTITION the corpus — reproducibly, with no coordination, on any
    * engine. Prefix-stability: extending a split's ppm only moves keys
    * IN from the split after it, never shuffles existing members.
    * Ppm-sums must total exactly [[Ppm]].
    */
  def splitLabel(key: Column, splits: Seq[(String, Long)]): Column = {
    require(splits.nonEmpty && splits.map(_._2).sum == Ppm,
      s"split ppm weights must sum to $Ppm: $splits")
    require(splits.forall(_._2 > 0), s"every split needs ppm > 0: $splits")
    val uppers = splits.scanLeft(0L)(_ + _._2).tail
    val b = hashBucket(key)
    // last split needs no guard: buckets are always < Ppm. NULL keys
    // get a NULL label (explicitly — a bare when-chain would silently
    // funnel them all into the last split), mirroring hashSample's
    // null-drop: unkeyed rows are not assignable to any split.
    val chain = splits.zip(uppers).init.foldRight(lit(splits.last._1): Column) {
      case (((label, _), upper), rest) => when(b < upper, lit(label)).otherwise(rest)
    }
    when(key.isNull, lit(null).cast("string")).otherwise(chain)
  }

  /** Demo split used by the q50 battery entry (oracle CASE generated
    * from this same Seq).
    */
  val DemoSplits: Seq[(String, Long)] =
    Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L)

  /** Stratified deterministic sample: per-stratum ppm rates; strata
    * absent from `rates` (including null) are dropped (rate 0).
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Long]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= Ppm),
      s"rates must be in [0, $Ppm]: $rates")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0L): Column) {
      case (acc, (s, r)) => when(strata === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(key) < rate)
  }

  /** Demo target mixture for the q61 battery entry (ppm shares over
    * the documents table's `lang` strata; oracle VALUES generated from
    * this same Seq).
    */
  val DemoMixturePpm: Seq[(String, Long)] = Seq(
    "en" -> 400000L, "zh" -> 250000L, "de" -> 150000L,
    "fr" -> 100000L, "es" -> 100000L)

  /** Rebalance the corpus toward a target mixture by DOWNSAMPLING
    * over-represented strata — the domain-mix step of corpus assembly
    * (web/books/code shares, language shares). `targetsPpm` is a full
    * distribution (ppm shares summing to 1e6); the output is the
    * largest hash-deterministic subcorpus whose strata hit those
    * shares: the binding stratum (smallest n_c/s_c) keeps everything,
    * every other stratum keeps rate_ppm = s_c·T / n_c of its rows
    * (T = min_c n_c·1e6/s_c, the achievable total). Strata outside the
    * target set are dropped; a target stratum with NO rows makes the
    * mixture unachievable → empty output, not a silently-wrong mix.
    *
    * Everything is integer arithmetic on counts and ppm shares, and
    * membership is the same md5-ppm filter as [[hashSample]], so the
    * kept set is reproducible on any engine/partitioning and NESTS as
    * targets move. Scale shape: one cheap count-per-stratum aggregate
    * (a handful of rows, broadcast back) + one scan-speed filter pass;
    * no shuffle of the data itself.
    *
    * Output: the kept rows plus their stratum's `rate_ppm`.
    */
  def rebalanceToMixture(df: DataFrame, key: Column, stratum: Column,
      targetsPpm: Seq[(String, Long)]): DataFrame = {
    require(targetsPpm.nonEmpty, "need at least one target stratum")
    require(targetsPpm.map(_._1).distinct.size == targetsPpm.size,
      s"target strata must be unique: $targetsPpm")
    require(targetsPpm.forall(_._2 > 0), s"every share needs ppm > 0: $targetsPpm")
    require(targetsPpm.map(_._2).sum == Ppm,
      s"target shares must sum to $Ppm (a full mixture): $targetsPpm")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targetsPpm.toDF("_stratum", "_s_ppm")
    val counts = df.select(stratum.as("_stratum"))
      .groupBy(col("_stratum")).agg(count(lit(1)).as("_n"))
    // left join from targets: an absent stratum surfaces as n=0 and
    // pins T (hence every rate) to 0. The hint must sit on the COUNTS
    // side — the preserved (left) side of a left-outer join can never
    // be the broadcast build side, so hinting tgt was a logged no-op
    // that fell back to a shuffle join (VERDICT r12 item 4)
    val present = tgt.join(broadcast(counts), Seq("_stratum"), "left")
      .select(col("_stratum"), col("_s_ppm"), coalesce(col("_n"), lit(0L)).as("_n"))
    val tMax = present.agg(min(expr("_n * 1000000 div _s_ppm")).as("_t"))
    val rates = present.crossJoin(broadcast(tMax))
      .select(col("_stratum"),
        when(col("_n") === 0, lit(0L))
          .otherwise(expr("_s_ppm * _t div _n")).as("rate_ppm"))
    df.join(broadcast(rates), stratum === col("_stratum"))
      .filter(hashBucket(key) < col("rate_ppm"))
      .drop("_stratum")
  }

  /** Deterministic fixed-SIZE per-stratum sample: the `nPer` rows of
    * each stratum with the smallest (60-bit md5 hash, key) — the
    * count-based companion to the rate-based [[stratifiedSample]]
    * (eval carve-outs and per-domain probe sets want "exactly N per
    * source", not a rate). Membership is a pure function of the
    * stratum's key SET — same rows on any engine or partitioning; the
    * key string tie-breaks hash collisions so the pick is total. The
    * only shuffle is one rank window per stratum; at 100 TB with
    * bounded strata this is a single exchange keyed by stratum, and
    * nPer bounds every partition's retained rows. NULL strata drop
    * (unassignable), matching the rate samplers.
    *
    * Output: the input columns plus `pick_rank` (1-based BIGINT).
    */
  def stratifiedHead(df: DataFrame, key: Column, stratum: Column,
      nPer: Int): DataFrame = {
    require(nPer >= 1, s"nPer must be positive, got $nPer")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_sh_stratum")).orderBy(col("_sh_h"), col("_sh_key"))
    df.withColumn("_sh_stratum", stratum)
      .filter(col("_sh_stratum").isNotNull)
      .withColumn("_sh_key", key.cast("string"))
      .withColumn("_sh_h", md5Long(col("_sh_key")))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= nPer)
      .drop("_sh_stratum", "_sh_key", "_sh_h")
  }

  /** Demo per-source epoch weights for the q98 battery entry (ppm:
    * 1e6 = one full pass). Spans sub-epoch (0.5) through multi-epoch
    * (1.75) so both the downsample and the repeat paths are exercised;
    * the oracle's VALUES list is generated from this same map.
    */
  val DemoEpochsPpm: Map[String, Long] =
    (0 until 20).map(i => s"src$i" -> (500000L + 250000L * (i % 6))).toMap

  /** Epoch-weighted mixture materialization — the "repeat factors"
    * step of training-corpus assembly (sources are consumed for a
    * fractional number of EPOCHS, e.g. books 1.75, web 0.5): each row
    * is emitted floor(w) times plus one more iff its hash bucket
    * falls under the fractional part, so E[copies] = w exactly and
    * the realized copy count is a pure function of the key —
    * reproducible on any engine or partitioning, and the fractional
    * membership NESTS as a source's epoch weight grows (the 1.3-epoch
    * extra-copy set contains the 1.2-epoch one, so raising a weight
    * never rewrites earlier copies). Strata absent from `epochsPpm`
    * are dropped.
    *
    * Scale shape: a when-chain weight lookup + `sequence`/`explode`
    * fan-out — map-side only, no shuffle, no rand(); the output
    * streams straight into the shuffle of whatever consumes it.
    *
    * Output: the input columns plus `copy_no` (0-based BIGINT).
    */
  def epochMixture(df: DataFrame, key: Column, stratum: Column,
      epochsPpm: Map[String, Long]): DataFrame = {
    require(epochsPpm.nonEmpty, "need at least one stratum weight")
    require(epochsPpm.values.forall(_ >= 0),
      s"epoch weights must be non-negative ppm: $epochsPpm")
    val w = epochsPpm.toSeq.sortBy(_._1).foldLeft(lit(-1L): Column) {
      case (acc, (s, e)) => when(stratum === s, lit(e)).otherwise(acc)
    }
    df.withColumn("_w", w)
      .filter(col("_w") >= 0)
      .withColumn("_copies",
        expr(s"_w DIV $Ppm") +
          when(hashBucket(key) < expr(s"_w % $Ppm"), lit(1L)).otherwise(lit(0L)))
      .filter(col("_copies") > 0)
      .withColumn("copy_no", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_w", "_copies")
  }

  /** Temperature-flattened mixture sampling — the multilingual-LM
    * "sampling temperature" recipe: target share of stratum s ∝
    * n_s^α with α = 1/2, so over-represented sources are flattened
    * toward the tail instead of drowning it. Rates derive from the
    * data itself: w_s = floor(√n_s) (exact — IEEE sqrt is correctly
    * rounded on every engine, then floored), and
    * rate_ppm(s) = min(1e6, budget·1e6·w_s ÷ (Σw · n_s)) in pure
    * BIGINT arithmetic, giving E[kept_s] = budget·w_s/Σw — the
    * α=0.5 mixture at ~`budget` total rows. Membership is the
    * [[hashBucket]] filter: reproducible, nesting, scan-speed.
    *
    * Scale: one stratum-count aggregate (strata are bounded —
    * sources, languages), rates broadcast back, then a pure filter;
    * the corpus itself never shuffles. NULL strata are dropped (rate
    * join on equality), matching [[rebalanceToMixture]].
    */
  def temperatureSample(df: DataFrame, key: Column, stratum: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.select(stratum.as("_stratum"))
      .groupBy(col("_stratum")).agg(count(lit(1)).as("_n"))
    val w = counts.select(col("_stratum"), col("_n"),
      floor(sqrt(col("_n").cast("double"))).cast("long").as("_w"))
    val sw = w.agg(sum(col("_w")).as("_sw"))
    val rates = w.crossJoin(broadcast(sw))
      .select(col("_stratum"),
        least(lit(Ppm), expr(s"$budget * 1000000 * _w div (_sw * _n)")).as("rate_ppm"))
    df.join(broadcast(rates), stratum === col("_stratum"))
      .filter(hashBucket(key) < col("rate_ppm"))
      .drop("_stratum")
  }

  /** Uniform ppm shares over `strata` (ascending order): 1e6 div m
    * each, with the first 1e6 mod m strata taking +1 so the shares sum
    * to exactly [[Ppm]] — the target a [[rebalanceToMixture]] needs to
    * mean "equal parts of each".
    */
  def uniformSharesPpm(strata: Seq[String]): Seq[(String, Long)] = {
    require(strata.nonEmpty, "need at least one stratum")
    require(strata.distinct.size == strata.size, s"strata must be unique: $strata")
    val m = strata.size
    val base = Ppm / m
    val extra = (Ppm % m).toInt
    strata.sorted.zipWithIndex.map { case (s, i) =>
      s -> (base + (if (i < extra) 1L else 0L))
    }
  }

  /** Cluster-balanced ("diversity") sampling — [[rebalanceToMixture]]
    * with the strata taken from a coarse quantizer's OBSERVED cells at
    * a uniform target share: over-represented semantic clusters
    * downsample until every cluster contributes equally — the
    * topic-balancing step (SemDeDup-adjacent) that metadata strata
    * can't express, because the skew lives in the embedding space, not
    * in `source`/`lang`. `assigned` is a cell-assigned frame (e.g.
    * [[Similarity.assignCells]] output); `cell` may be any integral
    * column.
    *
    * The distinct-cell probe collects at most the quantizer's k ids
    * (bounded — the same driver-side footprint as the centroid table
    * itself); everything after is [[rebalanceToMixture]]'s
    * one-aggregate-plus-scan-filter shape. Deriving targets from
    * OBSERVED cells keeps the mixture achievable when a cell lost all
    * members (an empty TARGET stratum would zero the whole output).
    *
    * Output: the kept rows plus their cell's `rate_ppm`.
    */
  def clusterBalance(assigned: DataFrame, key: Column, cell: Column): DataFrame = {
    val cells = assigned.select(cell.cast("long").as("_c"))
      .filter(col("_c").isNotNull).distinct()
      .collect().map(_.getLong(0)).sorted
    require(cells.nonEmpty, "no cells observed in the assignment")
    // single-digit-safe lexicographic = numeric ordering is NOT assumed:
    // shares are assigned in numeric cell order, labels are the decimal
    // strings rebalance joins on
    val m = cells.length
    val base = Ppm / m
    val extra = (Ppm % m).toInt
    val targets = cells.zipWithIndex.map { case (c, i) =>
      c.toString -> (base + (if (i < extra) 1L else 0L))
    }.toSeq
    rebalanceToMixture(assigned, key, cell.cast("long").cast("string"), targets)
  }

  /** Keep rows whose `value` lies inside the group's [lo, hi] quantile
    * band — the outlier-trim (winsorization) gate of corpus curation:
    * drop truncated fragments below the low percentile and
    * concatenation/boilerplate artifacts above the high one, per
    * language or domain.
    *
    * Thresholds come from ONE aggregation over a (group, value)
    * column-pruned scan, broadcast back onto the stream (groups are
    * bounded — languages, domains), then the gate itself is a
    * scan-speed filter. `exact = true` uses Spark's interpolated
    * `percentile` (≡ DuckDB `quantile_cont` — the q39 parity result;
    * memory O(distinct values) per group, fine for bounded domains
    * like token counts at any corpus size); `exact = false` switches
    * to `approx_percentile` (bounded sketch state) for unbounded value
    * domains. NULL group keys form their own band (null-safe join);
    * NULL values never pass the gate.
    */
  def quantileGate(df: DataFrame, value: Column, group: Column,
      lo: Double, hi: Double, exact: Boolean = true): DataFrame = {
    require(0.0 <= lo && lo <= hi && hi <= 1.0,
      s"quantiles must satisfy 0 <= lo <= hi <= 1: $lo, $hi")
    val base = df.withColumn("_qg_value", value).withColumn("_qg_group", group)
    def pct(p: Double) =
      if (exact) percentile(col("_qg_value"), lit(p))
      else percentile_approx(col("_qg_value"), lit(p), lit(10000))
    val bounds = base.groupBy(col("_qg_group").as("_qg_group2"))
      .agg(pct(lo).as("_qg_lo"), pct(hi).as("_qg_hi"))
    base.join(broadcast(bounds), col("_qg_group") <=> col("_qg_group2"))
      .filter(col("_qg_value") >= col("_qg_lo") && col("_qg_value") <= col("_qg_hi"))
      .drop("_qg_value", "_qg_group", "_qg_group2", "_qg_lo", "_qg_hi")
  }

  /** Sketch-thresholded quantile gate — [[quantileGate]]'s scale form
    * with REPRODUCIBLE thresholds: `exact = false` there reaches for
    * `approx_percentile`, whose internal sketch is engine-specific
    * (un-oracle-able, and a different engine or Spark version may gate
    * a different row set); here the per-group thresholds are the
    * ceil(p·m)-th order statistics of the group's bottom-k-by-hash
    * sample ([[Sketches.bottomKBySource]], q221) — a pure function of
    * the keys, identical on every engine that can hash and sort.
    *
    * Scale shape: the sample costs the salted two-level cut (bounded
    * windows), thresholds are ≤ |groups| rows broadcast back, and the
    * gate itself is a scan-speed filter — same plan as quantileGate,
    * but the threshold stage touches ≤ groups·k sample rows instead of
    * holding O(distinct values) percentile state per group. With a
    * maintained sample (q222) the threshold stage reads a ≤ groups·k
    * row table and touches no data at all. Sampling error: thresholds
    * sit within the q221 rank band (±4σ·√(p(1−p)/k) of the target
    * rank) — gates at 100 TB tolerate that; audits that can't should
    * use [[quantileGate]] `exact = true`.
    *
    * Keeps rows with loPct-th ≤ value ≤ hiPct-th estimated percentile
    * of their group (NULL values never pass the gate AND never enter
    * the sample — [[Sketches.bottomKBySource]] excludes them, so a
    * nullable value column cannot shift a group's thresholds or NULL
    * them out; a group smaller than k gates on its exact order
    * statistics since the sample IS the population).
    */
  def sketchQuantileGate(df: DataFrame, id: Column, value: Column,
      group: Column, loPct: Int, hiPct: Int, k: Int = 128): DataFrame = {
    require(1 <= loPct && loPct <= hiPct && hiPct <= 99,
      s"need 1 <= loPct <= hiPct <= 99: $loPct, $hiPct")
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("_sg_v", value.cast("long"))
      .withColumn("_sg_g", group)
    val samples = Sketches.bottomKBySource(
      base.select(col("_sg_g").as("source"),
        md5Long(id.cast("string")).as("h"), col("_sg_v").as("v")), k)
    val mPer = samples.groupBy(col("source")).agg(count(lit(1)).as("_sg_m"))
    val ranked = samples.withColumn("_sg_rn", row_number().over(
      Window.partitionBy(col("source")).orderBy(col("v"), col("h"))))
      .join(mPer, "source")
    val thr = ranked.groupBy(col("source"))
      .agg(
        max(when(col("_sg_rn") === expr(s"($loPct * _sg_m + 99) DIV 100"),
          col("v"))).as("_sg_lo"),
        max(when(col("_sg_rn") === expr(s"($hiPct * _sg_m + 99) DIV 100"),
          col("v"))).as("_sg_hi"))
    // the sample side's `source` must not collide with a caller column
    // of the same name (documents has one) — rename before the join
    base.join(broadcast(thr.withColumnRenamed("source", "_sg_src")),
        col("_sg_g") <=> col("_sg_src"))
      .filter(col("_sg_v") >= col("_sg_lo") && col("_sg_v") <= col("_sg_hi"))
      .drop("_sg_v", "_sg_g", "_sg_src", "_sg_lo", "_sg_hi")
  }

  /** Token-budget selection — "keep the best docs until the token
    * budget is spent": rank the corpus by (score DESC, key ASC) and
    * select the prefix whose cumulative token count stays ≤ budget,
    * where budget = total_tokens · budgetNum DIV budgetDen. The
    * data-selection cut every curriculum/pretraining mix ends with
    * ("best 40% of tokens by quality").
    *
    * The semantics are a GLOBAL ordered prefix sum, but the plan never
    * globally sorts the corpus: integer scores bucket into
    * `binWidth`-wide bins, the per-bin token sums (≤ scoreRange /
    * binWidth rows) walk cumulatively on the driver, and every bin is
    * then wholly in-budget (literal 1), wholly out (literal 0), or THE
    * boundary bin — only the boundary bin's docs (≤ one bin of mass)
    * pay a rank window. Equality with the ordered-prefix rule is exact
    * because the global order (score DESC, key) refines the bin order.
    *
    * `score` must be a non-negative integer column (fixed-point
    * quality scores — q41's quality_1e6 — fit directly).
    *
    * Output: (id, score, ntok, selected ∈ {0,1}); `selected = 1` iff
    * the doc's inclusive cumulative token count ≤ budget (the budget
    * is never exceeded).
    */
  def tokenBudgetSelect(df: DataFrame, key: Column, score: Column,
      tok: Column, budgetNum: Long, budgetDen: Long,
      binWidth: Long = 4096L): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"budget fraction must be in [0, 1]: $budgetNum/$budgetDen")
    require(binWidth >= 1, s"binWidth must be positive: $binWidth")
    // narrow (id, score, ntok, bin) projection materialized once —
    // three consumers below (bin stats, easy filter, boundary window)
    // must not re-derive the caller's score chain per branch
    val base = df.select(key.as("id"), score.cast("long").as("score"),
        tok.cast("long").as("ntok"))
      .withColumn("bin", expr(s"score DIV $binWidth"))
      .localCheckpoint()
    // per-bin token sums are control-plane small (≤ scoreRange /
    // binWidth rows — 245 for q41-style 1e6 scores): the cumulative
    // walk happens on the driver, like centroid seeds or split bounds
    val bins = base.groupBy(col("bin")).agg(sum(col("ntok")).as("bs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val budget = bins.map(_._2).sum * budgetNum / budgetDen
    var cum = 0L
    var boundary: Option[(Long, Long)] = None // (bin, tokens before it)
    for ((b, bs) <- bins if boundary.isEmpty) {
      if (cum + bs > budget) boundary = Some((b, cum))
      cum += bs
    }
    boundary match {
      case None => // every bin fits: the whole corpus selects
        base.select(col("id"), col("score"), col("ntok"),
          lit(1L).as("selected"))
      case Some((bLow, cumBefore)) =>
        val easy = base.filter(col("bin") =!= bLow)
          .withColumn("selected",
            when(col("bin") > bLow, lit(1L)).otherwise(lit(0L)))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bin")).orderBy(col("score").desc, col("id"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val bnd = base.filter(col("bin") === bLow)
          .withColumn("selected",
            when(lit(cumBefore) + sum(col("ntok")).over(w) <= budget,
              lit(1L)).otherwise(lit(0L)))
        easy.unionByName(bnd)
          .select(col("id"), col("score"), col("ntok"), col("selected"))
    }
  }

  /** Per-stratum percentile calibration of an integer score — maps raw
    * scores onto each stratum's own [0, 1e6] percentile scale so they
    * compare ACROSS strata (a web doc's 0.7 raw quality and a books
    * doc's 0.7 mean different things; their within-source percentiles
    * don't). `pct_1e6 = (rank − 1) · 1e6 DIV (n − 1)` with rank the
    * MIN rank among ties (SQL `rank()`), 0 for single-row strata.
    *
    * The semantics are a per-stratum rank window, but the corpus never
    * windows: per-(stratum, score) counts aggregate first (bounded by
    * |strata| × |score domain| — fixed-point scores keep this ≪
    * corpus), the below-count cumsum runs over THAT table, and ranks
    * join back by (stratum, score) — one corpus shuffle, no
    * corpus-wide sort, immune to stratum skew a per-stratum window
    * would serialize on.
    *
    * Output: (id, stratum, score, pct_1e6). NULL strata are dropped.
    */
  def percentileCalibrate(df: DataFrame, key: Column, stratum: Column,
      score: Column): DataFrame = {
    val base = df.filter(stratum.isNotNull)
      .select(key.as("id"), stratum.as("stratum"), score.cast("long").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("stratum"))
    val ranks = base.groupBy(col("stratum"), col("score"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_below", coalesce(sum(col("_c")).over(w), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(wn))
      .drop("_c")
    base.join(ranks, Seq("stratum", "score"))
      .withColumn("pct_1e6", when(col("_n") <= 1, lit(0L))
        .otherwise(expr("_below * 1000000L DIV (_n - 1)")))
      .select(col("id"), col("stratum"), col("score"), col("pct_1e6"))
  }

  /** Exact-quota stratified split — per stratum, EXACTLY
    * ⌊n_s · ppm / 1e6⌋ rows go to the held-out split, selected in
    * id-hash order. [[hashSample]]'s per-row coin flip is only
    * proportional in expectation; evaluation protocols that promise
    * "10% of every source" need the count to be exact, not
    * approximate — this is that contract.
    *
    * Same no-global-sort discipline as [[curriculumOrder]]: rank
    * within (stratum, shard) — shard-sized sorts — plus a
    * (|strata|·|shards|)-row offset/total table cumsum'd per stratum
    * and broadcast back; held-out = stratum-rank ≤ quota. Output:
    * (id, stratum, heldout) for every input row.
    */
  def quotaSplit(df: DataFrame, key: Column, stratum: Column,
      heldoutPpm: Long, shards: Int = 64): DataFrame = {
    require(heldoutPpm >= 0 && heldoutPpm <= Ppm,
      s"heldoutPpm must be in [0, $Ppm], got $heldoutPpm")
    require(shards >= 1, s"need at least one shard, got $shards")
    val base = df.select(key.as("id"), stratum.as("stratum"))
      .withColumn("_h", md5Long(col("id").cast("string")))
      .withColumn("_shard", pmod(col("_h"), lit(shards.toLong)))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"), col("_shard")).orderBy(col("_h"), col("id"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("_shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("stratum"))
    val offsets = base.groupBy(col("stratum"), col("_shard"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_offset", coalesce(sum(col("_c")).over(ws), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(wn))
      .drop("_c")
    base
      .withColumn("_r", row_number().over(wg).cast("long"))
      .join(broadcast(offsets), Seq("stratum", "_shard"))
      .withColumn("heldout",
        col("_offset") + col("_r") <= expr(s"_n * ${heldoutPpm}L div ${Ppm}L"))
      .select(col("id"), col("stratum"), col("heldout"))
  }

  /** Curriculum ordering — a deterministic GLOBAL training-order
    * ordinal: documents sorted by difficulty bin (easy bins first),
    * pseudo-shuffled within each bin by id-hash so a bin isn't
    * consumed in storage order. The assignment every
    * curriculum/annealing schedule needs, produced WITHOUT a global
    * sort: the corpus is hash-sharded, ranked only within (bin, shard)
    * — shard-sized sorts, skew-immune — and each group's start offset
    * comes from a (|bins|·|shards|)-row count table cumsum'd with a
    * tiny window and broadcast back. The global order realized is
    * (bin, shard, hash, id), which is itself deterministic, so the
    * ordinal is reproducible run-over-run AND engine-over-engine.
    *
    * `shards` is the distribution grain (scale with executors; each
    * within-group sort holds ~n/(bins·shards) rows). Output: (id, bin,
    * ordinal) with ordinal 1..n dense over the whole corpus. NULL bins
    * are rejected up front — a training order with unplaceable rows is
    * a bug, not a row to drop silently.
    */
  def curriculumOrder(df: DataFrame, key: Column, bin: Column,
      shards: Int = 64): DataFrame = {
    require(shards >= 1, s"need at least one shard, got $shards")
    val base = df.select(key.as("id"),
        when(bin.isNull, raise_error(lit("curriculumOrder: NULL difficulty bin")))
          .otherwise(bin.cast("long")).as("bin"))
      .withColumn("_h", md5Long(col("id").cast("string")))
      .withColumn("_shard", pmod(col("_h"), lit(shards.toLong)))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bin"), col("_shard")).orderBy(col("_h"), col("id"))
    val wo = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"), col("_shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("bin"), col("_shard"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_offset", coalesce(sum(col("_c")).over(wo), lit(0L)))
      .drop("_c")
    base
      .withColumn("_r", row_number().over(wg).cast("long"))
      .join(broadcast(offsets), Seq("bin", "_shard"))
      .select(col("id"), col("bin"), (col("_offset") + col("_r")).as("ordinal"))
  }

  /** Deterministic weighted sample of k rows WITHOUT replacement —
    * priority sampling (Duffield, Lund & Thorup, JACM 2007). Each row
    * draws the pseudo-uniform `h = md5(key) mod 2^60` and competes
    * with priority rank `r = h div w` (integer u/w — the k SMALLEST r
    * win, equivalent to the paper's k largest w/u): heavy rows get
    * proportionally small ranks, so inclusion probability scales with
    * weight, yet membership is a pure function of the key — stable
    * across runs, engines, and partitionings (rand()-based weighted
    * reservoirs are none of these). Tie rank → smaller id wins.
    *
    * Scale shape: the rank is a scan-speed expression; selection is a
    * global top-k (TakeOrderedAndProject — per-partition heaps of k,
    * only |partitions|·k rows reach the driver-side merge, never a
    * global sort). Weights must be >= 1; a zero/negative/NULL weight
    * raises rather than silently skewing the sample.
    *
    * Output: (id, weight, prio, rank 1..k) in rank order.
    */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    prioCut(withPrio(df, key, weight), k)
  }

  /** (id, weight, prio) projection shared by the direct and maintained
    * priority-sample paths — one priority definition, so the two
    * cannot drift.
    */
  private def withPrio(df: DataFrame, key: Column, weight: Column,
      stratum: Option[Column] = None): DataFrame = {
    val w = when(weight.isNull || weight.cast("long") < 1L,
        raise_error(lit("prioritySample: weight must be >= 1")))
      .otherwise(weight.cast("long"))
    val keep = stratum.toSeq.map(_.as("stratum")) ++
      Seq(key.as("id"), w.as("weight"))
    df.select(keep: _*)
      .withColumn("_h", md5Long(col("id").cast("string")))
      .withColumn("prio", expr("CAST(_h DIV weight AS BIGINT)"))
      .drop("_h")
  }

  /** Per-stratum weighted sample — [[prioritySample]]'s scale form for
    * mixture construction: k rows PER STRATUM by the same md5-derived
    * priority (hash DIV weight, k smallest win), cut with the
    * bounded-state TopKPairs aggregate so only |strata|·k pairs cross
    * the shuffle with map-side combine (the perKeyCap discipline) —
    * never a per-stratum sort window, never a global TakeOrdered. One
    * priority definition shared with the global form (withPrio), so
    * the two cannot drift; tie order (prio, id) matches exactly
    * (TopKPairs keeps (−prio desc, id asc)).
    *
    * Output: (stratum, rank 1..k, id, prio). Weights/payloads rejoin
    * by id — the sample is |strata|·k rows, so the join broadcasts.
    */
  def prioritySampleByStratum(df: DataFrame, stratum: Column, key: Column,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    withPrio(df, key, weight, Some(stratum))
      .groupBy(col("stratum"))
      .agg(graft.expressions.TopKPairs(-col("prio"), col("id"), k).as("_top"))
      .select(col("stratum"), posexplode(col("_top")))
      .select(col("stratum"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"), (-col("col.v")).as("prio"))
  }

  /** Global bottom-k by (prio, id) + rank — TakeOrderedAndProject,
    * never a global sort.
    */
  private def prioCut(rel: DataFrame, k: Int): DataFrame =
    rel.orderBy(col("prio"), col("id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("prio"), col("id"))).cast("long"))
      .select(col("id"), col("weight"), col("prio"), col("rank"))

  /** The weighted sample FOLLOWS the corpus — q222's maintenance
    * discipline on the weighted lever. The bottom-k-by-priority cut is
    * LOSSLESS under union (the k smallest priorities of A ∪ B are a
    * subset of bottom-k(A) ∪ B when B is the increment), so the
    * maintained sample re-cuts the PRIOR k-SET plus the new rows alone
    * — k + |feed| rows, never a corpus re-scan — and equals the direct
    * recompute EXACTLY, row for row (deterministic priorities make
    * this an identity, not an approximation). RE-DELIVERED rows are
    * absorbed: priorities are pure functions of (id, weight), so a
    * re-added id either reproduces its stored sample row exactly
    * (collapsed by the distinct below) or lost the cut under the same
    * total order originally and loses again — idempotent either way.
    * Remaining adds-only contract: a REMOVAL, or a changed weight for
    * an existing id (which is a removal), forces a recompute — the
    * q188/q222 additive-only caveat.
    *
    * `prior` is a previous [[prioritySample]]/[[maintainPrioritySample]]
    * output; `added` is the raw increment (key/weight shaped).
    */
  def maintainPrioritySample(prior: DataFrame, added: DataFrame,
      key: Column, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    prioCut(prior.select(col("id"), col("weight"), col("prio"))
      .unionByName(withPrio(added, key, weight)).distinct(), k)
  }
}
