package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy hitters (frequent items) over an unbounded key stream — the
  * vocabulary/URL/domain frequency probe of corpus analysis, done the
  * way it has to be done at 100 TB: a count-min sketch — a fixed-size
  * (depth × width counters) mergeable summary whose cost is one scan
  * regardless of cardinality. The battery's sketch is the PORTABLE
  * relation form (counters as (r, cell) rows from one map-side-combined
  * groupBy); Spark's opaque `count_min_sketch` binary aggregate stays
  * exercised in [[cmsPerSourceMerge]] (spec-pinned), but its hash
  * functions are engine-private, which is exactly why the battery row
  * uses the replayable form — see [[heavyHitters]].
  *
  * The returned frame pairs the exact top-N (TakeOrderedAndProject —
  * never a global sort) with the sketch's error contract per item,
  * emitted as 0/1 flags: `cms_lower_ok` = estimate ≥ exact (CMS never
  * undercounts — a hard guarantee), `cms_upper_ok` = estimate ≤
  * exact + ⌈eps·total⌉ (holds with probability ≥ confidence per item).
  */
object Sketches {

  /** Top-`topN` values of `key` by exact count, each next to its
    * portable count-min estimate and both error-contract flags — ALL
    * engine-computed on both sides (VERDICT r12 item 2: this was the
    * last battery row asserting a probabilistic per-item guarantee as
    * an oracle constant; it now carries the q217 replayed-sketch
    * idiom, and the estimate itself joins the compared output).
    *
    * Sketch: depth = ⌈ln(1/(1−confidence))⌉ rows × width = ⌈e/eps⌉
    * cells; cell r of a token is md5Long("cms<r>:" ⧺ token) mod width
    * ([[cmsCellOf]] — the ONE hash definition shared with q217 and
    * the streaming counter maintenance). Counters come from one
    * map-side-combined groupBy over the ×depth-fanned stream (bounded
    * depth·width output), estimates from min-over-rows on topN·depth
    * probe rows — fully distributed; the binary-collect form this
    * replaces shipped sketch + topN rows to the driver.
    *
    * Flags (the q217 Markov contract): with width = ⌈e/eps⌉ a row's
    * expected collision mass is ≤ N/width ≤ eps·N/e, so Markov gives
    * P[row over eps·N] ≤ 1/e and P[min over] ≤ e^−depth ≤
    * 1 − confidence — `cms_upper_ok` = est ≤ cnt + ⌈eps·N⌉ may
    * legitimately read 0 and both engines agree on it. The eps bound
    * rides integer ppm math (⌈N·eps_ppm/10⁶⌉, exact to ~9·10¹⁵
    * stream rows).
    *
    * Output: (token, rank, cnt, est, cms_lower_ok, cms_upper_ok),
    * rank 1-based by (cnt desc, token asc).
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    require(topN >= 1, s"need topN>=1, got $topN")
    require(eps > 0 && eps < 1 && confidence > 0 && confidence < 1,
      s"need eps, confidence in (0,1); got eps=$eps confidence=$confidence")
    val depth = math.max(1, math.ceil(math.log(1.0 / (1.0 - confidence))).toInt)
    val width = math.max(2, math.ceil(math.E / eps).toInt)
    val epsPpm = math.round(eps * 1e6)
    val keyed = df.select(key.cast("string").as("token"))
      .filter(col("token").isNotNull)
      .localCheckpoint() // one scan feeds total, top-N and counters
    val total = keyed.agg(count(lit(1)).as("_n"))
    val counters = cmsCells(keyed, col("token"), depth, width)
      .groupBy(col("r"), col("cell")).agg(count(lit(1)).as("_c"))
    val top = keyed.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("token"))).cast("long"))
    // topN·depth probe rows against the ≤ depth·width counter relation
    val probes = top.select(col("token"), col("rank"), col("cnt"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), cmsCellOf(col("token"), r, width)
            .as("cell"))): _*)).as("_rc"))
      .select(col("token"), col("rank"), col("cnt"),
        col("_rc.r").as("r"), col("_rc.cell").as("cell"))
    probes.join(counters, Seq("r", "cell"))
      .groupBy(col("token"), col("rank"), col("cnt"))
      .agg(min(col("_c")).as("est"))
      .crossJoin(broadcast(total))
      .select(col("token"), col("rank"), col("cnt"), col("est"),
        when(col("est") >= col("cnt"), 1L).otherwise(0L).as("cms_lower_ok"),
        when(col("est") <= col("cnt") +
          expr(s"(_n * $epsPpm + 999999) DIV 1000000"), 1L).otherwise(0L)
          .as("cms_upper_ok"))
      .orderBy(col("rank"))
  }

  /** Audience overlap between segments (event types): for every
    * unordered pair, the EXACT distinct-user counts and intersection
    * (hash-checked by the oracle) next to an HLL inclusion–exclusion
    * estimate (|A∩B| ≈ |A|+|B|−|A∪B| from three mergeable sketches),
    * emitted as a 0/1 within-bound flag in the q35/q62 sketch-contract
    * style — the estimates themselves are engine-specific and stay
    * out of the compared output. At 100 TB the exact companion is the
    * audit you run once; the sketches are what the dashboard serves,
    * because per-segment sketches union in O(2^lgK) regardless of
    * user count.
    *
    * Bound: inclusion–exclusion compounds the union's relative
    * standard error (~1.04/√2^lgK), so the flag allows
    * 3·rse·|A∪B|_exact + 16 absolute — generous enough to hold whp,
    * tight enough that a broken union merge trips it.
    *
    * Shape at scale: one (type, user) dedup shuffle feeds BOTH the
    * exact pair join and the per-type sketch agg; the pair join is
    * |types|²-bounded on the deduped relation, never on raw events.
    */
  def audienceOverlap(events: DataFrame, typeCol: String, userCol: String,
      lgK: Int = 14): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    val du = events.select(col(typeCol).as("t"), col(userCol).as("u")).distinct()
    val per = du.groupBy(col("t"))
      .agg(count(lit(1)).as("nd"), expr(s"hll_sketch_agg(u, $lgK)").as("sk"))
    val exactBoth = du.as("a")
      .join(du.as("b"), col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("exact_both"))
    val rse = 1.04 / math.sqrt((1L << lgK).toDouble)
    per.as("pa").join(per.as("pb"), col("pa.t") < col("pb.t"))
      .join(exactBoth,
        col("pa.t") === col("ta") && col("pb.t") === col("tb"), "left")
      .select(col("pa.t").as("type_a"), col("pb.t").as("type_b"),
        col("pa.nd").as("exact_a"), col("pb.nd").as("exact_b"),
        coalesce(col("exact_both"), lit(0L)).as("exact_both"),
        expr("hll_sketch_estimate(hll_union(pa.sk, pb.sk, false))")
          .as("_est_union"))
      .withColumn("_est_both",
        col("exact_a") + col("exact_b") - col("_est_union"))
      .withColumn("_union_exact",
        col("exact_a") + col("exact_b") - col("exact_both"))
      .withColumn("est_ok",
        (abs(col("_est_both") - col("exact_both")).cast("double")
          <= col("_union_exact").cast("double") * (3.0 * rse) + 16.0)
          .cast("long"))
      .select(col("type_a"), col("type_b"), col("exact_a"), col("exact_b"),
        col("exact_both"), col("est_ok"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** KMV (k-minimum-values) distinct estimator over the corpus's word
    * 3-gram space — the third sketch family next to HLL (q35) and
    * count-min (q62), with the same "estimate NEXT TO its exact
    * companion + an engine-computed error-bound flag" contract. The
    * estimator: keep the k smallest distinct 60-bit gram hashes; with
    * h_k the k-th smallest, D̂ = (k−1)·2^60 div h_k — all exact
    * integers (DECIMAL(38,0) ≡ HUGEINT for the product), so both
    * engines compute the identical estimate. The flag pins the
    * standard ~1/√k relative-error bound at 3σ:
    * (est − exact)²·k ≤ 9·exact², entirely in integers.
    *
    * Shape at scale: the min-k set is a TakeOrdered over
    * partial-distinct hashes (the estimate's whole point is that the
    * k-set, not the distinct set, is what a production sketch keeps);
    * the exact companion pays the full distinct for the audit.
    *
    * Output: 1 row (k, kth_hash, est_distinct, exact_distinct,
    * within_bound).
    */
  /** The PRODUCTION form of [[kmvDistinctGrams]]: the sketch alone,
    * no exact companion — the cost profile a deployed KMV has (q193
    * keeps the exact distinct next to the estimate as the audit row;
    * its 4.7× measured slope IS that companion). Per partition the
    * only state is a k-entry ordered set of the smallest DISTINCT
    * hashes seen (the KMV accumulator), so shuffle traffic is
    * ≤ partitions·k longs instead of the full distinct-hash stream —
    * the sketch's entire point at 100 TB. This is the one battery
    * operator written over mapPartitions: a bounded-state streaming
    * accumulator is genuine per-partition imperative logic that no
    * built-in aggregate expresses without first paying the exact
    * distinct's shuffle.
    *
    * When the corpus has fewer than k distinct grams the k-set holds
    * all of them, so the "estimate" is exact by construction.
    *
    * Output: 1 row (k, kth_hash, est_distinct).
    */
  def kmvSketchGrams(docs: DataFrame, textCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import graft.functions.{md5Long, rawShingles}
    val spark = docs.sparkSession
    import spark.implicits._
    val hashes = docs
      .select(explode(rawShingles(lower(col(textCol)), 3)).as("g"))
      .select(md5Long(col("g")).as("h"))
      .as[Long]
    val minK = kminPartials(hashes, k)
    minK.agg(max(col("h")).as("kth_hash"), count(lit(1)).as("_n_seen"))
      .select(lit(k.toLong).as("k"), col("kth_hash"),
        expr(s"""CAST(CASE WHEN _n_seen < $k THEN _n_seen
              ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * ${1L << 60})
                   DIV kth_hash AS BIGINT) END AS BIGINT)""").as("est_distinct"))
  }

  /** Shuffle-free bottom-k DISTINCT hashes: per-partition k-bounded
    * TreeSet dedup heaps, then a global merge of ≤ partitions·k
    * candidates (the same hash can surface from several partitions —
    * dedup before the final cut). The production k-min discipline
    * shared by [[kmvSketchGrams]] and [[kmvKeyOverlapEstimate]]; input
    * hashes must be non-null.
    */
  private def kminPartials(hashes: org.apache.spark.sql.Dataset[Long],
      k: Int): DataFrame = {
    val partials = hashes.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      while (it.hasNext) {
        val h: java.lang.Long = it.next()
        if (set.size < k) set.add(h)
        else if (h < set.last()) { if (set.add(h)) set.pollLast() }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
        .asScala.map(_.longValue())
    }(org.apache.spark.sql.Encoders.scalaLong)
    partials.toDF("h").distinct().orderBy(col("h")).limit(k)
  }

  /** COUNT-MIN MERGEABILITY — [[kmvPerSourceMerge]]'s companion for
    * the frequency sketch: per-source count-min sketches (same
    * eps/confidence/seed → identical hash functions) merge by
    * COUNTER ADDITION, and because estimation takes a min over
    * per-row counters that each sum linearly across sources, the
    * merged sketch's every estimate is EXACTLY the direct global
    * sketch's — not within-bound, bit-equal. The distributed shape:
    * each source (executor, ingest day) keeps depth·width counters,
    * the coordinator merges |sources| binaries, and the key stream
    * never moves.
    *
    * Output: the q62 heavy-hitter table with a `merged_eq_direct`
    * column — per top-`topN` token (exact counts), 1 iff the merged
    * estimate equals the direct sketch's, plus the usual
    * lower/upper-bound flags on the MERGED estimate. Driver state:
    * |sources| sketch binaries + topN rows, never the stream.
    */
  def cmsPerSourceMerge(docs: DataFrame, textCol: String, sourceCol: String,
      topN: Int = 20, eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(topN >= 1, s"need topN>=1, got $topN")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.tokens
    val keyed = docs.select(col(sourceCol).as("source"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token").isNotNull)
      .localCheckpoint() // one tokenize feeds three aggregates
    val top = keyed.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN).collect()
    // |sources| sketch binaries — the only rows that reach the driver
    val perSource = keyed.groupBy(col("source"))
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)").as("s"))
      .collect().map(_.getAs[Array[Byte]]("s"))
    require(perSource.nonEmpty, "empty corpus: nothing to sketch")
    val merged = CountMinSketch.readFrom(new ByteArrayInputStream(perSource.head))
    perSource.tail.foreach(b =>
      merged.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(b))))
    val direct = CountMinSketch.readFrom(new ByteArrayInputStream(keyed
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)").as("s"))
      .collect()(0).getAs[Array[Byte]](0)))
    val bound = math.ceil(eps * merged.totalCount()).toLong
    val rows = top.zipWithIndex.map { case (r, i) =>
      val token = r.getString(0)
      val cnt = r.getLong(1)
      val est = merged.estimateCount(token)
      (token, (i + 1).toLong, cnt,
        if (est == direct.estimateCount(token)) 1L else 0L,
        if (est >= cnt) 1L else 0L,
        if (est <= cnt + bound) 1L else 0L)
    }.toSeq
    rows.toDF("token", "rank", "cnt", "merged_eq_direct",
      "cms_lower_ok", "cms_upper_ok")
  }

  /** PORTABLE count-min merge (q217) — the [[cmsPerSourceMerge]]
    * contract rebuilt so that EVERY output column, including the
    * estimates and the probabilistic upper-bound flag, is a
    * deterministic integer function both engines compute: the sketch's
    * hash functions are the engine-wide md5Long over a per-row prefix
    * (`"cms<r>:" || token`), and the sketch itself is stored as
    * (r, cell) → counter ROWS rather than an opaque binary. That is
    * the same data structure Spark's CountMinSketch holds internally
    * — depth·width counters — but as a relation it is:
    *
    *  - engine-portable: DuckDB replays the identical sketch in SQL,
    *    so q217's `cms_upper_ok` is COMPUTED on both sides (the
    *    q221/q224 within_bound idiom) — a legitimately-out-of-bound
    *    item still hash-matches, closing the one battery row that
    *    asserted a probabilistic guarantee as a constant;
    *  - fully distributed: counters come from one map-side-combined
    *    groupBy over the ×depth-fanned token stream (bounded
    *    depth·width output — 32k rows at the defaults), merge is
    *    counter ADDITION (a second bounded aggregate), and NO sketch
    *    state ever reaches the driver — at 100 TB the binary-collect
    *    form ships |sources| binaries to one coordinator, this form
    *    keeps the whole algebra in the engine.
    *
    * merged_eq_direct: per top token, min-over-rows of the per-source-
    * summed counters equals min over the directly-counted ones —
    * counter addition is exact, so 1 by the merge law, computed here.
    * cms_lower_ok: est ≥ cnt — the hard CMS guarantee (every cell
    * counter includes the token's own count). cms_upper_ok:
    * est ≤ cnt + 3·ceil(N/width) — Markov on the per-row collision
    * mass (expectation < N/width) gives P[fail] ≤ 3^−depth per item;
    * the flag may legitimately read 0 and both engines agree on it.
    *
    * Output: (token, rank, cnt, est, merged_eq_direct, cms_lower_ok,
    * cms_upper_ok) for the exact top-`topN` tokens.
    */
  def cmsPortableMerge(docs: DataFrame, textCol: String, sourceCol: String,
      topN: Int = 20, depth: Int = 4, width: Int = 8192): DataFrame = {
    require(topN >= 1 && depth >= 1 && width >= 2,
      s"need topN>=1, depth>=1, width>=2: $topN, $depth, $width")
    import graft.functions.{md5Long, tokens}
    val keyed = docs.select(col(sourceCol).as("source"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token").isNotNull)
      .localCheckpoint() // one tokenize feeds totals, top-N and cells
    def cellOf(tok: Column, r: Int): Column = cmsCellOf(tok, r, width)
    // ×depth fan-out, then ONE bounded aggregate per leg: the merged
    // leg sums per-source counters (the merge IS addition), the direct
    // leg counts the stream — both ≤ depth·width rows
    val cells = cmsCells(keyed, col("token"), depth, width)
      .select(col("source"), col("r"), col("cell"))
    val perSource = cells.groupBy(col("source"), col("r"), col("cell"))
      .agg(count(lit(1)).as("c"))
    val mergedCtr = perSource.groupBy(col("r"), col("cell"))
      .agg(sum(col("c")).as("c"))
    val directCtr = cells.groupBy(col("r"), col("cell"))
      .agg(count(lit(1)).as("c"))
    val top = keyed.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("token"))).cast("long"))
    // probe the counters for the topN tokens: topN·depth probe rows
    // against the ≤ depth·width counter relations (broadcast-scale)
    val probes = top.select(col("token"), col("rank"), col("cnt"), explode(array(
      (0 until depth).map(r =>
        struct(lit(r).as("r"), cellOf(col("token"), r).as("cell"))): _*)).as("_rc"))
      .select(col("token"), col("rank"), col("cnt"),
        col("_rc.r").as("r"), col("_rc.cell").as("cell"))
    val ests = probes
      .join(mergedCtr.withColumnRenamed("c", "_cm"), Seq("r", "cell"))
      .join(directCtr.withColumnRenamed("c", "_cd"), Seq("r", "cell"))
      .groupBy(col("token"), col("rank"), col("cnt"))
      .agg(min(col("_cm")).as("est"), min(col("_cd")).as("_est_direct"))
    val total = keyed.agg(count(lit(1)).as("_n"))
    ests.crossJoin(broadcast(total))
      .select(col("token"), col("rank"), col("cnt"), col("est"),
        when(col("est") === col("_est_direct"), 1L).otherwise(0L)
          .as("merged_eq_direct"),
        when(col("est") >= col("cnt"), 1L).otherwise(0L).as("cms_lower_ok"),
        when(col("est") <= col("cnt") +
          lit(3L) * expr(s"(_n + ${width - 1}) DIV $width"), 1L).otherwise(0L)
          .as("cms_upper_ok"))
      .orderBy(col("rank"))
  }

  /** Hash cell r of the portable CMS — the one hash definition shared
    * by [[cmsPortableMerge]], its DuckDB oracle, and the streaming
    * counter maintenance ([[graft.streaming.StreamingHeavyHitters
    * .cmsCounterUpdates]]), so all three build the IDENTICAL sketch.
    */
  def cmsCellOf(tok: Column, r: Int, width: Int): Column = {
    import graft.functions.md5Long
    pmod(md5Long(concat(lit(s"cms$r:"), tok)), lit(width.toLong))
  }

  /** Fan each row out to its `depth` (r, cell) sketch coordinates —
    * the map-side stage of the portable CMS, exposed so the streaming
    * twin runs the SAME cell derivation (stream ≡ batch by code
    * identity, the ingest-gate discipline). Input keeps its columns;
    * adds `r`, `cell`.
    */
  def cmsCells(df: DataFrame, token: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2: $depth, $width")
    df.withColumn("_rc", explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsCellOf(token, r, width).as("cell"))): _*)))
      .withColumn("r", col("_rc.r")).withColumn("cell", col("_rc.cell"))
      .drop("_rc")
  }

  /** KMV MERGEABILITY — the property that makes sketches distributed
    * infrastructure rather than a single-pass trick: per-source k-min
    * sets union and re-cut to k, and because every hash in the global
    * k-min set is necessarily inside its own source's k-min set, the
    * merged sketch is IDENTICAL to the sketch a direct global pass
    * builds — lossless, not approximately-correct. This is how a
    * 1000-executor fleet (or 1000 ingest days) each keep a k-set and
    * still answer corpus-wide distinct: ship sources·k longs, never
    * the gram stream.
    *
    * Output: one row per source — (source, k, kth_hash, est_distinct)
    * — plus a `_merged` row built ONLY from the per-source k-sets
    * (union → distinct → k smallest), whose estimate therefore equals
    * q202's direct global sketch. Sources with fewer than k distinct
    * grams estimate exactly (the k-set holds everything), and so does
    * the merged row when the union stays under k.
    *
    * Scale: the per-(source, hash) distinct is one shuffle; the k-cut
    * is a bounded per-source window; everything after operates on
    * ≤ sources·k rows. (The accumulator form — [[kmvSketchGrams]] —
    * is the shuffle-free production variant; this row exists to pin
    * the merge algebra.)
    */
  def kmvPerSourceMerge(docs: DataFrame, textCol: String,
      sourceCol: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import graft.functions.{md5Long, rawShingles}
    val d = docs.select(col(sourceCol).as("source"),
        explode(rawShingles(lower(col(textCol)), 3)).as("g"))
      .select(col("source"), md5Long(col("g")).as("h"))
      .distinct()
    // salted two-level k-cut: a straight per-source window would sort
    // the source's ENTIRE distinct stream in one partition (the skew
    // wall for a dominant source at corpus scale). Level 1 cuts k-min
    // per (source, h mod 64) — 64-way parallel, and lossless because
    // each of the true per-source k smallest is within its own salt
    // bucket's k smallest — so level 2's window sees ≤ 64·k rows per
    // source.
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), pmod(col("h"), lit(64))).orderBy(col("h"))
    val pruned = d.withColumn("_rn1", row_number().over(w1))
      .filter(col("_rn1") <= k).drop("_rn1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"))
    // the per-source k-min sets — ≤ sources·k rows, used twice
    val mins = pruned.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .localCheckpoint(true)
    def estCol = expr(
      s"""CAST(CASE WHEN _n < $k THEN _n
            ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * ${1L << 60})
                 DIV kth_hash AS BIGINT) END AS BIGINT)""")
    val perSource = mins.groupBy(col("source"))
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("_n"))
      .select(col("source"), lit(k.toLong).as("k"), col("kth_hash"),
        estCol.as("est_distinct"))
    // LOSSLESS MERGE: union of k-sets → distinct → k smallest
    val merged = mins.select(col("h")).distinct().orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("_n"))
      .select(lit("_merged").as("source"), lit(k.toLong).as("k"),
        col("kth_hash"), estCol.as("est_distinct"))
    perSource.unionByName(merged).orderBy(col("source"))
  }

  def kmvDistinctGrams(docs: DataFrame, textCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import graft.functions.{md5Long, rawShingles}
    val hashes = docs
      .select(explode(rawShingles(lower(col(textCol)), 3)).as("g"))
      .select(md5Long(col("g")).as("h"))
    val minK = hashes.distinct().orderBy(col("h")).limit(k)
    val kth = minK.agg(max(col("h")).as("kth_hash"),
      count(lit(1)).as("_n_seen"))
    val exact = hashes.agg(countDistinct(col("h")).as("exact_distinct"))
    kth.crossJoin(broadcast(exact))
      // fewer than k distinct grams → the sketch IS exact
      .withColumn("est_distinct", expr(
        s"""CASE WHEN _n_seen < $k THEN exact_distinct
            ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * ${1L << 60})
                 DIV kth_hash AS BIGINT) END"""))
      .withColumn("within_bound", expr(
        s"""CAST(CASE WHEN (CAST(est_distinct AS DECIMAL(38,0)) - exact_distinct)
              * (CAST(est_distinct AS DECIMAL(38,0)) - exact_distinct) * $k
              <= CAST(9 AS DECIMAL(38,0)) * exact_distinct * exact_distinct
            THEN 1 ELSE 0 END AS BIGINT)"""))
      .select(lit(k.toLong).as("k"), col("kth_hash"),
        col("est_distinct"), col("exact_distinct"), col("within_bound"))
  }

  /** 4-sigma sampling band for a rank estimate from a k-row uniform
    * sample, in ppm: ceil(4e6 * sqrt(q(1-q)/k)). Shared with the
    * oracle generator so both engines assert the identical band.
    */
  def quantileBoundPpm(qPct: Int, k: Int): Long = {
    require(qPct >= 1 && qPct <= 99 && k >= 2, s"bad qPct=$qPct k=$k")
    val q = qPct / 100.0
    math.ceil(4e6 * math.sqrt(q * (1 - q) / k)).toLong
  }

  /** Mergeable quantile sketch (q221): per-source bottom-k-by-hash
    * uniform value samples, plus a `_merged` sketch rebuilt ONLY from
    * those k-sets. Bottom-k by a uniform per-row hash IS a uniform
    * random sample, and its merge is LOSSLESS — the k smallest hashes
    * of a union are contained in the union of each side's k smallest —
    * so 1000 executors / ingest days / sources each keep k (hash,
    * value) pairs and a coordinator answers any corpus-wide quantile
    * from sources·k rows, never the stream. The KMV trick (q215)
    * carried from distinct-counting to order statistics; completes the
    * battery's sketch-algebra family (HLL bounds q35, KMV merge q215,
    * CMS merge q217).
    *
    * Output, one row per (source ∪ `_merged`) × qPct, ordered:
    * (source, q_pct, n_pop, m_sample, est_value, lo_ppm, hi_ppm,
    * within_bound, merged_eq_direct) where est_value is the sample's
    * ceil(q·m)-th value (ties broken by hash — deterministic on both
    * engines), lo_ppm/hi_ppm bracket est_value's exact rank interval
    * in the FULL population (strict-below / at-or-below — the audit
    * join; ties in the value domain make this an interval, not a
    * point), within_bound = the target rank q·1e4 falls inside
    * [lo − band, hi + band] with band = [[quantileBoundPpm]] (exact
    * populations, n ≤ k, pass by construction), and merged_eq_direct
    * compares the merged k-set row-by-row against the bottom-k
    * computed directly on the full stream (lossless ⇒ always 1; the
    * engine COMPUTES it rather than asserting it).
    *
    * Scale shape: one window per source for the k-cut (salted
    * two-level, the q215 skew guard), then everything except the rank
    * audit operates on ≤ sources·k rows; the audit is one broadcast
    * join of ≤ (sources+1)·|qPcts| estimate rows against the
    * population stream — a single scan, no sort of the full data.
    *
    * NULL values never enter the sample (see [[bottomKBySource]]) nor
    * the direct-compare leg; they still count into n_pop but never
    * into the strict/at-or-below rank sums (CASE-guarded to 0 on both
    * engines), so a nullable value column cannot shift thresholds or
    * drop a group cross-engine.
    */
  def quantileSketchMerge(docs: DataFrame, idCol: String, value: Column,
      sourceCol: String, k: Int = 128,
      qPcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    require(qPcts.nonEmpty && qPcts.forall(p => p >= 1 && p <= 99),
      s"qPcts must be in [1,99]: $qPcts")
    import graft.functions.md5Long
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(sourceCol).as("source"),
      md5Long(col(idCol).cast("string")).as("h"),
      value.cast("long").as("v"))
    val samples = bottomKBySource(base, k)
      .localCheckpoint(true) // ≤ sources·k rows, used four times
    // LOSSLESS MERGE: bottom-k of the union of per-source bottom-k
    val mergedSample = samples.select(col("h"), col("v"))
      .orderBy(col("h"), col("v")).limit(k)
      .select(lit("_merged").as("source"), col("h"), col("v"))
      .localCheckpoint(true) // ≤ k rows
    // merged_eq_direct: multiset-compare the merged k-set against the
    // bottom-k computed directly on the full stream (1-row result).
    // The direct leg must apply the same NULL-value exclusion as the
    // sample cut (bottomKBySource) or a NULL-v row could enter only
    // the direct side and falsely fail the lossless-merge compare.
    val direct = base.filter(col("v").isNotNull).select(col("h"), col("v"))
      .orderBy(col("h"), col("v")).limit(k)
    val meq = mergedSample.groupBy(col("h"), col("v"))
      .agg(count(lit(1)).as("_cm"))
      .join(direct.groupBy(col("h"), col("v")).agg(count(lit(1)).as("_cd")),
        Seq("h", "v"), "full_outer")
      .agg(coalesce(sum(when(coalesce(col("_cm"), lit(0L)) =!=
          coalesce(col("_cd"), lit(0L)), 1L).otherwise(0L)), lit(0L)).as("_bad"))
      .select(when(col("_bad") === 0L, 1L).otherwise(0L).as("merged_eq_direct"))
    val all = samples.unionByName(mergedSample)
    val mPer = all.groupBy(col("source")).agg(count(lit(1)).as("m_sample"))
    val ws = Window.partitionBy(col("source")).orderBy(col("v"), col("h"))
    val ranked = all.withColumn("_srn", row_number().over(ws))
    // bound table shared with the oracle via quantileBoundPpm
    val qRows = qPcts.map(p => struct(lit(p.toLong).as("q_pct"),
      lit(quantileBoundPpm(p, k)).as("_band")))
    val ests = ranked.join(mPer, "source")
      .withColumn("_q", explode(array(qRows: _*)))
      .select(col("source"), col("_q.q_pct").as("q_pct"),
        col("_q._band").as("_band"), col("m_sample"), col("_srn"), col("v"))
      .filter(col("_srn") === expr("(q_pct * m_sample + 99) DIV 100"))
      .select(col("source"), col("q_pct"), col("_band"), col("m_sample"),
        col("v").as("est_value"))
    // rank audit: one scan of the population (doubled for the global
    // row) against the broadcast ≤ (sources+1)·|qPcts| estimates
    val popUnion = base.select(col("source"), col("v"))
      .unionByName(base.select(lit("_merged").as("source"), col("v")))
    val audited = popUnion.join(broadcast(ests), Seq("source"))
      .groupBy(col("source"), col("q_pct"), col("_band"), col("m_sample"),
        col("est_value"))
      .agg(count(lit(1)).as("n_pop"),
        sum(when(col("v") < col("est_value"), 1L).otherwise(0L)).as("_lt"),
        sum(when(col("v") <= col("est_value"), 1L).otherwise(0L)).as("_le"))
      .withColumn("lo_ppm", expr("CAST(_lt * 1000000 DIV n_pop AS BIGINT)"))
      .withColumn("hi_ppm", expr("CAST(_le * 1000000 DIV n_pop AS BIGINT)"))
      .withColumn("within_bound", expr(
        s"""CAST(CASE WHEN n_pop <= $k THEN 1
              WHEN q_pct * 10000 >= lo_ppm - _band
               AND q_pct * 10000 <= hi_ppm + _band THEN 1
              ELSE 0 END AS BIGINT)"""))
    audited.crossJoin(broadcast(meq))
      .select(col("source"), col("q_pct"), col("n_pop"), col("m_sample"),
        col("est_value"), col("lo_ppm"), col("hi_ppm"),
        col("within_bound"), col("merged_eq_direct"))
      .orderBy(col("source"), col("q_pct"))
  }

  /** Pairwise source content similarity from KMV sketches ALONE
    * (q224): the k-minimum-values sets that already serve distinct
    * counting (q215) are a coordinated uniform sample of each source's
    * gram space, so for any source pair the k smallest hashes of
    * A_k ∪ B_k are a uniform sample of A ∪ B, and the fraction of them
    * present in BOTH k-sets estimates the Jaccard similarity
    * (Broder's min-wise estimator on bottom-k sketches). At 100 TB the
    * coordinator answers all |sources|² similarities from sources·k
    * longs — the corpus is never re-scanned per pair, which is exactly
    * what the exact matrix (q92's shape, and this row's audit leg)
    * must do.
    *
    * Output, one row per unordered pair (src_a < src_b):
    * (src_a, src_b, m_union_k, j_num, est_ppm, inter_exact,
    * union_exact, exact_ppm, within_3sig) where m_union_k = |k smallest
    * of A_k ∪ B_k| (< k only when the true union is smaller — then the
    * estimate is exact by construction), j_num = how many of those sit
    * in both k-sets, est_ppm = j_num·1e6 DIV m_union_k, the exact legs
    * come from one distinct-gram self-join (the audit), and
    * within_3sig applies the binomial 3σ band entirely in integers:
    * (est−exact)²·k ≤ 9·(exact_ppm·(1e6−exact_ppm) + 1e6) — the flag
    * is COMPUTED on both engines, so a legitimately-outside-3σ pair
    * still hash-matches (no q217-style asserted probability).
    *
    * `candidatesOnly = true` (q226) is the many-sources scale path:
    * the pair frontier comes from the k-set self-join on h instead of
    * the source cross — only pairs that CAN score nonzero materialize,
    * so 1000 mostly-disjoint sources cost the overlap structure, not
    * C(1000, 2) union builds. The q212→q216 dense-baseline/sparse-cure
    * pairing.
    */
  /** Frontier-selection law for [[kmvPairwiseJaccard]] (VERDICT r11
    * item 6): pick the sparse candidate frontier once the dense form's
    * pair count C(n,2) crosses ~2k — the ENTIRE pair mass the measured
    * 400-source probe materialized sparsely (BASELINE.md round-11
    * table: dense 79,800 pairs / 35.2 s vs sparse 1,800 pairs / 3.4 s
    * at 400 sources in 40 disjoint vocab groups; at the battery's 20
    * overlapping sources the two emit identical rows in statistically
    * equal time — 2.73 vs 2.55 s). C(64,2) = 2,016 is where the dense
    * frontier alone exceeds that measured sparse pair mass, so 64 is
    * the crossover: below it the cross-join's simplicity costs
    * nothing; at or above it the dense form burns quadratic union
    * builds proving zeros that the k-set self-join never materializes.
    */
  def suggestJaccardFrontier(nSources: Long): Boolean = nSources >= 64L

  /** [[kmvPairwiseJaccard]] with the frontier chosen by
    * [[suggestJaccardFrontier]] from a column-pruned distinct-source
    * count (one cheap planning scan — the suggestSimhashParams
    * discipline: derive the knob from the data on every engine, no
    * fixed-parameter cliff). Callers get the scale-safe plan by
    * default; the battery keeps both pinned shapes (q224 dense, q226
    * sparse) so each regresses independently.
    */
  def kmvPairwiseJaccardAuto(docs: DataFrame, textCol: String,
      sourceCol: String, k: Int = 256): DataFrame =
    kmvPairwiseJaccard(docs, textCol, sourceCol, k,
      candidatesOnly = suggestJaccardFrontier(
        docs.select(col(sourceCol)).distinct().count()))

  def kmvPairwiseJaccard(docs: DataFrame, textCol: String,
      sourceCol: String, k: Int = 256,
      candidatesOnly: Boolean = false): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import graft.functions.{md5Long, rawShingles}
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col(sourceCol).as("source"),
        explode(rawShingles(lower(col(textCol)), 3)).as("g"))
      .select(col("source"), md5Long(col("g")).as("h"))
      .distinct()
      .localCheckpoint(true) // distinct (source, gram-hash): sketch + audit input
    // per-source k-min sets — the q215 salted two-level cut
    val w1 = Window.partitionBy(col("source"), pmod(col("h"), lit(64)))
      .orderBy(col("h"))
    val pruned = d.withColumn("_rn1", row_number().over(w1))
      .filter(col("_rn1") <= k).drop("_rn1")
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    val mins = pruned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
      .localCheckpoint(true) // ≤ sources·k rows
    // the pair frontier. Dense (default): all C(|sources|, 2) — the
    // full matrix a 20-source corpus report wants. Sparse
    // (candidatesOnly, q226): only pairs whose k-sets SHARE a hash —
    // at 1000 mostly-disjoint sources the dense form's per-pair union
    // build is 500k pairs × 2k rows, nearly all of it spent proving
    // zeros; the sketch self-join emits exactly the pairs that can
    // score nonzero (j_num > 0 ⇒ a shared hash in both k-sets), so
    // disjoint pairs never materialize. A candidate can still
    // legitimately score 0 (its shared hashes rank past k in the
    // union) — emitted, so the output is a deterministic function of
    // the k-sets, not of which zeros were pruned.
    val pairs = (if (!candidatesOnly) {
      val srcs = mins.select(col("source")).distinct()
      srcs.select(col("source").as("src_a"))
        .crossJoin(srcs.select(col("source").as("src_b")))
    } else
      mins.withColumnRenamed("source", "src_a")
        .join(mins.withColumnRenamed("source", "src_b"), "h")
        .select(col("src_a"), col("src_b")).distinct()
    ).filter(col("src_a") < col("src_b"))
    // per-pair union of the two k-sets with membership flags
    val sideA = pairs.join(mins.withColumnRenamed("source", "src_a"), "src_a")
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1L).as("_ia"), lit(0L).as("_ib"))
    val sideB = pairs.join(mins.withColumnRenamed("source", "src_b"), "src_b")
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0L).as("_ia"), lit(1L).as("_ib"))
    val union2 = sideA.unionByName(sideB)
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("_ia")).as("_ia"), max(col("_ib")).as("_ib"))
    val wp = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    val est = union2.withColumn("_urn", row_number().over(wp))
      .filter(col("_urn") <= k) // the k smallest of A_k ∪ B_k
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("m_union_k"),
        sum(col("_ia") * col("_ib")).as("j_num"))
      .withColumn("est_ppm",
        expr("CAST(j_num * 1000000 DIV m_union_k AS BIGINT)"))
    // exact audit: one self-join of the distinct gram-hash sets
    val nPer = d.groupBy(col("source")).agg(count(lit(1)).as("_n"))
    val inter = d.withColumnRenamed("source", "src_a")
      .join(d.withColumnRenamed("source", "src_b"), "h")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter_exact"))
    val exact = pairs
      .join(nPer.select(col("source").as("src_a"), col("_n").as("_na")), "src_a")
      .join(nPer.select(col("source").as("src_b"), col("_n").as("_nb")), "src_b")
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .withColumn("union_exact", col("_na") + col("_nb") - col("inter_exact"))
      .withColumn("exact_ppm",
        expr("CAST(inter_exact * 1000000 DIV union_exact AS BIGINT)"))
      .select(col("src_a"), col("src_b"), col("inter_exact"),
        col("union_exact"), col("exact_ppm"))
    est.join(exact, Seq("src_a", "src_b"))
      .withColumn("within_3sig", expr(
        s"""CAST(CASE WHEN (est_ppm - exact_ppm) * (est_ppm - exact_ppm) * $k
              <= 9 * (exact_ppm * (1000000 - exact_ppm) + 1000000) THEN 1
              ELSE 0 END AS BIGINT)"""))
      .select(col("src_a"), col("src_b"), col("m_union_k"), col("j_num"),
        col("est_ppm"), col("inter_exact"), col("union_exact"),
        col("exact_ppm"), col("within_3sig"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** KMV key-overlap report — the planner trilogy's DISTINCT-KEY read,
    * next to the AMS row-product size (q240: Σ fA·fB, what a join
    * OUTPUTS) and the Bloom prune (q245, what a runtime filter KEEPS):
    * how many distinct keys two relations SHARE, estimated from one
    * bottom-k sketch per side. Each side pays a column-pruned distinct
    * + a TakeOrdered(k) over the 60-bit md5 key hashes (map-side
    * partial top-k — k longs cross the network per side, mergeable
    * across any partitioning, the q221 lossless-merge property);
    * Broder's min-wise estimator on the union k-set gives J, the union
    * k-th min gives |A ∪ B| (the q215 estimator), and their product
    * gives the intersection — so a coordinator answers "will this join
    * hit anything" from 2k longs without touching either relation
    * again. Sub-k regimes collapse to exact (m < k ⟹ both sketches
    * were exhaustive, mirroring kmvDistinctGrams' CASE).
    *
    * Everything emitted is a deterministic integer function of the key
    * sets — estimates AND exact audit legs (one distinct-key equi-join,
    * bounded by distinct keys, the q240 audit class) — plus the q224
    * within-3σ flag COMPUTED on both engines, never asserted.
    *
    * Output (one row): (k, m_union_k, j_num, est_n_a, est_n_b,
    * est_union, est_inter, j_est_ppm, n_a, n_b, inter_exact,
    * union_exact, j_exact_ppm, within_3sig).
    */
  def kmvKeyOverlap(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
      k: Int = 256): DataFrame = {
    val (ka, kb, est) = kmvOverlapSketch(a, aKey, b, bKey, k)
    val exA = ka.agg(count(lit(1)).as("n_a"))
    val exB = kb.agg(count(lit(1)).as("n_b"))
    val exI = ka.join(kb, "h").agg(count(lit(1)).as("inter_exact"))
    est.crossJoin(broadcast(exA)).crossJoin(broadcast(exB))
      .crossJoin(broadcast(exI))
      .withColumn("union_exact", col("n_a") + col("n_b") - col("inter_exact"))
      .withColumn("j_exact_ppm", expr(
        """CAST(CASE WHEN union_exact = 0 THEN 0
            ELSE inter_exact * 1000000 DIV union_exact END AS BIGINT)"""))
      .withColumn("within_3sig", expr(
        s"""CAST(CASE WHEN (j_est_ppm - j_exact_ppm) * (j_est_ppm - j_exact_ppm)
              * $k <= 9 * (j_exact_ppm * (1000000 - j_exact_ppm) + 1000000)
            THEN 1 ELSE 0 END AS BIGINT)"""))
      .select(col("k"), col("m_union_k"), col("j_num"),
        col("est_n_a"), col("est_n_b"), col("est_union"), col("est_inter"),
        col("j_est_ppm"), col("n_a"), col("n_b"), col("inter_exact"),
        col("union_exact"), col("j_exact_ppm"), col("within_3sig"))
  }

  /** The production sizing call of [[kmvKeyOverlap]] — sketch legs
    * alone, no exact/audit state (the q240→q243 split applied to the
    * distinct-key read), and crucially NO DISTINCT SHUFFLE: each
    * side's bottom-k distinct hashes come from a per-partition TreeSet
    * accumulator (the [[kmvSketchGrams]] production form — a k-bounded
    * dedup heap per partition, ≤ partitions·k candidates merge), so
    * the key columns never leave their scan tasks. Measured: the
    * report's audit distincts made its "estimate" term grow with
    * distinct keys (6.6 s at gen-sf10); this path is the flat one.
    * Identical k-min sets → identical estimates to the report
    * (spec-pinned). Output: (k, m_union_k, j_num, est_n_a, est_n_b,
    * est_union, est_inter, j_est_ppm).
    */
  def kmvKeyOverlapEstimate(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column, k: Int = 256): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import graft.functions.md5Long
    def prodKmin(df: DataFrame, c: Column): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      // NULL keys never match an equi-join, so they are no part of the
      // overlap — and left in, Spark's NULLS FIRST ordering would seat
      // them in the k-min set while DuckDB's NULLS LAST would not (the
      // bottomKBySource NULL rule, ADVICE r11)
      kminPartials(df.select(md5Long(c.cast("string")).as("h"))
        .filter(col("h").isNotNull).as[Long], k)
        .localCheckpoint(true)
    }
    kmvEstRow(prodKmin(a, aKey), prodKmin(b, bKey), k)
  }

  /** Shared sketch legs of [[kmvKeyOverlap]]/[[kmvKeyOverlapEstimate]]:
    * (distinct-key hashes A, distinct-key hashes B, the estimate row).
    */
  private def kmvOverlapSketch(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column, k: Int): (DataFrame, DataFrame, DataFrame) = {
    require(k >= 2, s"need k >= 2, got $k")
    import graft.functions.md5Long
    // NULL keys excluded on both legs: they never match an equi-join
    // (so they are no part of "overlap"), and Spark's NULLS FIRST
    // would otherwise seat them in the k-min set while DuckDB's NULLS
    // LAST would not (the bottomKBySource NULL rule, ADVICE r11)
    def keys(df: DataFrame, c: Column) =
      df.select(md5Long(c.cast("string")).as("h"))
        .filter(col("h").isNotNull).distinct()
        .localCheckpoint(true)
    val (ka, kb) = (keys(a, aKey), keys(b, bKey))
    def kmin(df: DataFrame) = df.orderBy(col("h")).limit(k)
      .localCheckpoint(true)
    (ka, kb, kmvEstRow(kmin(ka), kmin(kb), k))
  }

  /** The estimate row from two bottom-k distinct-hash frames. */
  private def kmvEstRow(ma: DataFrame, mb: DataFrame, k: Int): DataFrame = {
    // union k-set with membership flags: ≤ 2k rows, driver never sees
    // the hash stream
    val uk = ma.select(col("h"), lit(1L).as("_ia"), lit(0L).as("_ib"))
      .unionByName(mb.select(col("h"), lit(0L).as("_ia"), lit(1L).as("_ib")))
      .groupBy(col("h")).agg(max(col("_ia")).as("_ia"), max(col("_ib")).as("_ib"))
      .orderBy(col("h")).limit(k)
    def estOf(mCol: String, kthCol: String, exactCol: String) = expr(
      s"""CASE WHEN $mCol < $k THEN $exactCol
          ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * ${1L << 60})
               DIV $kthCol AS BIGINT) END""")
    // coalesce + zero-m guards below: two EMPTY relations must yield a
    // deterministic all-zero row, not NULLs (and, ANSI, not a divide
    // error) — DuckDB mirrored
    val sk = uk.agg(count(lit(1)).as("m_union_k"), max(col("h")).as("_kth_u"),
      coalesce(sum(col("_ia") * col("_ib")), lit(0L)).as("j_num"))
    val skA = ma.agg(count(lit(1)).as("_m_a"), max(col("h")).as("_kth_a"))
    val skB = mb.agg(count(lit(1)).as("_m_b"), max(col("h")).as("_kth_b"))
    val est = sk.crossJoin(broadcast(skA)).crossJoin(broadcast(skB))
      .withColumn("est_n_a", estOf("_m_a", "_kth_a", "_m_a"))
      .withColumn("est_n_b", estOf("_m_b", "_kth_b", "_m_b"))
      // sub-k: the union of two exhaustive sketches IS the exact union
      .withColumn("est_union", estOf("m_union_k", "_kth_u", "m_union_k"))
      .withColumn("est_inter", expr(
        """CAST(CASE WHEN m_union_k = 0 THEN 0
            ELSE j_num * est_union DIV m_union_k END AS BIGINT)"""))
      .withColumn("j_est_ppm", expr(
        """CAST(CASE WHEN m_union_k = 0 THEN 0
            ELSE j_num * 1000000 DIV m_union_k END AS BIGINT)"""))
      .select(lit(k.toLong).as("k"), col("m_union_k"), col("j_num"),
        col("est_n_a"), col("est_n_b"), col("est_union"), col("est_inter"),
        col("j_est_ppm"))
    est
  }

  /** Per-source bottom-k by (h, v) over (source, h, v) rows — the cut
    * shared by [[quantileSketchMerge]] and [[maintainQuantileSamples]].
    * Salted two-level: a straight per-source window would sort the
    * source's entire stream in one partition (the skew wall); each
    * true per-source k-min is within its salt bucket's k-min, so
    * level 2 sees ≤ 64·k rows per source.
    *
    * NULL values never enter the sample: a NULL `v` carries no order
    * statistic, and because the cut orders by (h, v) with h unique, a
    * NULL-v row would otherwise survive it — then every consumer's
    * (v, h) rank window would place it engine-specifically (Spark
    * ranks NULLs first, DuckDB last), shifting ceil-rank thresholds
    * cross-engine or making a group's threshold itself NULL. The
    * oracle sample CTEs (q221/q222/q223/q225) mirror this filter.
    */
  def bottomKBySource(base: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("source"), pmod(col("h"), lit(64)))
      .orderBy(col("h"), col("v"))
    val pruned = base.filter(col("v").isNotNull)
      .withColumn("_rn1", row_number().over(w1))
      .filter(col("_rn1") <= k).drop("_rn1")
    val w2 = Window.partitionBy(col("source")).orderBy(col("h"), col("v"))
    pruned.withColumn("_rn", row_number().over(w2))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** Incremental maintenance of per-source bottom-k samples under
    * ADDITIVE commits (q222): re-cut prior ∪ newly-added — EXACT
    * equality with a full recompute by the lossless-merge law
    * (bottom-k(bottom-k(S) ∪ A) = bottom-k(S ∪ A)), so a 100-TB lake
    * keeps per-source quantiles current by scanning only each commit's
    * change feed, never the table. Deletions invalidate a bottom-k
    * sample (an evicted competitor cannot be resurrected without the
    * stream) — a delete-bearing commit forces recompute, the same
    * additive-only caveat as incremental decontamination (q188).
    *
    * `prior` is a (source, h, v) sample table (≤ sources·k rows);
    * `added` is the raw change feed, hashed here with the same
    * engine-wide md5Long as every sketch producer.
    */
  def maintainQuantileSamples(prior: DataFrame, added: DataFrame,
      idCol: String, value: Column, sourceCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import graft.functions.md5Long
    val addedHashed = added.select(col(sourceCol).as("source"),
      md5Long(col(idCol).cast("string")).as("h"),
      value.cast("long").as("v"))
    bottomKBySource(prior.select(col("source"), col("h"), col("v"))
      .unionByName(addedHashed), k)
  }

  /** AMS join-size estimate (Alon–Matias–Szegedy F2 machinery in its
    * Alon–Gibbons–Matias–Szegedy join form): |A ⋈_key B| = Σ_k
    * fA(k)·fB(k) estimated WITHOUT joining — the "is this join
    * broadcast-able / how many rows will it emit" planner read at
    * 100 TB, where running the join to size it defeats the point.
    * The sketch family's fifth duty (distinct q193/q215, frequency
    * q217, quantiles q221, similarity q224, join size here).
    *
    * Per sketch j < m: sign_j(k) = ±1 from bit j of md5Long(key) (one
    * hash per row serves all m sketches); X_side[j] = Σ_rows
    * sign_j(key) — m exact BIGINT sums folded in ONE aggregate pass
    * per side, so each side's sketch is m longs and the estimate
    * E[X_A[j]·X_B[j]] = Σ fA·fB is served by the exact lower median
    * of the m products (deterministic order statistic — both engines
    * replay it; no mean-of-means randomness to seed).
    *
    * This is an AUDIT-shaped report (the q193 discipline): it carries
    * the exact join size and both second frequency moments — computed
    * from one per-key count aggregate per side plus a key-level join,
    * bounded by distinct keys, NOT the row-level join being sized —
    * and the AMS single-sketch variance bound Var ≤ 2·F2(A)·F2(B) as
    * the engine-computed flag (est − exact)² ≤ 9·2·F2A·F2B, the q151
    * cross-multiplied integer discipline (conservative for a median
    * of m, stated not hidden).
    *
    * Numeric envelope (ADVICE r12): every product — the X_A·X_B
    * sketch products, the exact Σ c_a·c_b, both F2 sums, and the
    * flag's (est−exact)² vs 18·F2A·F2B cross-multiply — runs in
    * DECIMAL(38,0) (HUGEINT in the oracle), because BIGINT overflows
    * the FLAG arithmetic at only ~10⁵ rows per side on one hot key
    * (F2 ~ n², the flag multiplies two of them). The decimal form is
    * exact while |est−exact| ≤ 10¹⁹ AND 18·F2A·F2B ≤ 10³⁸ — i.e.
    * ~1.5·10⁹ rows/side worst-case (everything on one key) and
    * ≥ 2·10¹⁸ rows/side with near-distinct keys; past that ANSI
    * raises rather than silently wrapping. The REPORT columns stay
    * BIGINT and saturate at ±Long.Max (readings there are 9.2·10¹⁸ —
    * any real sizing decision fired long before); the flag compares
    * the UNsaturated decimals.
    *
    * Output: 1 row (n_a, n_b, est_join, exact_join, f2_a, f2_b,
    * within_3sig).
    */
  def amsJoinSizeReport(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column, m: Int = 32): DataFrame = {
    def keyCounts(df: DataFrame, key: Column, cCol: String): DataFrame =
      df.select(key.cast("string").as("_k"))
        .groupBy(col("_k")).agg(count(lit(1)).as(cCol))
    val dec = AmsDec
    val ka = keyCounts(a, aKey, "_ca")
    val kb = keyCounts(b, bKey, "_cb")
    val exact = ka.join(kb, Seq("_k"))
      .agg(coalesce(sum(col("_ca").cast(dec) * col("_cb")),
        lit(0L).cast(dec)).as("_exact"))
    val f2a = ka.agg(coalesce(sum(col("_ca").cast(dec) * col("_ca")),
      lit(0L).cast(dec)).as("_f2a"))
    val f2b = kb.agg(coalesce(sum(col("_cb").cast(dec) * col("_cb")),
      lit(0L).cast(dec)).as("_f2b"))
    amsEstCore(a, aKey, b, bKey, m)
      .crossJoin(broadcast(exact))
      .crossJoin(broadcast(f2a)).crossJoin(broadcast(f2b))
      .withColumn("within_3sig",
        when((col("_est") - col("_exact")) * (col("_est") - col("_exact"))
          <= lit(18L).cast(dec) * col("_f2a") * col("_f2b"), 1L).otherwise(0L))
      .select(col("n_a"), col("n_b"), amsSat(col("_est")).as("est_join"),
        amsSat(col("_exact")).as("exact_join"), amsSat(col("_f2a")).as("f2_a"),
        amsSat(col("_f2b")).as("f2_b"), col("within_3sig"))
  }

  /** The production SIZING call — (n_a, n_b, est_join) with nothing
    * else: one aggregate pass per side (m bit-sums over a single
    * md5Long per row — no per-key state, no shuffle beyond the two
    * partial-aggregate reductions), so its cost is FLAT in distinct
    * keys and linear in the scan. [[amsJoinSizeReport]] is this plus
    * the exact/F2 audit columns (bounded by distinct keys) — run the
    * report when VALIDATING the estimator, this when sizing a join
    * before running it.
    */
  def amsJoinEstimate(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column, m: Int = 32): DataFrame =
    amsEstCore(a, aKey, b, bKey, m)
      .select(col("n_a"), col("n_b"), amsSat(col("_est")).as("est_join"))

  private val AmsDec = "decimal(38,0)"

  /** ±Long.Max saturation for BIGINT report columns computed at
    * DECIMAL(38,0) internally (the q240 overflow discipline).
    */
  private def amsSat(c: Column): Column =
    greatest(least(c, lit(Long.MaxValue).cast(AmsDec)),
      lit(Long.MinValue).cast(AmsDec)).cast("long")

  /** Shared estimate core: per-side sketches (n, X[0..m)) and the
    * lower-median product `_est` (DECIMAL(38,0), unsaturated — the
    * report's flag compares it before saturation).
    */
  private def amsEstCore(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column, m: Int): DataFrame = {
    require(m >= 1 && m <= 60, s"need 1 <= m <= 60 (md5Long bits), got $m")
    import graft.functions.md5Long
    def sketch(df: DataFrame, key: Column, nCol: String): DataFrame = {
      val aggs = count(lit(1)).as(nCol) +:
        (0 until m).map(j => sum(expr(s"shiftright(_h, $j) & 1")).as(s"_o$j"))
      df.select(md5Long(key.cast("string")).as("_h"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col(nCol), array((0 until m).map(j =>
          col(nCol) - lit(2L) * col(s"_o$j")): _*).as(s"${nCol}_x"))
    }
    sketch(a, aKey, "n_a").crossJoin(sketch(b, bKey, "n_b"))
      .withColumn("_prods", array_sort(zip_with(col("n_a_x"), col("n_b_x"),
        (x, y) => x.cast(AmsDec) * y)))
      .withColumn("_est", element_at(col("_prods"), (m + 1) / 2))
  }

  /** Bloom-bits law: m = ⌈k·n/ln 2⌉ bits for n keys and k hash rows —
    * the optimum where a k-hash Bloom filter's false-positive rate is
    * ≈ 2^−k (each bit set with probability ½). Exact integer math
    * (1/ln 2 as 14427/10⁴, rounded UP so the filter is never
    * under-provisioned); both engines re-derive it from count(*).
    */
  def suggestBloomBits(nKeys: Long, kHashes: Int): Long = {
    require(nKeys >= 1 && kHashes >= 1 && kHashes <= 16,
      s"need nKeys >= 1, kHashes in [1,16]: $nKeys, $kHashes")
    nKeys * kHashes * 14427L / 10000L + 1L
  }

  /** PORTABLE Bloom semi-join — the runtime-filter technique that
    * makes selective joins cheap at 100 TB: hash the (filtered) dim
    * side's keys into an m-bit array with k md5Long rows
    * (bit i of key = md5Long("bf<i>:" ⧺ key) mod m — the cmsCellOf
    * discipline: ONE hash definition both engines replay), broadcast
    * the words as a single literal, and prune the fact scan with a
    * pure MAP-SIDE expression — the fact side never shuffles, never
    * joins, never moves; only survivors reach the real join
    * downstream. This is what Spark's own InjectRuntimeFilter does
    * with its opaque BloomFilterAggregate, rebuilt portable so the
    * DuckDB oracle replays the identical bits and the pruned set
    * hash-gates exactly (no within-bound flags needed — the filter is
    * a deterministic function of the dim key set).
    *
    * Production routing (measured at gen-sf10, 60M-row fact / 3M-key
    * dim, BASELINE round-13): exact left-semi 12.5 s (fact-wide
    * shuffle), THIS portable form 12.8 s (scan-local; the md5-string
    * hash is the oracle-portability tax — it ties the semi-join even
    * where shuffles are memory-speed and wins wherever they are
    * network), [[graft.expressions.Bloom]] (Spark's xxhash64
    * runtime-filter expressions) 3.1 s — use THAT when the filter
    * doesn't need cross-engine replay. The probe loop itself is the
    * native [[graft.expressions.BloomTestLong]] (the composed
    * element_at chain paid ~12 s per probe per 60M rows in generic
    * boxed array access — the DotFoldLong lesson again).
    *
    * Guarantees, both engine-computed: NO false negatives (every true
    * match survives — a hard Bloom property the audit counts rather
    * than asserts) and fpr ≈ 2^−k at the [[suggestBloomBits]] sizing.
    *
    * Driver/broadcast state: m/64 longs (the words) — size `mBits`
    * for the broadcast-literal regime (require ≤ 2^30 bits = 128 MB
    * words; past ~10⁸ dim keys switch to joining the position
    * RELATION instead of a literal — same bits, shuffle returns).
    */
  def bloomWords(dim: DataFrame, dimKey: Column, mBits: Long,
      kHashes: Int): Array[Long] = {
    require(mBits >= 64 && mBits <= (1L << 30),
      s"need 64 <= mBits <= 2^30 (broadcast-literal regime), got $mBits")
    import graft.functions.md5Long
    val nWords = ((mBits + 63) / 64).toInt
    // positions OR into words IN-ENGINE (map-side-combined bit_or), so
    // the driver receives ≤ m/64 word rows, never the position stream
    val words = new Array[Long](nWords)
    dim.select(md5Long(dimKey.cast("string")).as("_h"))
      .select(explode(array((0 until kHashes).map(i =>
        bloomPos(col("_h"), i, mBits)): _*)).as("_p"))
      .select(expr("CAST(_p DIV 64 AS INT)").as("_w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").as("_b"))
      .groupBy(col("_w")).agg(expr("bit_or(_b)").as("_bits"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Position i of a key's 60-bit md5 hash — Kirsch–Mitzenmacher
    * double hashing: pos_i = (h1 + i·h2) mod m with h1/h2 the hash's
    * low/high 30-bit halves (h2 forced odd so positions never
    * degenerate). ONE md5 per key serves all k probes — the md5-string
    * hash is the portability tax, so paying it once instead of k times
    * is the production path's big constant (measured at gen-sf10:
    * 53 → 22 s for the 60M-row prune); the derivation is pure integer
    * arithmetic both engines replay, preserving the oracle contract.
    */
  private def bloomPos(h: Column, i: Int, mBits: Long): Column = {
    val h1 = h.bitwiseAND(lit((1L << 30) - 1))
    val h2 = shiftright(h, 30).bitwiseAND(lit((1L << 30) - 1))
      .multiply(lit(2L)).plus(lit(1L))
    pmod(h1 + lit(i.toLong) * h2, lit(mBits))
  }

  /** The fact-side test expression over a literal words array — all k
    * probes must hit. Pure map-side (no shuffle, no join).
    */
  def bloomTest(factKey: Column, words: Array[Long], mBits: Long,
      kHashes: Int): Column =
    graft.expressions.BloomTestLong(
      graft.functions.md5Long(factKey.cast("string")),
      typedLit(words), lit(mBits), lit(kHashes))

  /** The composed-Catalyst executable spec of [[bloomTest]] (k ×
    * element_at over the words literal + shift/mask) — parity-pinned
    * against the native expression in ExpressionsSpec; measured ~12 s
    * PER PROBE per 60M rows from generic boxed array access, which is
    * why the hot path is [[graft.expressions.BloomTestLong]].
    */
  private[graft] def bloomTestComposed(factKey: Column, words: Array[Long],
      mBits: Long, kHashes: Int): Column = {
    import graft.functions.md5Long
    val w = typedLit(words)
    val h = md5Long(factKey.cast("string"))
    (0 until kHashes).map { i =>
      val p = bloomPos(h, i, mBits)
      (call_function("shiftright",
        element_at(w, (p.cast("double") / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)
  }

  /** Prune `fact` to rows whose key passes the dim-side Bloom filter,
    * sized by [[suggestBloomBits]]. The fact plan is scan + filter —
    * plan-pinned in PlanQualitySpec.
    */
  def bloomPrune(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, kHashes: Int = 5): DataFrame = {
    val n = math.max(1L, dim.select(dimKey).distinct().count())
    val m = suggestBloomBits(n, kHashes)
    fact.filter(bloomTest(factKey, bloomWords(dim, dimKey, m, kHashes),
      m, kHashes))
  }

  /** The past-2³⁰-bits regime of [[bloomPrune]] — IDENTICAL bits and
    * probes (same [[suggestBloomBits]] m, same md5 + double hashing),
    * but the words live as a (word, bits) RELATION joined on word
    * index instead of a broadcast literal: the filter costs one
    * shuffle of the DISTINCT fact keys' k probe rows against the m/64
    * word rows (never the fact itself — survivors semi-join back),
    * and m is unbounded. The two forms prune the exact same set
    * (spec-pinned), so the switch is a pure plan decision.
    *
    * Routing (measured, ScaleProbe bloomrel at gen-sf10 — BASELINE
    * round 14): inside the literal regime this form pays ~3 key-scale
    * shuffles (distinct fact keys, the probe/word join, the semi-join
    * back) and ran 4.8× the literal filter (62.7 vs 13.1 s, 60M-row
    * fact / 3M-key dim); past the 2³⁰ cap (150M-key dim, m ≈ 1.08G
    * bits) it is the ONLY Bloom option, but at fact-key multiplicity
    * ~1 the plain exact semi-join still won 16× (40 vs 658 s) — the
    * relation form's shuffles are priced per DISTINCT key, so route
    * to it only when m > 2³⁰ AND the fact carries many rows per key
    * (then the semi-join shuffles the full fact while this form
    * shuffles keys once). Otherwise: literal below the cap, exact
    * semi-join above it at low multiplicity.
    */
  def bloomPruneRelation(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, kHashes: Int = 5): DataFrame = {
    import graft.functions.md5Long
    val n = math.max(1L, dim.select(dimKey).distinct().count())
    val m = suggestBloomBits(n, kHashes)
    def probesOf(df: DataFrame, key: Column): DataFrame =
      df.select(md5Long(key.cast("string")).as("_h"), key.as("_k"))
        .select(col("_k"), explode(array((0 until kHashes).map(i =>
          bloomPos(col("_h"), i, m)): _*)).as("_p"))
    val wordsDf = probesOf(dim.select(dimKey.as("_dk")).distinct(), col("_dk"))
      .select(expr("_p DIV 64").as("_w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").as("_b"))
      .groupBy(col("_w")).agg(expr("bit_or(_b)").as("_bits"))
    val pass = probesOf(fact.select(factKey.as("_fk")).distinct(), col("_fk"))
      .select(col("_k").as("_fk"), expr("_p DIV 64").as("_w"),
        expr("CAST(_p % 64 AS INT)").as("_bit"))
      .join(wordsDf, Seq("_w"), "left")
      .groupBy(col("_fk"))
      .agg(sum(when(coalesce(
        expr("(shiftright(_bits, _bit) & 1) = 1"), lit(false)), 1L)
        .otherwise(0L)).as("_hits"))
      .filter(col("_hits") === lit(kHashes.toLong))
      .select(col("_fk"))
    fact.join(pass, factKey === col("_fk"), "left_semi")
  }

  /** One-row audit of [[bloomPrune]] (the q193/q240 audit discipline):
    * fact/dim populations, the law's m, pass counts, the exactly-
    * counted false positives, and `no_false_neg` COMPUTED (count of
    * true matches the filter dropped — 0 by the Bloom hard guarantee,
    * counted not asserted). Output: (n_fact, n_dim_keys, m_bits, k,
    * bloom_pass, exact_pass, false_pos, no_false_neg).
    */
  def bloomPruneAudit(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, kHashes: Int = 5): DataFrame = {
    val dk = dim.select(dimKey.as("_k")).distinct().localCheckpoint(true)
    val n = math.max(1L, dk.count())
    val m = suggestBloomBits(n, kHashes)
    // probe each DISTINCT fact key once and carry its multiplicity —
    // the audit's counts weight by _c, so the k md5 probes run over
    // distinct keys instead of twice over every fact row (measured
    // 43 → 16 s at gen-sf10's 60M-row/15M-key fact; the production
    // bloomPrune path is untouched — its one probe pass per row IS
    // the runtime-filter cost)
    val fk = fact.select(factKey.as("_fk"))
      .groupBy(col("_fk")).agg(count(lit(1)).as("_c"))
    val test = bloomTest(col("_fk"), bloomWords(dk, col("_k"), m, kHashes),
      m, kHashes)
    // both aggregate branches reference this identical subtree: the
    // groupBy exchange is computed once and REUSED (ReuseExchange), so
    // no checkpoint materialization of the 10⁷-key relation is needed
    val probed = fk.select(col("_fk"), col("_c"), test.as("_pass"))
    val exact = probed.join(dk, probed("_fk") === dk("_k"), "left_semi")
    probed.agg(coalesce(sum(col("_c")), lit(0L)).as("n_fact"),
        coalesce(sum(when(col("_pass"), col("_c")).otherwise(0L)), lit(0L))
          .as("bloom_pass"))
      .crossJoin(broadcast(exact.agg(
        coalesce(sum(col("_c")), lit(0L)).as("exact_pass"),
        coalesce(sum(when(col("_pass"), 0L).otherwise(col("_c"))), lit(0L))
          .as("_dropped_true"))))
      .select(col("n_fact"), lit(n).as("n_dim_keys"), lit(m).as("m_bits"),
        lit(kHashes.toLong).as("k"), col("bloom_pass"), col("exact_pass"),
        (col("bloom_pass") - col("exact_pass")).as("false_pos"),
        when(col("_dropped_true") === 0L, 1L).otherwise(0L)
          .as("no_false_neg"))
  }

  /** m-selection law for [[amsJoinSizeReport]] (VERDICT r12 item 5):
    * m = ⌈2/ε²⌉ sketch rows for a target relative error ε, clamped to
    * [1, 60] — the suggestSimhashParams discipline (derive the knob
    * from a stated target in exact integer math, no fixed-parameter
    * cliff). Derivation: a single AGMS product X_A·X_B has
    * Var ≤ 2·F2(A)·F2(B) (Alon–Gibbons–Matias–Szegedy), so m combined
    * rows put σ at √(2·F2A·F2B/m); in the Cauchy–Schwarz-tight regime
    * J ≈ √(F2A·F2B) — the self-join-like worst case, the ONLY regime
    * where relative error is data-independent — σ/J ≤ √(2/m), giving
    * m = ⌈2/ε²⌉. The operator's estimator is the lower MEDIAN of the
    * m products rather than their mean, so the same m doubles as the
    * median's confidence dial (per-product 3σ failure ≤ 1/9 by
    * Chebyshev; the median of m fails only if half the products do,
    * probability ≤ exp(−2m·(1/2−1/9)²)). The 60 cap is structural —
    * each row is one BIT of the single 60-bit md5Long per input row —
    * so targets below √(2/60) ≈ 18.3% are unreachable within one
    * hash; `capped` says so instead of silently under-delivering.
    *
    * ε arrives in ppm (integer, engine-portable): the default
    * 250_000 ppm (25%) reproduces the operator's historical m = 32.
    *
    * Returns (m, capped).
    */
  def suggestAmsM(targetRelErrPpm: Long = 250000L): (Int, Boolean) = {
    require(targetRelErrPpm >= 1 && targetRelErrPpm <= 1000000,
      s"need targetRelErrPpm in [1, 1e6], got $targetRelErrPpm")
    val p2 = targetRelErrPpm * targetRelErrPpm // <= 1e12, BIGINT-safe
    val raw = (2000000000000L + p2 - 1) / p2   // ceil(2e12 / ppm^2)
    (math.min(60L, math.max(1L, raw)).toInt, raw > 60L)
  }

  /** [[amsJoinSizeReport]] with m chosen by [[suggestAmsM]] from a
    * target relative error, the law columns appended so the selection
    * itself is hash-gated (the q229/kmvPairwiseJaccardAuto idiom).
    * Output adds (target_ppm, m, m_capped) to the report row.
    */
  def amsJoinSizeReportAuto(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column, targetRelErrPpm: Long = 250000L): DataFrame = {
    val (m, capped) = suggestAmsM(targetRelErrPpm)
    amsJoinSizeReport(a, aKey, b, bKey, m)
      .withColumn("target_ppm", lit(targetRelErrPpm))
      .withColumn("m", lit(m.toLong))
      .withColumn("m_capped", lit(if (capped) 1L else 0L))
  }
}
