package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Locks in the physical-plan properties the engine is designed
  * around — if a refactor breaks pushdown or broadcast selection,
  * these fail before any benchmark notices.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("filters are pushed to the parquet scan") {
    assert(plan("q01_pricing_summary").contains("LessThanOrEqual(l_shipdate"))
    assert(plan("q02_status_topk").contains("EqualTo(o_orderstatus,O)"))
    assert(plan("q32_asof_prev_click").contains("EqualTo(event_type,click)"))
  }

  test("scans prune to referenced columns only") {
    val p = plan("q24_token_count")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"token count must not read unused columns: $readSchema")
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    assert(plan("q02_status_topk").contains("TakeOrderedAndProject"))
  }

  test("dim join broadcasts the small side") {
    assert(plan("q08_join_revenue").contains("BroadcastHashJoin"))
  }

  test("ANN brute force broadcasts the query set (no shuffled cartesian)") {
    val p = plan("q21_ann_brute_force")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"), "must not plan a shuffled cartesian")
  }

  test("quality-score scan prunes to doc_id + text") {
    val p = plan("q41_quality_score")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"quality score must not read unused columns: $readSchema")
  }

  test("native expressions are planned in the hot paths (no HOF fallback)") {
    // (formatted mode under AQE doesn't print WholeStageCodegen markers;
    // the codegen path itself is exercised by ExpressionsSpec)
    // minhash/simhash signature stages run inside the operators'
    // localCheckpoint job (so the self-join reads a materialization
    // instead of re-hashing the corpus per side) — assert the native
    // expression on the operators' OWN signature-stage builders (the
    // exact frames the pair operators checkpoint), not the
    // post-checkpoint plan
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mhStage = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(mhStage.contains("minhash_sig"),
      "minhashLshPairs' signature stage must use the native expression")
    val shStage = graft.operators.Dedup.simhashSignatures(docs, "doc_id", "text", 32)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(shStage.contains("simhash_text"),
      "simhashPairs' fingerprint stage must use the native expression")
    assert(plan("q18_minhash_lsh_pairs").contains("ExistingRDD"),
      "q18's join must read the checkpointed signatures")
    assert(plan("q21_ann_brute_force").contains("dot_fold"),
      "q21 must use the native dot product")
  }

  test("sketch aggregation keeps map-side partial aggregation") {
    val p = plan("q35_sketches")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate") ||
      p.contains("ObjectHashAggregate"))
  }

  test("chunking is map-only: no exchange before the generator") {
    val p = plan("q47_chunking")
    // one Generate (explode) fed straight from the scan; the only
    // exchange allowed is the final presentation orderBy, which sits
    // ABOVE the generator (plans print top-down, so the generator's
    // input is the tree printed below it, up to the details section)
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(tree.exists(_.contains("Generate")), s"chunking must explode: $p")
    val generatorInput = tree.dropWhile(!_.contains("Generate")).drop(1)
    assert(!generatorInput.exists(_.contains("Exchange")),
      s"no shuffle may feed the chunk generator:\n${generatorInput.mkString("\n")}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars"), s"must not read unused columns: $readSchema")
  }

  test("stratified sample is a pure scan-level filter (no shuffle, no join)") {
    val p = plan("q48_stratified_sample")
    assert(p.contains("Filter"))
    assert(!p.contains("Join"), "sampling must not join")
    // exactly ONE exchange in the tree — the presentation orderBy; the
    // filter itself is narrow (scan → filter → sort)
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(tree.count(_.contains("Exchange")) == 1,
      s"sampling must shuffle only for the final sort:\n${tree.mkString("\n")}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("lang"))
    assert(!readSchema.contains("text"), s"must not read text: $readSchema")
  }

  test("decontamination broadcasts the eval shingle set (no shuffled join)") {
    val p = plan("q55_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"bench grams must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus stream must not shuffle for the gram join:\n$p")
  }

  test("bm25 tokenizes the corpus once (term stream reads the checkpoint)") {
    // the stats pass materializes the tokenized corpus via
    // localCheckpoint; the returned plan must read that RDD, never
    // re-scan parquet / re-tokenize
    val p = plan("q51_bm25")
    assert(p.contains("ExistingRDD"), s"bm25 must read the checkpointed tokens:\n$p")
    assert(!p.contains("Scan parquet"),
      s"bm25 must not re-scan the corpus after the stats pass:\n$p")
  }

  test("equi-depth histogram plans no global sort; bounds broadcast onto the scan") {
    val p = plan("q80_equidepth_hist")
    // the final orderBy(bucket) sorts ≤10 rows; the VALUE stream must
    // never be globally sorted (the ntile formulation would) — no Sort
    // may appear below the bucket aggregation's exchange
    val aggAt = p.indexOf("HashAggregate")
    assert(aggAt >= 0, s"expected a bucket aggregation:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"percentile bounds must broadcast:\n$p")
    assert(!p.contains("Window"), s"no window (hence no ntile global sort):\n$p")
  }

  test("ANN rank tails aggregate (bounded state), not window-sort") {
    for (q <- Seq("q21_ann_brute_force", "q49_ann_ivf")) {
      val p = plan(q)
      assert(p.contains("graft_topk"), s"$q must rank via TopKPairs:\n$p")
    }
    // brute force has no other window stage, so the absence of Window
    // proves candidates are never window-sorted (q49 keeps one tiny
    // window for its nprobe cell probe — queries × k rows, not data)
    val p21 = plan("q21_ann_brute_force")
    assert(!p21.contains("Window"), s"q21 must not window-sort candidates:\n$p21")
  }

  test("LM surprisal broadcasts the count tables; token stream never shuffles on term") {
    val p = plan("q88_lm_surprisal")
    assert(p.contains("BroadcastHashJoin"), s"counts must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus token stream must never shuffle on term:\n$p")
    val p90 = plan("q90_bigram_surprisal")
    assert(p90.contains("BroadcastHashJoin") && !p90.contains("SortMergeJoin"),
      s"bigram counts must broadcast too:\n$p90")
  }

  test("temperature sample: rates broadcast, corpus filtered without shuffling") {
    val p = plan("q89_temperature_sample")
    assert(p.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for its rate:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"sampling must not read text: $readSchema")
  }

  test("contamination report broadcasts the gram set and never re-explodes for totals") {
    val p = plan("q91_contamination_report")
    assert(p.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$p")
    // the totals side computes size(shingles(...)) narrowly — no
    // second Generate feeding an aggregation
    assert(p.linesIterator.count(_.trim.startsWith("Generate")) <= 1,
      s"per-doc totals must come from size(), not a second explode:\n$p")
  }

  test("phrase search broadcasts the slot table; no cartesian anywhere") {
    val p = plan("q102_phrase_search")
    assert(p.contains("BroadcastHashJoin"), s"slot table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"votes must join on term only:\n$p")
  }

  test("near-dup decontamination broadcasts the eval band keys and shingle sets") {
    val p = plan("q100_near_dup_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs anywhere:\n$p")
  }

  test("DSIR broadcasts both count tables; token stream never shuffles on term") {
    val p = plan("q105_dsir_weights")
    val joins = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(joins >= 2, s"corpus and target counts must both broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the token stream must not shuffle on term:\n$p")
  }

  test("epoch mixture is map-side: weight chain + explode, no join, no extra shuffle") {
    val p = plan("q98_epoch_mixture")
    assert(!p.contains("Join"), "weights ride as a when-chain, not a join")
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(tree.count(_.contains("Exchange")) == 1,
      s"only the presentation sort may shuffle:\n${tree.mkString("\n")}")
  }

  test("shard layout: the rank window is keyed by shard, never single-partition") {
    val p = plan("q108_shard_layout")
    val winLine = p.linesIterator.find(_.trim.startsWith("Arguments: [row_number()"))
      .orElse(p.linesIterator.find(_.contains("row_number()"))).getOrElse("")
    assert(winLine.contains("windowspecdefinition(shard_id"),
      s"shard_pos must rank within shards, not globally:\n$winLine")
  }

  test("length batching: window keyed by shard; padding agg keeps map-side partial") {
    val p = plan("q109_length_batches")
    val winLine = p.linesIterator.find(_.contains("row_number()")).getOrElse("")
    assert(winLine.contains("windowspecdefinition(shard"),
      s"batch ranks must be per-shard:\n$winLine")
    assert(p.contains("HashAggregate"), s"report must hash-aggregate:\n$p")
  }

  test("vocab report: top-k cut is TakeOrdered, total broadcasts onto the head") {
    val p = plan("q110_vocab_report")
    assert(p.contains("TakeOrderedAndProject"),
      s"the vocab head must never globally sort the term counts:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row total must broadcast:\n$p")
  }

  test("decontaminated split broadcasts the held-out gram set before the train shuffle") {
    val p = plan("q111_decontaminated_split")
    assert(p.contains("BroadcastHashJoin"), s"held-out grams must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs anywhere:\n$p")
  }

  test("cluster balance: rates broadcast back onto a scan-speed filter") {
    val p = plan("q112_cluster_balance")
    assert(p.contains("BroadcastHashJoin"), s"the k-row rate table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      s"only 1-row stat frames may nest-loop:\n$p")
  }

  test("IVF corpus assignment is narrow and uses the native dot expression") {
    import org.apache.spark.sql.functions.col
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cents = graft.operators.Similarity.trainCentroids(corpus, k = 4, iters = 1)
    val assigned = corpus
      .withColumn("_nrm", graft.functions.l2norm(col("emb")))
      .withColumn("cid",
        graft.operators.Similarity.assignCellWithNorm(col("emb"), col("_nrm"), cents))
    val p = assigned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"cell assign must be map-side:\n$p")
    assert(p.contains("dot_fold"), "assignment must use the native dot expression")
  }

  test("cluster-best pick: the rank window is keyed by cluster, never global") {
    val p = plan("q115_cluster_best")
    val winLine = p.linesIterator.find(_.contains("row_number()")).getOrElse("")
    assert(winLine.contains("windowspecdefinition(cluster_id"),
      s"kept-pick must rank within clusters only:\n$winLine")
  }

  test("CDC chunking is one narrow pass: zero exchanges before the chunk-hash shuffle") {
    import org.apache.spark.sql.functions.col
    val p = graft.operators.Dedup.cdcChunks(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"),
      s"cuts/spans/chunk hashes must never shuffle:\n$p")
  }

  test("token budget: no global sort; only the boundary bin pays a window") {
    val p = plan("q117_token_budget")
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty &&
      winLines.forall(_.contains("windowspecdefinition(bin")),
      s"every window must be keyed by the boundary bin:\n${winLines.mkString("\n")}")
  }

  test("score calibration: windows run over the counts table, never the corpus") {
    val p = plan("q122_score_calibration")
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("sum(_c")),
      s"both windows must sum per-(stratum,score) counts only:\n${winLines.mkString("\n")}")
  }

  test("rolling actives: window fan-out is a generator; observed-days semi-join broadcasts") {
    val p = plan("q139_rolling_active")
    assert(p.contains("Generate"), s"day fan-out must be an explode, not a join:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"observed-days filter must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
  }

  test("curriculum order: rank window keyed by (bin, shard); offsets broadcast back") {
    val p = plan("q140_curriculum")
    val rankWins = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("row_number")).toSeq
    assert(rankWins.nonEmpty && rankWins.forall(_.contains("_shard")),
      s"the corpus rank window must be sharded, never per-bin global:\n${rankWins.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"),
      s"the offset table must broadcast onto the ranked stream:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-wide shuffle join:\n$p")
  }

  test("quota split: rank window sharded; quota compare needs no second corpus pass") {
    val p = plan("q146_quota_split")
    val rankWins = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("row_number")).toSeq
    assert(rankWins.nonEmpty && rankWins.forall(_.contains("_shard")),
      s"the stratum rank must be sharded:\n${rankWins.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"offset/total table must broadcast:\n$p")
  }

  test("source centroids: corpus explodes once; pairwise join runs over centroid rows only") {
    val p = plan("q144_source_centroids")
    assert(p.linesIterator.count(_.trim.startsWith("Generate")) <= 2,
      s"embedding explode must happen once in the tree:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the |S|-row pairwise join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no shuffled cartesian for the centroid pairs:\n$p")
  }

  test("pagerank: supersteps are equi-joins — no cartesian, no nested-loop") {
    val p = plan("q142_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rank propagation must stay equi-join shaped:\n$p")
  }

  test("daily anomaly: raw stream aggregates before the window; no raw-stream window") {
    val p = plan("q151_daily_anomaly")
    // the trailing-stats window must run over the (type, day) counts,
    // partitioned by event_type — never over raw events. The formatted
    // tree prints root-first, so a window CONSUMING the aggregate
    // appears textually above it.
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window must consume the aggregated daily series:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("tfidf keywords: corpus count broadcasts; per-doc rank window partitioned by id") {
    val p = plan("q152_tfidf_keywords")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row corpus count must broadcast onto the tf stream:\n$p")
    val rankWins = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("row_number")).toSeq
    assert(rankWins.nonEmpty && rankWins.forall(_.contains("id")),
      s"top-k window must be per-document, never global:\n${rankWins.mkString("\n")}")
  }

  test("repeated n-grams: top-20 cut plans as TakeOrdered, no Expand from countDistinct") {
    val p = plan("q149_repeated_ngrams")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k must never global-sort:\n$p")
    assert(!p.contains("Expand"),
      s"(gram,id) pre-agg must replace countDistinct's Expand doubling:\n$p")
  }

  test("frequency spectrum / pmi: totals broadcast as 1-row aggregates") {
    for (q <- Seq("q157_freq_spectrum", "q154_pmi_collocations")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q: the corpus-total row must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: no shuffled cartesian:\n$p")
    }
  }

  test("mutual-best linkage plans the hot-gram skew valve (broadcast anti-join)") {
    // q145's mutualBestMatch materializes the candidate pairs
    // (localCheckpoint), so the valve must be pinned on the PAIR
    // GENERATION plan — the battery query's final plan starts at the
    // checkpointed RDD and shows only the argmax joins.
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val pairs = graft.operators.FuzzyJoin.editDistanceJoin(
      cust.filter(col("c_custkey") % 31 === 0 && col("c_custkey") < 7500),
      "c_custkey", "c_name",
      cust.filter(col("c_custkey") % 17 === 0 && col("c_custkey") < 7500),
      "c_custkey", "c_name", maxDist = 2, maxGramDf = Some(1000L))
    val p = pairs.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("LeftAnti"),
      s"maxGramDf cap must plan anti-joins against the hot-gram set:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"gram blocking must stay equi-join shaped:\n$p")
    // and the battery query itself stays cartesian-free end to end
    val q = plan("q145_mutual_best")
    assert(!q.contains("CartesianProduct"),
      s"mutual-best argmax joins must stay equi-join shaped:\n$q")
  }

  test("doc LM bits: vocab stats broadcast; one pair pass (scoring reads the checkpoint)") {
    val p = plan("q165_doc_lm_bits")
    assert(p.contains("ExistingRDD"),
      s"scoring must reuse the checkpointed per-doc pair weights:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"L/R vocab tables must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
  }

  test("pc1 outliers: projection is scan-speed; cut is TakeOrdered, not global sort") {
    val p = plan("q166_pc1_outliers")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k cut must plan as TakeOrderedAndProject:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the projection is a literal expression — no joins at all:\n$p")
  }

  test("IVF-PQ refine: shortlist broadcasts onto the corpus scan; rank tail aggregates") {
    val p = plan("q167_ivf_pq_refine")
    assert(p.contains("graft_topk"), s"refine must rank via TopKPairs:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the kShort shortlist must broadcast onto the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never shuffle for the refine join:\n$p")
  }

  test("TPC-H Q5 shape: date filter pushes to the orders scan; dims broadcast; one shuffle join") {
    val p = plan("q200_local_supplier_volume")
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"),
      s"the date band must reach the orders scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the join tree:\n$p")
  }

  test("no user broadcast hint on SF-scaling tables (customer/supplier)") {
    // customer and supplier grow linearly with SF (150k/10k rows per SF
    // unit) — a user broadcast() hint on either forces a driver-sized
    // build at cluster scale. Only region (5 rows) and nation (25 rows)
    // may carry hints; everything else is AQE's call.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (q <- Seq("q08_join_revenue", "q200_local_supplier_volume")) {
      val analyzed = SparkEntry.queries(q)(spark, dir).queryExecution.analyzed
      val hinted = analyzed.collect { case h: ResolvedHint => h }
      for (h <- hinted; bad <- Seq("customer", "supplier")) {
        assert(!h.child.toString.contains(bad),
          s"$q carries a user hint over the SF-scaling table '$bad':\n$h")
      }
      // AQE must still broadcast the small sides at test SF on its own.
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q small sides should still auto-broadcast at sf0.001")
    }
  }

  test("multimodal codec rows stay narrow: one presentation sort, no join, no extra shuffle") {
    // q207/q210/q211/q227 are synth → codec → fingerprint chains: the
    // decode work is a mapPartitions over the scan, so the ONLY
    // Exchange in the plan is the final orderBy's range partitioning —
    // a second shuffle would mean the per-payload work stopped being
    // map-side (q227 runs the REAL ImageIO codec per demuxed frame and
    // must stay exactly as narrow)
    for (q <- Seq("q207_audio_envelope", "q210_audio_resample",
        "q211_video_frames", "q227_frame_decode")) {
      val p = plan(q)
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 2, // formatted mode lists each node twice (tree + detail)
        s"$q must shuffle only for the presentation sort, saw $exchanges Exchange lines:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q has no join stage:\n$p")
    }
  }

  test("fingerprint pairing joins band-bucketed, never cartesian") {
    // q208/q209: the self-join must be an equi-join on (band, bval) —
    // a cartesian/nested-loop here is the all-pairs scale-killer the
    // banding exists to avoid
    for (q <- Seq("q208_audio_neardup", "q209_image_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must pair via the band-key equi-join:\n$p")
    }
  }

  test("LSH band sweep: every config reads ONE checkpointed signature pass") {
    val p = plan("q168_lsh_band_sweep")
    assert(p.contains("ExistingRDD"),
      s"configs must re-band the checkpointed signatures:\n$p")
    assert(!p.contains("Scan parquet"),
      s"no config may re-scan the corpus / recompute signatures:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"bucket stats are plain aggregates:\n$p")
  }

  test("bottom-k sample cut (q221/q222/q223/q225 core) is the salted two-level window") {
    // level 1 must partition by (source, pmod(h, 64)) — a plain
    // per-source window funnels a dominant source's whole stream
    // through one task (the skew wall the salting exists for). Pinned
    // on the operator directly: the battery rows checkpoint the sample
    // eagerly, so their final plans no longer show the cut.
    import org.apache.spark.sql.execution.ExplainMode
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        graft.functions.md5Long(col("doc_id").cast("string")).as("h"),
        col("n_chars").cast("long").as("v"))
    val p = graft.operators.Sketches.bottomKBySource(base, 64)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("pmod("),
      s"the level-1 salt (pmod(h, 64)) must key the first window:\n$p")
    assert(p.linesIterator.count(_.matches(".*\\+- Window \\(\\d+\\)")) >= 2,
      s"two window levels (salted cut, then per-source cut):\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the rank<=k filter must push into the window as a group limit:\n$p")
  }

  test("sketch gate + robust outliers: thresholds broadcast onto the scan, never a corpus shuffle-join") {
    for (q <- Seq("q223_sketch_gate", "q225_robust_outliers")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the <= |groups| threshold rows must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q: the corpus must never shuffle for the threshold join:\n$p")
    }
  }

  test("RP sweep: id-shift pairing is an equi-join, never cartesian; one projection per side") {
    val p = plan("q230_rp_error_sweep")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"adjacent-id pairing must plan as an equi-join:\n$p")
    // the constant-folded sign matrix must not survive as a
    // CreateArray forest (one literal, not 2048 expression nodes)
    assert(!p.contains("named_struct(rp"), p.take(500))
  }

  test("per-stratum weighted sample aggregates bounded state, no sort window") {
    val p = plan("q234_prio_sample_stratum")
    assert(p.contains("ObjectHashAggregate"),
      s"TopKPairs must plan as ObjectHashAggregate (map-side combine):\n$p")
    assert(!p.linesIterator.exists(_.matches(".*\\bWindow \\(\\d+\\).*")),
      s"no per-stratum rank window may appear:\n$p")
  }

  test("stitch pairs: seam join is hash-keyed, never cartesian") {
    val p = plan("q232_stitch_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"tail-key = head-key must plan as an equi-join:\n$p")
  }

  test("AMS estimate path: no join machinery at all beyond the 1-row cross") {
    val p = plan("q243_ams_estimate")
    // the sizing call is two partial-aggregate reductions + a 1-row
    // cross; any SortMergeJoin or per-key exchange means the audit
    // legs leaked into the production path
    assert(!p.contains("SortMergeJoin"),
      s"estimate-only path must carry no key-level join:\n$p")
    assert(!p.contains("HashAggregate keys=[_k"),
      s"estimate-only path must carry no per-key aggregate:\n$p")
  }

  test("stitch df-law row: capped pairing stays a hash equi-join") {
    val p = plan("q242_stitch_df_law")
    assert(!p.contains("CartesianProduct"),
      s"law-capped seam join must remain an equi-join:\n$p")
  }

  test("bloom prune: the fact side is scan + filter ONLY — no join, " +
    "no exchange (the runtime-filter contract)") {
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val pruned = graft.operators.Sketches.bloomPrune(
      spark.read.parquet(s"$dir/lineitem.parquet").select(col("l_orderkey")),
      col("l_orderkey"), dim, col("o_orderkey"))
    val p = pruned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"bloom-pruned fact plan must be a pure map-side filter:\n$p")
  }

  test("Q21 funnel: the aggregate rewrite scans lineitem ONCE — no " +
    "semi/anti self-joins; top-k is TakeOrdered") {
    val p = plan("q248_waiting_suppliers")
    assert(p.split("lineitem\\.parquet").length - 1 == 1,
      s"the rewrite's point is ONE lineitem scan, not three:\n$p")
    assert(!p.contains("LeftAnti") && !p.contains("LeftSemi"),
      s"exists/not-exists must be rewritten away:\n$p")
    assert(!p.contains("Expand"),
      s"two-level aggregate, never countDistinct's row-tripling Expand:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be TakeOrdered, never a global sort:\n$p")
  }

  test("kmv key-overlap estimate row: sketch legs only — no distinct-key " +
    "join anywhere") {
    val p = plan("q252_kmv_key_overlap_est")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the sizing call must carry no key-level join:\n$p")
  }

  test("maintainComponents: the label-table path is broadcast-joined — " +
    "history never shuffles") {
    import org.apache.spark.sql.functions.{col, lit}
    val prior = spark.range(1000000L).select(col("id"),
      (col("id") - col("id") % 10).as("cluster_id"))
    val delta = spark.range(50).select((col("id") * 20).as("id_a"),
      (col("id") * 20 + 10).as("id_b"))
    val out = graft.operators.Dedup.maintainComponents(prior, delta)
    val p = out.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"),
      s"the rep→rep' update must broadcast the small side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join may touch the million-row label table:\n$p")
    assert(!p.contains("Exchange hashpartitioning(_pid") &&
      !p.contains("Exchange hashpartitioning(id#"),
      s"the label table must not be hash-exchanged:\n$p")
  }

  test("bloom prune relation row: distinct-key probes + semi-join back, " +
    "never cartesian") {
    val p = plan("q247_bloom_prune_rel")
    assert(p.contains("LeftSemi"),
      s"relation-form survivors must return via a left-semi join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"probe/word matching must stay an equi-join:\n$p")
  }

  test("Q13 shape: the right-side predicate in the JOIN condition keeps " +
    "the join OUTER (a WHERE would convert it to inner and lose the " +
    "zero-order group); the cut still reaches the orders scan") {
    val p = plan("q265_cust_order_dist")
    assert(p.contains("LeftOuter"),
      s"the outer join IS the null-group semantics:\n$p")
    assert(p.contains("Not(StringStartsWith(o_orderpriority,4-))"),
      s"the join-condition predicate must still push to the scan:\n$p")
    assert(p.contains("partial_count"),
      s"the per-customer count must combine map-side:\n$p")
  }

  test("Q19 shape: each side's IMPLIED disjunction is extracted from " +
    "the OR-of-ANDs join predicate and pushed below the join") {
    val p = plan("q266_disjunctive_revenue")
    assert(p.contains("And(EqualTo(p_brand,Brand#12),LessThanOrEqual(p_size,5))"),
      s"the brand+size disjunction must reach the part scan's " +
        s"PushedFilters:\n$p")
    assert(p.contains("And(GreaterThanOrEqual(l_quantity,1.0),LessThanOrEqual(l_quantity,11.0))"),
      s"the quantity disjunction must reach the lineitem scan's " +
        s"PushedFilters:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the partkey equality must stay the join key with the OR as " +
        s"residual:\n$p")
  }

  test("takedown repair: the label table is probed map-side (broadcast " +
    "anti against the takedown-bounded affected reps) — never shuffled") {
    // sf0.01: the sf0.001 corpus can yield an empty pair graph, which
    // AQE prunes to EmptyRelation (the q260 pin precedent)
    val df = SparkEntry.queries("q262_repair_after_delete")(spark,
      "/root/testdata/sf0.01")
    df.collect() // AQE: pin the FINAL adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // the repair's iterative work is checkpointed inside the operator;
    // the output plan shows the untouched-labels branch — the one scan
    // of the label table, anti-joined map-side against the broadcast
    // affected-rep set
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"untouched labels must be a broadcast anti probe:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the label table must never shuffle in a takedown:\n$p")
  }

  test("semantic-PQ gate row: never cartesian (bucket + LUT equi-joins only)") {
    val p = plan("q246_inc_semantic_pq")
    assert(!p.contains("CartesianProduct"),
      s"the ADC verify must ride bucket/LUT equi-joins:\n$p")
  }

  test("Q3 funnel: date filters push to both scans; top-k is TakeOrdered") {
    val p = plan("q244_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must never be a global sort:\n$p")
    assert(p.contains("LessThan(o_orderdate") &&
      p.contains("GreaterThan(l_shipdate"),
      s"both date cuts must reach PushedFilters:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter must reach the customer scan:\n$p")
  }

  test("Q20 shape: decorrelated to ONE lineitem scan — no correlated " +
    "re-execution, no second distinct pass; dims broadcast") {
    val p = plan("q254_excess_stock")
    assert(p.split("lineitem\\.parquet").length - 1 == 1,
      s"the decorrelation's point is ONE fact scan (pair set + window " +
        s"sum in the same pass), not per-pair re-execution:\n$p")
    assert(p.contains("StartsWith(p_name,small)"),
      s"the part-name cut must reach PushedFilters:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"part semi-join and the supplier/nation dims must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no shuffle join belongs in this funnel at battery scale:\n$p")
  }

  test("Q17 shape: one lineitem scan feeds both the filter and its " +
    "threshold window; brand filter pushes to the part scan") {
    val p = plan("q257_small_qty_revenue")
    assert(p.split("lineitem\\.parquet").length - 1 == 1,
      s"the decorrelation's point is ONE fact scan (window threshold " +
        s"in the same pass), not a correlated re-execution:\n$p")
    assert(p.contains("EqualTo(p_brand,Brand#23)"),
      s"brand cut must reach the part scan's PushedFilters:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the brand-filtered part side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join belongs in this funnel at battery scale:\n$p")
  }

  test("Q22 shape: scalar threshold is a one-row broadcast; dormancy " +
    "is a single anti-join against the date-pruned orders slice") {
    val p = plan("q256_dormant_customers")
    assert(p.contains("LeftAnti"),
      s"NOT EXISTS must be ONE anti-join, not a correlated probe:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the scalar subquery must ride a broadcast, never cartesian:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the cutoff must reach the orders scan's PushedFilters:\n$p")
    assert(p.split("customer\\.parquet").length - 1 == 2,
      s"customer is scanned once for the scalar and once for the " +
        s"funnel - two scans, never more:\n$p")
  }

  test("Q15 shape: the revenue aggregate runs ONCE - the scalar-max " +
    "branch reads a ReusedExchange at runtime") {
    // AQE stage reuse only materializes in the FINAL adaptive plan, so
    // this pin executes the query (collect - count() would plan a
    // different query) and reads the executed plan; the explicit
    // key-not-null in the query is what makes both aggregate branches
    // canonicalize identically (without it the join side's inferred
    // IsNotNull(l_suppkey) splits the scans and lineitem reads twice)
    val df = SparkEntry.queries("q258_top_supplier")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("ReusedExchange"),
      s"the max branch must reuse the revenue exchange, not rescan:\n$p")
    assert(plan("q258_top_supplier").contains("GreaterThanOrEqual(l_shipdate"),
      "quarter cut must reach the lineitem scan")
  }

  test("Q2 shape: map-side partial dedup shrinks the fact shuffle; the " +
    "min window re-exchanges only the deduped pairs; dims broadcast") {
    val p = plan("q259_min_cost_supplier")
    assert(p.split("hashpartitioning\\(l_partkey#\\d+L, l_suppkey#")
      .length - 1 == 1,
      s"the pair dedup must exchange on (partkey, suppkey) — the shape " +
        s"whose partial aggregate dedups map-side BEFORE the shuffle " +
        s"(the q2shape probe's scale argument):\n$p")
    assert(p.split("hashpartitioning\\(").length - 1 == 2,
      s"exactly the dedup exchange plus the window's deduped-pair " +
        s"exchange — never a third:\n$p")
    assert(p.contains("EqualTo(p_size,15)"),
      s"size cut must reach the part scan's PushedFilters:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"supplier/nation/part sides must broadcast:\n$p")
  }

  test("Q11 shape: groups and the global total share one aggregate " +
    "subtree - ReusedExchange at runtime") {
    // sf0.01, not the spec's default sf0.001: the chosen nation has no
    // suppliers there, so AQE prunes the whole query to EmptyRelation
    // before any stage (and its exchange) ever runs
    val df = SparkEntry.queries("q260_important_stock")(spark,
      "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("ReusedExchange"),
      s"the global total must reuse the groups' exchange, not rescan:\n$p")
    assert(p.contains("EqualTo(n_name,NATION_7)"),
      s"nation cut must reach the nation scan's PushedFilters:\n$p")
  }

  test("Q18 funnel: top-k is TakeOrdered; scans prune to used columns") {
    val p = plan("q238_big_orders")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must never be a global sort:\n$p")
    val liSchema = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("l_orderkey")).getOrElse("")
    assert(!liSchema.contains("l_comment") && !liSchema.contains("l_shipdate"),
      s"lineitem scan must read only orderkey+quantity: $liSchema")
  }

  test("Q4 shape: EXISTS is ONE semi-join; the quarter cut reaches " +
    "the orders scan") {
    val p = plan("q267_priority_late_count")
    assert(p.contains("LeftSemi"),
      s"the correlated EXISTS must plan as a single semi-join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,1996-07-01") &&
      p.contains("LessThan(o_orderdate,1996-10-01"),
      s"the quarter window must reach the orders scan's PushedFilters:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian belongs in an EXISTS rewrite:\n$p")
  }

  test("Q6 shape: scan-only — all three predicate families in " +
    "PushedFilters, zero joins, pruned ReadSchema") {
    val p = plan("q275_forecast_revenue")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThanOrEqual(l_discount,0.07)") &&
      p.contains("LessThan(l_quantity,24.0)") &&
      p.contains("GreaterThanOrEqual(l_shipdate,1996-01-01"),
      s"date window, discount band and quantity cap must ALL reach " +
        s"the scan:\n$p")
    assert(!p.contains("Join"),
      s"Q6 is the zero-join shape — a join means the plan went wrong:\n$p")
    val liSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse("")
    assert(!liSchema.contains("l_orderkey") && !liSchema.contains("l_tax"),
      s"the scan must read only the 4 referenced columns: $liSchema")
  }

  test("Q7 shape: the two-nation IN cut reaches the nation scans and " +
    "the symmetric-OR pair filter never degrades to a cartesian") {
    val p = plan("q268_volume_shipping")
    assert(p.contains("In(n_name, [NATION_7,NATION_8])"),
      s"the implied two-nation disjunction must reach the nation " +
        s"scan's PushedFilters (the q266 CNF discipline on dims):\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1995-01-01"),
      s"the two-year window must reach the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the OR pair predicate is a residual on equi-joins, never a " +
        s"join condition of its own:\n$p")
  }

  test("Q8 shape: part-type, region and order-window cuts all reach " +
    "their scans; the share CASE never forces a second fact scan") {
    val p = plan("q269_market_share")
    assert(p.contains("StringStartsWith(p_type,ECONOMY)"),
      s"the type prefix must reach the part scan:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      s"the region cut must reach the region scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,1995-01-01"),
      s"the window must reach the orders scan:\n$p")
    assert(p.split("lineitem\\.parquet").length - 1 == 1,
      s"numerator and denominator share ONE fact scan (the CASE " +
        s"split, not a self-join):\n$p")
  }

  test("Q9 shape: one fact scan; the part-name cut is a pushed " +
    "StringContains; profit math stays in the projection") {
    val p = plan("q270_product_profit")
    assert(p.contains("StringContains(p_name,small)"),
      s"the name cut must reach the part scan's PushedFilters:\n$p")
    assert(p.split("lineitem\\.parquet").length - 1 == 1,
      s"profit derives from ONE fact scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"all five relations ride equi-joins:\n$p")
  }

  test("Q10 shape: revenue aggregates by custkey BEFORE the customer " +
    "attributes join; top-20 is TakeOrdered") {
    val p = plan("q271_returned_items")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must never be a global sort:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"the returnflag cut must reach the lineitem scan:\n$p")
    assert(p.contains("hashpartitioning(o_custkey"),
      s"the one wide exchange is the per-custkey revenue aggregate — " +
        s"the attribute columns must never enter it:\n$p")
    val liSchema = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("l_returnflag")).getOrElse("")
    assert(!liSchema.contains("c_name"),
      s"customer attributes must not ride the fact scan: $liSchema")
  }

  test("Q12 shape: derived-mode predicates cut the fact before its " +
    "single orders join; the CASE split combines map-side") {
    val p = plan("q272_shipmode_priority")
    assert(p.split("Join type: Inner").length - 1 == 1,
      s"exactly one join (fact to orders):\n$p")
    assert(p.contains("partial_sum(CASE WHEN o_orderpriority"),
      s"the two-class split must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the priority lookup rides an equi-join:\n$p")
  }

  test("Q14 shape: the month window reaches the fact scan; part dim " +
    "broadcasts; single-row conditional share is one aggregate") {
    val p = plan("q273_promo_revenue")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1996-09-01") &&
      p.contains("LessThan(l_shipdate,1996-10-01"),
      s"the month window must reach the lineitem scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the part dim must broadcast:\n$p")
    assert(p.split("lineitem\\.parquet").length - 1 == 1,
      s"promo and total share ONE fact scan:\n$p")
  }

  test("salted skew join: the fact scatters on a deterministic " +
    "xxhash64 salt and the join key carries (user_id, _salt)") {
    val p = plan("q277_salted_skew_join")
    assert(p.contains("xxhash64"),
      s"the salt must derive from a stable row hash (no rand() — " +
        s"retries and speculative tasks must agree):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 8-way dim replication rides the equi-join, never a " +
        s"cartesian:\n$p")
  }

  test("Q16 shape: NOT IN is a broadcast anti-join; the three part " +
    "cuts reach the scan; no pair-dedup exchange precedes the " +
    "count-distinct") {
    val p = plan("q274_supplier_part_cnt")
    assert(p.contains("LeftAnti"),
      s"the provably-non-null NOT IN must plan as an anti-join:\n$p")
    assert(p.contains("In(p_size, [14,19,23,3,36,45,49,9])") &&
      p.contains("Not(EqualTo(p_brand,Brand#13))") &&
      p.contains("Not(StringStartsWith(p_type,MEDIUM))"),
      s"all three part cuts must reach PushedFilters:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pairs ride broadcast equi-joins:\n$p")
  }
}
