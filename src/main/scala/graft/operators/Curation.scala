package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a real LLM data
  * pipeline runs over raw documents, as one operator —
  *
  *   1. exact dedup (content-hash groupBy, min-id keeper),
  *   2. near-dup pruning (MinHash-LSH candidate pairs → connected
  *      components → keep only each cluster's min id),
  *   3. quality gate (composite score in 1e-6 fixed point),
  *   4. language gate (stopword-argmax language id).
  *
  * Every stage is an existing oracle-verified operator ([[Dedup]],
  * [[TextAnalysis]]); this just wires them, so the whole pipeline stays
  * shuffle-disciplined: one shuffle for the exact-dedup hash groupBy,
  * the banded-LSH equi-join for candidates, O(log d) rounds for
  * clustering, and pure codegen'd expressions for the gates.
  */
object Curation {

  /** Returns the curated corpus: survivors of both dedup stages that
    * pass the quality and language gates, with the gate signals
    * attached (`quality_1e6`, `predicted_lang`).
    */
  def curate(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minQuality1e6: Long = 600000L, lang: String = "en",
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val keepExact = Dedup.exact(docs, col(idCol), col(textCol)).select(col("keep_id"))
    // the deduped corpus feeds BOTH the LSH pair pipeline and the final
    // survivor join — materialize it once instead of re-running the
    // scan + hash-groupBy + semi-join per consumer (at cluster scale
    // this is the natural checkpoint/persist boundary of a curation
    // run; a 2-use lineage over 100 TB is exactly what you checkpoint)
    val kept = docs.join(keepExact, docs(idCol) === keepExact("keep_id"), "left_semi")
      .localCheckpoint(true)
    val pairs = Dedup.minhashLshPairs(kept, idCol, textCol, bands, rowsPerBand, n)
    val dropNearDups = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id")).select(col("id"))
    // both gates from ONE tokenization (curationGates), computed in a
    // plain Project and materialized (localCheckpoint) before the
    // filter. The barrier matters: filtering directly on the projected
    // struct lets Catalyst inline the gate expression into the Filter
    // condition (re-evaluated per reference), and the previous
    // explode(array(…)) Generate barrier evaluated the generator ~27×
    // slower than a Project at 50k docs (measured: project 0.4 s,
    // explode-staged 11.7 s, unmaterialized project+filter 10.9 s,
    // project+checkpoint+filter ~2 s).
    val gated = kept.join(dropNearDups, kept(idCol) === dropNearDups("id"), "left_anti")
      .select(col("*"), TextAnalysis.curationGates(col(textCol)).as("_g"))
      .localCheckpoint(true)
    gated
      .filter(col("_g.quality_1e6") >= minQuality1e6 &&
        col("_g.predicted_lang") === lang)
      .withColumn("quality_1e6", col("_g.quality_1e6"))
      .withColumn("predicted_lang", col("_g.predicted_lang"))
      .drop("_g")
  }

  /** [[curate]] plus the round-6 gates a production corpus pipeline
    * adds on top: an intra-document repetition cap
    * ([[TextAnalysis.repetitionRatio]] in 1e6 fixed point) and
    * benchmark decontamination ([[Decontaminate.sharedNgrams]] against
    * `bench` — survivors sharing ≥ `minShared` word `decontamN`-grams
    * with any eval doc are dropped). Gate order: curate survivors →
    * repetition filter (narrow) → decontamination anti-join. Both new
    * stages keep the composite's shuffle discipline: repetition is a
    * pure scan-level filter; decontamination broadcasts the eval
    * shingle set.
    */
  def curateV2(docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minQuality1e6: Long = 600000L, lang: String = "en",
      maxRep1e6: Long = 500000L, repetitionN: Int = 3,
      decontamN: Int = 3, minShared: Long = 1L,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val base = curate(docs, idCol, textCol, minQuality1e6, lang,
      bands, rowsPerBand, n)
    val flagged = Decontaminate
      .sharedNgrams(base, idCol, textCol, bench, textCol, decontamN, minShared)
      .select(col("doc_id").as("_contaminated_id"))
    base
      .filter(floor(TextAnalysis.repetitionRatio(col(textCol), repetitionN) *
        lit(1000000.0)).cast("long") < maxRep1e6)
      .join(flagged, col(idCol) === col("_contaminated_id"), "left_anti")
  }

  /** [[curateV2]] with the round-7 upgrades a production pipeline ends
    * with:
    *
    *   - near-dup clusters keep their BEST-quality member
    *     ([[Dedup.keepBestOfCluster]]) instead of the min id — the
    *     cleanest copy survives, not the first-crawled one;
    *   - after all gates, the corpus takes the final token-budget cut
    *     ([[Sampling.tokenBudgetSelect]]): the best `budgetNum/
    *     budgetDen` of the surviving tokens by quality.
    *
    * Plan discipline: quality is computed ONCE per exact-dedup
    * survivor (the same gates struct serves best-of selection, the
    * quality gate, and the budget ranking); the budget cut adds one
    * bounded bin aggregate + a boundary-bin window, never a global
    * sort.
    *
    * Output: (idCol, quality_1e6, predicted_lang, ntok) for the docs
    * that make the cut.
    */
  def curateV3(docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minQuality1e6: Long = 600000L, lang: String = "en",
      maxRep1e6: Long = 500000L, repetitionN: Int = 3,
      decontamN: Int = 3, minShared: Long = 1L,
      budgetNum: Long = 2L, budgetDen: Long = 5L,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val keepExact = Dedup.exact(docs, col(idCol), col(textCol)).select(col("keep_id"))
    val kept = docs.join(keepExact, docs(idCol) === keepExact("keep_id"), "left_semi")
      .localCheckpoint(true)
    val clusters = Dedup.connectedComponents(
      Dedup.minhashLshPairs(kept, idCol, textCol, bands, rowsPerBand, n))
    // one gates struct per exact-dedup survivor, materialized once:
    // best-of selection needs quality BEFORE near-dup pruning
    val gated = kept
      .select(col(idCol), col(textCol),
        TextAnalysis.curationGates(col(textCol)).as("_g"))
      .localCheckpoint(true)
    val best = Dedup.keepBestOfCluster(
        gated.select(col(idCol).as("id"), col("_g.quality_1e6").as("score")),
        clusters)
      .filter(col("kept") === 1L).select(col("id"))
    // materialize the gate survivors ONCE: the frame feeds BOTH the
    // decontamination shingle pass and the clean projection below, and
    // its lineage re-pays the best-of window + the repetitionRatio
    // re-tokenization per consumer (measured r16: the un-materialized
    // form evaluated this chain 3x — ~1.3 s of q118's 4.5 s wall)
    val survivors = gated
      .join(best, gated(idCol) === best("id"), "left_semi")
      .filter(col("_g.quality_1e6") >= minQuality1e6 &&
        col("_g.predicted_lang") === lang &&
        floor(TextAnalysis.repetitionRatio(col(textCol), repetitionN) *
          lit(1000000.0)).cast("long") < maxRep1e6)
      .localCheckpoint(true)
    val flagged = Decontaminate
      .sharedNgrams(survivors, idCol, textCol, bench, textCol, decontamN, minShared)
      .select(col("doc_id").as("_contaminated_id"))
    // same discipline for the budget input: tokenBudgetSelect's bin
    // pass and the final semi-join are two consumers of the
    // decontamination anti-join + tokenCount chain
    val clean = survivors
      .join(flagged, col(idCol) === col("_contaminated_id"), "left_anti")
      .select(col(idCol),
        col("_g.quality_1e6").as("quality_1e6"),
        col("_g.predicted_lang").as("predicted_lang"),
        graft.functions.tokenCount(col(textCol)).as("ntok"))
      .localCheckpoint(true)
    val cut = Sampling.tokenBudgetSelect(clean, col(idCol),
        col("quality_1e6"), col("ntok"), budgetNum, budgetDen)
      .filter(col("selected") === 1L).select(col("id"))
    clean.join(cut, clean(idCol) === cut("id"), "left_semi")
  }

  /** Gate-attrition funnel: attribute EVERY document to the FIRST
    * curation gate that kills it — the per-gate loss report a corpus
    * team publishes with each pipeline run (without first-fail
    * attribution the per-gate counts double-count docs several gates
    * would reject). Gate order mirrors [[curateV2]]'s composition:
    *
    *   1_exact_dup → 2_near_dup → 3_quality → 4_language →
    *   5_repetition → 6_contaminated → 7_pass
    *
    * All gate signals are computed for all docs in parallel branches
    * (dedup keepers, LSH clusters over keepers, one fused gates
    * struct, repetition, decontamination) and folded into one
    * CASE — so the funnel costs the same as running the pipeline
    * once, not once per gate. Output: (gate, n_docs, share_1e6),
    * share in 1e-6 of the corpus (floor division, exact integers).
    *
    * Scale shape: the same shuffles curateV2 itself pays (content-hash
    * groupBy, banded LSH equi-join, O(log d) CC rounds, one broadcast
    * decontamination join), plus id-keyed left joins to fold flags and
    * a 7-group final aggregate; the 1-row total broadcasts.
    */
  def attritionFunnel(docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minQuality1e6: Long = 600000L, lang: String = "en",
      maxRep1e6: Long = 500000L, repetitionN: Int = 3,
      decontamN: Int = 3, minShared: Long = 1L,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val verdicts = funnelVerdicts(docs, bench, idCol, textCol, minQuality1e6,
      lang, maxRep1e6, repetitionN, decontamN, minShared, bands, rowsPerBand, n)
    val total = docs.agg(count(lit(1)).as("_total"))
    verdicts.groupBy(col("gate"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .withColumn("share_1e6", expr("n_docs * 1000000 DIV _total"))
      .select(col("gate"), col("n_docs"), col("share_1e6"))
  }

  /** Per-doc first-fail gate verdicts — the shared spine of
    * [[attritionFunnel]] and [[attritionFunnelBySource]]: every gate
    * signal computed in a parallel branch, folded by one CASE.
    * Returns (_id, gate).
    */
  private def funnelVerdicts(docs: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      minQuality1e6: Long, lang: String,
      maxRep1e6: Long, repetitionN: Int,
      decontamN: Int, minShared: Long,
      bands: Int, rowsPerBand: Int, n: Int): DataFrame = {
    val keepers = Dedup.exact(docs, col(idCol), col(textCol))
      .select(col("keep_id").as("_keep_id"), lit(true).as("_is_keep"))
    val kept = docs.join(
        keepers.select(col("_keep_id")), docs(idCol) === col("_keep_id"), "left_semi")
      .localCheckpoint(true)
    val nearDropped = Dedup.connectedComponents(
        Dedup.minhashLshPairs(kept, idCol, textCol, bands, rowsPerBand, n))
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("_nd_id"), lit(true).as("_near_dup"))
    val contaminated = Decontaminate
      .sharedNgrams(docs, idCol, textCol, bench, textCol, decontamN, minShared)
      .select(col("doc_id").as("_ct_id"), lit(true).as("_contam"))
    val sig = docs.select(col(idCol).as("_id"),
      TextAnalysis.curationGates(col(textCol)).as("_g"),
      floor(TextAnalysis.repetitionRatio(col(textCol), repetitionN) *
        lit(1000000.0)).cast("long").as("_rep_1e6"))
    sig
      .join(keepers, col("_id") === col("_keep_id"), "left")
      .join(nearDropped, col("_id") === col("_nd_id"), "left")
      .join(contaminated, col("_id") === col("_ct_id"), "left")
      .select(col("_id"),
        when(col("_is_keep").isNull, "1_exact_dup")
        .when(coalesce(col("_near_dup"), lit(false)), "2_near_dup")
        .when(col("_g.quality_1e6") < minQuality1e6, "3_quality")
        .when(col("_g.predicted_lang") =!= lang, "4_language")
        .when(col("_rep_1e6") >= maxRep1e6, "5_repetition")
        .when(coalesce(col("_contam"), lit(false)), "6_contaminated")
        .otherwise("7_pass").as("gate"))
  }

  /** The per-document verdict table itself — [[attritionFunnel]]'s
    * spine exposed row-by-row: (doc_id, gate) for EVERY document, the
    * provenance record a curation run ships so any individual drop is
    * explainable after the fact ("why is doc X missing?" answers with
    * a lookup, not a pipeline re-run).
    */
  def gateVerdicts(docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minQuality1e6: Long = 600000L, lang: String = "en",
      maxRep1e6: Long = 500000L, repetitionN: Int = 3,
      decontamN: Int = 3, minShared: Long = 1L,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame =
    funnelVerdicts(docs, bench, idCol, textCol, minQuality1e6, lang,
      maxRep1e6, repetitionN, decontamN, minShared, bands, rowsPerBand, n)
      .select(col("_id").as("doc_id"), col("gate"))

  /** The END-TO-END run report — one row that describes a whole
    * curation → split → packing run (what lands in the release notes
    * next to [[graft.operators.Diagnostics.datasetCard]]): raw doc
    * count, survivors after each dedup tier, the fully-curated count
    * and its token mass, deterministic train/val/test split sizes
    * over the survivors, and the exact packed-sequence count at
    * `budgetTokens` (the [[graft.operators.Chunker.packingBudgetSweep]]
    * ceil-math — no placement run). Everything derives from ONE
    * funnel-verdict pass plus one survivor projection: the report
    * costs one pipeline run, not one per number.
    *
    * Output: 1 row (n_raw, n_after_exact, n_after_near, n_curated,
    * tokens_curated, n_train, n_val, n_test, n_seqs).
    */
  def pipelineReport(docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      splits: Seq[(String, Long)] = Sampling.DemoSplits,
      budgetTokens: Long = 512L, shards: Int = 4): DataFrame = {
    require(splits.size == 3, s"expected train/val/test splits: $splits")
    val verdicts = funnelVerdicts(docs, bench, idCol, textCol, 600000L, "en",
        500000L, 3, 3, 1L, 4, 4, 3)
      .localCheckpoint(true)
    val counts = verdicts.agg(count(lit(1)).as("n_raw"),
      sum(when(col("gate") =!= "1_exact_dup", 1L).otherwise(0L))
        .as("n_after_exact"),
      sum(when(col("gate") =!= "1_exact_dup" && col("gate") =!= "2_near_dup", 1L)
        .otherwise(0L)).as("n_after_near"),
      sum(when(col("gate") === "7_pass", 1L).otherwise(0L)).as("n_curated"))
    val pass = docs.join(
        verdicts.filter(col("gate") === "7_pass").select(col("_id")),
        docs(idCol) === col("_id"), "left_semi")
      .select(col(idCol).as("_pid"),
        graft.functions.tokenCount(col(textCol)).as("_ntok"),
        Sampling.splitLabel(col(idCol), splits).as("_split"),
        pmod(graft.functions.md5Long(col(idCol).cast("string")),
          lit(shards.toLong)).as("_shard"))
      .localCheckpoint(true)
    val splitNames = splits.map(_._1)
    val passAgg = pass.agg(sum(col("_ntok")).as("tokens_curated"),
      sum(when(col("_split") === splitNames(0), 1L).otherwise(0L)).as("n_train"),
      sum(when(col("_split") === splitNames(1), 1L).otherwise(0L)).as("n_val"),
      sum(when(col("_split") === splitNames(2), 1L).otherwise(0L)).as("n_test"))
    val seqs = pass.groupBy(col("_shard"))
      .agg(sum(col("_ntok")).as("_tot"))
      .agg(sum(expr(s"(_tot + $budgetTokens - 1) DIV $budgetTokens"))
        .cast("long").as("n_seqs"))
    counts.crossJoin(broadcast(passAgg)).crossJoin(broadcast(seqs))
  }

  /** [[attritionFunnel]] attributed per SOURCE: the same first-fail
    * verdict spine, grouped by (source, gate) with shares within each
    * source's own total — the table that turns "the corpus loses 40%
    * to near-dups" into "feed X loses 80%, feed Y loses 2%", which is
    * the actionable form (fix or drop the feed, not the pipeline).
    * Costs one id→source join and a |sources|·7-bounded aggregate on
    * top of the funnel spine; per-source totals are a second bounded
    * aggregate broadcast back.
    *
    * Output: (source, gate, n_docs, share_1e6) ordered by source, gate.
    */
  def attritionFunnelBySource(docs: DataFrame, bench: DataFrame,
      sourceCol: String,
      idCol: String = "doc_id", textCol: String = "text",
      minQuality1e6: Long = 600000L, lang: String = "en",
      maxRep1e6: Long = 500000L, repetitionN: Int = 3,
      decontamN: Int = 3, minShared: Long = 1L,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val verdicts = funnelVerdicts(docs, bench, idCol, textCol, minQuality1e6,
      lang, maxRep1e6, repetitionN, decontamN, minShared, bands, rowsPerBand, n)
    val withSource = verdicts.join(
      docs.select(col(idCol).as("_id"), col(sourceCol).as("source")), Seq("_id"))
    val counts = withSource.groupBy(col("source"), col("gate"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = counts.groupBy(col("source")).agg(sum(col("n_docs")).as("_total"))
    counts.join(broadcast(totals), Seq("source"))
      .withColumn("share_1e6", expr("n_docs * 1000000 DIV _total"))
      .select(col("source"), col("gate"), col("n_docs"), col("share_1e6"))
      .orderBy(col("source"), col("gate"))
  }
}
