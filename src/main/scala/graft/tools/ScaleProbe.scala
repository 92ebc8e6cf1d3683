package graft.tools

import org.apache.spark.sql.functions._

/** One-off scale probe: times individual operators at a given SF dir
  * with alternative scale parameters, so BASELINE.md slope claims are
  * measured, not asserted. Usage:
  *   sbt "runMain graft.tools.ScaleProbe <sfDir> <probe> [probe...]"
  */
object ScaleProbe {
  private val Known = Set("simhash8", "simhash15", "simhashAuto",
    "neardup8", "neardup12", "brute", "curation",
    "semantic8", "semanticAuto", "semantic2", "semantic3", "jaccard400",
    "videodup", "ams", "stitchgate", "stitchgatecap", "bloom", "bloomprof",
    "bloomrel", "q21", "q20", "q2shape", "q17shape", "ccmaint",
    "ccmaintsyn", "ccconv", "keyoverlap", "seamwidth", "takedown",
    "shapegen", "q4form", "saltprobe", "saltprobe2", "bucketprobe",
    "takedownlake", "takedownlake2", "samplelake")

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val probes = args.tail.toSet
    val unknown = probes.diff(Known)
    require(unknown.isEmpty,
      s"unknown probes: ${unknown.mkString(", ")} (valid: ${Known.toSeq.sorted.mkString(", ")})")
    require(probes.nonEmpty, s"no probes given (valid: ${Known.toSeq.sorted.mkString(", ")})")
    val spark = graft.Bench.buildSession()
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"PROBE $name rows=$rows%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // janino/JIT warmup so the first timed probe isn't charged for
    // codegen compilation (same reason Bench warms on sf0.001)
    graft.operators.Dedup.simhashPairs(docs.limit(500), "doc_id", "text",
      bits = 60, bands = 4, maxHamming = 3).count()
    graft.operators.Similarity.bruteForceTopK(embs.limit(500),
      embs.limit(500).filter(col("id") % 200 === 0), k = 3).count()
    if (probes("simhash8")) timed("simhash_32bit_8bitbands")(
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 3).count())
    if (probes("simhash15")) timed("simhash_60bit_15bitbands")(
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text",
        bits = 60, bands = 4, maxHamming = 3).count())
    if (probes("simhashAuto")) {
      val n = docs.count()
      val (bits, bands) = graft.operators.Dedup.suggestSimhashParams(n)
      timed(s"simhash_auto_${bits}bit_${bands}bands")(
        graft.operators.Dedup.simhashPairs(docs, "doc_id", "text",
          bits = bits, bands = bands, maxHamming = 3).count())
    }
    if (probes("neardup8")) timed("neardup_8signbits")(
      graft.operators.Dedup.embeddingNearDups(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", threshold = 0.95, signBits = 8).count())
    if (probes("neardup12")) timed("neardup_12signbits")(
      graft.operators.Dedup.embeddingNearDups(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", threshold = 0.95, signBits = 12).count())
    // semantic dedup: fixed 8 cells (the q86 oracle baseline) vs
    // suggestSemanticCells(n) — training included in both timings,
    // since adaptive k moves cost between train and pair phases
    if (probes("semantic8")) timed("semantic_8cells") {
      val cents = graft.operators.Similarity.trainCentroids(embs, k = 8, iters = 2)
      graft.operators.Dedup.semanticDedup(embs, cents, 950000L).count()
    }
    if (probes("semanticAuto")) {
      val n = embs.count()
      val k = graft.operators.Dedup.suggestSemanticCells(n)
      timed(s"semantic_auto_${k}cells") {
        val cents = graft.operators.Similarity.trainCentroids(embs, k = k, iters = 2)
        graft.operators.Dedup.semanticDedup(embs, cents, 950000L).count()
      }
    }
    // two-level semantic dedup (q164): stage-by-stage decomposition —
    // level-1 train, level-1 assign, level-2 distributed train,
    // level-2 assign, subcell pair join + CC
    if (probes("semantic2")) {
      import graft.operators.{Dedup, Similarity}
      val n = embs.count()
      val k = Dedup.suggestSemantic2Params(n)
      println(s"PROBE semantic2 n=$n k1=k2=$k")
      var cents1: Seq[(Int, Seq[Double])] = null
      timed("s2_train_level1") {
        cents1 = Similarity.trainCentroids(embs, k = k, iters = 2); k.toLong
      }
      var cells1: org.apache.spark.sql.DataFrame = null
      timed("s2_assign_level1") {
        cells1 = Similarity.assignCells(embs, cents1)
          .select(col("id"), col("emb"), col("cid")).localCheckpoint(true)
        cells1.count()
      }
      var sub: org.apache.spark.sql.DataFrame = null
      timed("s2_train_level2") {
        sub = Similarity.trainSubCentroids(cells1, k, iters = 2); sub.count()
      }
      var cells: org.apache.spark.sql.DataFrame = null
      timed("s2_assign_level2") {
        cells = Similarity.assignSubCells(cells1, sub)
          .select(col("id"), col("emb"), col("cid"), col("cid2"))
          .localCheckpoint(true)
        cells.count()
      }
      timed("s2_subcell_pair_count") {
        // candidate-pair volume: the quantity the architecture bounds
        cells.groupBy(col("cid"), col("cid2")).count()
          .agg(sum(col("count") * (col("count") - 1) / 2)).collect()
          .head.getAs[Any](0).toString.toDouble.toLong
      }
      timed("s2_pairs_and_cc") {
        val l = cells.as("l"); val r = cells.as("r")
        val pairs = l.join(r, col("l.cid") === col("r.cid")
            && col("l.cid2") === col("r.cid2") && col("l.id") < col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
            Similarity.scoreFixed(col("l.emb"), col("r.emb")).as("s"))
          .filter(col("s") >= 950000L).select(col("id_a"), col("id_b"))
        Dedup.connectedComponents(pairs).count()
      }
    }
    // three-level quantizer probe (the q164-wall question): bounded
    // fanout k = ⌈(n/32)^⅓⌉ per level, so the level-1 assignment —
    // q164's residual n·k1 superlinear term with k1 = √(n/32) —
    // shrinks to n·(n/32)^⅓ while subcell populations stay ~32.
    // Level 3 REUSES trainSubCentroids verbatim on a composite
    // (cid·k + cid2) key: the machinery is level-count-agnostic.
    if (probes("semantic3")) {
      import graft.operators.{Dedup, Similarity}
      val n = embs.count()
      val kTot = math.max(1L, (n + 31) / 32)
      val k = math.max(2, math.ceil(math.cbrt(kTot.toDouble)).toInt)
      println(s"PROBE semantic3 n=$n k1=k2=k3=$k")
      var cents1: Seq[(Int, Seq[Double])] = null
      timed("s3_train_level1") {
        cents1 = Similarity.trainCentroids(embs, k = k, iters = 2); k.toLong
      }
      var cells1: org.apache.spark.sql.DataFrame = null
      timed("s3_assign_level1") {
        cells1 = Similarity.assignCells(embs, cents1)
          .select(col("id"), col("emb"), col("cid")).localCheckpoint(true)
        cells1.count()
      }
      var sub2: org.apache.spark.sql.DataFrame = null
      timed("s3_train_level2") {
        sub2 = Similarity.trainSubCentroids(cells1, k, iters = 2); sub2.count()
      }
      var cells2: org.apache.spark.sql.DataFrame = null
      timed("s3_assign_level2") {
        cells2 = Similarity.assignSubCells(cells1, sub2)
          .select(col("id"), col("emb"),
            (col("cid") * k + col("cid2")).as("cid"))
          .localCheckpoint(true)
        cells2.count()
      }
      var sub3: org.apache.spark.sql.DataFrame = null
      timed("s3_train_level3") {
        sub3 = Similarity.trainSubCentroids(cells2, k, iters = 2); sub3.count()
      }
      var cells3: org.apache.spark.sql.DataFrame = null
      timed("s3_assign_level3") {
        cells3 = Similarity.assignSubCells(cells2, sub3)
          .select(col("id"), col("emb"), col("cid"), col("cid2"))
          .localCheckpoint(true)
        cells3.count()
      }
      timed("s3_subcell_pair_count") {
        cells3.groupBy(col("cid"), col("cid2")).count()
          .agg(sum(col("count") * (col("count") - 1) / 2)).collect()
          .head.getAs[Any](0).toString.toDouble.toLong
      }
      timed("s3_pairs_and_cc") {
        val l = cells3.as("l"); val r = cells3.as("r")
        val pairs = l.join(r, col("l.cid") === col("r.cid")
            && col("l.cid2") === col("r.cid2") && col("l.id") < col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
            Similarity.scoreFixed(col("l.emb"), col("r.emb")).as("s"))
          .filter(col("s") >= 950000L).select(col("id_a"), col("id_b"))
        Dedup.connectedComponents(pairs).count()
      }
    }
    // q224 vs q226 at MANY mostly-disjoint sources — the regime the
    // sparse frontier exists for: 400 sources in 40 vocab groups of 10
    // (grams namespaced by group, so only same-group pairs overlap).
    // Dense must build C(400,2) = 79 800 per-pair unions to prove the
    // zeros; sparse materializes only the ~1 800 same-group candidates.
    if (probes("jaccard400")) {
      val docs400 = spark.range(0, 12000).select(
        col("id").as("doc_id"),
        concat(lit("s"), col("id") % 400).as("source"),
        // word values depend on the row index WITHIN the source
        // (id DIV 400), not the raw id, so two sources of the same
        // vocab group emit identical grams at matching indices —
        // real within-group overlap, still zero across groups
        concat_ws(" ", (0 to 12).map(j =>
          concat(lit("w"), expr("(id % 400) DIV 10"), lit("_"),
            expr(s"(id DIV 400) * ${j + 7} % 50"))): _*).as("text"))
        .localCheckpoint(true)
      timed("jaccard_dense_400src")(
        graft.operators.Sketches.kmvPairwiseJaccard(
          docs400, "text", "source", k = 64).count())
      timed("jaccard_sparse_400src")(
        graft.operators.Sketches.kmvPairwiseJaccard(
          docs400, "text", "source", k = 64, candidatesOnly = true).count())
    }
    if (probes("videodup")) {
      // q228's pairing input (4 md5-derived frame hashes per doc — dup
      // texts yield identical frame sets, exactly like the battery
      // fixture) WITHOUT the codec work: times the banding+pairing
      // core uncapped vs with the q205 hot-bucket valve, so the
      // dup-family pair mass and its cure are both measured
      val fh = docs.select(col("doc_id"),
          explode(transform(sequence(lit(0), lit(3)), f =>
            graft.functions.md5Long(concat(md5(coalesce(col("text"), lit(""))),
              lit("|f"), f.cast("string"))))).as("frame_hash"))
        .localCheckpoint(true)
      val (bits, _) = graft.operators.Dedup.suggestSimhashParams(
        fh.count(), bands = 4)
      val mask = bits / 4
      timed("videodup_uncapped")(
        graft.operators.Dedup.fingerprintOverlapPairs(fh, "doc_id",
          "frame_hash", bands = 4, strideBits = 16, maskBits = mask).count())
      timed("videodup_cap64")(
        graft.operators.Dedup.fingerprintOverlapPairs(fh, "doc_id",
          "frame_hash", bands = 4, strideBits = 16, maskBits = mask,
          maxBucketSize = Some(64)).count())
      // the actual cure for duplicate-FAMILY pair mass: exact video
      // dedup first (one representative per identical frame multiset —
      // the q17→q18 staging discipline), then pair survivors
      val reps = fh.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("frame_hash"))).as("_fs"))
        .groupBy(col("_fs")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), explode(col("_fs")).as("frame_hash"))
        .localCheckpoint(true)
      timed("videodup_exact_first")(
        graft.operators.Dedup.fingerprintOverlapPairs(reps, "doc_id",
          "frame_hash", bands = 4, strideBits = 16, maskBits = mask).count())
      timed("videodup_minshared2")(
        graft.operators.Dedup.fingerprintOverlapPairs(fh, "doc_id",
          "frame_hash", bands = 4, strideBits = 16, maskBits = mask,
          minShared = 2).count())
    }
    if (probes("brute")) timed("ann_brute")(
      graft.operators.Similarity.bruteForceTopK(embs,
        embs.filter(col("id") % 200 === 0), k = 3).count())
    if (probes("ams")) {
      // q240/q243 slope decomposition: the estimate-only sizing call
      // (one agg pass per side, FLAT in distinct keys) vs the full
      // report (adds the exact + F2 audit, bounded by distinct keys)
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"))
      timed("ams_estimate_only")(
        graft.operators.Sketches.amsJoinEstimate(ev, col("user_id"),
          ev, col("user_id")).count())
      timed("ams_full_report")(
        graft.operators.Sketches.amsJoinSizeReport(ev, col("user_id"),
          ev, col("user_id")).count())
    }
    if (probes("bloom")) {
      // the q245 production claim measured: pruning a fact scan by the
      // broadcast-literal Bloom (map-side filter, no shuffle) vs the
      // exact left-semi join (fact-wide shuffle) — same selectivity
      val dimk = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")).localCheckpoint(true)
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"))
      timed("bloom_exact_semijoin")(
        fact.join(dimk, fact("l_orderkey") === dimk("o_orderkey"),
          "left_semi").count())
      timed("bloom_prune_mapside")(
        graft.operators.Sketches.bloomPrune(fact, col("l_orderkey"),
          dimk, col("o_orderkey")).count())
      // Spark's own runtime-filter machinery (xxhash64, expressions
      // .Bloom) at a comparable ~2^-5 fpr: the engine-private
      // production hash vs the portable md5 form's oracle tax
      timed("bloom_native_xxhash") {
        val n = dimk.count()
        val bits = graft.expressions.Bloom.optimalNumBits(n, 0.03)
        val bf = dimk.agg(graft.expressions.Bloom.agg(
            col("o_orderkey"), n, bits).as("bf"))
          .collect()(0).getAs[Array[Byte]]("bf")
        fact.filter(graft.expressions.Bloom.mightContain(bf,
          col("l_orderkey"))).count()
      }
    }
    if (probes("bloomprof")) {
      // decompose the q245 production filter's per-row cost
      import graft.functions.md5Long
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey")).localCheckpoint(true)
      timed("prof_scan_only")(fact.count())
      timed("prof_one_md5")(fact.filter(
        pmod(md5Long(col("l_orderkey").cast("string")), lit(2L)) === 0L).count())
      val dimk = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")).localCheckpoint(true)
      val n = dimk.distinct().count()
      val m = graft.operators.Sketches.suggestBloomBits(n, 5)
      var words: Array[Long] = null
      timed("prof_words_build") {
        words = graft.operators.Sketches.bloomWords(
          dimk.select(col("o_orderkey").as("_k")), col("_k"), m, 5)
        words.length.toLong
      }
      timed("prof_full_test")(fact.filter(
        graft.operators.Sketches.bloomTest(col("l_orderkey"), words, m, 5))
        .count())
      timed("prof_test_k1")(fact.filter(
        graft.operators.Sketches.bloomTest(col("l_orderkey"), words, m, 1))
        .count())
    }
    if (probes("ccmaint")) {
      // q249 maintenance-vs-history slope (the q222/q239 discipline):
      // prior = CC over pairs among doc_id >= 2000 (history, grows
      // with SF), delta = pairs touching doc_id < 2000 (fixed batch);
      // prior CC and the pair stream are built untimed, then the
      // maintenance call is timed against the full-recompute reference
      val pairs = graft.operators.Dedup
        .minhashLshPairs(docs, "doc_id", "text").localCheckpoint(true)
      val hist = pairs.filter(col("id_a") >= 2000L && col("id_b") >= 2000L)
      val delta = pairs.filter(col("id_a") < 2000L || col("id_b") < 2000L)
        .localCheckpoint(true)
      val prior = graft.operators.Dedup.connectedComponents(hist)
        .localCheckpoint(true)
      val (np, nd) = (prior.count(), delta.count())
      timed(s"ccmaint_prior${np}_delta${nd}")(
        graft.operators.Dedup.maintainComponents(prior, delta).count())
      timed("ccmaint_full_recompute")(
        graft.operators.Dedup.connectedComponents(pairs).count())
    }
    if (probes("keyoverlap")) {
      // q251 slope: the sketch legs are one column-pruned distinct +
      // TakeOrdered(k) per side (flat-ish in rows); the exact audit
      // legs (distinct-key join) are the only distinct-key term
      timed("keyoverlap_full_report")(
        graft.operators.Sketches.kmvKeyOverlap(
          spark.read.parquet(s"$dir/customer.parquet"), col("c_custkey"),
          spark.read.parquet(s"$dir/orders.parquet"), col("o_custkey"))
          .count())
      timed("keyoverlap_estimate_only")(
        graft.operators.Sketches.kmvKeyOverlapEstimate(
          spark.read.parquet(s"$dir/customer.parquet"), col("c_custkey"),
          spark.read.parquet(s"$dir/orders.parquet"), col("o_custkey"))
          .count())
    }
    if (probes("ccmaintsyn")) {
      // the documents fixture's dup rate is too sparse to stress label
      // maintenance (40 prior labels at gen-sf0.1) — this ladder
      // isolates the law: HISTORY = n labels in size-10 components,
      // DELTA fixed at 100 merging pairs; maintenance must track the
      // delta (plus one map-side scan of history), while the full
      // recompute walks every history edge through the fixpoint
      import graft.operators.Dedup
      for (n <- Seq(1000000L, 10000000L, 100000000L)) {
        val prior = spark.range(n).select(col("id"),
          (col("id") - col("id") % 10).as("cluster_id"))
        val delta = spark.range(100).select((col("id") * 20).as("id_a"),
          (col("id") * 20 + 10).as("id_b"))
        timed(s"ccmaintsyn_hist$n")(
          Dedup.maintainComponents(prior, delta).count())
        if (n <= 10000000L) {
          val star = spark.range(n).filter(col("id") % 10 =!= 0)
            .select(col("id").as("id_a"),
              (col("id") - col("id") % 10).as("id_b"))
          timed(s"ccmaintsyn_recompute$n")(
            Dedup.connectedComponents(star.unionByName(delta)).count())
        }
      }
    }
    if (probes("takedown")) {
      // VERDICT r15 item 1 evidence: deletion repair must track the
      // TOUCHED components (plus ONE map-side scan of the persisted
      // edge relation — the ccmaintsyn framing), while the full
      // recompute walks every surviving history edge through the
      // fixpoint. HISTORY = n nodes in size-10 PATH components (so
      // deleting a middle node genuinely SPLITS each touched
      // component); TAKEDOWN fixed at 100 docs (node 1000i+5, the
      // middle of every 100th component).
      import graft.operators.Dedup
      for (n <- Seq(1000000L, 10000000L, 100000000L)) {
        val edges = spark.range(n).filter(col("id") % 10 =!= 9)
          .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
        val prior = spark.range(n).select(col("id"),
          (col("id") - col("id") % 10).as("cluster_id"))
        val le = edges.withColumn("cluster_id",
          col("id_a") - col("id_a") % 10)
        val del = spark.range(100).select((col("id") * 1000 + 5).as("id"))
        timed(s"takedown_repair_hist$n")(
          Dedup.repairComponentsAfterDelete(prior, le, del).count())
        if (n <= 10000000L) {
          // same surviving edge set as a pure filter (no join cost
          // charged to the recompute side)
          def hits(c: org.apache.spark.sql.Column) =
            c % 1000 === 5 && c < 100000L
          timed(s"takedown_recompute_hist$n")(
            Dedup.connectedComponents(edges
              .filter(!hits(col("id_a")) && !hits(col("id_b")))).count())
        }
      }
    }
    if (probes("takedownlake")) {
      // VERDICT r15 item 2 evidence, END-TO-END on the lake: the same
      // path-component history as the `takedown` probe, but persisted
      // through maintainClustersWithEdges, with the edge store in both
      // layouts — edge_key-bucketed (every takedown scans the full
      // relation once) vs cluster_id-PARTITIONED (the induced read
      // opens only the affected components' buckets). The takedown is
      // FIXED (the middle node of 10 components) while history grows
      // 10x, and the bucket count follows the suggestBucketCount
      // sizing rule (32 at 1M, 256 at 10M — constant per-bucket
      // bytes): flat takedown time on the partitioned store is the
      // claim, with the keyed store carrying the history-scale edge
      // SCAN as its growing term. (A first cut held buckets at 32 and
      // deleted across 100 components: the takedown's COW rewrites
      // then touched EVERY bucket and both layouts scaled with
      // history — the measured demonstration that the flat-takedown
      // property NEEDS the sizing rule, recorded in BASELINE.)
      // The second (idempotent) takedown isolates the read path from
      // the write sets.
      import graft.operators.{IncrementalDedup => ID, VersionedTable}
      for (n <- Seq(1000000L, 10000000L); part <- Seq(false, true)) {
        val tag = s"h${n}_" + (if (part) "part" else "keyed")
        val buckets = if (n <= 1000000L) 32 else 256
        val root = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft_tdlake_$tag")
        graft.util.Fs.deleteRecursively(root)
        val labels = new VersionedTable(spark, s"$root/labels", "id",
          "batch_no", numBuckets = buckets)
        val edges = new VersionedTable(spark, s"$root/edges", "edge_key",
          "batch_no", numBuckets = buckets,
          partitionColOpt = if (part) Some("cluster_id") else None)
        val pairs = spark.range(n).filter(col("id") % 10 =!= 9)
          .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
        timed(s"tdlake_ingest_$tag")(locally {
          ID.maintainClustersWithEdges(labels, edges, pairs, 1L)
          labels.snapshot.count()
        })
        val del = spark.range(10).select((col("id") * 10 + 5).as("id"))
          .localCheckpoint(true)
        timed(s"tdlake_takedown_$tag")(
          ID.takedown(labels, edges, del, 2L).count())
        timed(s"tdlake_retakedown_$tag")(
          ID.takedown(labels, edges, del, 3L).count())
        graft.util.Fs.deleteRecursively(root)
      }
    }
    if (probes("takedownlake2")) {
      // the bucket-granularity decomposition: the takedownlake legs'
      // residual growth is COW rewrite width — every write term is
      // min(|touched keys|, numBuckets) x bucketBytes, so at FIXED
      // history the takedown should get CHEAPER as buckets shrink the
      // per-touched-bucket rewrite. 10M-edge history, partitioned
      // store, 256 vs 2048 buckets, identical 10-component takedown.
      import graft.operators.{IncrementalDedup => ID, VersionedTable}
      for (buckets <- Seq(256, 2048)) {
        val tag = s"h10000000_b$buckets"
        val root = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft_tdlake2_$tag")
        graft.util.Fs.deleteRecursively(root)
        val labels = new VersionedTable(spark, s"$root/labels", "id",
          "batch_no", numBuckets = buckets)
        val edges = new VersionedTable(spark, s"$root/edges", "edge_key",
          "batch_no", numBuckets = buckets,
          partitionColOpt = Some("cluster_id"))
        val n = 10000000L
        val pairs = spark.range(n).filter(col("id") % 10 =!= 9)
          .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
        timed(s"tdlake2_ingest_$tag")(locally {
          ID.maintainClustersWithEdges(labels, edges, pairs, 1L)
          labels.snapshot.count()
        })
        val del = spark.range(10).select((col("id") * 10 + 5).as("id"))
          .localCheckpoint(true)
        timed(s"tdlake2_takedown_$tag")(
          ID.takedown(labels, edges, del, 2L).count())
        timed(s"tdlake2_retakedown_$tag")(
          ID.takedown(labels, edges, del, 3L).count())
        graft.util.Fs.deleteRecursively(root)
      }
    }
    if (probes("samplelake")) {
      // VERDICT r15 item 1 evidence: per-takedown IO on the buffered
      // sample tracks the TOUCHED rows (O(k+m) buffer + |del|), never
      // the corpus — the takedown leg stays flat while history grows
      // 100x (the ingest leg shows the corpus-scale contrast).
      import graft.operators.{IncrementalDedup => ID, VersionedTable}
      for (n <- Seq(1000000L, 10000000L, 100000000L)) {
        val root = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft_smplake_$n")
        graft.util.Fs.deleteRecursively(root)
        val svt = new VersionedTable(spark, root.toString, "id",
          "batch_no", numBuckets = 8)
        val corpus = spark.range(n).select(col("id"),
          (col("id") % 997 + 1).as("w"))
        timed(s"smplake_ingest_h$n")(locally {
          ID.maintainSampleBuffered(svt, corpus, col("id"), col("w"),
            k = 48, m = 16, batchNo = 1L)
          svt.snapshot.count()
        })
        // one real buffered hit + 99 misses (hit id read outside the
        // timed window)
        val sid = svt.snapshot.orderBy(col("rank")).select(col("id"))
          .head().getLong(0)
        val del = spark.range(99).select((col("id") + n).as("id"))
          .unionAll(spark.range(1).select(lit(sid).as("id")))
          .localCheckpoint(true)
        timed(s"smplake_takedown_h$n")(
          ID.takedownSampleBuffered(svt, del, k = 48, m = 16,
            batchNo = 2L, corpus = () => corpus, key = col("id"),
            weight = col("w")).count())
        graft.util.Fs.deleteRecursively(root)
      }
    }
    if (probes("shapegen")) {
      // VERDICT r15 item 6 evidence: the TPC-H shape rows run VERBATIM
      // on gen data through GenFilters' generator-keyed constants — no
      // substitute predicates, the exact battery query functions
      for (q <- Seq("q254_excess_stock", "q260_important_stock",
          "q265_cust_order_dist", "q266_disjunctive_revenue",
          // the round-15 completions: Q4/Q6/Q7/Q8/Q9/Q10/Q12/Q14/Q16
          // (GenFilters nations/region/part-name; PROMO%/ECONOMY% and
          // the 1995-1997 windows exist verbatim in both generators)
          "q267_priority_late_count", "q268_volume_shipping",
          "q269_market_share", "q270_product_profit",
          "q271_returned_items", "q272_shipmode_priority",
          "q273_promo_revenue", "q274_supplier_part_cnt",
          "q275_forecast_revenue"))
        timed(s"shapegen_$q")(graft.SparkEntry.queries(q)(spark, dir).count())
    }
    if (probes("q4form")) {
      // Q4 (q267) formulation study: the shapegen leg read the EXISTS
      // semi as the costliest new shape (20.6 s at gen-sf10) — its
      // right side shuffles the ~72% late fact slice at full line
      // multiplicity. Candidate cure: distinct the late orderkeys
      // BEFORE the join — the partial HashAggregate dedups map-side on
      // the SAME hashpartitioning(orderkey) the semi-join needs, so
      // the shuffle carries ~orders-many keys instead of ~lines-many
      // (4:1 in TPC-H). Both forms return identical counts (semi
      // semantics absorb duplicates); this leg measures whether the
      // extra aggregate pays for the shuffle cut.
      val lo = lit("1996-07-01").cast("timestamp")
      val hi = lit("1996-10-01").cast("timestamp")
      def orders0 = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_orderpriority"))
      def late0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"))
        .filter((col("l_orderkey") * 3 + col("l_linenumber") * 5) % 31
          - 15 < (col("l_orderkey") + col("l_linenumber") * 2) % 14 + 1)
        .select(col("l_orderkey"))
      for (i <- 1 to 3) {
        timed(s"q4form_semi_raw_r$i")(orders0
          .join(late0, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority")).count().count())
        timed(s"q4form_semi_distinct_r$i")(orders0
          .join(late0.distinct(),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority")).count().count())
      }
    }
    if (probes("bucketprobe")) {
      // q276's amortization claim, measured: the bucketed layout pays
      // its orderkey shuffle once at write time; every later join on
      // the key rides it exchange-free. Legs: the recurring shuffle
      // join (broadcast off — the non-broadcastable regime bucketing
      // exists for), the one-time bucketed write of both sides, and
      // the recurring co-located join. Crossover = writeCost /
      // (shuffleJoin − colocJoin) recurring joins.
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"),
          floor(col("l_quantity") * 100).cast("long").as("_qc"))
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        for (i <- 1 to 3)
          timed(s"bucketprobe_shuffle_join_r$i")(
            l.join(o, col("l_orderkey") === col("o_orderkey"))
              .groupBy(col("o_orderpriority"))
              .agg(sum(col("_qc")).as("q")).count())
        val root = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft_bucketprobe").toString
        graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
        timed("bucketprobe_write_both")(locally {
          graft.operators.Layout.writeBucketedAt(l, "graft_bp_l",
            "l_orderkey", 32, s"$root/l")
          graft.operators.Layout.writeBucketedAt(o, "graft_bp_o",
            "o_orderkey", 32, s"$root/o")
          2L
        })
        for (i <- 1 to 3)
          timed(s"bucketprobe_coloc_join_r$i")(
            spark.table("graft_bp_l")
              .join(spark.table("graft_bp_o"),
                col("l_orderkey") === col("o_orderkey"))
              .groupBy(col("o_orderpriority"))
              .agg(sum(col("_qc")).as("q")).count())
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }
    if (probes("saltprobe")) {
      // q277's scale claim, measured: a single giant key (30% of a
      // 20M-row fact on key 0) joining a 1M-row dim too big to
      // broadcast (threshold forced to -1). Three plans, same result:
      // AQE skew-join ON (the default cure), AQE skew-join OFF (the
      // straggler baseline — one reducer owns 6M rows), and
      // Layout.saltedJoin salt=32 (the explicit cure). Deterministic
      // synthetic frames; 3 rounds each, read the min.
      val n = 20000000L
      def bigAt(hotPct: Int) = spark.range(n).select(
        when(col("id") % 100 < hotPct, lit(0L))
          .otherwise(col("id") % 1000000L).as("key"),
        (col("id") % 97).as("v"))
      def small = spark.range(1000000L)
        .select(col("id").as("key"), (col("id") % 5).as("tag"))
      val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        for (hotPct <- Seq(30, 90); i <- 1 to 3) {
          val big = bigAt(hotPct)
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
          timed(s"saltprobe_h${hotPct}_aqe_on_r$i")(big.join(small, "key")
            .groupBy("tag").agg(sum(col("v")).as("sv")).count())
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
          timed(s"saltprobe_h${hotPct}_aqe_off_r$i")(big.join(small, "key")
            .groupBy("tag").agg(sum(col("v")).as("sv")).count())
          timed(s"saltprobe_h${hotPct}_salted32_r$i")(
            graft.operators.Layout.saltedJoin(big, small, "key", 32)
              .groupBy("tag").agg(sum(col("v")).as("sv")).count())
          // the targeted form: salt ONLY the measured hot key — the
          // small side replicates 32 ROWS instead of 32M
          timed(s"saltprobe_h${hotPct}_saltedhot32_r$i")(
            graft.operators.Layout.saltedJoinHot(big, small, "key", 32,
              Seq(0L))
              .groupBy("tag").agg(sum(col("v")).as("sv")).count())
        }
      } finally {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      }
    }
    if (probes("saltprobe2")) {
      // VERDICT r15 item 5: hunt the regime where salting WINS, in
      // the shapes the saltprobe study itself named as unreached —
      // WIDE string-heavy rows (the hot partition's bytes, not just
      // its row count, land on one reducer) and HIGH per-key join
      // MULTIPLICITY (a many-to-many hot key whose OUTPUT explodes).
      // 8M-row fact, 30% on hot key 0, 1M-row dim (broadcast forced
      // off); wide legs carry a ~100-byte payload through the join;
      // mult legs give the hot key 4 dim replicas (output 4x on the
      // hot slice). Four plans each: AQE skew ON (the default cure),
      // AQE OFF (the no-AQE engine the salt escape hatch exists for),
      // full salted32, hot-targeted salted32.
      val n = 8000000L
      def fact(wide: Boolean) = {
        val base = spark.range(n).select(
          when(col("id") % 100 < 30, lit(0L))
            .otherwise(col("id") % 1000000L).as("key"),
          (col("id") % 97).as("v"))
        if (wide) base.withColumn("payload",
          concat(lit("x" * 96), col("v").cast("string")))
        else base
      }
      def dim(mult: Boolean) = {
        val base = spark.range(1000000L)
          .select(col("id").as("key"), (col("id") % 5).as("tag"))
        if (mult) base.unionAll(spark.range(3L)
          .select(lit(0L).as("key"), (col("id") + 5L).as("tag")))
        else base
      }
      def agg(df: org.apache.spark.sql.DataFrame, wide: Boolean) =
        (if (wide) df.groupBy("tag").agg(sum(length(col("payload"))).as("s"))
         else df.groupBy("tag").agg(sum(col("v")).as("s"))).count()
      val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        for (shape <- Seq("wide", "mult", "widemult"); i <- 1 to 3) {
          val (w, m) = (shape.contains("wide"), shape.contains("mult"))
          val (b, s) = (fact(w), dim(m))
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
          timed(s"saltprobe2_${shape}_aqe_on_r$i")(agg(b.join(s, "key"), w))
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
          timed(s"saltprobe2_${shape}_aqe_off_r$i")(agg(b.join(s, "key"), w))
          timed(s"saltprobe2_${shape}_salted32_r$i")(
            agg(graft.operators.Layout.saltedJoin(b, s, "key", 32), w))
          timed(s"saltprobe2_${shape}_saltedhot32_r$i")(
            agg(graft.operators.Layout.saltedJoinHot(b, s, "key", 32,
              Seq(0L)), w))
        }
      } finally {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      }
    }
    if (probes("bloomrel")) {
      // q247's relation form vs the q245 broadcast-literal form vs the
      // exact semi-join, same fact/dim (VERDICT r13 item 7): inside
      // the literal regime (m ≤ 2³⁰) the relation form pays TWO
      // distinct-key shuffles plus the word join, so the literal
      // filter should win — this leg measures how much, i.e. the
      // routing threshold's cost of getting it wrong
      val dimk = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")).localCheckpoint(true)
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"))
      timed("bloomrel_exact_semijoin")(
        fact.join(dimk, fact("l_orderkey") === dimk("o_orderkey"),
          "left_semi").count())
      timed("bloomrel_literal")(
        graft.operators.Sketches.bloomPrune(fact, col("l_orderkey"),
          dimk, col("o_orderkey")).count())
      timed("bloomrel_relation")(
        graft.operators.Sketches.bloomPruneRelation(fact, col("l_orderkey"),
          dimk, col("o_orderkey")).count())
      // the regime the relation form EXISTS for: a 150M-key dim whose
      // m = 1.08G bits exceeds bloomWords' 2³⁰ literal cap (a 135 MB
      // long[] is past broadcast sanity) — the literal form refuses
      // (require), the relation form still prunes; the exact semi-join
      // is the only alternative and pays the fact-wide shuffle against
      // a 150M-key build side
      val bigDim = spark.range(150000000L).select(col("id").as("k"))
      val bigFact = spark.range(60000000L)
        .select((col("id") * 5 % 300000000L).as("k"))
      timed("bloomrel_big_exact_semijoin")(
        bigFact.join(bigDim.select(col("k").as("dk")),
          col("k") === col("dk"), "left_semi").count())
      timed("bloomrel_big_relation")(
        graft.operators.Sketches.bloomPruneRelation(bigFact, col("k"),
          bigDim, col("k")).count())
    }
    if (probes("q20")) {
      // q254's decorrelation measured (VERDICT r13 item 6 slope leg):
      // the shipped ONE-PASS form folds the (partkey, suppkey) pair
      // set and the correlated window sum into a single conditional-
      // sum aggregate (one fact scan, one exchange); the obvious
      // alternative a decorrelating optimizer emits first is TWO
      // aggregates over two fact scans joined back (pair set ⋈ window
      // sums) — same answer, twice the scan + an extra join exchange
      // partkey-mod filter, not the battery's p_name LIKE: gen_sf.py's
      // part names come from DuckDB's tpch generator, where no name
      // starts with 'small' — the LIKE form would probe an empty pair
      // set. ~10% of parts keeps the battery row's selectivity class.
      val smallParts = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_partkey") % 10 === 0L)
        .select(col("p_partkey")).localCheckpoint(true)
      val winLo = lit("1996-01-01").cast("timestamp")
      val winHi = lit("1997-01-01").cast("timestamp")
      def factL = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
          floor(col("l_quantity") * 100).cast("long").as("_qc"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      def avail = ((col("l_partkey") * 7 + col("l_suppkey") * 13) % 50 + 1) * 100
      timed("q20_onepass")(
        factL.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(when(col("l_shipdate") >= winLo &&
            col("l_shipdate") < winHi, col("_qc"))).as("_wq"))
          .filter(avail * 2 > col("_wq")).count())
      timed("q20_twopass") {
        val pairs = factL.select(col("l_partkey"), col("l_suppkey")).distinct()
        val wsum = factL
          .filter(col("l_shipdate") >= winLo && col("l_shipdate") < winHi)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("_qc")).as("_wq"))
        pairs.join(wsum, Seq("l_partkey", "l_suppkey"), "left")
          .filter(avail * 2 > col("_wq")).count()
      }
    }
    if (probes("q2shape")) {
      // q259's one-exchange claim measured: the explicit partkey
      // repartition lets pair-dedup AND the per-part min window share
      // one exchange; without it Spark plans dedup on (pk, sk) and a
      // SECOND exchange for the window's pk partitioning. Same
      // filters as q259 (p_size works on both generators).
      import org.apache.spark.sql.expressions.{Window => W}
      val sized = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_size") === 15).select(col("p_partkey"))
        .localCheckpoint(true)
      def base = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"))
      def finish(pairs: org.apache.spark.sql.DataFrame) = pairs
        .withColumn("cost_c",
          (col("l_partkey") * 11 + col("l_suppkey") * 17) % 1000 + 1)
        .withColumn("_mn",
          min(col("cost_c")).over(W.partitionBy(col("l_partkey"))))
        .filter(col("cost_c") === col("_mn")).count()
      timed("q2shape_one_exchange")(finish(
        base.repartition(col("l_partkey"))
          .dropDuplicates(Seq("l_partkey", "l_suppkey"))))
      timed("q2shape_two_exchanges")(finish(
        base.dropDuplicates(Seq("l_partkey", "l_suppkey"))))
    }
    if (probes("q17shape")) {
      // q257's decorrelation measured: the per-part avg threshold as
      // a window over the SAME pass (one exchange) vs the aggregate-
      // and-join-back form a decorrelating optimizer emits first
      // (an extra aggregate exchange + the join). Brand#23 exists on
      // both generators.
      import org.apache.spark.sql.expressions.{Window => W}
      val brand = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
        .localCheckpoint(true)
      def base = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"),
          floor(col("l_quantity") * 100).cast("long").as("_qc"),
          floor(col("l_extendedprice") * 100).cast("long").as("_pc"))
        .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      timed("q17shape_window_onepass") {
        val byPart = W.partitionBy(col("l_partkey"))
        base.withColumn("_sq", sum(col("_qc")).over(byPart))
          .withColumn("_n", count(lit(1)).over(byPart))
          .filter(col("_qc") * col("_n") * 5 < col("_sq"))
          .agg(coalesce(sum(col("_pc")), lit(0L))).count()
      }
      timed("q17shape_agg_join_twopass") {
        val thr = base.groupBy(col("l_partkey").as("_pk"))
          .agg(sum(col("_qc")).as("_sq"), count(lit(1)).as("_n"))
        base.join(thr, col("l_partkey") === col("_pk"))
          .filter(col("_qc") * col("_n") * 5 < col("_sq"))
          .agg(coalesce(sum(col("_pc")), lit(0L))).count()
      }
    }
    if (probes("ccconv")) {
      // VERDICT r13 item 3 evidence: the folded convergence test
      // (labels-moved flag carried through the jump chain, one
      // map-side scan of the checkpointed round output) vs the old
      // standalone two-join O(E) atFixpoint probe per round — same
      // labeling, fewer Spark jobs and no per-round edge re-joins.
      // The old loop is reproduced verbatim (pre-11a0eed Dedup.scala)
      // so the comparison measures the formulation, not drift.
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
      def ccOld(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          .distinct()
          .localCheckpoint(true)
        if (edges.isEmpty)
          return edges.select(col("src").as("id"), col("dst").as("cluster_id"))
        var labels = edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("m"))
          .select(col("id"), least(col("id"), col("m")).as("label"))
          .localCheckpoint(true)
        def atFixpoint: Boolean = {
          val la = labels.select(col("id").as("ia"), col("label").as("la"))
          val lb = labels.select(col("id").as("ib"), col("label").as("lb"))
          edges.join(la, edges("src") === col("ia"))
            .join(lb, edges("dst") === col("ib"))
            .filter(col("la") =!= col("lb")).isEmpty
        }
        var iter = 0
        var converged = atFixpoint
        while (!converged && iter < maxIter) {
          val nbrMin = edges.join(labels, edges("dst") === labels("id"))
            .groupBy(edges("src").as("nid")).agg(min(col("label")).as("nlabel"))
          val oneHop = labels.join(nbrMin, labels("id") === col("nid"), "left")
            .select(col("id"),
              least(col("label"), coalesce(col("nlabel"), col("label"))).as("l1"))
          def jump(ls: DataFrame): DataFrame =
            ls.as("x")
              .join(ls.select(col("id").as("pid"), col("l1").as("pl")).as("y"),
                col("x.l1") === col("y.pid"), "left")
              .select(col("x.id").as("id"),
                least(col("x.l1"), coalesce(col("y.pl"), col("x.l1"))).as("l1"))
          labels = jump(jump(oneHop))
            .withColumnRenamed("l1", "label")
            .localCheckpoint(true)
          iter += 1
          converged = atFixpoint
        }
        labels.select(col("id"), col("label").as("cluster_id"))
      }
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val counter = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      def countJobs(name: String)(body: => Long): Unit = {
        // min-of-2 timing (the archive discipline); the listener-bus
        // drain sleep sits OUTSIDE the timed window. (sec, jobs, rows)
        // travel as ONE tuple keyed on the fastest run — picking min
        // sec and min jobs independently can print a chimera of two
        // runs when AQE re-plans change the job count (ADVICE r14).
        var best = (Double.MaxValue, Int.MaxValue, 0L)
        for (_ <- 1 to 2) {
          spark.sparkContext.addSparkListener(counter)
          jobs.set(0)
          val t0 = System.nanoTime()
          val rows = body
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000) // listener bus drain
          spark.sparkContext.removeSparkListener(counter)
          if (sec < best._1) best = (sec, jobs.get(), rows)
        }
        println(f"PROBE $name rows=${best._3}%d sec=${best._1}%.2f jobs=${best._2}%d")
      }
      val pairs = graft.operators.Dedup
        .minhashLshPairs(docs, "doc_id", "text").localCheckpoint(true)
      // a long path graph forces many productive rounds, so the
      // per-round probe tax shows up even when the organic dup graph
      // converges in 2 rounds: 4096-node path = 12 productive rounds
      // at 4x shrink/round
      val path = spark.range(4095L).select(col("id").as("id_a"),
        (col("id") + 1L).as("id_b")).localCheckpoint(true)
      for ((nm, es) <- Seq(("organic", pairs), ("path4096", path))) {
        countJobs(s"ccconv_hybrid_$nm")(
          graft.operators.Dedup.connectedComponents(es).count())
        countJobs(s"ccconv_oldprobe_$nm")(ccOld(es).count())
        // identical labelings — the fold must not change the answer
        val a = graft.operators.Dedup.connectedComponents(es)
        val b = ccOld(es)
        val diff = a.as("a").join(b.as("b"), col("a.id") === col("b.id"))
          .filter(col("a.cluster_id") =!= col("b.cluster_id")).count()
        println(s"PROBE ccconv_labels_diff_$nm rows=$diff sec=0.00")
      }
    }
    if (probes("q21")) {
      // q248's two formulations measured head to head: the engine's
      // per-order aggregate rewrite (one lineitem exchange) vs the
      // textbook EXISTS/NOT-EXISTS form (a semi + an anti fact
      // self-join — three lineitem shuffles). Same answer (the q248
      // oracle hash-gates that); this probe measures the plan delta.
      def ord = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      def li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      timed("q21_aggregate_rewrite") {
        val rw = graft.SparkEntry.queries("q248_waiting_suppliers")(spark, dir)
        val n = rw.count()
        if (sys.env.contains("GRAFT_PROBE_EXPLAIN"))
          println(rw.queryExecution.executedPlan.toString)
        n
      }
      timed("q21_exists_naive") {
        val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey").as("k"), col("l_suppkey").as("s"))
        val anyOther = li.select(col("l_orderkey").as("k2"),
          col("l_suppkey").as("s2"))
        val lateOther = late.select(col("k").as("k3"), col("s").as("s3"))
        val naive = late
          .join(anyOther, col("k") === col("k2") && col("s") =!= col("s2"),
            "left_semi")
          .join(lateOther, col("k") === col("k3") && col("s") =!= col("s3"),
            "left_anti")
          .groupBy(col("s")).agg(count(lit(1)).as("numwait"))
        val n = naive.count()
        if (sys.env.contains("GRAFT_PROBE_EXPLAIN"))
          println(naive.queryExecution.executedPlan.toString)
        n
      }
    }
    if (probes("stitchgatecap")) {
      // the stitchgate leg with the q242 law's cap applied at the gate
      // (detectStitches maxKeyDf): shows the templated-seam pair mass
      // — the only super-linear term the uncapped leg measured — is
      // controlled, at a bounded (≤0.1% of keys) recall trade
      val frags = graft.SparkEntry.stitchFrags(spark, dir)
        .localCheckpoint(true)
      val law = graft.operators.Dedup.suggestStitchMaxKeyDf(
        frags, "fid", "text", 3)
      val batch = frags.filter(col("fid") < 2000L).localCheckpoint(true)
      val hist = frags.filter(col("fid") >= 2000L)
      val root = java.nio.file.Files
        .createTempDirectory("graft_stitchgatecap").toString
      val vt = new graft.operators.VersionedTable(spark, root, "fid",
        "batch_no", numBuckets = 8)
      val nh = hist.count()
      graft.operators.IncrementalDedup.detectStitches(
        vt, hist, "fid", "text", 3, 1L, Some(law.cap)).count()
      timed(s"stitchgatecap${law.cap}_hist${nh}_batch${batch.count()}")(
        graft.operators.IncrementalDedup.detectStitches(
          vt, batch, "fid", "text", 3, 2L, Some(law.cap)).count())
    }
    if (probes("stitchgate")) {
      // q239 maintenance-vs-history slope (VERDICT r12 item 6): seed
      // the boundary index with the WHOLE fragment corpus except a
      // fixed-size batch (untimed), then time detecting that fixed
      // batch against it — run at gen-sf0.1/1/10, history grows 100×
      // while the timed batch stays ~2k fragments
      val frags = graft.SparkEntry.stitchFrags(spark, dir)
        .localCheckpoint(true)
      val batch = frags.filter(col("fid") < 2000L).localCheckpoint(true)
      val hist = frags.filter(col("fid") >= 2000L)
      val root = java.nio.file.Files
        .createTempDirectory("graft_stitchgate").toString
      val vt = new graft.operators.VersionedTable(spark, root, "fid",
        "batch_no", numBuckets = 8)
      val nh = hist.count()
      graft.operators.IncrementalDedup.detectStitches(
        vt, hist, "fid", "text", 3, 1L).count() // seed ingest, untimed
      timed(s"stitchgate_hist${nh}_batch${batch.count()}")(
        graft.operators.IncrementalDedup.detectStitches(
          vt, batch, "fid", "text", 3, 2L).count())
    }
    if (probes("seamwidth")) {
      // q253's law measured (VERDICT r13 item 2): the 30-word-vocab
      // fixture saturates the w=3 seam-key space (27k keys), so the
      // fixed-width detector's candidate mass grows ~6.3× per 10× data
      // (the q232 organic regime the df-cap law refuses to cut); the
      // law's width w (vocab^w ≥ nKeys/2) divides expected key df back
      // to ~2 and the equi-join's pair mass collapses to the true
      // seams. Fragment corpora are built untimed at each width (a
      // w-token overlap is only detectable at width w).
      import graft.operators.Dedup
      // the ONE law derivation shared with q253/q261 — the probe must
      // measure the same law the battery rows gate
      val law = graft.SparkEntry.seamWidthLawFor(spark, dir)
      println(s"PROBE seamwidth_law rows=${law.w} sec=0.00" +
        s" # vocab=${law.vocabSize} nKeys=${law.nKeys}" +
        s" needed=${law.neededKeySpace}")
      val f3 = graft.SparkEntry.stitchFragsAt(spark, dir, 3)
        .localCheckpoint(true)
      val fw = graft.SparkEntry.stitchFragsAt(spark, dir, law.w)
        .localCheckpoint(true)
      timed("seamwidth_fixed_w3")(
        Dedup.boundaryOverlapPairs(f3, "fid", "text", 3).count())
      timed(s"seamwidth_law_w${law.w}")(
        Dedup.boundaryOverlapPairs(fw, "fid", "text", law.w).count())
      // the DOWNSTREAM term the width law exists for: every consumer
      // of the pair stream (CC clustering, reassembly degree filters)
      // walks the candidate mass, which grows superlinearly at a
      // saturated width and linearly at the law's. CC over the w3
      // mass is opt-in (SEAMWIDTH_CC_W3=1): at gen-sf10 it is a
      // 37M-edge dup-saturated graph
      timed(s"seamwidth_cc_law_w${law.w}") {
        val p = Dedup.boundaryOverlapPairs(fw, "fid", "text", law.w)
          .localCheckpoint(true)
        Dedup.connectedComponents(p).count()
      }
      if (sys.env.get("SEAMWIDTH_CC_W3").contains("1"))
        timed("seamwidth_cc_fixed_w3") {
          val p = Dedup.boundaryOverlapPairs(f3, "fid", "text", 3)
            .localCheckpoint(true)
          Dedup.connectedComponents(p).count()
        }
    }
    if (probes("curation")) {
      // stage-by-stage decomposition of Curation.curate's cost
      import graft.operators.{Dedup, TextAnalysis}
      val d = docs
      // materialize the dedup result inside its own timing so the
      // checkpoint stage doesn't silently re-run the dedup groupBy
      var keep: org.apache.spark.sql.DataFrame = null
      timed("cur_exact_dedup") {
        keep = Dedup.exact(d, col("doc_id"), col("text"))
          .select(col("keep_id")).localCheckpoint(true)
        keep.count()
      }
      var kept: org.apache.spark.sql.DataFrame = null
      timed("cur_checkpoint_kept") {
        kept = d.join(keep, d("doc_id") === keep("keep_id"), "left_semi")
          .localCheckpoint(true)
        kept.count()
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      timed("cur_lsh_pairs") {
        pairs = Dedup.minhashLshPairs(kept, "doc_id", "text").localCheckpoint(true)
        pairs.count()
      }
      timed("cur_connected_components")(
        Dedup.connectedComponents(pairs).count())
      timed("cur_gates")(
        kept.select(col("*"), TextAnalysis.curationGates(col("text")).as("_g"))
          .localCheckpoint(true)
          .filter(col("_g.quality_1e6") >= 600000L &&
            col("_g.predicted_lang") === "en").count())
      timed("cur_full")(graft.operators.Curation.curate(d).count())
    }
    spark.stop()
  }
}
