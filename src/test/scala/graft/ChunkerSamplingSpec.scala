package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunker, Sampling}

class ChunkerSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (1 to n).map(i => s"w$i").mkString(" "))

  test("chunkByTokens windows with overlap; remainder chunk is shorter, never empty") {
    val df = Seq(doc(1, 10), doc(2, 11), doc(3, 3)).toDF("doc_id", "text")
    val out = Chunker.chunkByTokens(df, "text", chunkTokens = 4, overlapTokens = 1)
      .select("doc_id", "chunk_no", "chunk", "chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // stride 3: doc 1 (10 toks) → starts 0,3,6 → exactly covered
    assert(out.filter(_._1 == 1).map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // doc 2 (11 toks) → 4 windows, final is the 2-token remainder
    val d2 = out.filter(_._1 == 2)
    assert(d2.map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10 w11"))
    assert(d2.map(_._4).toSeq == Seq(4L, 4L, 4L, 2L))
    // doc 3 shorter than one window → single chunk
    assert(out.filter(_._1 == 3).map(t => (t._3, t._4)).toSeq == Seq(("w1 w2 w3", 3L)))
    // every token of every doc appears in some chunk (coverage)
    assert(out.filter(_._1 == 2).flatMap(_._3.split(" ")).toSet ==
      (1 to 11).map(i => s"w$i").toSet)
  }

  test("chunkByTokens drops whitespace-only docs and keeps input columns") {
    // "   " (spaces), "\t\n" (non-space whitespace), and null must all
    // drop — trim() alone would let the tab/newline doc emit an empty chunk
    val df = Seq((1L, "a b c", "en"), (2L, "   ", "fr"), (3L, null: String, "de"),
      (4L, "\t\n", "es")).toDF("doc_id", "text", "lang")
    val out = Chunker.chunkByTokens(df, "text", 2, 0)
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "lang", "chunk_no", "chunk", "chunk_tokens"))
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
    assert(rows.map(_.getAs[String]("chunk")).toSeq.sorted == Seq("a b", "c"))
  }

  test("chunkByTokens rejects invalid window parameters") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.chunkByTokens(df, "text", 0, 0))
    intercept[IllegalArgumentException](Chunker.chunkByTokens(df, "text", 4, 4))
  }

  test("packSequences lays docs out contiguously per shard and cuts at the budget") {
    import graft.operators.Chunker
    val df = (1L to 40L).map(i => (i, 10L + (i % 7))).toDF("doc_id", "n_tokens")
    val out = Chunker.packSequences(df, "doc_id", "n_tokens",
        budgetTokens = 50L, shards = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("shard"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
    assert(out.length == 40)
    assert(out.map(_._3).toSet.size == 2, "both shards populated")
    out.groupBy(_._3).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._1)
      // concatenation semantics: each doc starts exactly where the
      // previous one ended (prefix sums), seq/offset = div/mod 50
      var prefix = 0L
      ordered.foreach { case (id, ntok, _, seq, off) =>
        assert(seq == prefix / 50, s"shard $shard doc $id seq")
        assert(off == prefix % 50, s"shard $shard doc $id offset")
        prefix += ntok
      }
      assert(ordered.head._5 == 0L, s"shard $shard must start at offset 0")
      // seq ids never decrease along the layout order
      assert(ordered.map(_._4).sliding(2).forall(p => p.head <= p.last))
    }
    intercept[IllegalArgumentException](
      Chunker.packSequences(df, "doc_id", "n_tokens", 0L, 2))
  }

  test("packSequencesNoSplit: greedy first-fit, docs never straddle a cut") {
    val df = (1L to 40L).map(i => (i, 10L + (i % 7))).toDF("doc_id", "n_tokens")
    val out = Chunker.packSequencesNoSplit(df, "doc_id", "n_tokens",
        budgetTokens = 50L, shards = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("shard"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
    assert(out.length == 40)
    assert(out.map(_._3).toSet.size == 2, "both shards populated")
    out.groupBy(_._3).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._1)
      // replay the greedy recurrence doc by doc
      var seq = 0L; var fill = 0L
      ordered.foreach { case (id, n, _, s, off) =>
        if (fill > 0 && fill + n > 50) { seq += 1; fill = 0 }
        assert(s == seq && off == fill, s"shard $shard doc $id placement")
        fill += n
      }
      // the defining invariant vs packSequences: a doc that fits the
      // budget is never cut across sequences
      ordered.foreach { case (id, n, _, _, off) =>
        if (n <= 50) assert(off + n <= 50, s"doc $id straddles a cut") }
      assert(ordered.head._5 == 0L, s"shard $shard must start at offset 0")
      assert(ordered.map(_._4).sliding(2).forall(p => p.head <= p.last))
    }
    // an oversized doc owns a sequence; the next doc starts a fresh one
    val big = Seq((1L, 10L), (2L, 100L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val bigOut = Chunker.packSequencesNoSplit(big, "doc_id", "n_tokens", 50L, 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))).toMap
    assert(bigOut == Map(1L -> ((0L, 0L)), 2L -> ((1L, 0L)), 3L -> ((2L, 0L))))
    intercept[IllegalArgumentException](
      Chunker.packSequencesNoSplit(df, "doc_id", "n_tokens", 0L, 2))
  }

  test("packing variants agree when the layout never crosses a cut") {
    // uniform 10-token docs against a 50-token budget: prefix sums land
    // exactly on boundaries, so split and no-split packing coincide
    val df = (1L to 20L).map(i => (i, 10L)).toDF("doc_id", "n_tokens")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id", "shard", "seq_id", "seq_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    assert(canon(Chunker.packSequences(df, "doc_id", "n_tokens", 50L, 2)) ==
      canon(Chunker.packSequencesNoSplit(df, "doc_id", "n_tokens", 50L, 2)))
  }

  test("packing budgets follow any caller-supplied token-count column (BPE seam)") {
    // the whitespace token count is a deterministic PROXY, not an
    // assumption: both packers budget on whatever integer column the
    // caller supplies. Simulate a precomputed BPE count (~1.3 tokens
    // per word, as real BPE inflates) and check placement follows IT.
    val df = (1L to 12L).map(i => (i, 10L)).toDF("doc_id", "ws_tokens")
      .withColumn("bpe_tokens", (col("ws_tokens") * 13).cast("long") / 10)
      .withColumn("bpe_tokens", col("bpe_tokens").cast("long"))
    def placements(countCol: String) =
      Chunker.packSequences(df, "doc_id", countCol, budgetTokens = 50L, shards = 1)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))).toMap
    val ws = placements("ws_tokens")
    val bpe = placements("bpe_tokens")
    // whitespace counts: doc i starts at 10*(i-1) → seq (i-1)/5
    assert(ws(6L) == ((1L, 0L)) && ws(12L) == ((2L, 10L)))
    // BPE counts (13/doc): doc i starts at 13*(i-1)
    assert((1L to 12L).forall { i =>
      bpe(i) == (((13 * (i - 1)) / 50).toLong, ((13 * (i - 1)) % 50).toLong) },
      s"BPE placement must follow the supplied counts: $bpe")
    assert(ws != bpe, "different count columns must yield different layouts")
    // the no-split packer honors the same seam
    val noSplit = Chunker.packSequencesNoSplit(df, "doc_id", "bpe_tokens", 50L, 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))).toMap
    // greedy: 3 docs of 13 fit per 50-token sequence (39 ≤ 50 < 52)
    assert((1L to 12L).forall { i =>
      noSplit(i) == (((i - 1) / 3, ((i - 1) % 3) * 13)) }, s"got $noSplit")
  }

  test("hashSample is deterministic, rate-monotone (samples nest), and unbiased-ish") {
    val df = (1L to 2000L).toDF("id")
    def ids(ppm: Long): Set[Long] =
      Sampling.hashSample(df, col("id"), ppm).collect().map(_.getLong(0)).toSet
    val s20 = ids(200000)
    assert(s20 == ids(200000), "same rate must select the same rows")
    val s50 = ids(500000)
    assert(s20.subsetOf(s50), "lower-rate sample must nest inside higher-rate")
    assert(ids(0).isEmpty && ids(Sampling.Ppm).size == 2000)
    // 2000 uniform hashes at 50%: expect ~1000, allow generous slack
    assert(math.abs(s50.size - 1000) < 150, s"got ${s50.size}")
  }

  test("epochMixture: floor copies + hash-gated fractional extra; extras nest as weights grow") {
    val df = (1L to 1000L).toDF("id")
      .withColumn("src", when(col("id") <= 400, "a")
        .when(col("id") <= 800, "b").otherwise("c"))
    def run(w: Map[String, Long]) =
      Sampling.epochMixture(df, col("id"), col("src"), w)
        .groupBy("id").agg(count(lit(1)).as("n"), max("copy_no").as("mx"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // integral weights: exact copy counts, copy_no runs 0..w-1
    val exact = run(Map("a" -> 2000000L, "b" -> 1000000L))
    assert((1L to 400L).forall(exact(_) == (2L, 1L)), "a emits exactly 2 copies")
    assert((401L to 800L).forall(exact(_) == (1L, 0L)), "b emits exactly 1 copy")
    assert(!exact.contains(900L), "stratum without a weight drops")
    // fractional: the extra-copy set IS the hashSample membership set
    val frac = run(Map("a" -> 1300000L))
    val extra = frac.filter(_._2._1 == 2L).keySet
    val sampled = Sampling.hashSample(df.filter(col("src") === "a"), col("id"), 300000L)
      .collect().map(_.getLong(0)).toSet
    assert(extra == sampled, "fractional membership mirrors hashSample")
    // nesting: raising the weight only ADDS extra copies
    val wider = run(Map("a" -> 1600000L)).filter(_._2._1 == 2L).keySet
    assert(extra.subsetOf(wider), "extra-copy sets nest as the epoch weight grows")
    // sub-epoch weight downsamples instead of repeating
    val sub = run(Map("a" -> 500000L))
    assert(sub.nonEmpty && sub.values.forall(_ == (1L, 0L)) && sub.size < 400,
      s"0.5 epochs keeps a strict subset, one copy each: ${sub.size}")
  }

  test("stratifiedHead: exactly N per stratum, deterministic, prefix-stable in N") {
    val df = (1L to 300L).toDF("id").withColumn("src",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise(lit(null).cast("string")))
    def pick(n: Int) = Sampling.stratifiedHead(df, col("id"), col("src"), n)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val h5 = pick(5)
    assert(h5.groupBy(_._1).view.mapValues(_.length).toMap == Map("a" -> 5, "b" -> 5),
      "exactly N per stratum, null stratum dropped")
    assert(h5.filter(_._1 == "a").map(_._3).sorted.toSeq == (1L to 5L), "ranks are 1..N")
    assert(pick(5).toSet == h5.toSet, "same pick on re-run")
    assert(pick(3).map(t => (t._1, t._2)).toSet.subsetOf(h5.map(t => (t._1, t._2)).toSet),
      "growing N only appends picks")
  }

  test("splitLabel partitions the corpus; splits align with hashSample prefixes") {
    val df = (1L to 1000L).toDF("id")
    val labeled = df.select(col("id"),
        Sampling.splitLabel(col("id"), Sampling.DemoSplits).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // exactly one label per row, all three present, rough proportions
    assert(labeled.length == 1000)
    val byLabel = labeled.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 700 && byLabel("train") < 900, s"got $byLabel")
    // prefix-consistency: the 80% train split IS hashSample at 800k ppm
    val sampled = Sampling.hashSample(df, col("id"), 800000L)
      .collect().map(_.getLong(0)).toSet
    assert(labeled.filter(_._2 == "train").map(_._1).toSet == sampled)
    // weights must sum to exactly 1e6
    intercept[IllegalArgumentException](
      Sampling.splitLabel(col("id"), Seq("a" -> 500000L, "b" -> 400000L)))
    // null keys get a NULL label, never silently land in the last split
    val withNull = Seq(Some(1L), None).toDF("id")
      .select(Sampling.splitLabel(col("id"), Sampling.DemoSplits).as("split"))
      .collect().map(r => Option(r.getString(0)))
    assert(withNull.count(_.isEmpty) == 1, s"null key must get null split: ${withNull.toSeq}")
  }

  test("stratifiedSample applies per-stratum rates; unmapped strata drop") {
    val df = (1L to 300L).map(i =>
      (i, Seq("keep_all", "half", "other")((i % 3).toInt))).toDF("id", "grp")
    val out = Sampling.stratifiedSample(df, col("grp"), col("id"),
        Map("keep_all" -> 1000000L, "half" -> 500000L))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byGrp = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGrp("keep_all") == 100, "rate 1e6 must keep the whole stratum")
    assert(!byGrp.contains("other"), "unmapped stratum must drop entirely")
    val half = byGrp("half")
    assert(half > 25 && half < 75, s"~50% of 100 expected, got $half")
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(df, col("grp"), col("id"), Map("x" -> 2000000L)))
  }

  test("rebalanceToMixture downsamples toward the target shares; binding stratum keeps all") {
    // 600 a / 200 b / 200 extra; target a 50% b 50% → b binds (T=400):
    // b keeps everything, a keeps ~200 of 600, extra drops
    val df = ((1L to 600L).map(i => (i, "a")) ++ (601L to 800L).map(i => (i, "b")) ++
      (801L to 1000L).map(i => (i, "extra"))).toDF("id", "grp")
    val out = Sampling.rebalanceToMixture(df, col("id"), col("grp"),
        Seq("a" -> 500000L, "b" -> 500000L))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("grp"),
        r.getAs[Long]("rate_ppm")))
    val byGrp = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGrp("b") == 200, s"binding stratum must keep every row: $byGrp")
    assert(!byGrp.contains("extra"), "non-target stratum must drop entirely")
    val a = byGrp("a")
    assert(a > 130 && a < 270, s"~200 of 600 'a' rows expected, got $a")
    // the kept 'a' set is exactly the hashSample at the computed rate
    val rateA = out.collect { case (_, "a", r) => r }.head
    assert(rateA == 500000L * 400L / 600L)
    val nested = Sampling.hashSample(df.filter(col("grp") === "a"), col("id"), rateA)
      .collect().map(_.getLong(0)).toSet
    assert(out.collect { case (id, "a", _) => id }.toSet == nested)
    // a target stratum with no rows → mixture unachievable → empty
    assert(Sampling.rebalanceToMixture(df, col("id"), col("grp"),
      Seq("a" -> 500000L, "missing" -> 500000L)).count() == 0L)
    // shares must form a full distribution
    intercept[IllegalArgumentException](Sampling.rebalanceToMixture(
      df, col("id"), col("grp"), Seq("a" -> 300000L)))
  }

  test("quantileGate trims per-group tails; null groups band together; null values drop") {
    // group g: values 1..100 → p10=10.9, p90=90.1: keep 11..90;
    // null group: values 1..10 plus one null-value row
    val rows: Seq[(Long, String, java.lang.Long)] =
      (1 to 100).map(i => (i.toLong, "g", java.lang.Long.valueOf(i.toLong))) ++
        (101 to 110).map(i => (i.toLong, null: String,
          java.lang.Long.valueOf((i - 100).toLong))) :+
        ((111L, null: String, null: java.lang.Long))
    val df = rows.toDF("id", "grp", "v")
    val kept = Sampling.quantileGate(df, col("v"), col("grp"), 0.10, 0.90)
      .collect().map(r => r.getLong(0)).toSet
    val keptG = kept.filter(_ <= 100)
    assert(keptG == (11L to 90L).toSet, s"p10..p90 of 1..100 keeps 11..90: $keptG")
    // null group's own band: values 1..10, p10=1.9, p90=9.1 → keep 2..9
    val keptN = kept.filter(_ > 100)
    assert(keptN == (102L to 109L).toSet, s"null group trims its own tails: $keptN")
    assert(!kept.contains(111L), "null values never pass the gate")
    // degenerate band keeps everything non-null
    assert(Sampling.quantileGate(df, col("v"), col("grp"), 0.0, 1.0).count() == 110)
    // approx path agrees on this tiny domain
    val approx = Sampling.quantileGate(df, col("v"), col("grp"), 0.10, 0.90, exact = false)
      .collect().map(_.getLong(0)).toSet
    assert((approx & keptG).size >= keptG.size - 2, s"approx near exact: ${approx.size}")
    intercept[IllegalArgumentException](
      Sampling.quantileGate(df, col("v"), col("grp"), 0.9, 0.1))
  }

  test("sketchQuantileGate: exact order-statistic thresholds when n<=k; sampled path gates on the sample's order stats") {
    val df = (1 to 100).map(i => (i.toLong, "g", i.toLong)).toDF("id", "grp", "v")
    // n <= k: the sample IS the population — ceil-rank order statistics:
    // lo = ceil(10·100/100) = 10th value, hi = ceil(90·100/100) = 90th
    val kept = Sampling.sketchQuantileGate(df, col("id"), col("v"),
        col("grp"), 10, 90, k = 128)
      .collect().map(_.getLong(0)).toSet
    assert(kept == (10L to 90L).toSet, s"exact path keeps 10..90: $kept")
    // sampled path (k = 16): thresholds must be the ceil-rank order
    // statistics of the bottom-16-by-(h, v) sample, re-derived here
    // from the same engine hash
    val hv = df.select(col("v"),
        graft.functions.md5Long(col("id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    val sv = hv.sorted.take(16).map(_._2).sorted
    val (lo, hi) = (sv((10 * 16 + 99) / 100 - 1), sv((90 * 16 + 99) / 100 - 1))
    val kept16 = Sampling.sketchQuantileGate(df, col("id"), col("v"),
        col("grp"), 10, 90, k = 16)
      .collect().map(_.getLong(0)).toSet
    assert(kept16 == (lo to hi).toSet,
      s"sampled thresholds [$lo, $hi] must gate reproducibly: $kept16")
    intercept[IllegalArgumentException](
      Sampling.sketchQuantileGate(df, col("id"), col("v"), col("grp"), 90, 10))
  }

  test("clusterBalance equalizes planted skewed clusters; uniform shares sum exactly") {
    import graft.operators.Similarity
    // uniformSharesPpm: remainder goes to the first strata in sorted order
    val sh = Sampling.uniformSharesPpm(Seq("b", "a", "c"))
    assert(sh == Seq("a" -> 333334L, "b" -> 333333L, "c" -> 333333L))
    assert(sh.map(_._2).sum == Sampling.Ppm)
    intercept[IllegalArgumentException](Sampling.uniformSharesPpm(Seq("a", "a")))
    // two planted clusters, 10:1 skew
    val vecs = ((1L to 300L).map(i => (i, Seq(10.0f + (i % 7) * 0.01f, 1.0f))) ++
      (301L to 330L).map(i => (i, Seq(-10.0f - (i % 5) * 0.01f, 1.0f))))
      .toDF("id", "emb")
    val cents = Similarity.trainCentroids(vecs, k = 2, iters = 2)
    val assigned = Similarity.assignCells(vecs, cents).select(col("id"), col("cid"))
    val kept = Sampling.clusterBalance(assigned, col("id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCell = kept.groupBy(_._2)
    assert(byCell.size == 2, s"both cells must survive: ${byCell.keySet}")
    // binding (small) cluster keeps ALL 30 at rate 1e6; big cluster
    // downsamples at exactly 500000·60 div 300 = 100000 ppm
    val smallCell = assigned.filter(col("id") > 300).select("cid").head().getInt(0)
    val small = byCell(smallCell)
    assert(small.length == 30 && small.forall(_._3 == 1000000L),
      s"binding cluster keeps everything: ${small.length}")
    val big = byCell.keys.find(_ != smallCell).map(byCell).get
    assert(big.forall(_._3 == 100000L), s"big-cluster rate: ${big.head._3}")
    assert(big.length > 15 && big.length < 45,
      s"~30 of 300 expected at 100000 ppm: ${big.length}")
  }

  test("lengthBatches: descending lengths within shards, full batches, less padding than corpus order") {
    val df = (1L to 800L).map(i => (i, (i * 37 % 500) + 1)).toDF("k", "ntok")
    val a = Chunker.lengthBatches(df, "k", "ntok", batchSize = 16, shards = 4)
    val rows = a.select("k", "ntok", "shard", "batch_no", "batch_slot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 800)
    // within a shard, batch k's every length >= batch k+1's every length
    rows.groupBy(_._3).foreach { case (sh, rs) =>
      val byBatch = rs.groupBy(_._4).toSeq.sortBy(_._1)
      byBatch.sliding(2).foreach {
        case Seq((_, cur), (_, nxt)) =>
          assert(cur.map(_._2).min >= nxt.map(_._2).max,
            s"shard $sh batches not length-sorted")
        case _ =>
      }
      // all batches full except possibly the last
      byBatch.init.foreach { case (b, g) =>
        assert(g.length == 16, s"shard $sh batch $b not full: ${g.length}")
      }
      // slots are 0..n-1 within each batch
      byBatch.foreach { case (b, g) =>
        assert(g.map(_._5).sorted.toSeq == (0L until g.length).toSeq)
      }
    }
    // padding: sorted batching wastes strictly less than key-order batching
    def waste(assign: Map[Long, (Long, Long)], toks: Map[Long, Long]): Long =
      assign.groupBy(_._2).map { case (_, g) =>
        val ts = g.keys.toSeq.map(toks); ts.max * ts.length - ts.sum
      }.sum
    val toks = rows.map(r => r._1 -> r._2).toMap
    val sortedAssign = rows.map(r => r._1 -> ((r._3, r._4))).toMap
    val naiveAssign = rows.map(r => r._1 -> ((0L, (r._1 - 1) / 16))).toMap
    assert(waste(sortedAssign, toks) < waste(naiveAssign, toks) / 4,
      s"sorted batching must cut padding hard: ${waste(sortedAssign, toks)} vs ${waste(naiveAssign, toks)}")
    // deterministic under repartitioning
    val b = Chunker.lengthBatches(df.repartition(7), "k", "ntok", 16, 4)
      .select("k", "shard", "batch_no", "batch_slot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(b.toSeq == rows.map(r => (r._1, r._3, r._4, r._5)).sortBy(_._1).toSeq)
    // paddingReport mirrors the hand-computed waste
    val rep = Chunker.paddingReport(a, "ntok")
    assert(rep.agg(sum("pad_tokens")).head.getLong(0) == waste(sortedAssign, toks))
    intercept[IllegalArgumentException](Chunker.lengthBatches(df, "k", "ntok", 0, 4))
  }

  test("tokenBudgetSelect equals the global ordered-prefix rule; boundary bin splits mid-bin") {
    // bins of width 100: {1,2}=bin9, {3}=bin8, {4}=bin5, {5,8}=bin4
    // (the boundary bin — 5 selects, 8 does not), {6}=bin1, {7}=bin0
    val rows = Seq((1L, 900L, 10L), (2L, 900L, 10L), (3L, 850L, 5L),
      (4L, 500L, 20L), (5L, 450L, 6L), (8L, 450L, 3L),
      (6L, 100L, 50L), (7L, 90L, 1L))
    val out = Sampling.tokenBudgetSelect(rows.toDF("doc_id", "q", "ntok"),
        col("doc_id"), col("q"), col("ntok"), budgetNum = 1L, budgetDen = 2L,
        binWidth = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // naive replay of the oracle rule: (q desc, id) prefix, cum <= budget
    val budget = rows.map(_._3).sum * 1L / 2L
    var cum = 0L
    val expected = rows.sortBy(r => (-r._2, r._1)).map { case (id, _, n) =>
      cum += n; id -> (if (cum <= budget) 1L else 0L)
    }.toMap
    assert(out == expected, s"got $out, want $expected (budget $budget)")
    // the boundary bin really split: one selected, one not, same bin
    assert(out(5L) == 1L && out(8L) == 0L)
    // budget never exceeded, and the next doc IN ORDER would exceed it
    val spent = rows.filter(r => out(r._1) == 1L).map(_._3).sum
    assert(spent <= budget && spent + 3L > budget) // doc 8 is next in order
    intercept[IllegalArgumentException](Sampling.tokenBudgetSelect(
      rows.toDF("doc_id", "q", "ntok"), col("doc_id"), col("q"), col("ntok"),
      3L, 2L))
  }

  test("percentileCalibrate matches the rank formula; ties share min rank; singleton stratum is 0") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L),
      (4L, "a", 30L), (5L, "b", 7L), (6L, null.asInstanceOf[String], 9L))
    val out = Sampling.percentileCalibrate(rows.toDF("k", "s", "v"),
        col("k"), col("s"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // stratum a (n=4): 10 -> 0; 20,20 (min rank 2) -> 333333; 30 (rank 4) -> 1e6
    assert(out(1L) == 0L && out(2L) == 333333L && out(3L) == 333333L &&
      out(4L) == 1000000L, s"$out")
    assert(out(5L) == 0L, s"singleton stratum pct must be 0: $out")
    assert(!out.contains(6L), "null stratum drops")
  }

  test("maintainPrioritySample: maintained ≡ full, row for row") {
    val all = (1L to 40L).map(i => (i, 1L + i % 7)).toDF("id", "w")
    val b1 = all.filter(col("id") <= 25L)
    val b2 = all.filter(col("id") > 25L)
    val prior = Sampling.prioritySample(b1, col("id"), col("w"), k = 8)
    val maintained = Sampling
      .maintainPrioritySample(prior, b2, col("id"), col("w"), k = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val full = Sampling.prioritySample(all, col("id"), col("w"), k = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(maintained.toSeq == full.toSeq,
      s"maintained=${maintained.toSeq} full=${full.toSeq}")
  }

  test("prioritySampleByStratum: per-stratum cut ≡ global form run per stratum") {
    val df = (1L to 30L).map(i => (if (i % 3 == 0) "a" else "b", i, 1L + i % 5))
      .toDF("src", "id", "w")
    val byStratum = Sampling
      .prioritySampleByStratum(df, col("src"), col("id"), col("w"), k = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val perStratum = Seq("a", "b").flatMap { s =>
      Sampling.prioritySample(df.filter(col("src") === s), col("id"), col("w"),
          k = 4)
        .collect()
        .map(r => (s, r.getAs[Long]("rank"), r.getAs[Long]("id"),
          r.getAs[Long]("prio")))
    }.toSet
    assert(byStratum == perStratum, s"$byStratum vs $perStratum")
  }

  test("maintainPrioritySample: empty increment is the identity") {
    val all = (1L to 10L).map(i => (i, 2L)).toDF("id", "w")
    val prior = Sampling.prioritySample(all, col("id"), col("w"), k = 4)
    val kept = Sampling.maintainPrioritySample(prior,
        all.filter(col("id") < 0L), col("id"), col("w"), k = 4)
      .orderBy("rank").collect().map(_.toSeq)
    assert(kept.toSeq == prior.orderBy("rank").collect().map(_.toSeq).toSeq)
  }
}
