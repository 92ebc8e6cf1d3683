package graft

import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(df, col("doc_id"), col("text")).orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("keep_id") == 1L && out(0).getAs[Long]("n_dups") == 2L)
  }

  test("minhash LSH pairs identical and near-identical docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base), (2L, base),                       // identical → all bands match
      (3L, base + " extra"),                        // near dup → likely some band
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH bucket cap drops pathological all-identical buckets") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = (1L to 20L).map(i => (i, base)).toDF("doc_id", "text") // one hot bucket of 20
    val uncapped = Dedup.minhashLshPairs(df, "doc_id", "text").count()
    assert(uncapped == 20L * 19 / 2)
    val capped = Dedup.minhashLshPairs(df, "doc_id", "text", maxBucketSize = Some(5)).count()
    assert(capped == 0L)
  }

  test("simhash: identical texts equal, disjoint texts differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val m = Dedup.simhash(df, col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("suggestSimhashParams widens bands with corpus size; scaled params keep recall") {
    // band width must track log2(n): fixed bands make candidates grow
    // ~n²/2^bandBits (measured 101 s vs 12.5 s at 50k docs)
    def bandBits(n: Long) = { val (b, bands) = Dedup.suggestSimhashParams(n); b / bands }
    assert(bandBits(100) == 6 && bandBits(5000) == 12 && bandBits(50000) == 15)
    assert(Seq(100L, 1000L, 100000L, 10000000L).map(bandBits).sliding(2)
      .forall(p => p.head <= p.last), "band bits must widen monotonically")
    assert(bandBits(Long.MaxValue) == 15, "capped at md5Long's 60-bit ceiling")
    // non-default band counts must still respect the 60-bit total
    for (bands <- Seq(5, 6, 7, 10)) {
      val (bits, bs) = Dedup.suggestSimhashParams(Long.MaxValue, bands)
      assert(bs == bands && bits <= 60 && bits % bands == 0,
        s"bands=$bands gave bits=$bits")
    }
    intercept[IllegalArgumentException](Dedup.suggestSimhashParams(1000, bands = 61))
    // planted near-dups survive the suggested (wider-band) parameters
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((1L, base), (2L, base), (3L, base + " extra"),
      (4L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val (bits, bands) = Dedup.suggestSimhashParams(4)
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", bits, bands, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"identical docs must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"unrelated must not: $pairs")
  }

  test("suggestSignBits tracks log2(n), capped by dim and the mask width") {
    assert(Dedup.suggestSignBits(100, dim = 64) == 7)
    assert(Dedup.suggestSignBits(1000000, dim = 64) == 20)
    assert(Seq(100L, 10000L, 1000000L, 100000000L)
      .map(Dedup.suggestSignBits(_, 64)).sliding(2).forall(p => p.head <= p.last))
    assert(Dedup.suggestSignBits(1000000, dim = 8) == 8, "capped by the dimension")
    assert(Dedup.suggestSignBits(Long.MaxValue, dim = 64) == 30, "capped by the mask")
    assert(Dedup.suggestSignBits(1, dim = 64) == 4, "floor keeps buckets meaningful")
    // planted near-dup pair survives the suggested width at small n
    val emb = Seq(
      (1L, Seq(1.0f, 0.9f, 0.8f, 1.0f)), (2L, Seq(0.9f, 1.0f, 0.9f, 0.9f)),
      (3L, Seq(-1.0f, -0.8f, -0.9f, -1.0f))).toDF("id", "emb")
    val bits = Dedup.suggestSignBits(3, dim = 4)
    val pairs = Dedup.embeddingNearDups(emb, "id", "emb", 0.9, signBits = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"aligned pair must survive: $pairs")
  }

  test("semanticDedup groups within-cell near-dups and keeps one rep per group") {
    // ids 1/2 seed the two cells (A=(1,0,0,0), B=(0,0,1,0)); 3 and 5
    // duplicate the prototypes, 4 and 6 share a cell but sit below the
    // 0.95 cosine threshold
    val emb = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f)), (2L, Seq(0f, 0f, 1.0f, 0f)),
      (3L, Seq(1.0f, 0f, 0f, 0f)), (4L, Seq(0.6f, 0.8f, 0f, 0f)),
      (5L, Seq(0f, 0f, 1.0f, 0f)), (6L, Seq(0f, 0f, 0.6f, 0.8f)))
      .toDF("id", "emb")
    val cents = Similarity.trainCentroids(emb, k = 2, iters = 1)
    val out = Dedup.semanticDedup(emb, cents, threshold1e6 = 950000L)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (1L, 1L) && out(3L) == (1L, 0L), s"A group: $out")
    assert(out(2L) == (2L, 1L) && out(5L) == (2L, 0L), s"B group: $out")
    assert(out(4L) == (4L, 1L) && out(6L) == (6L, 1L), "sub-threshold rows keep themselves")
    assert(out.values.count(_._2 == 1L) == 4, "exactly one survivor per group + singletons")
  }

  test("segmentDedup drops later duplicate segments and reassembles docs in order") {
    val segs = Seq(
      (1L, 0L, "alpha"), (1L, 1L, "beta"),
      (2L, 0L, "alpha"), (2L, 1L, "gamma"), // alpha seen in doc 1 → drops
      (3L, 0L, "beta"), (3L, 1L, "beta"),   // both drop (doc 1 owns beta)
      (4L, 0L, "delta"), (4L, 1L, "delta")) // in-doc dup: first survives
      .toDF("id", "seg_no", "seg")
    val out = Dedup.segmentDedup(segs).orderBy("id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ("alpha beta", 2L, 2L), s"doc1: $out")
    assert(out(2L) == ("gamma", 1L, 2L), s"doc2: $out")
    assert(out(3L) == ("", 0L, 2L), "fully-duplicated doc keeps an empty text")
    assert(out(4L) == ("delta", 1L, 2L), "within-doc dup keeps only the first")
  }

  test("duplicatedSpans merges overlapping dup positions into maximal spans") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox runs fast today ok fine"),  // shares one 3-gram with 1
      (3L, "x y z x y z x y z"),                          // in-doc repetition: fully covered
      (4L, "totally unique words nothing here matches anything at all"),
      (5L, "quick brown fox gap1 gap2 gap3 gap4 x y z")   // two separate spans
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(!out.contains(4L), "doc without any repeated gram is absent")
    assert(out(1L) == (9L, 1L, 3L, 333333L), s"doc1 one 3-token span: $out")
    assert(out(2L) == (9L, 1L, 3L, 333333L), s"doc2 mirrors doc1: $out")
    assert(out(3L) == (9L, 1L, 9L, 1000000L), "overlapping positions merge into full coverage")
    assert(out(5L) == (10L, 2L, 6L, 600000L), "gap beyond n-1 splits spans")
  }

  test("removeDuplicatedSpans cuts every covered token and reassembles the rest") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox runs fast today ok fine"),
      (3L, "x y z x y z x y z"),
      (4L, "totally unique words nothing here matches anything at all"),
      (5L, "quick brown fox gap1 gap2 gap3 gap4 x y z")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("the jumps over the lazy dog", 9L, 3L)), s"doc1: $out")
    assert(out(3L) == (("", 9L, 9L)), "fully-duplicated doc empties")
    assert(out(4L) == (("totally unique words nothing here matches anything at all", 9L, 0L)),
      "untouched doc reassembles verbatim")
    assert(out(5L) == (("gap1 gap2 gap3 gap4", 10L, 6L)), s"two spans cut: $out")
    assert(out.size == 5, "every corpus doc is present")
  }

  test("unigramSurprisal: exact floor-log2 bits, rare tokens score higher") {
    // corpus: a×5, b×3, c×1 → N=9 (4 bits); s(a)=4-3=1, s(b)=4-2=2, s(c)=4-1=3
    val docs = Seq((1L, "a a a b"), (2L, "a a b b"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 5L, 1250000L)), s"doc1: $out")   // 3·1+1·2=5
    assert(out(2L) == ((4L, 6L, 1500000L)), s"doc2: $out")   // 2·1+2·2=6
    assert(out(3L) == ((1L, 3L, 3000000L)), s"rare-only doc scores highest: $out")
    assert(out(3L)._3 > out(1L)._3, "rarity ordering")
  }

  test("temperatureSample flattens the mixture toward sqrt(n) shares") {
    import graft.operators.Sampling
    // 900 'big' vs 100 'small': raw shares 90/10, sqrt-weights 30/10
    // → target shares 75/25 of the budget
    val docs = (0 until 900).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "small"))
    val df = docs.toDF("doc_id", "source")
    val out = Sampling.temperatureSample(df, col("doc_id"), col("source"), budget = 200L)
    val rates = out.select("source", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_big=30, w_small=10, sw=40: big → 200e6·30/(40·900)=166666,
    // small → 200e6·10/(40·100)=500000
    assert(rates("big") == 166666L && rates("small") == 500000L, s"rates: $rates")
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expectation 150/50; allow hash-sampling noise, require flattening
    val bigShare = kept("big").toDouble / (kept("big") + kept("small"))
    assert(bigShare < 0.88, s"flattened below the raw 90% share: $kept")
    assert(kept("small") > 100 * 0.25, s"tail source lifted: $kept")
  }

  test("bigramSurprisal: conditional bits from exact integer log2s") {
    // corpus (docs with >=2 tokens): d1 'a b a b', d2 'a b'
    // unigrams a=3? no: a appears 2+1=3, b=2+1=3 → bin len 2
    // bigrams 'a b'×3 (bin len 2), 'b a'×1 (len 1)
    // s(a b)=2-2=0, s(b a)=2-1=1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!out.contains(3L), "single-token docs drop")
    assert(out(1L) == ((3L, 1L, 333333L)), s"d1: $out") // 0+1+0 over 3 pairs
    assert(out(2L) == ((1L, 0L, 0L)), s"d2: $out")
  }

  test("contaminationReport: overlap share and deterministic sample gram") {
    import graft.operators.Decontaminate
    val corpus = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("b c d")).toDF("text")
    val out = Decontaminate.contaminationReport(corpus, "doc_id", "text",
        bench, "text", n = 2).collect()
    assert(out.length == 1, s"only the overlapping doc reports: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 500000L, s"1 of 2 grams shared: $r")
    assert(r.getString(4) == "b c")
  }

  test("corpusHealth: dup-aware distinct counts, token totals, exact median") {
    import graft.operators.Diagnostics
    val docs = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y y"),
      (4L, "b", "p q r"))
      .toDF("doc_id", "source", "text")
    val out = Diagnostics.corpusHealth(docs, col("source"), col("doc_id"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((3L, 2L, 4L, 1000000L)), s"source a: $out") // median of 1,1,2
    assert(out("b") == ((1L, 1L, 3L, 3000000L)), s"source b: $out")
  }

  test("keepBestOfCluster keeps the top-scoring member; singletons keep themselves") {
    val scored = Seq((1L, 50L), (2L, 90L), (3L, 90L), (4L, 70L), (9L, 10L))
      .toDF("id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("id", "cluster_id")
    val out = Dedup.keepBestOfCluster(scored, clusters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cluster 1: scores 50/90/90 — tie breaks to the smaller id (2)
    assert(out(2L) == ((1L, 90L, 1L)) && out(3L) == ((1L, 90L, 0L)) &&
      out(1L) == ((1L, 50L, 0L)), s"best-of with tie: $out")
    // single-member cluster and unclustered singleton both keep
    assert(out(4L) == ((4L, 70L, 1L)), s"solo cluster: $out")
    assert(out(9L) == ((9L, 10L, 1L)), s"singleton keeps itself: $out")
    assert(out.values.count(_._3 == 1L) == 3)
  }

  test("cdcChunks partitions the token stream; cdcDedupReport: exact-dup mass, insertion resilience, empty doc") {
    val a = (0 until 240).map(i => s"tok$i").mkString(" ")
    val b = ((0 until 6).map(i => s"tok$i") ++ Seq("inserted") ++
      (6 until 240).map(i => s"tok$i")).mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, b), (4L, "")).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", mask = 16)
      .groupBy("id").agg(sum("n_words").as("nw"), count(lit(1)).as("nc"),
        min("chunk_no").as("mn"), max("chunk_no").as("mx"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // chunks partition the token stream, numbered contiguously from 0
    assert(ch(1L)._1 == 240L && ch(3L)._1 == 241L, s"word mass: $ch")
    assert(ch(1L)._3 == 0L && ch(1L)._4 == ch(1L)._2 - 1, s"contiguous: $ch")
    assert(!ch.contains(4L), "empty doc emits no chunks")
    val rep = Dedup.cdcDedupReport(docs, "doc_id", "text", mask = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // identical docs: every chunk occurs >= 2x -> the full word mass is dup
    assert(rep(1L)._2 == 240L && rep(1L)._4 == 240L, s"exact-dup mass: $rep")
    // insertion: content-defined cuts re-synchronize -> shared tail chunks
    assert(rep(3L)._4 > 0L, s"CDC must re-sync after an insertion: ${rep(3L)}")
    // fixed-window contrast is structural: chunkByTokens at any width w
    // would misalign every window after position 6 (off-by-one forever)
    assert(rep(4L) == ((0L, 0L, 0L, 0L)), s"empty doc zeros: ${rep.get(4L)}")
  }

  test("tokenizerFertility: hand-computed ratios; empty source yields NULL ratios") {
    import graft.operators.Diagnostics
    // merge (a,b): "ab"→1 subword, "cd"→2; doc "ab ab cd": ws=3,
    // bpe=1+1+2=4, chars=8 → fertility 4e6/3, chars/tok 2e6
    val docs = Seq((1L, "x", "ab ab cd"), (2L, "y", "")).toDF("doc_id", "source", "text")
    val out = Diagnostics.tokenizerFertility(docs, col("source"), col("text"),
        Seq(("a", "b")))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)) ==
      ((1L, 3L, 4L, 8L)), s"source x sums: $x")
    assert(x.getLong(5) == 1333333L && x.getLong(6) == 2000000L, s"x ratios: $x")
    val y = out("y")
    assert(y.isNullAt(5) && y.isNullAt(6), s"empty source must yield NULL ratios: $y")
  }

  test("vocabReport: rank/share/cumulative-share head, hand-computed") {
    import graft.operators.Diagnostics
    // 10 tokens total: a×5, b×3, c×1, d×1 (case-folded)
    val docs = Seq((1L, "A a a b B"), (2L, "a a b c d")).toDF("doc_id", "text")
    val out = Diagnostics.vocabReport(docs, col("text"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a", 5L, 500000000L, 500000000L),
      (2L, "b", 3L, 300000000L, 800000000L),
      (3L, "c", 1L, 100000000L, 900000000L)), s"head: ${out.toSeq}")
    // tie at n=1 breaks by term: c before d, so the top-3 cut is total
    val out4 = Diagnostics.vocabReport(docs, col("text"), topK = 4)
      .collect().map(_.getString(1))
    assert(out4.toSeq == Seq("a", "b", "c", "d"))
    intercept[IllegalArgumentException](Diagnostics.vocabReport(docs, col("text"), 0))
  }

  test("dsirWeights: exact bit arithmetic ranks target-like docs above off-domain") {
    import graft.operators.TextAnalysis
    // corpus tokens: en×3, xx, yy (N_C=5); target: en×3 (N_T=3)
    // normalizer bits(6)-bits(4) = 0; s(en) = bits(4)-bits(4) = 0;
    // s(xx) = s(yy) = bits(1)-bits(2) = -1
    val corpus = Seq((1L, "en en en"), (2L, "xx yy")).toDF("doc_id", "text")
    val target = Seq(Tuple1("en en en")).toDF("text")
    val out = TextAnalysis.dsirWeights(corpus, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((3L, 0L, 0L)), s"target-like doc: $out")
    assert(out(2L) == ((2L, -2L, -1000000L)), s"off-domain doc: $out")
  }

  test("dsirSelect keeps the top score band; threshold ties keep; topShare=1 keeps all") {
    import graft.operators.TextAnalysis
    // 8 on-domain docs + 24 off-domain docs of COMMON off-tokens (a
    // corpus-rare token beats a target token under add-one smoothing
    // — rarity is information — so the off side must be frequent to
    // score below the target-like docs): s(en)=2, s(xx|yy|zz)=0
    val corpus = ((1L to 8L).map(i => (i, "en en en")) ++
      (9L to 32L).map(i => (i, "xx yy zz"))).toDF("doc_id", "text")
    val target = Seq(Tuple1("en en en")).toDF("text")
    val kept = TextAnalysis.dsirSelect(corpus, "doc_id", "text", target, "text",
        topShare = 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 8L).toSet, s"top quartile must be the on-domain docs: $kept")
    // ties at the threshold keep: every on-domain doc scores identically
    val all = TextAnalysis.dsirSelect(corpus, "doc_id", "text", target, "text", 1.0)
    assert(all.count() == 32L, "topShare=1 keeps the whole corpus")
    intercept[IllegalArgumentException](
      TextAnalysis.dsirSelect(corpus, "doc_id", "text", target, "text", 0.0))
  }

  test("winnowingFingerprints: gap bound holds and shared runs share a fingerprint") {
    import graft.operators.TextAnalysis
    val shared = "alpha beta gamma delta epsilon zeta"  // w+n-1 = 6 tokens
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight nine ten"),
      (2L, s"red green blue $shared cyan magenta yellow black white pink grey"),
      (3L, "totally disjoint vocabulary with no overlap whatsoever here at all ok"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs, "doc_id", "text", n = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    // winnowing guarantee: one selection per window → consecutive
    // fingerprint positions never gap by more than w
    byDoc.values.foreach { ps =>
      ps.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= 4, s"gap $a→$b")
        case _ =>
      }
      assert(ps.head <= 3, "a fingerprint lands in the first window")
    }
    val h = (d: Long) => fps.filter(_._1 == d).map(_._2).toSet
    assert((h(1L) & h(2L)).nonEmpty, "shared >= w+n-1 run guarantees a shared fingerprint")
    assert((h(1L) & h(3L)).isEmpty && (h(2L) & h(3L)).isEmpty, "disjoint docs share nothing")
  }

  test("winnowingPairs pairs shared-run docs; the df cap drops boilerplate hashes") {
    import graft.operators.TextAnalysis
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight nine ten"),
      (2L, s"red green blue $shared cyan magenta yellow black white pink grey"),
      (3L, "totally disjoint vocabulary with no overlap whatsoever here at all ok"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowingPairs(docs, "doc_id", "text",
        n = 3, w = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"only the shared-run pair: $pairs")
    assert(pairs((1L, 2L)) >= 1L)
    // every shared hash appears in exactly 2 docs → a df cap of 1 kills all pairs
    val capped = TextAnalysis.winnowingPairs(docs, "doc_id", "text",
        n = 3, w = 4, minShared = 1L, maxHashDf = Some(1))
    assert(capped.count() == 0L, "df cap drops cross-doc hashes")
  }

  test("phraseSearch matches only consecutive tokens; repeated slots vote per slot") {
    import graft.operators.TextSearch
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat again"),
      (2L, "cat sat the on mat"),  // all terms present, never consecutive
      (3L, "a b a b a"))           // overlapping matches of a repeated-slot phrase
      .toDF("doc_id", "text")
    val out = TextSearch.phraseSearch(docs, "doc_id", "text",
        Seq("the cat sat", "a b a"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(("the cat sat", 1L)) == ((2L, 0L)), s"two starts in doc1: $out")
    assert(!out.contains(("the cat sat", 2L)), "scattered tokens don't match")
    assert(out(("a b a", 3L)) == ((2L, 0L)), s"overlapping repeated-slot matches: $out")
    assert(out.size == 2, s"no other rows: $out")
  }

  test("nearDupContaminated flags paraphrased eval leakage above the Jaccard gate") {
    import graft.operators.Decontaminate
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, base),                       // verbatim leak
      (2L, base + " trailing extra"),   // paraphrase-ish: high overlap
      (3L, "wholly unrelated words that never appear in any benchmark item at all"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val out = Decontaminate.nearDupContaminated(
        corpus, "doc_id", "text", bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 100L)) == 1000000L, s"verbatim leak at jaccard 1: $out")
    assert(out.contains((2L, 100L)) && out((2L, 100L)) >= 900000L,
      s"near-verbatim leak flagged: $out")
    assert(!out.keySet.map(_._1).contains(3L), "unrelated doc not flagged")
  }

  test("sourceGramOverlap counts shared distinct grams per source pair") {
    import graft.operators.Diagnostics
    val docs = Seq(
      ("s1", "a b c"), ("s2", "b c d"), ("s2", "a b q"), ("s3", "z z"))
      .toDF("source", "text")
    val out = Diagnostics.sourceGramOverlap(docs, col("text"), col("source"), n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // s1 grams {a b, b c}; s2 grams {b c, c d, a b, b q}; s3 {z z}
    assert(out == Map(("s1", "s2") -> 2L), s"matrix: $out")
  }

  test("suggestSemanticCells: exact integer floor-sqrt, bounded, monotone") {
    assert(Dedup.suggestSemanticCells(1) == 8, "floor keeps cells meaningful")
    assert(Dedup.suggestSemanticCells(100) == 10)
    assert(Dedup.suggestSemanticCells(99) == 9, "exact at perfect-square edges")
    assert(Dedup.suggestSemanticCells(2000) == 44)
    assert(Dedup.suggestSemanticCells(20000) == 141)
    assert(Dedup.suggestSemanticCells(100000000L) == 4096, "capped for broadcast")
    assert(Seq(100L, 10000L, 1000000L, 100000000L)
      .map(Dedup.suggestSemanticCells).sliding(2).forall(p => p.head <= p.last))
    // adaptive cells reproduce the fixed-k grouping on a planted corpus
    val emb = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f)), (2L, Seq(0f, 0f, 1.0f, 0f)),
      (3L, Seq(1.0f, 0f, 0f, 0f)), (4L, Seq(0f, 0f, 1.0f, 0f)))
      .toDF("id", "emb")
    val k = Dedup.suggestSemanticCells(4)
    val cents = Similarity.trainCentroids(emb, k = math.min(k, 4), iters = 1)
    val out = Dedup.semanticDedup(emb, cents, 950000L).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L), s"groups: $out")
  }

  test("curateV2 layers repetition and decontamination gates over curate") {
    import graft.operators.Curation
    // quality gate needs len>=100 and some stopwords; build docs that
    // pass curate's gates, then differ only on the NEW v2 gates
    // clean survivor: >=100 chars, stopword-dense, all 3-grams distinct
    val good = "the quick data table is in it for a full scan and the merge " +
      "of sorted rows with many unique extra words spread out to reach enough length"
    val repeaty = ("the data the data " * 10).trim + " it is for a scan" // high 3-gram repetition
    // distinct wording (NOT a near-dup of `good` — LSH would cluster it
    // away before the v2 gates run), non-repetitive, embeds bench grams
    val leaked = "a scan runs on the big table for it is of the data row and " +
      "columns in a stream that keeps going until the unique leaked benchmark phrase here"
    val docs = Seq((1L, good), (2L, repeaty), (3L, leaked)).toDF("doc_id", "text")
    val bench = Seq((100L, "unique leaked benchmark phrase here")).toDF("doc_id", "text")
    val v1 = Curation.curate(docs).collect().map(_.getAs[Long]("doc_id")).toSet
    assume(v1 == Set(1L, 2L, 3L), s"all three must survive curate: $v1")
    val v2 = Curation.curateV2(docs, bench)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(v2 == Set(1L), s"repetition and contamination must drop 2 and 3: $v2")
  }

  test("curateV3 keeps the best-quality near-dup member and applies the token-budget cut") {
    import graft.operators.Curation
    val base = "the quick data table is in it for a full scan and the merge " +
      "of sorted rows with many unique extra words spread out to reach enough length"
    val good2 = "a wide report of the files is it for the user and the state " +
      "of parsed notes with calm plain other terms laid out to reach enough size"
    val repeaty = ("the data the data " * 10).trim + " it is for a scan"
    val leaked = "a scan runs on the big table for it is of the data row and " +
      "columns in a stream that keeps going until the unique leaked benchmark phrase here"
    // {1, 5} are near-dups (one appended token); 1 has the digit
    // penalty, so 5 — the LARGER id — is the better-quality member
    val docs = Seq((1L, base + " 77"), (5L, base), (4L, good2),
      (2L, repeaty), (3L, leaked)).toDF("doc_id", "text")
    val bench = Seq((100L, "unique leaked benchmark phrase here")).toDF("doc_id", "text")
    val all = Curation.curateV3(docs, bench, budgetNum = 1L, budgetDen = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // best-of keeps 5 (not min-id 1); repetition drops 2, decontam drops 3
    assert(all.map(_._1).toSet == Set(4L, 5L), s"v3 survivors: ${all.toSeq}")
    // tight budget: survivors cut to the (quality desc, id) token prefix
    val budget = all.map(_._3).sum / 2
    var cum = 0L
    val expect = all.sortBy(t => (-t._2, t._1))
      .takeWhile { t => cum += t._3; cum <= budget }.map(_._1).toSet
    val cut = Curation.curateV3(docs, bench, budgetNum = 1L, budgetDen = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(cut == expect, s"budget cut: $cut vs $expect")
  }

  test("hardNegatives ranks lexical matches but never near-dups of the seed") {
    import graft.operators.Retrieval
    // 14 distinct terms — UNDER the 16-term MoreLikeThis cap, so the
    // df-prune keeps the hardNeg-shared terms too
    val seed = "zephyr quartz marble onyx travertine granite slate basalt " +
      "pumice obsidian limestone gneiss schist shale"
    val nearDup = seed + " extra" // one appended token -> LSH near-dup
    val hardNeg = "zephyr quartz marble onyx pebble gravel sand clay silt " +
      "loam dust mica feldspar quartzite dolomite gypsum talc calcite halite"
    val unrelated = "apples pears plums cherries grapes melons figs dates " +
      "kiwis mangos papayas guavas lychees quinces apricots nectarines"
    val docs = Seq((10L, seed), (2L, nearDup), (3L, hardNeg), (4L, unrelated))
      .toDF("doc_id", "text")
    val out = Retrieval.hardNegatives(docs, "doc_id", "text",
        docs.filter(col("doc_id") === 10L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.forall(_._1 == 10L), s"one seed only: ${out.toSeq}")
    val negs = out.sortBy(_._3).map(_._2).toSeq
    assert(!negs.contains(2L), s"near-dup must be excluded: $negs")
    assert(!negs.contains(10L), s"seed excludes itself: $negs")
    assert(negs.headOption.contains(3L),
      s"the term-sharing non-dup must rank first: $negs")
  }

  test("minhashJaccardEstimate: exact-dup pairs estimate 1e6; near-dups track exact") {
    val a = (0 until 60).map(i => s"m$i").mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, a + " tail")).toDF("doc_id", "text")
    val out = Dedup.minhashJaccardEstimate(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // identical docs: identical signatures AND identical shingle sets
    assert(out((1L, 2L)) == ((1000000L, 1000000L)), s"exact pair: $out")
    // near-dup: exact J = 58/59; k=16 estimate within its error band
    val (est, exact) = out((1L, 3L))
    assert(exact > 900000L, s"planted near-dup must have high exact J: $exact")
    assert((est - exact).abs <= 400000L, s"estimate tracks exact: $est vs $exact")
  }

  test("sourceNearDupMatrix counts unordered source pairs; diagonal is intra-source") {
    import graft.operators.Diagnostics
    val t0 = (0 until 40).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, t0, "web"), (2L, t0 + " x", "web"),
      (3L, t0 + " y", "books"),
      (9L, "totally different other words entirely here now", "web"))
      .toDF("doc_id", "text", "source")
    val out = Diagnostics.sourceNearDupMatrix(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: (1,2) web-web; (1,3), (2,3) books-web — one unordered key
    assert(out(("web", "web")) == 1L && out(("books", "web")) == 2L, s"$out")
    assert(!out.contains(("web", "books")), s"orientation must normalize: $out")
  }

  test("deboilerplate drops high-df chunks and reassembles survivors in order") {
    val uniq = (0 until 50).map(i => s"u$i").mkString(" ")
    val boiler = (0 until 40).map(i => s"f$i").mkString(" ")
    val docs = Seq((1L, uniq), (2L, boiler), (3L, boiler), (4L, boiler))
      .toDF("doc_id", "text")
    val out = Dedup.deboilerplate(docs, "doc_id", "text", maxDf = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // the unique doc's chunks all have occ=1 -> verbatim reassembly
    // (order included: a reordered reassembly would not equal the input)
    assert(out(1L)._1 == uniq, s"unique doc reassembles in order: ${out(1L)}")
    // 3x-duplicated content: every chunk has occ=3 > maxDf -> empty
    assert(Seq(2L, 3L, 4L).forall(id => out(id) == (("", 0L))),
      s"3x boilerplate must vanish: $out")
  }

  test("repetitionRatio measures duplicate n-gram mass; short docs are 0") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),   // all 3-grams identical
      (2L, "all words here are fully distinct tokens"),
      (3L, "one two"),                          // < n tokens → no grams
      (4L, null: String)).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.75, s"4 grams, 1 distinct -> 0.75: ${out(1L)}")
    assert(out(2L) == 0.0 && out(3L) == 0.0 && out(4L) == 0.0)
  }

  test("decontamination flags docs sharing n-grams with the benchmark set") {
    import graft.operators.Decontaminate
    val bench = Seq((100L, "the capital of france is paris obviously")).toDF("id", "text")
    val corpus = Seq(
      (1L, "quiz answer the capital of france is paris so there"), // 4 shared 3-grams
      (2L, "unrelated content about something else entirely here"),
      (3L, "of france is")).toDF("doc_id", "text")                 // 1 shared 3-gram
    val out = Decontaminate.sharedNgrams(corpus, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "the capital of", "capital of france", "of france is",
    // "france is paris" — 4 distinct grams; doc 3 shares exactly one
    assert(out == Map(1L -> 4L, 3L -> 1L), s"got $out")
    // minShared thresholds out the single-gram doc
    val strict = Decontaminate.sharedNgrams(corpus, "doc_id", "text", bench, "text",
        n = 3, minShared = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
    // wider grams are stricter: no shared 7-gram exists
    assert(Decontaminate.sharedNgrams(corpus, "doc_id", "text", bench, "text", n = 7)
      .count() == 0L)
    intercept[IllegalArgumentException](
      Decontaminate.sharedNgrams(corpus, "doc_id", "text", bench, "text", n = 0))
  }

  test("decontaminatedSplit quarantines exactly the train docs overlapping the held-out side") {
    import graft.operators.{Decontaminate, Sampling}
    // every 7th doc carries one common sentence → once any of them
    // lands in val/test, its train siblings must quarantine; the rest
    // are per-doc unique and must keep their split untouched
    val docs = spark.range(0, 300).selectExpr("id AS doc_id",
      """CASE WHEN id % 7 = 0 THEN 'shared leak sentence appears verbatim here'
              ELSE concat('unique doc ', id, ' noise tokens ', id * 31) END AS text""")
    val out = Decontaminate.decontaminatedSplit(
        docs, "doc_id", "text", Sampling.DemoSplits)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 300)
    // replay expectations locally from the operator's own split labels
    val labels = docs.select(col("doc_id"),
        Sampling.splitLabel(col("doc_id"), Sampling.DemoSplits).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val leakHeld = (0L until 300L).exists(i => i % 7 == 0 && labels(i) != "train")
    assert(leakHeld, "fixture must place at least one leak doc in val/test")
    out.foreach { case (id, split, nShared) =>
      if (labels(id) != "train") {
        assert(split == labels(id) && nShared == 0L,
          s"held-out doc $id must keep its split: ($split, $nShared)")
      } else if (id % 7 == 0) {
        assert(split == "quarantined" && nShared > 0L,
          s"leaked train doc $id must quarantine: ($split, $nShared)")
      } else {
        assert(split == "train" && nShared == 0L,
          s"clean train doc $id must stay train: ($split, $nShared)")
      }
    }
    intercept[IllegalArgumentException](Decontaminate.decontaminatedSplit(
      docs, "doc_id", "text", Sampling.DemoSplits, trainLabel = "nope"))
  }

  test("bloom-prefiltered decontamination equals the exact path; bloom prunes below the shuffle") {
    import graft.operators.Decontaminate
    val bench = spark.range(0, 20)
      .selectExpr("id", "concat('bench phrase number ', id, ' with shared words') AS text")
    val corpus = spark.range(0, 200).selectExpr("id AS doc_id",
      // every 10th doc embeds a benchmark phrase; the rest are unique noise
      """CASE WHEN id % 10 = 0
           THEN concat('leaked copy bench phrase number ', id / 10, ' with shared words inside')
           ELSE concat('clean document ', id, ' noise ', id * 7, ' tokens ', id * 13)
         END AS text""")
    val exact = Decontaminate.sharedNgrams(corpus, "doc_id", "text", bench, "text", n = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = Decontaminate.sharedNgramsBloom(corpus, "doc_id", "text", bench, "text", n = 3)
    val got = bloom.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact, s"bloom path diverged: $got vs $exact")
    assert(exact.nonEmpty, "planted leaks must be flagged")
    // plan shape, with auto-broadcast off to model a bench gram set too
    // big to broadcast: the confirm join is a shuffle join, and every
    // might_contain filter sits BELOW any exchange (shuffles only see
    // the pruned stream). AQE may still re-plan tiny sides at runtime —
    // the static plan is what's pinned.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val scalePlan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Decontaminate.sharedNgramsBloom(corpus, "doc_id", "text", bench, "text", n = 3)
        .queryExecution.sparkPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val bloomFilters = scalePlan.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f }
    assert(bloomFilters.nonEmpty, s"no bloom filter in plan:\n$scalePlan")
    assert(bloomFilters.forall(_.collect { case e: ShuffleExchangeExec => e }.isEmpty),
      s"bloom filters must run below every shuffle:\n$scalePlan")
    assert(scalePlan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
      s"confirm join should be the shuffle-join scale path:\n$scalePlan")
    // pruning power: far fewer grams survive the bloom than exist — the
    // stream entering the shuffle is ~the true-overlap stream
    val allGrams = corpus.select(explode(shingles(col("text"), 3))).count()
    val survivors = corpus
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("gram"))
      .filter(graft.expressions.Bloom.mightContain(
        benchBloomBytes(bench, 3), col("gram")))
      .count()
    assert(survivors < allGrams / 2,
      s"bloom should prune most grams: $survivors of $allGrams survived")
  }

  /** Build the bench bloom exactly as sharedNgramsBloom does (kept in
    * the spec so the pruning measurement can't drift from the operator).
    */
  private def benchBloomBytes(bench: org.apache.spark.sql.DataFrame, n: Int): Array[Byte] = {
    val bsh = bench.select(explode(shingles(col("text"), n)).as("gram")).distinct()
    val items = math.max(bsh.count(), 1L)
    bsh.agg(graft.expressions.Bloom.agg(col("gram"), items,
        graft.expressions.Bloom.optimalNumBits(items, 0.01)).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  test("editDistancePairs finds typo'd name pairs via trigram blocking; skew valve works") {
    import graft.operators.FuzzyJoin
    val df = Seq(
      (1L, "Johnathan Smithers"),
      (2L, "Jonathan Smithers"),     // 1 edit from id 1
      (3L, "JOHNATHAN  SMITHERS"),   // 0 edits after lower (inner spaces differ → 1 edit)
      (4L, "Margaret Thistlewood"),  // unrelated
      (5L, "Margeret Thistlewood")   // 1 edit from id 4
    ).toDF("id", "name")
    val out = FuzzyJoin.editDistancePairs(df, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) == 1L, s"typo pair must match: $out")
    assert(out.contains((4L, 5L)) && out((4L, 5L)) == 1L)
    assert(out.contains((1L, 3L)), "case/space variant within 2 edits")
    assert(!out.exists { case ((a, b), _) => Set(a, b) == Set(1L, 4L) },
      s"unrelated names must not pair: $out")
    // skew valve: dropping ubiquitous grams loses pairs whose only
    // shared grams are ubiquitous — here every gram of the matching
    // pairs is rare, so a generous cap changes nothing
    val capped = FuzzyJoin.editDistancePairs(df, "id", "name", maxDist = 2,
        maxGramDf = Some(4L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == out.keySet, s"generous cap must not lose pairs: $capped")
    intercept[IllegalArgumentException](
      FuzzyJoin.editDistancePairs(df, "id", "name", maxDist = -1))

    // two-table linkage: a typo'd registry links to its master record
    val master = Seq((10L, "Johnathan Smithers"), (11L, "Margaret Thistlewood"))
      .toDF("mid", "mname")
    val dirty = Seq((20L, "Jonathan Smithers"), (21L, "Margret Thistlewood"),
      (22L, "Completely Unrelated")).toDF("did", "dname")
    val linked = FuzzyJoin.editDistanceJoin(master, "mid", "mname",
        dirty, "did", "dname", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(linked == Set((10L, 20L), (11L, 21L)),
      s"each dirty record links to exactly its master: $linked")
  }

  test("normalized dedup collapses re-punctuated copies; containment beats jaccard on subsets") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "Hello, World! This is   fine."),
      (2L, "hello world this is fine"),        // same after normalization
      (3L, "Entirely different content here.")).toDF("doc_id", "text")
    val groups = Dedup.exact(docs, col("doc_id"),
        TextAnalysis.normalizeForDedup(col("text")))
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dups")).toMap
    assert(groups == Map(1L -> 2L, 3L -> 1L),
      s"punctuation/case/whitespace variants must collapse: $groups")
    // containment: doc 5 (a strict subset) scores ~1 against its host
    // even though jaccard is diluted by the host's extra grams
    val sub = Seq(
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val pairs = Seq((4L, 5L)).toDF("id_a", "id_b")
    val c = Dedup.ngramContainment(sub, "doc_id", "text", pairs, 3).collect()(0)
    assert(c.getAs[Long]("cont_b_1e6") == 1000000L,
      "the subset's grams are fully contained in the host")
    assert(c.getAs[Long]("cont_a_1e6") < 500000L,
      "the host is not contained in the subset")
    val j = Dedup.ngramJaccard(sub, "doc_id", "text", pairs, 3)
      .collect()(0).getAs[Double]("jaccard")
    assert(j < 0.5, s"jaccard under-scores the subset relationship: $j")
  }

  test("ngram jaccard: identical=1e6, disjoint=0") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(df, "doc_id", "text", pairs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) == 0.0)
  }

  test("brute-force topk finds the nearest vector and excludes self") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "emb")
    val q = vecs.filter($"id" === 1L)
    val out = Similarity.bruteForceTopK(vecs, q, k = 2).orderBy("rank").collect()
    assert(out(0).getAs[Long]("neighbor_id") == 2L)
    assert(!out.map(_.getAs[Long]("neighbor_id")).contains(1L))
  }

  test("bucketed topk only searches the query's sign bucket") {
    val vecs = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f)),
      (2L, Array(0.9f, 0.9f, 0.9f)),
      (3L, Array(-1.0f, -1.0f, -1.0f))).toDF("id", "emb")
    val out = Similarity.bucketedTopK(vecs, vecs.filter($"id" === 1L), k = 5, signBits = 3)
    val ids = out.collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(ids == Set(2L)) // 3 is in the opposite bucket
  }

  test("trained-centroid IVF: k-means recovers separated clusters, search has full recall") {
    // three well-separated axis clusters, 4 vectors each; ids ordered so
    // the 3 seeds (lowest ids) start one per cluster
    def v(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, j) => x + (if (j == i % 3) 0.01f * i else 0f) }
    val a = Array(1f, 0f, 0f); val b = Array(0f, 1f, 0f); val c = Array(0f, 0f, 1f)
    val vecs = Seq(
      (0L, v(a, 0)), (1L, v(b, 1)), (2L, v(c, 2)),
      (3L, v(a, 3)), (4L, v(b, 4)), (5L, v(c, 5)),
      (6L, v(a, 6)), (7L, v(b, 7)), (8L, v(c, 8)),
      (9L, v(a, 9)), (10L, v(b, 10)), (11L, v(c, 11))).toDF("id", "emb")

    val cents = Similarity.trainCentroids(vecs, k = 3, iters = 2)
    // training is deterministic: a second run is bit-identical
    assert(cents == Similarity.trainCentroids(vecs, k = 3, iters = 2))
    // the three cells partition the corpus 4/4/4 along the clusters
    val assigned = vecs.select($"id",
        Similarity.assignCell($"emb", cents).as("cid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned.values.toSet.size == 3)
    assert(Seq(0L, 3L, 6L, 9L).map(assigned).toSet.size == 1, "cluster A in one cell")
    assert(Seq(1L, 4L, 7L, 10L).map(assigned).toSet.size == 1, "cluster B in one cell")
    assert(Seq(2L, 5L, 8L, 11L).map(assigned).toSet.size == 1, "cluster C in one cell")

    // IVF with nprobe=1 on separated clusters = exact within-cluster knn
    val ivf = Similarity.ivfTopK(vecs, vecs.filter($"id" === 0L), cents, k = 3, nprobe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"id" === 0L), k = 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(ivf == brute, s"full recall expected on separated clusters: ivf=$ivf brute=$brute")
    assert(ivf == Set(3L, 6L, 9L))
  }

  test("ivfTopK recall@3 vs brute force on real embeddings (nprobe sweep)") {
    // pins the quality claim the coarse-quantizer analogy makes: IVF
    // search is approximate ONLY through cell pruning, and probing more
    // cells recovers the exact ranking
    val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val queries = corpus.filter(col("id") % 200 === 0)
    val cents = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    val truth = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt3(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(corpus, queries, cents, k = 3, nprobe = nprobe)
        .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size }
        .sum / truth.size
    }
    val (r1, r2, r4) = (recallAt3(1), recallAt3(2), recallAt3(4))
    // measured on the current synthetic embeddings: 0.444 / 0.667 /
    // 0.889 — floors leave margin for regenerated testdata while still
    // catching a broken quantizer (which collapses recall toward 0)
    info(f"recall@3: nprobe=1 $r1%.3f, nprobe=2 $r2%.3f, nprobe=4 $r4%.3f")
    assert(r2 >= 0.55, f"recall@3 at nprobe=2 (of 8 cells) must clear 0.55, got $r2%.3f")
    assert(r4 >= 0.8, f"recall@3 at nprobe=4 (of 8 cells) must clear 0.8, got $r4%.3f")
    assert(r2 >= r1 - 1e-9 && r4 >= r2 - 1e-9,
      f"recall must not fall as nprobe grows: $r1%.3f / $r2%.3f / $r4%.3f")
  }

  test("residual PQ codes beat raw PQ codes at equal nprobe") {
    // planted structure where the textbook motivation is deterministic:
    // cluster center j = 10·(e_j + e_{4+j}) spans BOTH subspaces, so
    // raw per-subspace codebooks (k=4) spend every cell on cluster
    // placement and all same-cluster candidates tie; within-cluster
    // ±1 offset patterns in dims 4..7 survive only in residuals, whose
    // codebooks resolve them. Queries are pattern-2 members whose true
    // siblings sit mid-range in id order — an all-tied ADC cannot luck
    // into them via the neighbor-id tie-break.
    val patterns = Seq(
      Array(1f, 1f, -1f, -1f), Array(-1f, 1f, 1f, -1f),
      Array(1f, -1f, 1f, -1f), Array(-1f, -1f, -1f, 1f))
    def vec(cluster: Int, pat: Int, scale: Float): Array[Float] = {
      val v = Array.fill(8)(0f)
      v(cluster) = 10f; v(4 + cluster) += 10f
      for (d <- 0 until 4) v(4 + d) += patterns(pat)(d) * scale
      v
    }
    val rows = (0 until 4).map(c => (c.toLong, vec(c, 0, 1.0f))) ++
      (for (c <- 0 until 4; p <- 0 until 4; m <- 0 until 2) yield {
        val id = 4L + c * 8 + p * 2 + m
        (id, vec(c, p, 1.0f + 0.05f * m))
      })
    val corpus = rows.toDF("id", "emb")
    val queries = corpus.filter(col("id") % 8 === 1 && col("id") >= 4)
    val coarse = Similarity.trainCentroids(corpus, k = 4, iters = 2)
    val raw = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    val res = Similarity.trainResidualCodebooks(corpus, coarse, m = 2, k = 4, iters = 2)
    val truth = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size }
        .sum / truth.size
    }
    // nprobe=1 — the single-cell regime residual PQ exists for (the
    // cosine-ADC cross-cell caveat is documented on ivfPqResidualTopK)
    val rawR = recall(Similarity.ivfPqTopK(corpus, queries, coarse, raw, k = 3, nprobe = 1))
    val resR = recall(Similarity.ivfPqResidualTopK(corpus, queries, coarse, res, k = 3, nprobe = 1))
    info(f"planted recall@3 at nprobe=1: raw $rawR%.3f, residual $resR%.3f")
    assert(resR > rawR + 0.2,
      f"residual codes must clearly beat raw codes on planted structure: $resR%.3f vs $rawR%.3f")
    // Real-embeddings sweep is REPORTED, not asserted: the synthetic
    // embeddings are near-random, so ADC recall over 9 queries moves
    // in 0.111 steps and the raw-vs-residual ordering flips with
    // codebook capacity (m=8/k=16 measured raw 0/0/0.111 vs residual
    // 0/0.111/0.222 at nprobe 1/2/4 — residual never worse; m=4/k=8
    // flips at nprobe=1). Asserting on that would pin noise; the
    // planted construction above is the deterministic gate.
    val corpus2 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val queries2 = corpus2.filter(col("id") % 200 === 0)
    val coarse2 = Similarity.trainCentroids(corpus2, k = 8, iters = 2)
    val raw2 = Similarity.trainPqCodebooks(corpus2, m = 4, k = 8, iters = 2)
    val res2 = Similarity.trainResidualCodebooks(corpus2, coarse2, m = 4, k = 8, iters = 2)
    val truth2 = Similarity.bruteForceTopK(corpus2, queries2, k = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall2(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth2.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size }
        .sum / truth2.size
    }
    for (np <- Seq(1, 2)) {
      val rr = recall2(Similarity.ivfPqTopK(corpus2, queries2, coarse2, raw2, k = 3, nprobe = np))
      val rs = recall2(Similarity.ivfPqResidualTopK(corpus2, queries2, coarse2, res2, k = 3, nprobe = np))
      info(f"real recall@3 at nprobe=$np: raw $rr%.3f, residual $rs%.3f (reported, see comment)")
    }
  }

  test("SQ8 codes stay in [0,255], degenerate dims code 0, top-k follows exact dot order") {
    val df = Seq(
      (1L, Seq(1.0f, 0.05f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.05f, 0.0f)),
      (3L, Seq(0.0f, 0.05f, 1.0f, 0.0f)), (4L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (5L, Seq(0.0f, 0.9f, 0.1f, 0.0f)), (6L, Seq(0.05f, 0.0f, 0.9f, 0.0f)))
      .toDF("id", "emb")
    val bounds = Similarity.sqTrain(df)
    assert(bounds.size == 4 && bounds.last == ((0L, 0L)), s"constant dim bounds: $bounds")
    val codes = Similarity.sqEncode(df, bounds).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes.values.flatten.forall(c => c >= 0L && c <= 255L), "codes bounded")
    assert(codes.values.forall(_(3) == 0L), "degenerate dim codes to 0")
    assert(codes(1L)(0) == 255L && codes(2L)(1) == 255L, "range max codes to 255")
    val out = Similarity.sqTopK(Similarity.sqEncode(df, bounds), bounds,
        df.filter(col("id") <= 2), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact dot top-1: query 1 → 4 (0.905), query 2 → 5 (0.905); the
    // ~0.4%-per-dim quantization error cannot flip those margins
    assert(out.contains((1L, 1L, 4L)) && out.contains((2L, 1L, 5L)), out.mkString(","))
  }

  test("PQ codes separate clusters; ADC recovers nearest neighbors without vectors") {
    // three tight clusters, visible in BOTH subspaces (dims 0-1 and
    // 2-3), so per-subspace codebooks must separate them and ADC
    // scoring over codes alone must find within-cluster neighbors
    def v(a: Float, b: Float) = Array(a, b, a, b)
    val vecs = (0 until 12).map { i =>
      val base = Seq(v(1f, 0f), v(0f, 1f), v(-1f, 0f))(i % 3)
      (i.toLong, base.map(x => x + (i / 3) * 0.01f))
    }.toDF("id", "emb")
    val books = Similarity.trainPqCodebooks(vecs, m = 2, k = 3, iters = 3)
    assert(books.length == 2 && books.forall(_.size == 3))
    assert(books.forall(_.forall(_._2.length == 2)), "2-dim sub-centroids")
    val enc = Similarity.pqEncode(vecs, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc.size == 12 && enc.values.forall(c => c.length == 2 &&
      c.forall(x => x >= 0 && x < 3)), s"2 codes in [0,3): $enc")
    // same cluster ⇒ same code pair
    assert(Seq(0L, 3L, 6L, 9L).map(enc).toSet.size == 1)
    assert(Seq(1L, 4L, 7L, 10L).map(enc).toSet.size == 1)
    // ADC top-3 for query 0 = its own cluster's other members
    val top = Similarity.pqAdcTopK(Similarity.pqEncode(vecs, books),
        vecs.filter(col("id") === 0L), books, k = 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(top == Set(3L, 6L, 9L), s"ADC must recover the cluster: $top")
    intercept[IllegalArgumentException](
      Similarity.trainPqCodebooks(vecs, m = 3, k = 2, iters = 1)) // 4 % 3 != 0
  }

  test("ivfPqTopK equals pure ADC when all cells probed; prunes to the cluster at nprobe=1") {
    def v(a: Float, b: Float) = Array(a, b, a, b)
    val vecs = (0 until 12).map { i =>
      val base = Seq(v(1f, 0f), v(0f, 1f), v(-1f, 0f))(i % 3)
      (i.toLong, base.map(x => x + (i / 3) * 0.01f))
    }.toDF("id", "emb")
    val coarse = Similarity.trainCentroids(vecs, k = 3, iters = 3)
    val books = Similarity.trainPqCodebooks(vecs, m = 2, k = 3, iters = 3)
    val q = vecs.filter($"id" === 0L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_1e6"))).toSet
    // probing every cell removes the pruning: IVF-PQ must equal the
    // all-pairs ADC ranking exactly (scores included)
    val full = rows(Similarity.pqAdcTopK(Similarity.pqEncode(vecs, books), q, books, 3))
    val all = rows(Similarity.ivfPqTopK(vecs, q, coarse, books, 3, nprobe = 3))
    assert(all == full, s"nprobe=k must equal pure ADC: $all vs $full")
    // on separated clusters nprobe=1 confines candidates to the
    // query's own cluster
    val one = Similarity.ivfPqTopK(vecs, q, coarse, books, 3, nprobe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(one == Set(3L, 6L, 9L), s"own cluster expected: $one")
  }

  test("trainCentroids carries an emptied cell's previous centroid") {
    // two seeds land in the same dense cluster; one seed keeps all
    // points, the other may end up empty — its centroid must persist
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.98f, 0.02f)), (3L, Array(0.97f, 0.03f))).toDF("id", "emb")
    val cents = Similarity.trainCentroids(vecs, k = 2, iters = 3)
    assert(cents.size == 2 && cents.forall(_._2.length == 2))
    assert(cents.map(_._1) == Seq(0, 1))
  }

  test("bm25 ranks term-dense docs higher, drops docs without query terms") {
    import graft.operators.TextSearch
    val docs = Seq(
      (1L, "fast fast fast scan"),       // dense in query terms
      (2L, "fast scan over a long document with many filler words here"),
      (3L, "completely unrelated words only"),
      (4L, "rare rare rare rare")).toDF("doc_id", "text")
    val out = TextSearch.bm25(docs, "doc_id", "text", "fast scan")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(3L) && !out.contains(4L), s"no-term docs must drop: $out")
    assert(out(1L) > out(2L),
      s"shorter, denser doc must outrank the diluted one: $out")
    // deterministic: identical scores on a second run
    val again = TextSearch.bm25(docs, "doc_id", "text", "fast scan")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == again)
    intercept[IllegalArgumentException](TextSearch.bm25(docs, "doc_id", "text", "  "))
  }

  test("bm25Many equals per-query bm25 and shares contributions across queries") {
    import graft.operators.TextSearch
    val docs = Seq(
      (1L, "fast fast fast scan"),
      (2L, "fast scan over a long document with many filler words here"),
      (3L, "completely unrelated words only"),
      (4L, "scan merge scan merge")).toDF("doc_id", "text")
    val queries = Seq("a" -> "fast scan", "b" -> "merge scan")
    val many = TextSearch.bm25Many(docs, "doc_id", "text", queries)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // invariant: the multi-query result IS the per-query result, query
    // by query — shared union-term contributions must not change scores
    for ((qid, q) <- queries) {
      val single = TextSearch.bm25(docs, "doc_id", "text", q)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val slice = many.collect { case ((id, d), s) if id == qid => d -> s }.toMap
      assert(slice == single, s"query $qid: many=$slice single=$single")
    }
    // the DataFrame overload routes to the same result
    val qdf = queries.toDF("qid", "qtext")
    val viaDf = TextSearch.bm25Many(docs, "doc_id", "text", qdf, "qid", "qtext",
        k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaDf == many)
    intercept[IllegalArgumentException](
      TextSearch.bm25Many(docs, "doc_id", "text", Seq("a" -> "x", "a" -> "y")))
  }

  test("inverted index: postings match direct computation; lookups prune buckets") {
    import graft.operators.TextSearch
    val docs = Seq(
      (1L, "fast fast scan of the table"),
      (2L, "slow walk in the park"),
      (3L, "table scan table scan table")).toDF("doc_id", "text")
    TextSearch.buildInvertedIndex(docs, "doc_id", "text", "inv_idx_spec", buckets = 8)
    val got = TextSearch.postings(spark, "inv_idx_spec", Seq("fast", "table"))
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("dl"))).toMap
    assert(got == Map(
      ("fast", 1L) -> ((2L, 6L)), ("table", 1L) -> ((1L, 6L)),
      ("table", 3L) -> ((3L, 5L))), s"postings wrong: $got")
    // the lookup reads only the query terms' buckets: bucket pruning
    // shows up in the scan as SelectedBucketsCount < total. The
    // autoBucketedScan heuristic only values join partitioning, not
    // pruning — disable it for pruning-critical lookups (doc'd on
    // postings()).
    val auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val scan = try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      TextSearch.postings(spark, "inv_idx_spec", Seq("fast", "table"))
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", auto)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(scan)
    assert(sel.isDefined, s"expected a bucket-pruned scan:\n$scan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"2 terms must not touch all 8 buckets:\n${sel.get}")
    intercept[IllegalArgumentException](TextSearch.postings(spark, "inv_idx_spec", Nil))
  }

  test("funnel requires strict stage order; out-of-order completions don't convert") {
    import graft.operators.EventAnalytics
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: purchase BEFORE first view → stops at view
      (2L, "purchase", 50L), (2L, "view", 100L),
      // user 3: click at the same µs as the view (not strictly after) →
      // only a later click converts
      (3L, "view", 100L), (3L, "click", 100L), (3L, "click", 400L),
      // user 4: never views
      (4L, "click", 10L)).toDF("user_id", "event_type", "ts_us")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("stage_reached"), Option(r.getAs[java.lang.Long]("t_click")))).toMap
    assert(out(1L)._1 == 3L)
    assert(out(2L)._1 == 1L, s"pre-view purchase must not convert: $out")
    assert(out(3L) == ((2L, Some(java.lang.Long.valueOf(400L)))),
      s"same-µs click must not count; the later one must: $out")
    assert(out(4L)._1 == 0L)
    intercept[IllegalArgumentException](
      EventAnalytics.funnel(ev, "user_id", "event_type", "ts_us", Seq("a", "a")))
  }

  test("trailingStats: per-row RANGE frame includes exactly the lookback; ties are peers") {
    import graft.operators.EventAnalytics
    val ev = Seq(
      (1L, 1L, 0L, 10L),        // frame: itself
      (2L, 1L, 500L, 20L),      // frame: [0..500] → rows 1,2
      (3L, 1L, 1001L, 30L),     // frame: [1..1001] → rows 2,3 (0 ages out)
      (4L, 1L, 1001L, 40L),     // tie with row 3: same frame, BOTH peers in it
      (5L, 2L, 100L, 99L)       // other key: own frame
    ).toDF("event_id", "user_id", "ts_us", "cents")
    val out = EventAnalytics.trailingStats(ev, col("user_id"), col("ts_us"),
        col("cents"), backUs = 1000L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_win"), r.getAs[Long]("sum_win"))).toMap
    assert(out(1L) == ((1L, 10L)))
    assert(out(2L) == ((2L, 30L)))
    // ties are RANGE peers: both 1001-µs rows see rows 2,3,4
    assert(out(3L) == ((3L, 90L)) && out(4L) == ((3L, 90L)),
      s"tied rows must share the peer frame: $out")
    assert(out(5L) == ((1L, 99L)))
    intercept[IllegalArgumentException](EventAnalytics.trailingStats(
      ev, col("user_id"), col("ts_us"), col("cents"), backUs = -1L))
  }

  test("decayedSum halves contributions per half-life; shift saturates") {
    import graft.operators.EventAnalytics
    val day = 86400000000L
    val ev = Seq(
      (1L, 3L * day, 800L),  // newest → ref; age 0 → full
      (1L, 2L * day, 800L),  // 1 half-life → 400
      (1L, 0L, 800L),        // 3 half-lives → 100
      (2L, 3L * day - 1L, 801L) // age just under a half-life → full (int div)
    ).toDF("user_id", "ts_us", "cents")
    val out = EventAnalytics.decayedSum(ev, col("user_id"), col("ts_us"),
        col("cents"), halfLifeUs = day)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 800L + 400L + 100L, s"halving schedule wrong: $out")
    assert(out(2L) == 801L, s"sub-half-life age must not decay: $out")
    // saturation: ancient events still contribute value >> maxShift
    val old = Seq((3L, 100L * day, 1L << 40), (3L, 0L, 1L << 40))
      .toDF("user_id", "ts_us", "cents")
    val sat = EventAnalytics.decayedSum(old, col("user_id"), col("ts_us"),
        col("cents"), halfLifeUs = day, maxShift = 30)
      .collect().map(r => r.getLong(1)).head
    assert(sat == (1L << 40) + (1L << 10), s"shift must saturate at 30: $sat")
    intercept[IllegalArgumentException](EventAnalytics.decayedSum(
      ev, col("user_id"), col("ts_us"), col("cents"), halfLifeUs = 0))
  }

  test("equiDepthHistogram buckets are ~equal depth with contiguous bounds") {
    import graft.operators.Diagnostics
    val df = spark.range(1, 1001).selectExpr("id AS v") // 1..1000
    val out = Diagnostics.equiDepthHistogram(df, col("v"), buckets = 10)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toMap
    assert(out.size == 10)
    assert(out.values.map(_._1).sum == 1000)
    // uniform data → every decile holds ~100 rows
    assert(out.values.forall { case (n, _, _) => n >= 95 && n <= 105 },
      s"uniform deciles must be ~equal: $out")
    // buckets tile the domain in order without overlap
    val sorted = out.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.sliding(2).forall {
      case Seq((_, _, hi1), (_, lo2, _)) => hi1 < lo2
      case _ => true
    }, s"bucket ranges must be disjoint and ordered: $sorted")
    intercept[IllegalArgumentException](
      Diagnostics.equiDepthHistogram(df, col("v"), buckets = 1))
  }

  test("retentionCohorts counts distinct users per cohort/offset cell") {
    import graft.operators.EventAnalytics
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, 1L * day), (1L, 1L * day + 5L), // day 0 cohort, active d0+d1
      (2L, 0L), (2L, 2L * day),                      // day 0 cohort, active d0+d2
      (3L, 1L * day)).toDF("user_id", "ts_us")       // day 1 cohort
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
  }

  test("keySkewReport surfaces hot keys with shares and count quantiles; top-k plan") {
    import graft.operators.Diagnostics
    val df = ((1 to 60).map(_ => "hot") ++ (1 to 20).map(_ => "warm") ++
      (1 to 20).map(i => s"k$i")).toDF("key0")
    val rep = Diagnostics.keySkewReport(df, col("key0"), topK = 2)
    val out = rep.collect()
    assert(out.length == 2)
    val r1 = out.find(_.getAs[Long]("rank") == 1L).get
    assert(r1.getAs[String]("key") == "hot" && r1.getAs[Long]("n") == 60L)
    assert(r1.getAs[Long]("share_1e6") == 60L * 1000000L / 100L)
    assert(r1.getAs[Long]("n_keys") == 22L && r1.getAs[Long]("max_n") == 60L)
    // per-key counts: twenty 1s, a 20, a 60 → p50 is 1
    assert(r1.getAs[Double]("p50_n") == 1.0)
    // the top-k is a TakeOrdered, never a global sort
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
    intercept[IllegalArgumentException](Diagnostics.keySkewReport(df, col("key0"), 0))
  }

  test("skewJoinAdvice: all three branches fire and the salt count " +
    "levels the hot key to mean-partition size") {
    import graft.operators.Diagnostics
    // 4 partitions, 80 rows -> meanPart = 20; hot key 50 rows = 2.5x
    // mean (shuffle band at 5x), hotter key needs the salt branch
    val mild = ((1 to 50).map(_ => "hot") ++ (1 to 30).map(i => s"k$i"))
      .toDF("key0")
    val m = Diagnostics.skewJoinAdvice(mild, col("key0"), dimRows = 31L,
      broadcastRowCap = 1000L, partitions = 4, topK = 1).collect().head
    assert(m.getAs[String]("advice") == "broadcast" &&
      m.getAs[Long]("salt") == 0L)
    val m2 = Diagnostics.skewJoinAdvice(mild, col("key0"), dimRows = 5000L,
      broadcastRowCap = 1000L, partitions = 4, topK = 1).collect().head
    assert(m2.getAs[String]("advice") == "shuffle" &&
      m2.getAs[Long]("mean_part_n") == 20L && m2.getAs[Long]("salt") == 0L)
    // 400 hot rows of 480 total -> meanPart 120; 400 > 5*... no: make
    // the hot key exceed 5x mean: 400 hot + 80 cold, P=24 -> mean 20,
    // 400 = 20x mean -> salt = ceil(400/20) = 20
    val wild = ((1 to 400).map(_ => "hot") ++ (1 to 80).map(i => s"k$i"))
      .toDF("key0")
    val w = Diagnostics.skewJoinAdvice(wild, col("key0"), dimRows = 5000L,
      broadcastRowCap = 1000L, partitions = 24, topK = 1).collect().head
    // the third branch prefers AQE (both saltprobe studies measured
    // salting losing in every local[32] cell); the salt count is the
    // documented no-AQE escape-hatch parameter
    assert(w.getAs[String]("advice") == "aqe_or_salt" &&
      w.getAs[Long]("salt") == 20L,
      s"expected salt=ceil(400/20)=20, got ${w.mkString(",")}")
    // the clamp: a key owning nearly everything caps at 64
    val solo = (1 to 200).map(_ => "hot").toDF("key0")
    val c = Diagnostics.skewJoinAdvice(solo, col("key0"), dimRows = 5000L,
      broadcastRowCap = 1000L, partitions = 200, topK = 1).collect().head
    assert(c.getAs[Long]("salt") == 64L)
  }

  test("heavyHitters ranks by exact count and the count-min contract holds") {
    import graft.operators.Sketches
    // skewed stream: "hot" 50×, "warm" 10×, singletons
    val df = ((1 to 50).map(_ => "hot") ++ (1 to 10).map(_ => "warm") ++
      (1 to 5).map(i => s"cold$i")).toDF("token")
    val out = Sketches.heavyHitters(df, col("token"), topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("hot", 1L, 50L), ("warm", 2L, 10L), ("cold1", 3L, 1L)))
    assert(out.forall(t => t._4 >= t._3), "CMS must never undercount (est >= cnt)")
    assert(out.forall(t => t._5 == 1L), "lower flag is est >= cnt, computed")
    assert(out.forall(t => t._6 == 1L), "eps bound must hold on a tiny stream")
    // deterministic across runs (md5Long cells — no RNG anywhere)
    val again = Sketches.heavyHitters(df, col("token"), topN = 3).collect()
    assert(out.toSeq == again.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq)
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, col("token"), 0))
  }

  test("bloom semi-join: zero false negatives at any width; false " +
    "positives counted exactly; the audit row carries the law's m") {
    import graft.operators.Sketches
    val dim = (1L to 50L).map(k => k * 7).toDF("k")
    val fact = (1L to 1000L).toDF("fk")
    val truth = (1L to 50L).map(_ * 7).toSet
    val a = Sketches.bloomPruneAudit(fact, col("fk"), dim, col("k")).collect()(0)
    assert(a.getAs[Long]("n_fact") == 1000L && a.getAs[Long]("n_dim_keys") == 50L)
    assert(a.getAs[Long]("m_bits") ==
      Sketches.suggestBloomBits(50L, 5)) // 50*5*14427/10000+1
    assert(a.getAs[Long]("exact_pass") == 50L)
    assert(a.getAs[Long]("no_false_neg") == 1L)
    assert(a.getAs[Long]("false_pos") ==
      a.getAs[Long]("bloom_pass") - 50L && a.getAs[Long]("false_pos") >= 0L)
    val kept = Sketches.bloomPrune(fact, col("fk"), dim, col("k"))
      .collect().map(_.getLong(0)).toSet
    assert(truth.subsetOf(kept), "bloom prune must keep every true match")
    // deliberately undersized filter (64 bits for 50 keys): collisions
    // everywhere, the hard no-false-negative guarantee still holds
    val w = Sketches.bloomWords(dim.select(col("k").as("_k")), col("_k"),
      mBits = 64L, kHashes = 2)
    val kept64 = fact.filter(Sketches.bloomTest(col("fk"), w, 64L, 2))
      .collect().map(_.getLong(0)).toSet
    assert(truth.subsetOf(kept64), "no false negatives even saturated")
    assert(kept64.size > truth.size, "a 64-bit filter over 50 keys collides")
    intercept[IllegalArgumentException](Sketches.suggestBloomBits(0L, 5))
    intercept[IllegalArgumentException](
      Sketches.bloomWords(dim, col("k"), mBits = 32L, kHashes = 5))
    // the relation form (the past-2^30-bits regime) prunes the EXACT
    // same set as the broadcast-literal form — identical bits, so the
    // switch is a pure plan decision
    val keptRel = Sketches.bloomPruneRelation(fact, col("fk"), dim, col("k"))
      .collect().map(_.getLong(0)).toSet
    assert(keptRel == kept, "relation form must equal the literal form")
  }

  test("rrfFuse sums integer reciprocal-rank quotients; one-list docs still score") {
    import graft.operators.Retrieval
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val den = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, den), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("rrf_1e9"))).toMap
    def q(r: Long) = 1000000000L / (60L + r)
    // doc 10 is in both lists (ranks 1 and 2); docs 11/12 in one each
    assert(out(10L)._2 == q(1) + q(2))
    assert(out(11L)._2 == q(2) && out(12L)._2 == q(1))
    assert(out(10L)._1 == 1L, s"two-list doc must fuse to the top: $out")
    // ties (11 vs 12 both q(?)...) — 12 at q(1) outranks 11 at q(2)
    assert(out(12L)._1 == 2L && out(11L)._1 == 3L)
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq.empty, k = 1))
  }

  test("pruneQueryTermsByDf keeps the rarest terms, drops corpus-absent ones") {
    import graft.operators.TextSearch
    val docs = Seq(
      (1L, "common rare1 common2"),
      (2L, "common common2"),
      (3L, "common common2 rare2"),
      (4L, "common common2")).toDF("doc_id", "text")
    // dfs: common 4, common2 4, rare1 1, rare2 1, ghost absent
    val pairs = Seq(("q", "common"), ("q", "common2"), ("q", "rare1"),
      ("q", "rare2"), ("q", "ghost"))
    val pruned = TextSearch.pruneQueryTermsByDf(docs, "doc_id", "text", pairs, maxTerms = 2)
    assert(pruned.toSet == Set(("q", "rare1"), ("q", "rare2")),
      s"the two df-1 terms must win the cap: $pruned")
    val all = TextSearch.pruneQueryTermsByDf(docs, "doc_id", "text", pairs, maxTerms = 10)
    assert(all.map(_._2).toSet == Set("common", "common2", "rare1", "rare2"),
      s"corpus-absent terms must drop even uncapped: $all")
    intercept[IllegalArgumentException](
      TextSearch.pruneQueryTermsByDf(docs, "doc_id", "text", pairs, maxTerms = 0))
  }

  test("hybridMoreLikeThis surfaces lexical-only and dense-only neighbors") {
    import graft.operators.Retrieval
    // doc 1 is the seed. doc 2 shares its text (lexical hit, orthogonal
    // vector); doc 3 shares its direction (dense hit, alien text).
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "unrelated words entirely different tokens"),
      (4L, "noise filler content nothing shared")).toDF("doc_id", "text")
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(-1.0f, -0.2f)))
      .toDF("id", "emb")
    val out = Retrieval.hybridMoreLikeThis(docs, "doc_id", "text", embs,
        docs.filter(col("doc_id") === 1), embs.filter(col("id") === 1),
        depth = 3, k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    assert(!out.contains(1L), s"seed must exclude itself: $out")
    assert(out.contains(2L) && out.contains(3L),
      s"both the lexical and the dense neighbor must surface: $out")
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat is on the mat and it is happy"),
      (2L, "der hund ist ein tier und das ist gut"),
      (3L, "qqq www eee")).toDF("doc_id", "text")
    val m = df.select($"doc_id", TextAnalysis.langId($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "en")
    assert(m(2L) == "de")
    assert(m(3L) == "und")
  }

  test("langIdWithMargin: margin tracks best-vs-runner-up; ties and empty yield 0") {
    val df = Seq(
      (1L, "the cat is on the mat and it is happy"), // clear en, no other-lang hits
      (2L, "the der cat hund"),                      // en/de tie at 2 hits each
      (3L, "qqq www eee"),                           // no hits anywhere
      (4L, "")).toDF("doc_id", "text")               // no tokens
    val rows = df.select($"doc_id", TextAnalysis.langIdWithMargin($"text").as("m"))
      .select($"doc_id", $"m.predicted_lang", $"m.best_hits", $"m.second_hits",
        $"m.n_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows(1L) == (("en", 7L, 0L, 10L))) // the,is ×2 + on,and,it
    assert(rows(2L)._1 == "de", "tie goes to first language in code order")
    assert(rows(2L)._2 == rows(2L)._3, "a tied argmax must carry margin 0")
    assert(rows(3L) == (("und", 0L, 0L, 3L)))
    assert(rows(4L) == (("und", 0L, 0L, 0L)))
  }

  test("transitionMatrix: per-user consecutive pairs, exact row probabilities") {
    val events = Seq(
      (1L, 10L, "view", 100L), (2L, 10L, "click", 200L), (3L, 10L, "view", 300L),
      (4L, 20L, "view", 100L), (5L, 20L, "view", 200L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val m = graft.operators.EventAnalytics.transitionMatrix(
        events, "user_id", "event_type", "ts_us", "event_id")
      .collect().map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("p_1e6")))).toMap
    // from view: ->click (u10), ->view (u20) ; from click: ->view (u10)
    assert(m == Map(
      ("view", "click") -> ((1L, 500000L)), ("view", "view") -> ((1L, 500000L)),
      ("click", "view") -> ((1L, 1000000L))), s"got $m")
  }

  test("perKeyCap: at most k rows per key, deterministic hash order") {
    val df = (1L to 50L).map(i => (i % 3, i)).toDF("k", "i")
    val out = graft.operators.Sampling.perKeyCap(df, col("k"), col("i"), 5)
      .collect().map(r => (r.getAs[Long]("key"), r.getAs[Long]("keep_rank"),
        r.getAs[Long]("id")))
    assert(out.groupBy(_._1).forall(_._2.length == 5), "each key capped at 5")
    assert(out.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2).sorted.toSeq == (1L to 5L) }, "ranks are 1..5 per key")
    val again = graft.operators.Sampling.perKeyCap(df, col("k"), col("i"), 5)
      .collect().map(r => (r.getAs[Long]("key"), r.getAs[Long]("keep_rank"),
        r.getAs[Long]("id")))
    assert(out.toSet == again.toSet, "selection is deterministic")
  }

  test("sourceDivergence: identical distributions score below disjoint ones") {
    val docs = Seq(
      (1L, "aa bb aa bb cc", "p"), (2L, "aa bb aa bb cc", "q"),
      (3L, "zz yy xx ww vv", "r"))
      .toDF("doc_id", "text", "source")
    val kl = graft.operators.Diagnostics.sourceDivergence(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("kl_mbits")).toMap
    assert(kl.size == 6, s"ordered pairs of 3 sources: $kl")
    assert(kl(("p", "q")) < kl(("p", "r")),
      s"same-dist pair must diverge less than disjoint pair: $kl")
    assert(kl(("r", "p")) > kl(("q", "p")), s"disjoint beats identical from r side: $kl")
  }

  test("mmrRerank: diverse candidate beats the near-duplicate of pick 1") {
    // query (2,1); b=(0.98,0.04) is the most relevant, a=(1,0) its
    // near-dup, c=(0,1) diverse. Greedy: pick b, then c (margin
    // 447213-40782 beats a's 894427-999163), then a.
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.98f, 0.04f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("id", "emb")
    val queries = Seq((100L, Seq(2.0f, 1.0f))).toDF("id", "emb")
    val picks = graft.operators.Retrieval.mmrRerank(corpus, queries, depth = 3, k = 3)
      .orderBy(col("pick_no")).collect()
      .map(r => (r.getAs[Long]("pick_no"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("mmr_1e6")))
    assert(picks.map(_._2).toSeq == Seq(2L, 3L, 1L), s"got ${picks.toSeq}")
    assert(picks(0)._3 > picks(1)._3, "pick 1 carries raw relevance")
    assert(picks(2)._3 < 0, "the near-dup's margin is negative")
  }

  test("clusterSizeHistogram: clusters-per-size and doc mass from planted groups") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "completely different words entirely unrelated content here now friends"
    val docs = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b),
      (6L, "a lone unique document nothing like the others at all indeed"))
      .toDF("doc_id", "text")
    val hist = Dedup.clusterSizeHistogram(
        Dedup.connectedComponents(Dedup.minhashLshPairs(docs, "doc_id", "text")))
      .collect().map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))).toMap
    assert(hist == Map(3L -> ((1L, 3L)), 2L -> ((1L, 2L))), s"got $hist")
  }

  test("hashedTf: deterministic signed buckets, repeated tokens accumulate") {
    val docs = Seq((1L, "foo foo bar"), (2L, "foo foo bar")).toDF("doc_id", "text")
    val rows = TextAnalysis.hashedTf(docs, "doc_id", "text", dim = 64).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("bucket"), r.getAs[Long]("weight")))
    assert(rows.forall(r => r._2 >= 0 && r._2 < 64), s"buckets in range: ${rows.toSeq}")
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(byDoc(1L) == byDoc(2L), "identical text must yield identical vectors")
    assert(rows.filter(_._1 == 1L).map(r => math.abs(r._3)).sorted.toSeq == Seq(1L, 2L),
      "foo contributes |2|, bar |1| (distinct buckets for these tokens)")
  }

  test("ccnetBuckets: per-source tertiles; singleton source is head") {
    val docs = Seq(
      (1L, "common common common", "x"), // lowest surprisal in x
      (2L, "common common rare1", "x"),
      (3L, "rare2 rare3 rare4", "x"),    // highest surprisal in x
      (4L, "common", "y"))               // singleton source
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.ccnetBuckets(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("pct_1e6"), r.getAs[String]("bucket")))).toMap
    assert(out(1L) == ((0L, "head")))
    assert(out(2L) == ((500000L, "middle")))
    assert(out(3L) == ((1000000L, "tail")))
    assert(out(4L) == ((0L, "head")))
  }

  test("clusterCohesion: per-cell mean/min cosine to own centroid, exact floor mean") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),   // cell 0, cos 1.0
      (3L, Seq(1.0f, 1.0f)),   // cos .7071 to both -> tie -> cell 0
      (2L, Seq(0.0f, 1.0f)),   // cell 1, cos 1.0
      (4L, Seq(-1.0f, 0.0f)))  // cos -1 vs c0, 0 vs c1 -> cell 1
      .toDF("id", "emb")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val out = Similarity.clusterCohesion(corpus, cents)
      .collect().map(r => r.getAs[Long]("cid") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("avg_cos_1e6"),
          r.getAs[Long]("min_cos_1e6")))).toMap
    assert(out(0L) == ((2L, 853553L, 707106L))) // (1000000+707106) div 2
    assert(out(1L) == ((2L, 500000L, 0L)))
  }

  test("attritionFunnel: each doc lands on its FIRST failing gate; shares are exact") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),                                     // passes everything
      (2L, base),                                     // exact dup of 1
      (3L, base + " extra"),                          // near dup of 1 (LSH)
      (4L, "zz qq xx"),                               // too short -> quality
      (5L, "der hund ist ein tier und das ist gut " * 3),   // german, len>=100
      (6L, "the cat sat on the mat " * 5),            // en, repetitive
      (7L, "the maple syrup festival is a lovely event and it is fun for all of the folks in town every year here now"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "people enjoy the maple syrup festival greatly"))
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.attritionFunnel(docs, bench)
      .collect().map(r => r.getAs[String]("gate") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("share_1e6")))).toMap
    val expected = Map(
      "1_exact_dup" -> ((1L, 142857L)), "2_near_dup" -> ((1L, 142857L)),
      "3_quality" -> ((1L, 142857L)), "4_language" -> ((1L, 142857L)),
      "5_repetition" -> ((1L, 142857L)), "6_contaminated" -> ((1L, 142857L)),
      "7_pass" -> ((1L, 142857L)))
    assert(out == expected, s"got $out")
  }

  test("columnStats: per-column rows/nulls/NDV/min/max in one pass") {
    val df = Seq((1L, Some("x"), 10L), (2L, None, 5L), (3L, Some("x"), 10L))
      .toDF("id", "tag", "v")
    val m = graft.operators.Diagnostics.columnStats(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getAs[String]("column_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nonnull"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_value"),
          r.getAs[String]("max_value")))).toMap
    assert(m("id") == ((3L, 3L, 3L, "1", "3")))
    assert(m("tag") == ((3L, 2L, 1L, "x", "x")))
    assert(m("v") == ((3L, 3L, 2L, "5", "10")))
  }

  test("kneserNeyBigrams: hand-computed interpolated-KN probabilities; pruning keeps stats") {
    // corpus: "a b a b", "b c" -> BG (a,b):2 (b,a):1 (b,c):1, T=3
    // P(b|a) = (2-3/4)/2 + (3/4)(1/2)(1/3) = 3/4
    // P(a|b) = (1-3/4)/2 + (3/4)(2/2)(1/3) = 3/8 ; P(c|b) likewise
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val all = TextAnalysis.kneserNeyBigrams(docs, "doc_id", "text", minCount = 1L)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        (r.getAs[Long]("c_ab"), r.getAs[Long]("p_kn_1e6"))).toMap
    assert(all(("a", "b")) == ((2L, 750000L)))
    assert(all(("b", "a")) == ((1L, 375000L)))
    assert(all(("b", "c")) == ((1L, 375000L)))
    val pruned = TextAnalysis.kneserNeyBigrams(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Long]("p_kn_1e6")).toMap
    assert(pruned.keySet == Set(("a", "b")),
      s"minCount=2 must prune singleton rows: ${pruned.keySet}")
    assert(pruned(("a", "b")) == 750000L,
      "pruning must not move surviving probabilities (stats taken pre-prune)")
  }

  test("token count and quality ratios") {
    val df = Seq((1L, "one two  three")).toDF("doc_id", "text")
    assert(df.select(tokenCount($"text")).as[Long].collect()(0) == 3L)
    val q = TextAnalysis.qualitySignals(df, $"text").collect()(0)
    assert(q.getAs[Long]("n_tokens") == 3L)
  }

  test("fingerprint is whitespace/case-insensitive; rolling hash is order-aware") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "world hello")).toDF("id", "t")
    val fps = df.select($"id", TextAnalysis.fingerprint($"t"), TextAnalysis.rollingHash($"t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(1L)._1 == fps(2L)._1) // normalized equal
    assert(fps(2L)._1 != fps(3L)._1) // different content order
    assert(fps(2L)._2 != fps(3L)._2) // rolling hash sees order
  }

  test("shingles: under-n-token text yields empty set, no negative sequence") {
    val df = Seq((1L, "one two"), (2L, "")).toDF("id", "t")
    val out = df.select(size(shingles($"t", 3))).as[Int].collect()
    assert(out.toSeq == Seq(0, 0))
  }

  test("charShingles produces distinct sorted n-grams") {
    val out = Seq("abab").toDF("t").select(charShingles($"t", 2)).as[Seq[String]].collect()(0)
    assert(out == Seq("ab", "ba"))
  }

  test("curation pipeline drops exact dups, near-dup cluster losers, low quality, wrong lang") {
    val en = "the quick brown fox and the lazy dog went to the market for a fine day of trading " * 4
    val docs = Seq(
      (1L, en + "alpha"),               // keeper
      (2L, en + "alpha"),               // exact dup of 1 -> dropped
      (3L, en + "alphb"),               // near-dup of 1 (same 3-gram shingles mostly) -> cluster loser
      (4L, "der die das und ist ein zu mit von nicht " * 10), // German -> lang gate
      (5L, "1234 5678 " * 60),          // digit soup -> quality gate
      (6L, en + "completely different tail with many extra distinct tokens appended here")
    ).toDF("doc_id", "text")
    val kept = graft.operators.Curation.curate(docs, minQuality1e6 = 600000L, lang = "en")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L))
    assert(!kept.contains(4L), "German doc must fail the language gate")
    assert(!kept.contains(5L), "digit soup must fail the quality gate")
    assert(!kept.contains(3L), "near-dup cluster loser must be dropped")
  }

  test("rollingActive: window ending each observed day, overlap not double-counted") {
    val DayUs = 86400000000L
    // user 1 active days 0,1; user 2 day 1 (twice); user 3 day 4
    val events = Seq((1L, 0L), (1L, 1L), (2L, 1L), (2L, 1L), (3L, 4L))
      .map { case (u, d) => (u, d * DayUs + 5L) }.toDF("user_id", "ts_us")
    val out = graft.operators.EventAnalytics.rollingActive(
        events, "user_id", "ts_us", windowDays = 3)
      .collect().map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("rolling_active")))).toMap
    // only observed days appear; day 1 window covers days -1..1; day 4 covers 2..4
    assert(out == Map(0L -> ((1L, 1L)), 1L -> ((2L, 2L)), 4L -> ((1L, 1L))),
      s"got $out")
  }

  test("curriculumOrder: dense 1..n ordinal, bins in ascending blocks, deterministic") {
    val df = (1L to 100L).map(i => (i, i % 4)).toDF("doc_id", "difficulty")
    val out = graft.operators.Sampling.curriculumOrder(
        df, col("doc_id"), col("difficulty"), shards = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bin"),
        r.getAs[Long]("ordinal")))
    assert(out.map(_._3).sorted.toSeq == (1L to 100L), "ordinal is a dense permutation")
    val byOrd = out.sortBy(_._3).map(_._2)
    assert(byOrd.toSeq == byOrd.sorted.toSeq, "bins form ascending contiguous blocks")
    val again = graft.operators.Sampling.curriculumOrder(
        df, col("doc_id"), col("difficulty"), shards = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("ordinal"))).toSet
    assert(out.map(t => (t._1, t._3)).toSet == again, "reproducible run-over-run")
    // within a bin the order is hash-shuffled, not id order
    val bin0 = out.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(bin0.toSeq != bin0.sorted.toSeq, "within-bin order is pseudo-shuffled")
  }

  test("curriculumOrder: NULL bin raises instead of silently dropping") {
    val df = Seq((1L, Some(2L)), (2L, None)).toDF("doc_id", "difficulty")
    val ex = intercept[Exception] {
      graft.operators.Sampling.curriculumOrder(
        df, col("doc_id"), col("difficulty"), shards = 2).collect()
    }
    assert(ex.getMessage != null)
  }

  test("pageRank: hub of a star outranks leaves; mass is exact integer arithmetic") {
    // star: 1 — {2,3,4}, plus an isolated pair 5 — 6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("a", "b")
    val pr = graft.operators.Graph.pageRank(edges, "a", "b", iters = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L), s"symmetric leaves tie: $pr")
    assert(pr(1L) > pr(2L), s"hub must outrank leaves: $pr")
    assert(pr(5L) == pr(6L), s"symmetric pair ties: $pr")
    // hand-replay: deg(1)=3, leaves deg 1; pair nodes deg 1
    // t1: in(1)=3·(1e6/1)=3e6 → pr=150000+2550000=2700000;
    //     in(leaf)=1e6/3=333333 → pr=150000+283333=433333
    //     pair: in=1e6 → pr=1000000
    assert(pr(5L) == 1000000L, s"pair is a fixed point: $pr")
    val again = graft.operators.Graph.pageRank(edges, "a", "b", iters = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(pr == again, "deterministic across runs")
  }

  test("temporalDrift: stable mix scores below a flipped mix; first bucket emits nothing") {
    // day 0: a-heavy; day 1: same shape; day 2: flipped shape
    val rows =
      Seq.fill(9)((0L, "a")) ++ Seq.fill(1)((0L, "b")) ++
      Seq.fill(9)((1L, "a")) ++ Seq.fill(1)((1L, "b")) ++
      Seq.fill(1)((2L, "a")) ++ Seq.fill(9)((2L, "b"))
    val df = rows.toDF("day", "cat")
    val out = graft.operators.Diagnostics.temporalDrift(df, col("day"), col("cat"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("kl_mbits")).toMap
    assert(out.keySet == Set(1L, 2L), s"first bucket has no predecessor: $out")
    assert(out(2L) > out(1L), s"flip day must out-diverge the stable day: $out")
  }

  test("sourceCentroidMatrix: aligned sources out-cosine orthogonal ones") {
    val docs = Seq((1L, "p"), (2L, "p"), (3L, "q"), (4L, "r"))
      .toDF("doc_id", "source")
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.2f)),   // p ~ x-axis
      (3L, Seq(1.0f, 0.1f)),                          // q ~ x-axis too
      (4L, Seq(0.0f, 1.0f)))                          // r ~ y-axis
      .toDF("id", "emb")
    val m = graft.operators.Similarity.sourceCentroidMatrix(docs, "doc_id", "source", embs)
      .collect().map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("cos_1e6")).toMap
    assert(m.keySet == Set(("p", "q"), ("p", "r"), ("q", "r")), s"upper triangle: $m")
    assert(m(("p", "q")) > 900000L, s"aligned sources near cos 1: $m")
    assert(m(("p", "r")) < 300000L && m(("q", "r")) < 300000L,
      s"orthogonal source stays low: $m")
  }

  test("mutualBestMatch: one-to-one, mutual argmax only, ties to lowest id") {
    // l1's best is r1 (dist 0) and vice versa → kept.
    // l2 prefers r1, but r1 prefers l1 → l2 unmatched.
    // l3/r3 tie with l3/r4 at dist 1 → tie breaks to r3; r3 agrees → kept.
    val pairs = Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (2L, 2L, 2L),
      (3L, 3L, 1L), (3L, 4L, 1L))
      .toDF("id_l", "id_r", "dist")
    val m = graft.operators.FuzzyJoin.mutualBestMatch(pairs)
      .collect().map(r => (r.getAs[Long]("id_l"), r.getAs[Long]("id_r"),
        r.getAs[Long]("dist"))).toSet
    assert(m == Set((1L, 1L, 0L), (3L, 3L, 1L)), s"got $m")
  }

  test("quotaSplit: exactly floor(n·ppm/1e6) held out per stratum, deterministic") {
    val df = ((1L to 37L).map(i => (i, "a")) ++ (100L to 109L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val out = graft.operators.Sampling.quotaSplit(
        df, col("doc_id"), col("source"), heldoutPpm = 250000L, shards = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("stratum"),
        r.getAs[Boolean]("heldout")))
    assert(out.length == 47, "every input row labeled")
    val held = out.filter(_._3).groupBy(_._2).view.mapValues(_.length).toMap
    // floor(37·0.25)=9, floor(10·0.25)=2
    assert(held == Map("a" -> 9, "b" -> 2), s"got $held")
    val again = graft.operators.Sampling.quotaSplit(
        df, col("doc_id"), col("source"), heldoutPpm = 250000L, shards = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("heldout"))).toSet
    assert(out.map(t => (t._1, t._3)).toSet == again, "selection is deterministic")
  }

  test("evalCoverage: per-eval-doc covered-gram share; zero-gram docs report 0") {
    val corpus = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma zeta"),   // grams: abg (covered), bgz (not) → 1/2
      (2L, "unrelated words entirely completely"), // 0/2
      (3L, "xy"))                       // < 3 tokens → 0 grams
      .toDF("doc_id", "text")
    val out = graft.operators.Decontaminate.evalCoverage(
        corpus, "text", bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("eval_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_covered"),
          r.getAs[Long]("share_1e6")))).toMap
    assert(out(1L) == ((2L, 1L, 500000L)), s"half covered: $out")
    assert(out(2L) == ((2L, 0L, 0L)), s"uncovered: $out")
    assert(out(3L) == ((0L, 0L, 0L)), s"zero-gram doc reports 0, no error: $out")
  }

  test("repeatedNgrams: doc frequency and occurrence counts, unique grams dropped") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, shared + " " + shared), // the shared 6-gram at positions 0 and 6
      (2L, shared),
      (3L, "totally different words that never repeat anywhere at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedNgrams(docs, "doc_id", "text",
      n = 6, minDocs = 2L, topK = 10).collect()
    assert(out.length == 1, s"only the shared 6-gram crosses minDocs: ${out.toSeq}")
    assert(out.head.getAs[String]("gram") == shared)
    assert(out.head.getAs[Long]("n_docs") == 2L, "docs 1 and 2")
    assert(out.head.getAs[Long]("n_occ") == 3L, "twice in doc 1, once in doc 2")
  }

  test("gopherRules: hand-computed rule booleans per document") {
    val docs = Seq(
      // 13 words, Σlen=39 (mean exactly 3.0), 4 distinct stopwords,
      // no symbols/bullets/ellipsis → all rules pass
      (1L, "the cat sat on the mat and it was happy to be there"),
      // every line bullet-led → ok_bullets false (3/3 > 90%)
      (2L, "- item one\n- item two\n- item three"),
      // 2 of 3 lines end '...' (> 30%) and 4 symbol hits ('#'×2 +
      // '...'×2) against 10 words (> 10%) → ok_ellipsis/ok_symbols false
      (3L, "this goes on...\nand on...\nmore # stuff # here"),
      // NULL text behaves as empty: 0 words fails ok_words
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
        minWords = 3L, maxWords = 100L, minStopHits = 2L)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Boolean]("ok_words") && out(1L).getAs[Boolean]("ok_mean_len")
      && out(1L).getAs[Boolean]("ok_symbols") && out(1L).getAs[Boolean]("ok_bullets")
      && out(1L).getAs[Boolean]("ok_ellipsis") && out(1L).getAs[Boolean]("ok_alpha")
      && out(1L).getAs[Boolean]("ok_stops") && out(1L).getAs[Boolean]("pass"),
      s"clean doc passes all rules: ${out(1L)}")
    assert(!out(2L).getAs[Boolean]("ok_bullets") && !out(2L).getAs[Boolean]("pass"),
      s"all-bullet doc fails ok_bullets: ${out(2L)}")
    assert(!out(3L).getAs[Boolean]("ok_ellipsis") && !out(3L).getAs[Boolean]("ok_symbols")
      && !out(3L).getAs[Boolean]("pass"),
      s"ellipsis/symbol doc fails those rules: ${out(3L)}")
    assert(out(3L).getAs[Boolean]("ok_bullets"), s"no bullets in doc 3: ${out(3L)}")
    assert(out(4L).getAs[Long]("n_words") == 0L && !out(4L).getAs[Boolean]("ok_words")
      && !out(4L).getAs[Boolean]("pass"), s"null text = empty doc: ${out(4L)}")
  }

  test("rollingActiveSketch: HLL window union tracks the exact series") {
    val DayUs = 86400000000L
    val events = (1L to 400L).flatMap { u =>
      // user u active on day u%5 and (if even) day u%5 + 2
      val d0 = u % 5
      val ds = if (u % 2 == 0) Seq(d0, d0 + 2) else Seq(d0)
      ds.map(d => (u, d * DayUs + u))
    }.toDF("user_id", "ts_us")
    val exact = graft.operators.EventAnalytics.rollingActive(
        events, "user_id", "ts_us", windowDays = 3)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("rolling_active")).toMap
    val est = graft.operators.EventAnalytics.rollingActiveSketch(
        events, "user_id", "ts_us", windowDays = 3, lgK = 12)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("rolling_est")).toMap
    assert(est.keySet == exact.keySet, s"same observed days: $est vs $exact")
    exact.foreach { case (day, ex) =>
      val e = est(day)
      assert(math.abs(e - ex) <= math.max(1L, (0.05 * ex).toLong),
        s"day $day: estimate $e vs exact $ex outside 5%")
    }
  }

  test("dailyAnomalies: integer z-test flags the spike, cold start never flags") {
    val DayUs = 86400000000L
    // type "a": 10 events/day for days 1-8, 50 on day 9 (spike);
    // type "b": constant 5/day (zero variance, never flags)
    val rows =
      (1 to 8).flatMap(d => (1 to 10).map(i => ("a", d * DayUs + i))) ++
      (1 to 50).map(i => ("a", 9 * DayUs + i)) ++
      (1 to 9).flatMap(d => (1 to 5).map(i => ("b", d * DayUs + i)))
    val events = rows.toDF("event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = graft.operators.EventAnalytics.dailyAnomalies(
        events, "event_type", "ts", lookback = 7, minPrev = 4, sigma = 2)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) -> r)
      .toMap
    assert(out.size == 18, s"9 days x 2 types: ${out.keySet}")
    val flagged = out.filter(_._2.getAs[Boolean]("is_anomaly")).keySet
    assert(flagged == Set(("a", "1970-01-10")),
      s"only the day-9 spike flags (zero-variance trailing window, 50 vs 10): $flagged")
    // cold start: the first 4 observed days of type a have n_prev < 4
    // even though day 1 deviates from an empty window (d·DayUs lands
    // on 1970-01-(d+1))
    assert(out(("a", "1970-01-06")).getAs[Long]("n_prev") == 4L &&
      out(("a", "1970-01-03")).getAs[Long]("n_prev") == 1L,
      "ROWS frame counts observed trailing days")
  }

  test("tfidfKeywords: bit-length idf, per-doc ranks, ties to term order") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry durian durian durian")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", topK = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("score")))
      .toMap
    // N=3 (bitlen 2); df=1 → idf 1 bit; df=2 → idf 0 bits
    assert(out((1L, 1L)) == (("apple", 2L, 2L)), s"doc1 top = apple tf2·idf1: $out")
    assert(out((1L, 2L)) == (("banana", 1L, 0L)), "doc1 rank2 = banana score 0")
    assert(out((3L, 1L)) == (("durian", 3L, 3L)), "doc3 top = durian tf3·idf1")
    assert(out((2L, 1L))._3 == 0L &&
      out((2L, 1L))._1 == "banana" && out((2L, 2L))._1 == "cherry",
      s"doc2 all-zero scores rank by term asc: $out")
  }

  test("noveltyCurve: first-seen vs distinct gram counts per bucket") {
    val docs = Seq(
      (0L, "a b c d"), (1L, "a b c"),
      (2L, "a b c x"), (3L, "q w e r")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyCurve(docs, "doc_id", "text",
        n = 3, bucketSize = 2L)
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_distinct"), r.getAs[Long]("n_new"),
          r.getAs[Long]("cum_grams"), r.getAs[Long]("novelty_1e6"))))
      .toMap
    assert(out(0L) == ((2L, 2L, 2L, 1000000L)),
      s"bucket 0: grams {a b c, b c d} all first-seen: $out")
    assert(out(1L) == ((4L, 3L, 5L, 750000L)),
      s"bucket 1: 4 distinct, 'a b c' already seen → 3 new: $out")
  }

  test("cellPurity: majority label per trained cell, ties to lower label") {
    // iters=0 → centroids are the two lowest-id vectors; cosine
    // assignment sends 3,4 to cell 0 and 5 to cell 1
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(0.95f, 0.05f)), (5L, Seq(0.1f, 0.9f))
    ).toDF("id", "emb")
    val labels = Seq((1L, 0L), (2L, 7L), (3L, 0L), (4L, 1L), (5L, 5L))
      .toDF("id", "label")
    val cents = graft.operators.Similarity.trainCentroids(corpus, k = 2, iters = 0)
    val out = graft.operators.Similarity.cellPurity(corpus, labels, cents)
      .collect()
      .map(r => r.getAs[Long]("cid") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("major_label"),
          r.getAs[Long]("n_major"), r.getAs[Long]("purity_1e6")))).toMap
    assert(out(0L) == ((3L, 0L, 2L, 666666L)),
      s"cell 0: labels {0,0,1} → majority 0 at 2/3: $out")
    assert(out(1L) == ((2L, 5L, 1L, 500000L)),
      s"cell 1: labels {7,5} tie → lower label 5 wins: $out")
  }

  test("recallAtK: counts exact neighbors surviving the bucketed path") {
    // signBits=1 → bucket = sign of dim 0. Query 10's true nearest
    // (id 1) sits in the OTHER bucket → recall 0; query 20's true
    // nearest (id 2) shares its bucket → recall 1.
    val corpus = Seq(
      (1L, Seq(-0.001f, 1.0f)), (2L, Seq(0.5f, 0.866f))
    ).toDF("id", "emb")
    val queries = Seq(
      (10L, Seq(0.001f, 1.0f)), (20L, Seq(1.0f, 0.1f))
    ).toDF("id", "emb")
    val out = graft.operators.Similarity.recallAtK(
        corpus, queries, k = 1, signBits = 1)
      .collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("recall_1e6")))).toMap
    assert(out(10L) == ((0L, 0L)), s"true neighbor lost to the other bucket: $out")
    assert(out(20L) == ((1L, 1000000L)), s"same-bucket neighbor kept: $out")
  }

  test("recallAtK: denominator is the per-query exact count, not k") {
    // corpus of 2 → every query has only 2 true neighbors; a perfect
    // approximate path must still read recall 1.0 at k=3
    val corpus = Seq(
      (1L, Seq(0.6f, 0.8f)), (2L, Seq(0.8f, 0.6f))
    ).toDF("id", "emb")
    val queries = Seq((10L, Seq(0.7f, 0.71f))).toDF("id", "emb")
    val out = graft.operators.Similarity.recallAtK(
        corpus, queries, k = 3, signBits = 1)
      .collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("recall_1e6")))).toMap
    // signBits=1 on all-positive dim 0 → one bucket → approx == exact
    assert(out(10L) == ((2L, 1000000L)),
      s"2 of 2 true neighbors kept → recall 1e6: $out")
  }

  test("userFeatures: sessions, purchases, cents, active days, recency") {
    val H = 3600000000L; val D = 24L * H
    val rows = Seq(
      (1L, 0L, 1.0, "purchase"), (1L, 600000000L, 1.0, "click"),
      (1L, 2 * H, 1.0, "click"), (1L, 2 * H + 300000000L, 1.0, "view"),
      (2L, 3 * D, 2.5, "click"))
    val events = rows.toDF("user_id", "ts_us", "value", "event_type")
    val out = graft.operators.EventAnalytics.userFeatures(
        events, "user_id", "ts_us", "value", "event_type")
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = out(1L)
    assert(u1.getAs[Long]("n_events") == 4L && u1.getAs[Long]("n_purchases") == 1L)
    assert(u1.getAs[Long]("n_sessions") == 2L,
      s"10-min gap continues, 110-min gap splits: $u1")
    assert(u1.getAs[Long]("active_days") == 1L &&
      u1.getAs[Long]("sum_value_c") == 400L)
    assert(u1.getAs[Long]("recency_days") == 2L,
      s"watermark 3d - last 2h05m = 2 whole days: $u1")
    val u2 = out(2L)
    assert(u2.getAs[Long]("n_sessions") == 1L &&
      u2.getAs[Long]("sum_value_c") == 250L &&
      u2.getAs[Long]("recency_days") == 0L, s"$u2")
  }

  test("freqSpectrum: log2 bands with type/token mass and exact shares") {
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.freqSpectrum(docs, "text").collect()
      .map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("share_1e6")))).toMap
    assert(out == Map(
      1L -> ((1L, 1L, 142857L)),   // hapax: c
      2L -> ((1L, 2L, 285714L)),   // b ×2
      3L -> ((1L, 4L, 571428L))),  // a ×4
      s"bands keyed by bitlen(count): $out")
  }

  test("triangles: node-ordered enumeration closes wedges exactly once") {
    // K4 on {1,2,3,4} → 4 triangles; hub 10-{11,12,13} with no
    // spoke-spoke edges → 0 triangles from the hub
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (1L, 2L) // duplicate edge must not duplicate triangles
    ).toDF("id_a", "id_b")
    val out = graft.operators.Graph.triangles(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)),
      s"K4's 4 triangles, hub-spokes none, each exactly once: $out")
  }

  test("gramMatrix: exact fixed-point upper-triangle sums") {
    val corpus = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(0.5f, -1.0f))
    ).toDF("id", "emb")
    val out = graft.operators.Similarity.gramMatrix(corpus, dims = 2)
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        ((r.getAs[Long]("sum_1e6"), r.getAs[Long]("n_rows")))).toMap
    // (0,0): 1 + 0.25 → 1000000 + 250000; (0,1): 2 + (-0.5) → 2000000
    // + floor(-0.5e6) = −500000; (1,1): 4 + 1
    assert(out((0L, 0L)) == ((1250000L, 2L)), s"$out")
    assert(out((0L, 1L)) == ((1500000L, 2L)), s"$out")
    assert(out((1L, 1L)) == ((5000000L, 2L)), s"$out")
  }

  test("semanticDedup2: subcell-partitioned pairs still find in-cell dups") {
    // 8 vectors in two obvious level-1 clusters around (1,0) and
    // (0,1); each cluster holds one near-dup pair (cos > 0.95) and
    // ids that seed deterministically. k1=k2=2, 1 Lloyd iter.
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.001f)),   // dup pair A
      (3L, Seq(0.8f, 0.6f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.001f, 0.999f)),   // dup pair B
      (6L, Seq(0.6f, 0.8f)),
      (7L, Seq(0.9f, 0.436f)), (8L, Seq(0.436f, 0.9f))
    )
    val corpus = rows.toDF("id", "emb")
    val cents1 = graft.operators.Similarity.trainCentroids(corpus, k = 2, iters = 2)
    val out = graft.operators.Dedup.semanticDedup2(corpus, cents1,
        k2 = 2, iters = 1, threshold1e6 = 999000L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rep_id"), r.getAs[Long]("kept")))).toMap
    assert(out.size == 8, s"every corpus row reported: $out")
    assert(out(2L) == ((1L, 0L)), s"near-dup 2 folds to rep 1: $out")
    assert(out(5L) == ((4L, 0L)), s"near-dup 5 folds to rep 4: $out")
    assert(Seq(1L, 3L, 4L, 6L).forall(i => out(i) == ((i, 1L))),
      s"singletons keep themselves: $out")
  }

  test("trainSubCentroids: per-cell seeds, distributed means, empty-cell carry") {
    // one level-1 cell (cid 0) with 3 one-dim-ish vectors; k2=2 seeds
    // from the two lowest ids; one iteration reassigns and means
    val cells = Seq(
      (0, 1L, Seq(0.0f, 0.0f)), (0, 2L, Seq(1.0f, 0.0f)),
      (0, 3L, Seq(1.0f, 0.02f))
    ).toDF("cid", "id", "emb")
    val sub = graft.operators.Similarity.trainSubCentroids(cells, k2 = 2, iters = 1)
      .collect().map(r => r.getAs[Int]("cid2") ->
        r.getSeq[Double](r.fieldIndex("cemb"))).toMap
    // seed 0 = zero vector (scores 0 everywhere, keeps only itself →
    // mean stays (0,0)); seed 1 = (1,0) attracts id 3 → mean of the two
    assert(sub(0) == Seq(0.0, 0.0), s"$sub")
    assert(math.abs(sub(1).head - 1.0) < 1e-9 &&
      math.abs(sub(1)(1) - 0.01) < 1e-4, s"mean of (1,0),(1,0.02): $sub")
  }

  test("gramMatrix: a row narrower than dims fails loudly, not silently") {
    val corpus = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(0.5f)) // row 2 is too narrow
    ).toDF("id", "emb")
    val e = intercept[Exception] {
      graft.operators.Similarity.gramMatrix(corpus, dims = 2).collect()
    }
    // the raise_error message survives somewhere in the cause chain
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("fewer than dims=2")), s"$e")
  }

  test("audienceOverlap: exact pairwise intersections + in-bound HLL flags") {
    // A = users 1..300, B = 201..500 (overlap 100), C = 1000..1009
    // (disjoint from both)
    val rows = (1L to 300L).map(u => ("A", u)) ++
      (201L to 500L).map(u => ("B", u)) ++
      (1000L to 1009L).map(u => ("C", u)) ++
      (1L to 50L).map(u => ("A", u)) // duplicates must not inflate
    val events = rows.toDF("event_type", "user_id")
    val out = graft.operators.Sketches.audienceOverlap(
        events, "event_type", "user_id")
      .collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
          r.getAs[Long]("exact_both"), r.getAs[Long]("est_ok")))).toMap
    assert(out(("A", "B")) == ((300L, 300L, 100L, 1L)), s"$out")
    assert(out(("A", "C")) == ((300L, 10L, 0L, 1L)), s"disjoint pair: $out")
    assert(out(("B", "C")) == ((300L, 10L, 0L, 1L)), s"$out")
  }

  test("sourceGini: ranked shares and exact integer Gini") {
    val docs = Seq((1L, "A", "a b c"), (2L, "B", "a")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceGini(docs, "source", "text").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("rank"),
          r.getAs[Long]("share_1e6"), r.getAs[Long]("gini_1e6")))).toMap
    // ranks (tokens asc): B=1, A=2; S=4, Σrank·tok=7, n=2 →
    // G = (2·7 − 3·4)/(2·4) = 0.25
    assert(out("B") == ((1L, 1L, 250000L, 250000L)), s"$out")
    assert(out("A") == ((3L, 2L, 750000L, 250000L)), s"$out")
  }

  test("pmiCollocations: fixed-point odds ratio, deterministic tie order") {
    val docs = Seq((1L, "x y x y"), (2L, "z z")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.pmiCollocations(
        docs, "text", minCount = 1L, topK = 10)
      .collect()
      .map(r => (r.getAs[String]("gram"), r.getAs[Long]("c_ab"),
        r.getAs[Long]("ratio_1e6")))
    // bigram stream: "x y"×2, "y x"×1, "z z"×1 → N=4
    // "y x": (1·4e6)/(1·1)=4e6; "z z": same; "x y": (2·4e6)/(2·2)=2e6
    assert(out.toSeq == Seq(
      ("y x", 1L, 4000000L), ("z z", 1L, 4000000L), ("x y", 2L, 2000000L)),
      s"ratio desc then gram asc: ${out.toSeq}")
  }

  test("docLmBits: hand-computed KN bits incl. backoff for pruned pairs") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // pairs: doc1 (a,b)×2 (b,a)×1; doc2 (a,b)×1 (b,c)×1
    // BG: (a,b)=3 (b,a)=1 (b,c)=1; L: a→(3,1), b→(2,2); R: a=1 b=1 c=1; T=3
    // (a,b) c_ab=3≥2: ((4·3−3)·3 + 3·1·1)·1e6 // (4·3·3) = 30e6//36 = 833333
    //   bits = 20 − bitlen(833333)=20 → 0
    // (b,a)/(b,c) backoff: (3·2·1·1e6) // (4·2·3) = 250000 → bits = 20−18 = 2
    val out = TextAnalysis.docLmBits(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("sum_bits"), r.getAs[Long]("avg_millibits")))
    assert(out.toSeq == Seq((1L, 3L, 2L, 666L), (2L, 2L, 2L, 1000L)), s"${out.toSeq}")
  }

  test("docLmBits: single-token and empty docs drop; all docs else emit") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    val out = TextAnalysis.docLmBits(docs, "doc_id", "text").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(3L))
  }

  test("powerIterationPc1: dominant axis recovered, max component at 1e6") {
    val corpus = Seq(
      (1L, Seq(10.0, 0.1)), (2L, Seq(-9.0, 0.2)), (3L, Seq(8.0, -0.1)),
      (4L, Seq(0.1, 1.0)), (5L, Seq(-0.2, -1.0))).toDF("id", "emb")
    val v = Similarity.powerIterationPc1(corpus, dims = 2, iters = 3)
    assert(math.abs(v(0)) == 1000000L, s"dominant x-axis component: $v")
    assert(math.abs(v(1)) < 200000L, s"minor axis stays small: $v")
  }

  test("pc1Outliers: extremes of the dominant axis rank first, id tie-break") {
    val corpus = Seq(
      (1L, Seq(10.0, 0.0)), (2L, Seq(-9.0, 0.0)), (3L, Seq(8.0, 0.0)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(0.0, -1.0))).toDF("id", "emb")
    val out = Similarity.pc1Outliers(corpus, dims = 2, iters = 3, k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("id"))
    assert(out.toSeq == Seq(1L, 2L, 3L), s"|proj| desc: ${out.toSeq}")
  }

  test("pc1Outliers: zero matrix degenerates to all-ones direction, no crash") {
    val corpus = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0))).toDF("id", "emb")
    val v = Similarity.powerIterationPc1(corpus, dims = 2, iters = 2)
    assert(v == Seq(1000000L, 1000000L), s"$v")
  }

  test("ivfPqRefineTopK: full shortlist + full probe ≡ exact brute force") {
    // two tight clusters; with nprobe = k(coarse) and kShort covering
    // every candidate, refine must reproduce the exact ranking
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.1, 0.0)), (2L, Seq(0.9, 0.1, 0.0, 0.0)),
      (3L, Seq(1.0, 0.1, 0.1, 0.0)), (4L, Seq(0.0, 0.1, 0.9, 1.0)),
      (5L, Seq(0.1, 0.0, 1.0, 0.9)), (6L, Seq(0.0, 0.0, 1.0, 1.0)))
    val corpus = vecs.toDF("id", "emb")
    val queries = corpus.filter(col("id").isin(1L, 4L))
    val coarse = Similarity.trainCentroids(corpus, k = 2, iters = 2)
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 2, iters = 2)
    val refined = Similarity.ivfPqRefineTopK(corpus, queries, coarse, books,
        k = 2, kShort = 6, nprobe = 2)
      .select("query_id", "rank", "neighbor_id", "score_1e6")
      .orderBy("query_id", "rank").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .orderBy("query_id", "rank").collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("score_1e6")))
    assert(refined.toSeq == exact.toSeq, s"refine=${refined.toSeq} exact=${exact.toSeq}")
  }

  test("lshBandSweep: identical docs collide in every band of every config") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((1L, base), (2L, base),
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val out = Dedup.lshBandSweep(df, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band"),
        r.getAs[Long]("n_buckets"), r.getAs[Long]("n_candidate_pairs"),
        r.getAs[Long]("max_bucket"))).toSeq
    assert(out.map(c => (c._1, c._2)) == Seq((16L, 1L), (8L, 2L), (4L, 4L), (2L, 8L)))
    out.foreach { case (bands, _, nb, pairs, mx) =>
      // the identical pair collides in all `bands` bands → ≥ bands raw pairs
      assert(pairs >= bands, s"identical docs must collide everywhere: $out")
      assert(mx >= 2L, s"a shared bucket exists: $out")
      // Σ sz over buckets = 3 docs · bands rows; with one shared pair
      // per band, bucket count is ≤ 2 per band
      assert(nb <= 2L * bands && nb >= bands, s"bucket-count bounds: $out")
    }
  }

  test("refineRecallReport: full probe + full shortlist → refine recall is 1") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.1, 0.0)), (2L, Seq(0.9, 0.1, 0.0, 0.0)),
      (3L, Seq(1.0, 0.1, 0.1, 0.0)), (4L, Seq(0.0, 0.1, 0.9, 1.0)),
      (5L, Seq(0.1, 0.0, 1.0, 0.9)), (6L, Seq(0.0, 0.0, 1.0, 1.0)))
    val corpus = vecs.toDF("id", "emb")
    val queries = corpus.filter(col("id").isin(1L, 4L))
    val coarse = Similarity.trainCentroids(corpus, k = 2, iters = 2)
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 2, iters = 2)
    val out = Similarity.refineRecallReport(corpus, queries, coarse, books,
        k = 2, kShort = 6, nprobe = 2).orderBy("query_id").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("recall_refine_1e6") == 1000000L,
        s"refine over the full candidate set must be exact: ${out.mkString(";")}")
      assert(r.getAs[Long]("hits_adc") <= r.getAs[Long]("hits_refine"),
        s"refine never loses recall vs plain ADC: ${out.mkString(";")}")
      assert(r.getAs[Long]("n_exact") == 2L)
    }
  }

  test("vocabCoverage: OOV mass per source, deterministic tie-break at the cut") {
    val docs = Seq((1L, "A", "a a b"), (2L, "B", "c")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.vocabCoverage(docs, "source", "text", topV = 1)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("n_oov_types"), r.getAs[Long]("oov_ppm")))).toMap
    // vocab = {a} (count 2); A: b is OOV (1 of 3); B: c is OOV (1 of 1)
    assert(out("A") == ((3L, 1L, 1L, 333333L)), s"$out")
    assert(out("B") == ((1L, 1L, 1L, 1000000L)), s"$out")
    // count tie at the cut → term asc wins: vocab = {a}, b stays OOV
    val tie = Seq((1L, "S", "b a")).toDF("doc_id", "source", "text")
    val t = TextAnalysis.vocabCoverage(tie, "source", "text", topV = 1).collect()(0)
    assert(t.getAs[Long]("n_oov") == 1L, s"tie must resolve to 'a' in-vocab: $t")
  }

  test("dedupSavings: per-source token mass through exact + near-dup stages") {
    val base = "the quick brown fox jumps over the lazy dog again and again today" // 13
    val docs = Seq(
      (1L, "X", base), (2L, "X", base),                    // exact dup inside X
      (5L, "Z", base),                                     // exact dup ACROSS sources
      (3L, "Y", "completely different words entirely unrelated content here now") // 8
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.Diagnostics.dedupSavings(docs, "doc_id", "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("tokens_after_exact"), r.getAs[Long]("tokens_after_neardup"),
          r.getAs[Long]("retained_ppm")))).toMap
    // keeper of `base` is min(doc_id) = 1 → X keeps one copy, Z keeps NONE
    assert(out("X") == ((2L, 26L, 13L, 13L, 500000L)), s"$out")
    assert(out("Z") == ((1L, 13L, 0L, 0L, 0L)), s"fully-deduped source reports 0: $out")
    assert(out("Y") == ((1L, 8L, 8L, 8L, 1000000L)), s"$out")
  }

  test("simhashHammingHistogram: h=0 mass for identical docs; cumulative consistent with pairs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((1L, base), (2L, base),
      (3L, "completely different words entirely unrelated content here now"),
      (4L, base + " extra tail")).toDF("doc_id", "text")
    val hist = Dedup.simhashHammingHistogram(df, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("hamming"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_pairs_le")))
    assert(hist.head._1 == 0L && hist.head._2 >= 1L,
      s"identical docs must land a Hamming-0 pair: ${hist.toSeq}")
    // cumulative is monotone and ends at the total
    assert(hist.map(_._3).toSeq == hist.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
    // the ≤3 cumulative equals the verified pair count of simhashPairs
    val le3 = hist.filter(_._1 <= 3L).map(_._2).sum
    val verified = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3).count()
    assert(le3 == verified, s"histogram(≤3)=$le3 vs simhashPairs=$verified")
  }

  test("kCenterSelect: greedy farthest-point picks diverse anchors, seed = min id") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)),
      (4L, Seq(0.1, 0.9)), (5L, Seq(-1.0, -1.0))).toDF("id", "emb")
    val out = Similarity.kCenterSelect(corpus, k = 3).collect()
      .map(r => (r.getAs[Long]("pick_no"), r.getAs[Long]("center_id"),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    // seed = 1; farthest from 1 = 5 (cos ≈ −0.707); then 3 (cos 0 to
    // center 1 beats 4's 0.11 and 2's 0.99)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((1L, 1L), (2L, 5L), (3L, 3L)),
      s"${out.toSeq}")
    assert(out(0)._3.isEmpty, "seed has no coverage radius")
    assert(out(1)._3.get < 0L, s"pick 2 was anti-aligned: ${out.toSeq}")
    assert(out(2)._3.get == 0L, s"pick 3 was orthogonal: ${out.toSeq}")
  }

  test("kCenterSelect: corpus smaller than k returns one pick per row, no null picks") {
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "emb")
    val out = Similarity.kCenterSelect(corpus, k = 5).collect()
    assert(out.length == 2, s"2-row corpus must yield 2 picks: ${out.toSeq}")
    assert(out.forall(r => !r.isNullAt(1)), s"no null center ids: ${out.toSeq}")
  }

  test("powerIterationPc1: empty corpus degrades to the all-ones start vector") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "emb")
    val v = Similarity.powerIterationPc1(empty, dims = 3, iters = 2)
    assert(v == Seq(1000000L, 1000000L, 1000000L), s"$v")
  }

  test("semanticCosineHistogram: within-cell pair mass, cumulative from the top") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.99, 0.01)), (3L, Seq(0.98, 0.02)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(0.01, 0.99))).toDF("id", "emb")
    val cents = Similarity.trainCentroids(corpus, k = 2, iters = 2)
    val out = Dedup.semanticCosineHistogram(corpus, cents).collect()
      .map(r => (r.getAs[Long]("bucket_lo_1e6"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_pairs_ge")))
    // two tight cells of 3 and 2 members → 3 + 1 within-cell pairs
    assert(out.map(_._2).sum == 4L, s"pair mass: ${out.toSeq}")
    // ordered desc, cumulative is the running total, buckets on the grid
    assert(out.map(_._1).toSeq == out.map(_._1).sortBy(-_).toSeq)
    assert(out.map(_._3).toSeq == out.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
    out.foreach { case (b, _, _) => assert(b % 50000L == 0L, s"grid: $b") }
    // all pairs here are near-aligned → every bucket is high-cosine
    assert(out.forall(_._1 >= 900000L), s"tight cells: ${out.toSeq}")
  }

  test("simhashPairs maxBucketSize: over-cap buckets drop wholesale; survivors unchanged") {
    // 6 near-identical template docs share every band bucket (size 6);
    // 2 distinct docs pair only with their own twin (size-2 buckets)
    val tmpl = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = ((1L to 6L).map(i => (i, tmpl)) ++
      Seq((10L, "totally different words here now"),
        (11L, "totally different words here now"))).toDF("doc_id", "text")
    val all = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 32, bands = 4, maxHamming = 3)
    val capped = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 32, bands = 4, maxHamming = 3, maxBucketSize = Some(5))
    assert(all.count() == 15 + 1, s"uncapped: C(6,2) template pairs + 1 twin pair")
    val cp = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cp == Set((10L, 11L)),
      s"cap must drop the size-6 template buckets, keep the twin pair: $cp")
  }

  test("fingerprintPairs: stride/mask banding over precomputed fingerprints; full-width hamming") {
    // two fingerprints sharing band 0's low byte (and nothing else),
    // one sharing no masked band with anyone
    val fps = Seq(
      (1L, 0x1111_2222_3333_11AAL),
      (2L, 0x4444_5555_6666_44AAL),  // band0 low 8 bits match id 1
      (3L, 0x7777_8888_9999_77BBL)).toDF("id", "fp")
    val pairs = Dedup.fingerprintPairs(fps, "id", "fp",
        bands = 4, strideBits = 16, maskBits = 8, maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expHam = java.lang.Long.bitCount(0x1111_2222_3333_11AAL ^ 0x4444_5555_6666_44AAL)
    assert(pairs.toSeq == Seq((1L, 2L, expHam.toLong)),
      s"only the band0-masked cohabitants pair, hamming over ALL 64 bits: ${pairs.toSeq}")
    // widening the mask past the shared byte separates them
    val none = Dedup.fingerprintPairs(fps, "id", "fp",
      bands = 4, strideBits = 16, maskBits = 16, maxHamming = 64).count()
    assert(none == 0, "16-bit masks see the differing high byte -> no pairs")
    // a mask wider than the stride would overlap bands -> rejected
    intercept[IllegalArgumentException] {
      Dedup.fingerprintPairs(fps, "id", "fp",
        bands = 4, strideBits = 16, maskBits = 17, maxHamming = 64)
    }
  }

  test("bucketConnectedComponents ≡ pairwise CC over the same banded frame") {
    // hand-built bands: docs 1,2 share a bucket; 2,3 share another
    // (transitively one component); 4,5 share; 6 sits alone
    val banded = Seq(
      (1L, 0, 10L), (2L, 0, 10L), (2L, 1, 20L), (3L, 1, 20L),
      (4L, 0, 30L), (5L, 0, 30L), (6L, 2, 99L)
    ).toDF("id", "band", "bval")
    val viaBuckets = Dedup.bucketConnectedComponents(banded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBuckets == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 4L), s"edge-less doc 6 must not be labeled: $viaBuckets")
    // identical to the pairwise formulation over all bucket cohabitants
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val viaPairs = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPairs == viaBuckets, s"$viaPairs vs $viaBuckets")
  }

  test("maintainComponents: merges, new-min relabel, untouched stability, " +
    "empty cases — always ≡ full recompute") {
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // prior: {1,2,3} rep 1, {10,11} rep 10, {20,21} rep 20
    val e1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val prior = Dedup.connectedComponents(e1)
    // delta: merge comps 1 and 10 via (3,10); new pair (30,31); a new
    // node 5 SMALLER than rep 10 joins 11 (must relabel the whole
    // merged component to 1's... 5 connects to 11 → comp {1..} ∪ {10,11}
    // ∪ {5}: global min 1); an IN-component edge (20,21) changes nothing
    val delta = Seq((3L, 10L), (30L, 31L), (5L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val maintained = labelsOf(Dedup.maintainComponents(prior, delta))
    val full = labelsOf(Dedup.connectedComponents(e1.unionByName(delta)))
    assert(maintained == full, s"$maintained vs $full")
    assert(maintained(5L) == 1L && maintained(10L) == 1L &&
      maintained(30L) == 30L && maintained(31L) == 30L)
    assert(maintained(20L) == 20L && maintained(21L) == 20L,
      s"untouched component must keep its label: $maintained")
    // new-min relabel in isolation: node 5 < rep 10 takes over
    val m2 = labelsOf(Dedup.maintainComponents(
      Dedup.connectedComponents(Seq((10L, 11L)).toDF("id_a", "id_b")),
      Seq((5L, 11L)).toDF("id_a", "id_b")))
    assert(m2 == Map(5L -> 5L, 10L -> 5L, 11L -> 5L), s"$m2")
    // empty delta → prior unchanged; empty prior → plain CC
    val pm = labelsOf(prior)
    assert(labelsOf(Dedup.maintainComponents(prior,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))) == pm)
    assert(labelsOf(Dedup.maintainComponents(
      Seq.empty[(Long, Long)].toDF("id", "cluster_id"),
      Seq((7L, 8L)).toDF("id_a", "id_b"))) == Map(7L -> 7L, 8L -> 7L))
    // the lake write set: prior overlaid with the delta rows must
    // reproduce the full maintained table, and only changed/new labels
    // may appear in it (the untouched component stays out)
    val writeSet = labelsOf(Dedup.maintainComponentsDelta(prior, delta))
    assert(pm ++ writeSet == maintained, s"$writeSet")
    assert(!writeSet.contains(20L) && !writeSet.contains(21L),
      s"untouched labels must not be rewritten: $writeSet")
    assert(writeSet.forall { case (id, c) => pm.get(id) != Some(c) },
      s"write set must carry only changes: $writeSet")
    // re-delivering an applied delta yields ZERO rows (upsert loops
    // are idempotent for free)
    val applied = Dedup.maintainComponents(prior, delta)
    assert(Dedup.maintainComponentsDelta(applied, delta).isEmpty,
      "re-delivered delta must produce an empty write set")
  }

  test("kmvKeyOverlap: sub-k regime is exact; disjoint, identical, and " +
    "sketched regimes") {
    import graft.operators.Sketches
    val a = (1L to 50L).toDF("ka")
    val b = (31L to 90L).toDF("kb")
    val r = Sketches.kmvKeyOverlap(a, col("ka"), b, col("kb")).collect()(0)
    assert(r.getAs[Long]("n_a") == 50 && r.getAs[Long]("n_b") == 60)
    assert(r.getAs[Long]("inter_exact") == 20 && r.getAs[Long]("union_exact") == 90)
    // both sketches exhaustive below k → every estimate IS its exact
    assert(r.getAs[Long]("est_n_a") == 50 && r.getAs[Long]("est_n_b") == 60)
    assert(r.getAs[Long]("est_union") == 90 && r.getAs[Long]("est_inter") == 20)
    assert(r.getAs[Long]("j_num") == 20 && r.getAs[Long]("within_3sig") == 1)
    val d = Sketches.kmvKeyOverlap(a, col("ka"),
      (100L to 120L).toDF("kb"), col("kb")).collect()(0)
    assert(d.getAs[Long]("j_num") == 0 && d.getAs[Long]("inter_exact") == 0 &&
      d.getAs[Long]("est_inter") == 0)
    val i = Sketches.kmvKeyOverlap(a, col("ka"), a, col("ka")).collect()(0)
    assert(i.getAs[Long]("j_num") == i.getAs[Long]("m_union_k") &&
      i.getAs[Long]("est_inter") == 50 && i.getAs[Long]("j_est_ppm") == 1000000L)
    // genuinely sketched regime (n ≫ k): deterministic hashes →
    // deterministic estimates; the 3σ flag must hold here
    val big = Sketches.kmvKeyOverlap(
      (1L to 2000L).toDF("ka"), col("ka"),
      (1001L to 3000L).toDF("kb"), col("kb"), k = 64).collect()(0)
    assert(big.getAs[Long]("m_union_k") == 64)
    assert(big.getAs[Long]("inter_exact") == 1000 &&
      big.getAs[Long]("union_exact") == 3000)
    assert(big.getAs[Long]("within_3sig") == 1,
      s"sketched-regime J must sit in the 3σ band: $big")
    intercept[IllegalArgumentException](
      Sketches.kmvKeyOverlap(a, col("ka"), b, col("kb"), k = 1))
    // NULL keys are no part of the overlap (they never match an
    // equi-join) and must not crash the primitive estimate path
    val an = ((1L to 50L).map(Option(_)) :+ (None: Option[Long])).toDF("ka")
    val rn = Sketches.kmvKeyOverlap(an, col("ka"), b, col("kb")).collect()(0)
    assert(rn == r, s"NULL keys must be excluded: $rn vs $r")
    val en = Sketches.kmvKeyOverlapEstimate(an, col("ka"), b, col("kb"))
      .collect()(0)
    assert(en.getAs[Long]("est_inter") == 20L,
      s"estimate path must skip NULL keys: $en")
    // the estimate-only call pins to the report's estimate columns
    val estOnly = Sketches.kmvKeyOverlapEstimate(
      (1L to 2000L).toDF("ka"), col("ka"),
      (1001L to 3000L).toDF("kb"), col("kb"), k = 64).collect()(0)
    Seq("k", "m_union_k", "j_num", "est_n_a", "est_n_b", "est_union",
      "est_inter", "j_est_ppm").foreach(c =>
      assert(estOnly.getAs[Long](c) == big.getAs[Long](c),
        s"estimate-only $c must equal the report's"))
  }

  test("cmsPerSourceMerge: merged estimates bit-equal the direct sketch; exact ranks") {
    import graft.operators.Sketches
    val docs = Seq(
      (1L, "a", "x x x y z common common"),
      (2L, "b", "y y common w w w w"),
      (3L, "b", "common x y z z")).toDF("doc_id", "source", "text")
    val out = Sketches.cmsPerSourceMerge(docs, "text", "source", topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // exact counts: x=4, common=4, w=4, y=4, z=3 → top3 by (cnt desc, token)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("common", 1L, 4L), ("w", 2L, 4L), ("x", 3L, 4L)), s"${out.toSeq}")
    assert(out.forall(t => t._4 == 1L && t._5 == 1L && t._6 == 1L),
      s"merge equality and bounds must hold: ${out.toSeq}")
  }

  test("cmsPortableMerge: collision-free width is exact; forced collisions keep the hard guarantees") {
    import graft.operators.Sketches
    val docs = Seq(
      (1L, "a", "x x x y z common common"),
      (2L, "b", "y y common w w w w"),
      (3L, "b", "common x y z z")).toDF("doc_id", "source", "text")
    val out = Sketches.cmsPortableMerge(docs, "text", "source", topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("common", 1L, 4L), ("w", 2L, 4L), ("x", 3L, 4L)), s"${out.toSeq}")
    // 5 distinct tokens in an 8192-cell row: no collisions → est == cnt
    assert(out.forall(t => t._4 == t._3),
      s"collision-free sketch must be exact: ${out.toSeq}")
    assert(out.forall(t => t._5 == 1L && t._6 == 1L && t._7 == 1L),
      s"merge equality and both bounds: ${out.toSeq}")
    // width 2 forces collisions: the lower bound and the merge law are
    // HARD guarantees and must survive; est may exceed cnt
    val tight = Sketches.cmsPortableMerge(docs, "text", "source", topN = 5,
        depth = 2, width = 2)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(tight.forall(t => t._2 >= t._1 && t._3 == 1L && t._4 == 1L),
      s"est >= cnt and merged == direct even under full collision: ${tight.toSeq}")
  }

  test("kmvPerSourceMerge: merged k-set sketch equals the direct global sketch") {
    import graft.operators.Sketches
    // enough gram mass per source that sketches engage (k small here)
    val docs = (1 to 40).map { i =>
      val src = s"s${i % 4}"
      (i.toLong, src, (1 to 30).map(j => s"w${(i * 7 + j * 13) % 97}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Sketches.kmvPerSourceMerge(docs, "text", "source", k = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("s0", "s1", "s2", "s3", "_merged"))
    // the merged row must equal the direct single-pass global sketch
    val direct = Sketches.kmvSketchGrams(docs, "text", k = 16).collect()(0)
    assert(out("_merged") == ((direct.getAs[Long]("kth_hash"),
        direct.getAs[Long]("est_distinct"))),
      s"lossless merge: ${out("_merged")} vs direct $direct")
    // a source with fewer than k distinct grams estimates exactly
    val tiny = Seq((1L, "a", "x y z")).toDF("doc_id", "source", "text")
    val t = Sketches.kmvPerSourceMerge(tiny, "text", "source", k = 16).collect()
    assert(t.forall(_.getAs[Long]("est_distinct") == 1L),
      s"one distinct 3-gram -> exact estimate 1: ${t.toSeq}")
  }

  test("quantileSketchMerge: exact when n<=k; lossless merge; real-sample bands") {
    import graft.operators.Sketches
    // tiny sources (n < k): the sample IS the population → est is the
    // exact ceil(q·n)-th order statistic
    val tiny = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 100L), (6L, "b", 200L)
    ).toDF("doc_id", "source", "v")
    val t = Sketches.quantileSketchMerge(tiny, "doc_id", col("v"), "source",
        k = 16, qPcts = Seq(50, 99))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(7), r.getLong(8)))
      .toMap
    // source a: m=4 → q50 rank ceil(2.0)=2 → 20; q99 rank ceil(3.96)=4 → 40
    assert(t(("a", 50L))._3 == 20L && t(("a", 99L))._3 == 40L, s"$t")
    // source b: m=2 → q50 rank 1 → 100; q99 rank 2 → 200
    assert(t(("b", 50L))._3 == 100L && t(("b", 99L))._3 == 200L, s"$t")
    // merged over 6 rows: q50 rank 3 → 30
    assert(t(("_merged", 50L))._1 == 6L && t(("_merged", 50L))._3 == 30L, s"$t")
    assert(t.values.forall(x => x._4 == 1L && x._5 == 1L),
      s"exact populations must pass bands; merge must be lossless: $t")
    // real sampling (n > k): merge stays lossless, sample caps at k,
    // and the 4-sigma band holds on a smooth value domain
    val big = (1 to 600).map { i =>
      (i.toLong, s"s${i % 2}", (i * 37 % 601).toLong)
    }.toDF("doc_id", "source", "v")
    val b = Sketches.quantileSketchMerge(big, "doc_id", col("v"), "source",
      k = 64, qPcts = Seq(50, 90)).collect()
    assert(b.length == 6, s"${b.toSeq}")
    val merged = b.filter(_.getString(0) == "_merged")
    assert(merged.forall(r => r.getLong(2) == 600L && r.getLong(3) == 64L),
      s"${merged.toSeq}")
    assert(b.forall(r => r.getLong(7) == 1L && r.getLong(8) == 1L),
      s"bands + lossless merge on the sampled path: ${b.toSeq}")
    // the shared band helper: 4e6·sqrt(q(1−q)/k), ceil'd
    assert(Sketches.quantileBoundPpm(50, 16) == 500000L)
    assert(Sketches.quantileBoundPpm(50, 128) == 176777L)
  }

  test("robustOutlierReport: exact order-statistic med/MAD when n<=k; MAD-0 group flags any deviation") {
    import graft.operators.Diagnostics
    // g: 1..101 → med = 51st value = 51; devs 0,1,1,..,50,50 → MAD = 51st = 25;
    // no |v−51| exceeds 3·25. c: five 7s and one 8 → med 7, MAD 0 (rank 3
    // of [0,0,0,0,0,1]) → the 8 is the one outlier (any deviation flags)
    val rows = (1 to 101).map(i => (i.toLong, "g", i.toLong)) ++
      (102 to 106).map(i => (i.toLong, "c", 7L)) :+ ((107L, "c", 8L))
    val r = Diagnostics.robustOutlierReport(rows.toDF("id", "src", "v"),
        col("id"), col("v"), col("src"), k = 128)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("g") == (101L, 51L, 25L, 0L), s"${r("g")}")
    assert(r("c") == (6L, 7L, 0L, 1L), s"${r("c")}")
  }

  test("sketch family: NULL values never enter samples; all-NULL groups drop consistently") {
    import graft.operators.{Diagnostics, Sampling, Sketches}
    // source a mixes NULLs into real values; source z is all-NULL.
    // NULL-v rows must not enter any bottom-k sample (h is unique, so
    // the (h, v) cut would otherwise admit them and the (v, h) rank
    // windows would place them engine-specifically — the ADVICE-r11
    // cross-engine divergence).
    val rows = Seq(
      (1L, "a", Option(10L)), (2L, "a", Option(20L)), (3L, "a", Option(30L)),
      (4L, "a", None: Option[Long]),
      (5L, "z", None: Option[Long]), (6L, "z", None: Option[Long])
    ).toDF("doc_id", "source", "v")
    val q = Sketches.quantileSketchMerge(rows, "doc_id", col("v"), "source",
        k = 16, qPcts = Seq(50)).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(8)))).toMap
    // a: sample = {10,20,30} (m=3, est = 2nd = 20) while n_pop counts
    // the NULL row too; z: empty sample → no row; merge stays lossless
    assert(q.keySet == Set("a", "_merged"), s"${q.keySet}")
    assert(q("a") == (4L, 3L, 20L, 1L), s"${q("a")}")
    assert(q("_merged") == (6L, 3L, 20L, 1L), s"${q("_merged")}")
    // gate thresholds come from the non-NULL sample only: 1..10 with
    // NULL rows mixed in gates ranks 1..9, not the rank-shifted 2..
    val gd = ((1 to 10).map(i => (i.toLong, "a", Option(i.toLong))) ++
      Seq((11L, "a", None: Option[Long]), (12L, "a", None: Option[Long])))
      .toDF("doc_id", "source", "v")
    val kept = Sampling.sketchQuantileGate(gd, col("doc_id"), col("v"),
      col("source"), 10, 90, k = 16).collect()
    assert(kept.length == 9 && kept.forall(r => !r.isNullAt(2)),
      s"exact order-statistic gate over the non-NULL sample: ${kept.length}")
    // robust report: NULLs count into n_docs, never into outliers; an
    // all-NULL group has no sample and drops from the report entirely
    val ro = Diagnostics.robustOutlierReport(rows, col("doc_id"), col("v"),
        col("source"), k = 16).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(ro.keySet == Set("a") && ro("a") == (4L, 0L), s"$ro")
  }

  test("kmvPairwiseJaccard: exact when unions fit in k; disjoint pair estimates zero") {
    import graft.operators.Sketches
    val docs = Seq(
      (1L, "a", "w1 w2 w3 w4"), // grams: (w1 w2 w3), (w2 w3 w4)
      (2L, "b", "w1 w2 w3"),    // shares (w1 w2 w3): inter 1, union 2 → J = 0.5
      (3L, "c", "x1 x2 x3")     // disjoint from both
    ).toDF("doc_id", "source", "text")
    val r = Sketches.kmvPairwiseJaccard(docs, "text", "source", k = 8)
      .collect().map(row => ((row.getString(0), row.getString(1)),
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
          row.getLong(6), row.getLong(7), row.getLong(8)))).toMap
    assert(r.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")),
      s"all unordered pairs, ordered lexically: ${r.keySet}")
    // n < k ⇒ the k-sets are the full gram sets and the estimate is exact
    assert(r(("a", "b")) == (2L, 1L, 500000L, 1L, 2L, 500000L, 1L),
      s"a-b: m=2, j_num=1, est=exact=0.5: ${r(("a", "b"))}")
    val ac = r(("a", "c"))
    assert(ac._3 == 0L && ac._4 == 0L && ac._6 == 0L && ac._7 == 1L,
      s"disjoint pair: est 0, exact 0, within band: $ac")
    // sparse mode: the frontier comes from the k-set self-join, so
    // disjoint pairs never materialize; overlapping pairs are identical
    // to the dense rows
    val sp = Sketches.kmvPairwiseJaccard(docs, "text", "source", k = 8,
        candidatesOnly = true)
      .collect().map(row => ((row.getString(0), row.getString(1)),
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
          row.getLong(6), row.getLong(7), row.getLong(8)))).toMap
    assert(sp.keySet == Set(("a", "b")),
      s"only the overlapping pair appears: ${sp.keySet}")
    assert(sp(("a", "b")) == r(("a", "b")),
      "sparse rows must equal the dense computation on shared pairs")
    // the frontier law: dense below C(64,2)≈the measured sparse pair
    // mass of the 400-source probe, sparse at or past it
    import graft.operators.Sketches.suggestJaccardFrontier
    assert(!suggestJaccardFrontier(20L) && !suggestJaccardFrontier(63L))
    assert(suggestJaccardFrontier(64L) && suggestJaccardFrontier(400L))
    // auto on a 3-source corpus picks dense → full matrix incl. zeros
    val auto = Sketches.kmvPairwiseJaccardAuto(docs, "text", "source", k = 8)
      .collect().map(row => (row.getString(0), row.getString(1))).toSet
    assert(auto == Set(("a", "b"), ("a", "c"), ("b", "c")), s"$auto")
  }

  test("fingerprintOverlapPairs: shared frames score all bands once; disjoint entities absent; cap guards hot buckets") {
    import graft.operators.Dedup
    def fp(b0: Long, b1: Long, b2: Long, b3: Long): Long =
      b0 | (b1 << 16) | (b2 << 32) | (b3 << 48)
    val fpA = fp(1, 2, 3, 4); val fpB = fp(5, 6, 7, 8)
    val fpC = fp(9, 10, 11, 12); val fpD = fp(13, 14, 15, 16)
    // v1 = {A, A, B} (repeated frame must count once), v2 = {A, C},
    // v3 = {D} (band-disjoint from everything)
    val frames = Seq((1L, fpA), (1L, fpA), (1L, fpB),
      (2L, fpA), (2L, fpC), (3L, fpD)).toDF("vid", "fh")
    val pairs = Dedup.fingerprintOverlapPairs(frames, "vid", "fh",
        bands = 4, strideBits = 16, maskBits = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the one shared frame contributes exactly its 4 band cells
    assert(pairs == Map((1L, 2L) -> 4L), s"$pairs")
    // boilerplate guard: a frame shared by ALL entities would mint B²
    // pairs; capping its buckets keeps only the organic overlap
    val intro = fp(100, 101, 102, 103)
    val many = (1L to 6L).map(v => (v, intro)) ++
      Seq((1L, fpA), (2L, fpA))
    val capped = Dedup.fingerprintOverlapPairs(many.toDF("vid", "fh"),
        "vid", "fh", bands = 4, strideBits = 16, maskBits = 15,
        maxBucketSize = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped == Map((1L, 2L) -> 4L),
      s"the 6-member intro-card buckets must drop, organic pair survives: $capped")
    // saturated-mask precision valve: a pair sharing a single band
    // cell (the random-collision signature) drops at minShared = 2; a
    // whole-frame match (4 cells) survives
    val mixed = Seq((1L, fpA), (2L, fpA),          // 4 shared cells
      (3L, fp(1, 90, 91, 92)), (4L, fp(1, 93, 94, 95))) // 1 shared cell
      .toDF("vid", "fh")
    val strict = Dedup.fingerprintOverlapPairs(mixed, "vid", "fh",
        bands = 4, strideBits = 16, maskBits = 15, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(strict == Map((1L, 2L) -> 4L), s"$strict")
  }

  test("maintainQuantileSamples: adds-only maintenance equals full recompute exactly") {
    import graft.operators.Sketches
    val k = 4
    def hashed(rows: Seq[(Long, String, Long)]) =
      rows.toDF("doc_id", "source", "v").select(col("source"),
        graft.functions.md5Long(col("doc_id").cast("string")).as("h"),
        col("v"))
    def kset(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Long)]] =
      df.collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val initial = (1L to 12L).map(i => (i, if (i % 2 == 0) "a" else "b", i * 10))
    val added = (13L to 25L).map(i => (i, if (i % 3 == 0) "a" else "c", i * 10))
    val sketch1 = Sketches.bottomKBySource(hashed(initial), k)
    val maintained = Sketches.maintainQuantileSamples(sketch1,
      added.toDF("doc_id", "source", "v"), "doc_id", col("v"), "source", k)
    val full = Sketches.bottomKBySource(hashed(initial ++ added), k)
    assert(kset(maintained) == kset(full),
      "bottom-k(bottom-k(S) ∪ A) must equal bottom-k(S ∪ A) per source")
    // source c exists only in the change feed; source b only in the base
    assert(kset(maintained).keySet == Set("a", "b", "c"))
    assert(kset(maintained)("b") == kset(sketch1)("b"),
      "a source untouched by the commit keeps its prior sample verbatim")
  }

  test("suggestSemantic3Params: exact integer cube root of ceil(n/32), clamped") {
    import graft.operators.Dedup.suggestSemantic3Params
    assert(suggestSemantic3Params(1L) == 2)      // kTot=1 → floor at 2
    assert(suggestSemantic3Params(500L) == 3)    // kTot=16: 2³=8 < 16 ≤ 27
    assert(suggestSemantic3Params(2048L) == 4)   // kTot=64: exactly 4³
    assert(suggestSemantic3Params(200000L) == 19) // kTot=6250: 18³=5832 < 6250
    assert(suggestSemantic3Params(Long.MaxValue / 2) == 1024) // clamp
  }

  test("semanticDedup3: identical vectors share every level's cell and co-cluster") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(0.0, 1.0)), (6L, Seq(-1.0, 0.0)),
      (7L, Seq(0.6, 0.8)), (8L, Seq(0.0, -1.0))).toDF("id", "emb")
    val k = graft.operators.Dedup.suggestSemantic3Params(8L)
    val cents = Similarity.trainCentroids(corpus, k = k, iters = 2)
    val out = graft.operators.Dedup
      .semanticDedup3(corpus, cents, k, iters = 2, threshold1e6 = 950000L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rep_id"), r.getAs[Long]("kept")))).toMap
    assert(out.size == 8, "every corpus row appears exactly once")
    // identical vectors can never split across levels → grouped, min-id rep
    assert(out(1L) == ((1L, 1L)) && out(2L) == ((1L, 0L)) && out(3L) == ((1L, 0L)),
      s"$out")
    assert(out(4L) == ((4L, 1L)) && out(5L) == ((4L, 0L)), s"$out")
    // singletons keep themselves
    assert(out(6L) == ((6L, 1L)) && out(8L) == ((8L, 1L)), s"$out")
  }

  test("semanticCosineHistogram2: subcell pair mass is a per-bucket subset of the flat form") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.99, 0.01)), (3L, Seq(0.98, 0.02)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(0.01, 0.99)), (6L, Seq(0.02, 0.98)))
      .toDF("id", "emb")
    val cents = Similarity.trainCentroids(corpus, k = 2, iters = 2)
    val flat = Dedup.semanticCosineHistogram(corpus, cents).collect()
      .map(r => r.getAs[Long]("bucket_lo_1e6") -> r.getAs[Long]("n_pairs")).toMap
    val out = Dedup.semanticCosineHistogram2(corpus, cents, k2 = 2, iters = 2)
      .collect()
      .map(r => (r.getAs[Long]("bucket_lo_1e6"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_pairs_ge")))
    // (cid, cid2) pairs are a subset of the cid pairs, bucket by bucket
    out.foreach { case (b, n, _) =>
      assert(n <= flat.getOrElse(b, 0L), s"bucket $b: $n > flat ${flat.get(b)}")
    }
    // same output contract as the flat form: desc order, running
    // cumulative, buckets on the width grid
    assert(out.map(_._1).toSeq == out.map(_._1).sortBy(-_).toSeq)
    assert(out.map(_._3).toSeq == out.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
    out.foreach { case (b, _, _) => assert(b % 50000L == 0L, s"grid: $b") }
    // the pair mass equals Σ C(pop,2) over the actual subcell populations
    val cells1 = Similarity.assignCells(corpus, cents).select(col("id"), col("emb"), col("cid"))
    val sub = Similarity.trainSubCentroids(cells1, k2 = 2, iters = 2)
    val pops = Similarity.assignSubCells(cells1, sub)
      .groupBy(col("cid"), col("cid2")).count().collect().map(_.getAs[Long]("count"))
    assert(out.map(_._2).sum == pops.map(p => p * (p - 1) / 2).sum,
      s"pair mass vs subcell populations: ${out.toSeq} vs ${pops.toSeq}")
  }

  test("attritionFunnelBySource: shares within each source's own total") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, "A", base), (2L, "A", base), (3L, "A", base + " extra"),
      (4L, "B", "zz qq xx"),
      (5L, "B", "der hund ist ein tier und das ist gut " * 3),
      (6L, "B", "the cat sat on the mat " * 5),
      (7L, "B", "the maple syrup festival is a lovely event and it is fun for all of the folks in town every year here now"))
      .toDF("doc_id", "source", "text")
    val bench = Seq((900L, "people enjoy the maple syrup festival greatly"))
      .toDF("doc_id", "text")
    val out = graft.operators.Curation
      .attritionFunnelBySource(docs.select("doc_id", "text", "source"), bench, "source")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("gate")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("share_1e6")))).toMap
    val expected = Map(
      ("A", "7_pass") -> ((1L, 333333L)), ("A", "1_exact_dup") -> ((1L, 333333L)),
      ("A", "2_near_dup") -> ((1L, 333333L)),
      ("B", "3_quality") -> ((1L, 250000L)), ("B", "4_language") -> ((1L, 250000L)),
      ("B", "5_repetition") -> ((1L, 250000L)),
      ("B", "6_contaminated") -> ((1L, 250000L)))
    assert(out == expected, s"got $out")
  }

  test("docLmBitsHeldOut: interpolated / backoff / unseen-floor ladder, hand-computed") {
    val train = Seq((2L, "a b a b a b")).toDF("doc_id", "text")
    // BG: (a,b)=3 (b,a)=2; L: a→(3,1) b→(2,1); R: a=1 b=1; T=2
    val score = Seq((1L, "a b z"), (3L, "b b")).toDF("doc_id", "text")
    // (a,b) interp: ((4·3−3)·2+3·1·1)e6//(4·3·2)=875000 → bits 0
    // (b,z): z unseen → floor p=1 → bits 19
    // (b,b) backoff: (3·1·1)e6//(4·2·2)=187500 → bits 2
    val out = TextAnalysis.docLmBitsHeldOut(train, score, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("sum_bits"),
        r.getAs[Long]("avg_millibits")))
    assert(out.toSeq == Seq((1L, 2L, 19L, 9500L), (3L, 1L, 2L, 2000L)),
      s"${out.toSeq}")
  }

  test("wordEntropy: exact bits + type/token ratio, map-side degenerate cases") {
    val docs = Seq((1L, "a a b"), (2L, "x x x x"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.wordEntropy(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("sum_bits"), r.getAs[Long]("ttr_ppm")))
    // doc1: a(c=2): bitlen(3)−bitlen(2)=0; b(c=1): 2−1=1 → sum 1
    assert(out(0) == ((3L, 2L, 1L, 666666L)), s"${out.toSeq}")
    // uniform doc: zero entropy
    assert(out(1) == ((4L, 1L, 0L, 250000L)), s"${out.toSeq}")
    assert(out(2) == ((0L, 0L, 0L, 0L)), s"empty doc: ${out.toSeq}")
    // zero shuffles: the plan has no exchange
    val plan = TextAnalysis.wordEntropy(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must stay map-side:\n$plan")
  }

  test("pqErrorReport: mass accounted, grid buckets, tight clusters near the top") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.1, 0.0)), (2L, Seq(0.9, 0.1, 0.0, 0.0)),
      (3L, Seq(1.0, 0.1, 0.1, 0.0)), (4L, Seq(0.0, 0.1, 0.9, 1.0)),
      (5L, Seq(0.1, 0.0, 1.0, 0.9)), (6L, Seq(0.0, 0.0, 1.0, 1.0)))
      .toDF("id", "emb")
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 2, iters = 2)
    val out = Similarity.pqErrorReport(corpus, books).collect()
      .map(r => (r.getAs[Long]("bucket_lo_1e6"), r.getAs[Long]("n_vectors"),
        r.getAs[Long]("n_ge")))
    assert(out.map(_._2).sum == 6L, s"every vector lands once: ${out.toSeq}")
    out.foreach { case (b, _, _) => assert(b % 10000L == 0L && b <= 1000000L) }
    assert(out.map(_._3).toSeq == out.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
    assert(out.head._1 >= 900000L,
      s"tight clusters reconstruct near-perfectly: ${out.toSeq}")
  }

  test("degreeHistogram: per-node degrees bucketed, cumulative from the top") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = graft.operators.Graph.degreeHistogram(pairs).collect()
      .map(r => (r.getAs[Long]("degree"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_nodes_ge")))
    // degrees: 3→{3}, 2→{1,2}, 1→{4}
    assert(out.toSeq == Seq((3L, 1L, 1L), (2L, 2L, 3L), (1L, 1L, 4L)),
      s"${out.toSeq}")
  }

  test("userEventEntropy: exact bits per user; uniform single-type user scores 0") {
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "c"), (2L, "c"), (2L, "c"), (2L, "c")).toDF("user_id", "event_type")
    val out = graft.operators.EventAnalytics.userEventEntropy(ev, "user_id", "event_type")
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
          r.getAs[Long]("sum_bits")))).toMap
    // user 1: a(c=2): bitlen(3)−bitlen(2)=0; b(c=1): 2−1=1 → 1 bit
    assert(out(1L) == ((3L, 2L, 1L)), s"$out")
    assert(out(2L) == ((4L, 1L, 0L)), s"single-type loop has zero entropy: $out")
  }

  test("dsirResample: extreme scores pin the gate; degenerate range keeps all") {
    val corpus = Seq((1L, "aa aa"), (2L, "zz zz"), (3L, "aa zz"))
      .toDF("doc_id", "text")
    val target = Seq((9L, "aa aa")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirResample(corpus, "doc_id", "text", target, "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rate_ppm")).toMap
    assert(out.contains(1L) && out(1L) == 1000000L,
      s"max-score doc keeps at rate 1e6: $out")
    assert(!out.contains(2L), s"min-score doc has rate 0 and never keeps: $out")
    out.get(3L).foreach(r => assert(r > 0L && r < 1000000L, s"mid rate: $out"))
    // one-score corpus: every doc keeps at 1e6
    val flat = Seq((1L, "aa"), (2L, "aa")).toDF("doc_id", "text")
    val kept = TextAnalysis.dsirResample(flat, "doc_id", "text", target, "text")
      .collect().map(r => r.getAs[Long]("rate_ppm"))
    assert(kept.length == 2 && kept.forall(_ == 1000000L), s"${kept.toSeq}")
  }

  test("charClassProfile: exact class split; non-ASCII lands in other") {
    val docs = Seq((1L, "A", "Ab1. x"), (2L, "B", "héllo")).toDF("doc_id", "source", "text")
    val out = graft.operators.Diagnostics.charClassProfile(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_letters"),
          r.getAs[Long]("n_digits"), r.getAs[Long]("n_punct"),
          r.getAs[Long]("n_space"), r.getAs[Long]("n_other"),
          r.getAs[Long]("other_ppm")))).toMap
    assert(out("A") == ((6L, 3L, 1L, 1L, 1L, 0L, 0L)), s"$out")
    assert(out("B") == ((5L, 4L, 0L, 0L, 0L, 1L, 200000L)),
      s"é is outside [A-Za-z] → other: $out")
  }

  test("simhashPrecisionAudit: identical pair scores exact Jaccard 1; near dup less") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq((1L, base), (2L, base), (3L, base + " extra tail words"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashPrecisionAudit(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        ((r.getAs[Long]("hamming"), r.getAs[Long]("jaccard_1e6")))).toMap
    assert(out((1L, 2L)) == ((0L, 1000000L)), s"identical pair: $out")
    out.get((1L, 3L)).foreach { case (h, j) =>
      assert(j < 1000000L && j > 0L, s"near dup strictly between: $out")
    }
  }

  test("sentenceStats: segment counts, extremes, map-side degenerate cases") {
    val docs = Seq((1L, "one two. three!! "), (2L, ""), (3L, "just words here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.sentenceStats(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_words"),
        r.getAs[Long]("max_words"), r.getAs[Long]("avg_words_ppm")))
    assert(out(0) == ((2L, 3L, 2L, 1500000L)), s"${out.toSeq}")
    assert(out(1) == ((0L, 0L, 0L, 0L)), s"empty doc: ${out.toSeq}")
    assert(out(2) == ((1L, 3L, 3L, 3000000L)), s"no delimiter = one sentence: ${out.toSeq}")
  }

  test("packingBudgetSweep: exact counts from totals; consistent with the real packer") {
    val docs = Seq((1L, 4L), (2L, 3L), (3L, 3L)).toDF("doc_id", "n_tokens")
    val out = graft.operators.Chunker.packingBudgetSweep(
        docs, "doc_id", "n_tokens", budgets = Seq(4L), shards = 1)
      .collect().map(r => (r.getAs[Long]("budget"), r.getAs[Long]("n_shards"),
        r.getAs[Long]("n_seqs"), r.getAs[Long]("n_pad"), r.getAs[Long]("pad_ppm")))
    // one shard, 10 tokens at budget 4 → 3 seqs, 2 pad, 2/12 ppm
    assert(out.toSeq == Seq((4L, 1L, 3L, 2L, 166666L)), s"${out.toSeq}")
    // sweep n_seqs must equal what the real packer materializes
    val big = (1L to 40L).map(i => (i, 1L + (i * 7) % 23)).toDF("doc_id", "n_tokens")
    val sweep = graft.operators.Chunker.packingBudgetSweep(
        big, "doc_id", "n_tokens", budgets = Seq(64L), shards = 4)
      .collect()(0).getAs[Long]("n_seqs")
    val placed = graft.operators.Chunker.packSequences(
        big, "doc_id", "n_tokens", budgetTokens = 64L, shards = 4)
    val real = placed.groupBy("shard")
      .agg(max(expr("seq_id + CASE WHEN seq_offset + n_tokens > 64 " +
        "THEN (seq_offset + n_tokens - 1) DIV 64 ELSE 0 END")).as("last"))
      .agg(sum(col("last") + 1)).collect()(0).getLong(0)
    assert(sweep == real, s"sweep=$sweep placed=$real")
  }

  test("windowedPmi: all within-window sorted pairs, exact ratios, pair tie order") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.windowedPmi(docs, "text", window = 3,
        minCount = 1L, topK = 10).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("c_ab"),
        r.getAs[Long]("ratio_1e6")))
    // d=1: ab bc cd; d=2: ac bd; d=3: ad → 6 pairs, each once;
    // every unigram count is 1 → ratio = 1·6·1e6/1 = 6e6 for all
    assert(out.map(_._1).toSeq ==
      Seq("a b", "a c", "a d", "b c", "b d", "c d"), s"${out.toSeq}")
    assert(out.forall(p => p._2 == 1L && p._3 == 6000000L), s"${out.toSeq}")
    // window = 1 degenerates to adjacent pairs only
    val adj = TextAnalysis.windowedPmi(docs, "text", window = 1,
        minCount = 1L, topK = 10).collect().map(_.getAs[String]("pair"))
    assert(adj.toSeq == Seq("a b", "b c", "c d"), s"${adj.toSeq}")
  }

  test("maintainEvalFlags: incremental flags equal the full recompute on the final eval") {
    val root = Fixtures.tmpDir("evalvt").toString
    val vt = new graft.operators.VersionedTable(spark, root, "doc_id", "ver",
      numBuckets = 2)
    vt.upsert(Seq((100L, "w1 w2 w3 w4", 1L)).toDF("doc_id", "text", "ver"))
    val prevTs = vt.commits.head // single commit so far; head = commit 1
    vt.upsert(Seq((101L, "x1 x2 x3", 2L)).toDF("doc_id", "text", "ver"))
    val corpus = Seq(
      (10L, "w1 w2 w3 zz"),                 // 1 gram shared with commit 1
      (11L, "x1 x2 x3 yy"),                 // 1 gram shared with the ADDED set only
      (12L, "w2 w3 w4 x1 x2 x3"),           // one from each commit
      (13L, "totally unrelated words here")).toDF("doc_id", "text")
    val out = graft.operators.Decontaminate.maintainEvalFlags(
        corpus, "doc_id", "text", vt, prevTs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(out == Map(10L -> 1L, 11L -> 1L, 12L -> 2L), s"$out")
    // contract: maintained ≡ direct recompute against the final snapshot
    val full = graft.operators.Decontaminate.sharedNgrams(
        corpus, "doc_id", "text", vt.snapshot, "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(out == full, s"maintained $out vs full $full")
  }

  test("sourceKsDistance: identical distributions score 0; disjoint halves score the gap") {
    val same = Seq((1L, "A", "w"), (2L, "A", "w w"), (3L, "B", "w"), (4L, "B", "w w"))
      .toDF("doc_id", "source", "text")
    val s0 = graft.operators.Diagnostics.sourceKsDistance(same, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("ks_ppm")).toMap
    assert(s0 == Map("A" -> 0L, "B" -> 0L), s"$s0")
    val skew = Seq((1L, "A", "w"), (2L, "A", "w"), (3L, "B", "w w w"), (4L, "B", "w w w"))
      .toDF("doc_id", "source", "text")
    val s1 = graft.operators.Diagnostics.sourceKsDistance(skew, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("ks_ppm")).toMap
    // corpus CDF at len 1 = 1/2; A = 1, B = 0 → both gaps = 1/2
    assert(s1 == Map("A" -> 500000L, "B" -> 500000L), s"$s1")
  }

  test("maintainPqIndex: maintained index equals a full re-encode of the final state") {
    val cvt = new graft.operators.VersionedTable(spark,
      Fixtures.tmpDir("annc").toString, "id", "ver", numBuckets = 2)
    val base = Seq(
      (2L, Seq(1.0, 0.0, 0.1, 0.0)), (4L, Seq(0.9, 0.1, 0.0, 0.0)),
      (6L, Seq(0.0, 0.1, 0.9, 1.0)), (8L, Seq(0.1, 0.0, 1.0, 0.9)))
      .toDF("id", "emb").withColumn("ver", lit(1L))
    cvt.upsert(base)
    val ts1 = cvt.commits.head // single commit so far; head = commit 1
    val frozen = cvt.snapshot.select("id", "emb")
    val coarse = Similarity.trainCentroids(frozen, k = 2, iters = 2)
    val books = Similarity.trainPqCodebooks(frozen, m = 2, k = 2, iters = 2)
    val ivt = new graft.operators.VersionedTable(spark,
      Fixtures.tmpDir("anni").toString, "id", "ver", numBuckets = 2)
    ivt.upsert(Similarity.encodeIvfPq(frozen, coarse, books)
      .join(cvt.snapshot.select(col("id"), col("ver")), Seq("id")))
    // commit 2: one insert, one update, one delete
    cvt.upsert(Seq((3L, Seq(0.0, 0.0, 1.0, 1.0)), (4L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("id", "emb").withColumn("ver", lit(2L)))
    cvt.delete(Seq(Tuple1(8L)).toDF("id"))
    Similarity.maintainPqIndex(ivt, cvt, ts1, coarse, books)
    val maintained = ivt.snapshot
      .select(col("id"), col("cid").cast("long"), col("codes").cast("array<long>"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    val full = Similarity.encodeIvfPq(cvt.snapshot.select("id", "emb"), coarse, books)
      .select(col("id"), col("cid").cast("long"), col("codes").cast("array<long>"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(maintained == full, s"maintained $maintained vs full $full")
    assert(maintained.map(_._1) == Set(2L, 3L, 4L, 6L), s"$maintained")
  }

  test("recallCurve: aligned buckets give perfect recall; split buckets lose neighbors") {
    // all-positive components → every vector lands in the same sign
    // bucket → the approximate ranking IS the exact one
    val aligned = Seq(
      (1L, Seq(1.0, 0.2)), (2L, Seq(0.9, 0.3)), (3L, Seq(0.8, 0.1)),
      (4L, Seq(0.7, 0.4))).toDF("id", "emb")
    val q = aligned.filter(col("id") === 1L)
    val perfect = Similarity.recallCurve(aligned, q, ks = Seq(1, 3), signBits = 2)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("recall_1e6")).toMap
    assert(perfect == Map(1L -> 1000000L, 3L -> 1000000L), s"$perfect")
    // nearest neighbor in the OPPOSITE sign bucket → missed at k=1
    val split = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(1.0, -0.1)), (3L, Seq(-1.0, 0.5)))
      .toDF("id", "emb")
    val missed = Similarity.recallCurve(split, split.filter(col("id") === 1L),
        ks = Seq(1), signBits = 2)
      .collect()(0).getAs[Long]("recall_1e6")
    assert(missed == 0L, s"cross-bucket true neighbor must be missed: $missed")
  }

  test("gateVerdicts: the per-doc verdict table matches the funnel attribution") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base), (3L, base + " extra"), (4L, "zz qq xx"),
      (5L, "der hund ist ein tier und das ist gut " * 3),
      (6L, "the cat sat on the mat " * 5),
      (7L, "the maple syrup festival is a lovely event and it is fun for all of the folks in town every year here now"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "people enjoy the maple syrup festival greatly"))
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.gateVerdicts(docs, bench)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("gate")).toMap
    assert(out == Map(1L -> "7_pass", 2L -> "1_exact_dup", 3L -> "2_near_dup",
      4L -> "3_quality", 5L -> "4_language", 6L -> "5_repetition",
      7L -> "6_contaminated"), s"$out")
  }

  test("kmvDistinctGrams: fewer than k distinct grams → sketch is exact and in bound") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c x y")).toDF("doc_id", "text")
    val r = graft.operators.Sketches.kmvDistinctGrams(docs, "text", k = 256)
      .collect()(0)
    assert(r.getAs[Long]("est_distinct") == r.getAs[Long]("exact_distinct"),
      s"small corpus: estimate IS exact: $r")
    assert(r.getAs[Long]("within_bound") == 1L)
    // a real estimate path (k = 2) stays deterministic and positive
    val r2 = graft.operators.Sketches.kmvDistinctGrams(docs, "text", k = 2)
      .collect()(0)
    assert(r2.getAs[Long]("est_distinct") > 0L && r2.getAs[Long]("kth_hash") > 0L)
  }

  test("kmvSketchGrams: production form matches the audited sketch across partitionings") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c x y"), (3L, "p q r s t u"))
      .toDF("doc_id", "text")
    for (parts <- Seq(1, 7); k <- Seq(2, 256)) {
      val audited = graft.operators.Sketches
        .kmvDistinctGrams(docs, "text", k = k).collect()(0)
      val r = graft.operators.Sketches
        .kmvSketchGrams(docs.repartition(parts), "text", k = k).collect()(0)
      assert(r.getAs[Long]("k") == k.toLong)
      assert(r.getAs[Long]("kth_hash") == audited.getAs[Long]("kth_hash"),
        s"parts=$parts k=$k: k-set must be partitioning-invariant")
      assert(r.getAs[Long]("est_distinct") == audited.getAs[Long]("est_distinct"),
        s"parts=$parts k=$k: estimate must match the audited form")
    }
  }

  test("mrrByLabel: first same-label rank reciprocals; zero-hit queries stay in the denominator") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)),
      (4L, Seq(-1.0, 0.2))).toDF("id", "emb")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C")).toDF("id", "label")
    val queries = corpus.filter(col("id").isin(1L, 4L))
    val out = Similarity.mrrByLabel(corpus, labels, queries, k = 3, signBits = 2)
      .collect().map(r => r.getAs[String]("path") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("mrr_1e6")))).toMap
    // exact: query 1 finds same-label 2 at rank 1 (rr 1e6); query 4's
    // label C has no other member → 0 but still divides → mrr 5e5
    assert(out("exact") == ((2L, 1L, 500000L)), s"$out")
    assert(out.contains("bucketed") && out("bucketed")._1 == 2L, s"$out")
  }

  test("corrReport: perfect line, anti-line, and constant column") {
    val up = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val u = graft.operators.Diagnostics.corrReport(up, col("x"), col("y")).collect()(0)
    assert((u.getAs[Long]("n"), u.getAs[Long]("r2_ppm"), u.getAs[Long]("sign"))
      == ((3L, 1000000L, 1L)), s"$u")
    val down = Seq((1L, -1L), (2L, -2L), (3L, -3L)).toDF("x", "y")
    val d = graft.operators.Diagnostics.corrReport(down, col("x"), col("y")).collect()(0)
    assert((d.getAs[Long]("r2_ppm"), d.getAs[Long]("sign")) == ((1000000L, -1L)), s"$d")
    val flat = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    val f = graft.operators.Diagnostics.corrReport(flat, col("x"), col("y")).collect()(0)
    assert((f.getAs[Long]("r2_ppm"), f.getAs[Long]("sign")) == ((0L, 0L)), s"$f")
  }

  test("interArrivalBands: bitlen bands per later-event type; equal timestamps band 0") {
    val ev = Seq(
      (1L, 10L, "a", 100L), (2L, 10L, "b", 100L), (3L, 10L, "a", 108L),
      (4L, 11L, "b", 500L)).toDF("event_id", "user_id", "event_type", "ts_us")
    val out = graft.operators.EventAnalytics.interArrivalBands(
        ev, "user_id", "event_type", "ts_us", "event_id")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("band"),
        r.getAs[Long]("n_gaps"))).toSet
    // user 10: (a@100 → b@100) gap 0 band 0 on b; (b@100 → a@108) gap 8
    // band 4 on a; user 11 has one event → no gap
    assert(out == Set(("b", 0L, 1L), ("a", 4L, 1L)), s"$out")
  }

  test("datasetCard: dup share, majority language, quality bounds") {
    val docs = Seq(
      (1L, "the a and of to in is it for on"),
      (2L, "the a and of to in is it for on"),
      (3L, "der die das und ist ein zu mit von nicht")).toDF("doc_id", "text")
    val r = graft.operators.Diagnostics.datasetCard(docs, "text").collect()(0)
    assert(r.getAs[Long]("n_docs") == 3L && r.getAs[Long]("n_tokens") == 30L)
    assert(r.getAs[Long]("n_distinct_content") == 2L
      && r.getAs[Long]("exact_dup_ppm") == 333333L, s"$r")
    assert(r.getAs[String]("majority_lang") == "en"
      && r.getAs[Long]("majority_ppm") == 666666L, s"$r")
    val q = r.getAs[Long]("mean_quality_1e6")
    assert(q >= 0L && q <= 1000000L, s"$r")
  }

  test("bucketBalanceAudit: shares account for everything; singleton bucket is even") {
    val df = (1L to 64L).map(Tuple1(_)).toDF("doc_id")
    val out = graft.operators.Layout.bucketBalanceAudit(df, col("doc_id"), 4)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("imbalance_ppm")))
    assert(out.map(_._2).sum == 64L, s"${out.toSeq}")
    val imb = out.map(_._4).distinct
    assert(imb.length == 1 && imb.head >= 1000000L,
      s"imbalance is one number ≥ 1e6: ${out.toSeq}")
    val one = graft.operators.Layout.bucketBalanceAudit(df, col("doc_id"), 1)
      .collect()(0)
    assert(one.getAs[Long]("share_ppm") == 1000000L
      && one.getAs[Long]("imbalance_ppm") == 1000000L, s"$one")
  }

  test("pipelineReport: stage counts, curated tokens, split partition, packed seqs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base), (3L, base + " extra"), (4L, "zz qq xx"),
      (5L, "der hund ist ein tier und das ist gut " * 3),
      (6L, "the cat sat on the mat " * 5),
      (7L, "the maple syrup festival is a lovely event and it is fun for all of the folks in town every year here now"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "people enjoy the maple syrup festival greatly"))
      .toDF("doc_id", "text")
    val r = graft.operators.Curation.pipelineReport(docs, bench).collect()(0)
    assert((r.getAs[Long]("n_raw"), r.getAs[Long]("n_after_exact"),
      r.getAs[Long]("n_after_near"), r.getAs[Long]("n_curated"))
      == ((7L, 6L, 5L, 1L)), s"$r")
    assert(r.getAs[Long]("tokens_curated") == 13L, s"$r")
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val")
      + r.getAs[Long]("n_test") == 1L, s"splits partition the survivors: $r")
    assert(r.getAs[Long]("n_seqs") == 1L, s"13 tokens pack into one sequence: $r")
  }

  test("lshBandSweep: raw candidate count dominates the distinct pair count") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((1L, base), (2L, base), (3L, base + " extra"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val sweep = Dedup.lshBandSweep(df, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("n_candidate_pairs"))).toMap
    val distinctPairs = Dedup.minhashLshPairs(df, "doc_id", "text").count()
    assert(sweep((4L)) >= distinctPairs,
      s"sweep(4,4)=${sweep(4L)} raw pairs must be ≥ ${distinctPairs} distinct")
  }

  test("boundaryOverlapPairs: recovers the seam, rejects shorter overlaps") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),     // tail2 = "gamma delta"
      (2L, "gamma delta epsilon zeta"),   // head2 = "gamma delta" → stitch 1→2
      (3L, "delta epsilon other words"),  // head2 = "delta epsilon": 1-token
                                          // overlap with doc 1 — no pair
      (4L, "x")                           // shorter than w → excluded
    ).toDF("doc_id", "text")
    val out = Dedup.boundaryOverlapPairs(df, "doc_id", "text", w = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[String]("overlap")))
    assert(out.toSet == Set((1L, 2L, "gamma delta")), out.mkString(";"))
  }

  test("boundaryOverlapPairs: no self-stitch, case-folded match") {
    val df = Seq(
      (1L, "a b a b"),             // own head == own tail — must NOT self-pair
      (2L, "A B c d")              // head2 "a b" after lowering = 1's tail
    ).toDF("doc_id", "text")
    val out = Dedup.boundaryOverlapPairs(df, "doc_id", "text", w = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(out.toSet == Set((1L, 2L)), out.mkString(";"))
  }

  test("boundaryOverlapPairs: maxKeyDf drops hot boilerplate seams") {
    val rows = (1L to 5L).map(i => (i, s"unique$i words copyright footer")) ++
      Seq((10L, "copyright footer continues onward"))
    val df = rows.toDF("doc_id", "text")
    val all = Dedup.boundaryOverlapPairs(df, "doc_id", "text", w = 2)
    assert(all.count() == 5L) // every footer tail stitches to doc 10's head
    val capped = Dedup.boundaryOverlapPairs(df, "doc_id", "text", w = 2,
      maxKeyDf = Some(3))
    assert(capped.count() == 0L)
  }

  test("suggestStitchMaxKeyDf: order-statistic cap, small-corpus no-drop, " +
    "hot boilerplate cut (the gen-sf10 q232/q236 6.3x/5.4x templated-seam " +
    "growth this law exists to linearize)") {
    // small corpus: budget = floor(nKeys/1000) = 0 -> cap = max df ->
    // NOTHING dropped, even though the footer seam is df=5 hot
    val rows = (1L to 5L).map(i => (i, s"unique$i words copyright footer")) ++
      Seq((10L, "copyright footer continues onward"))
    val df = rows.toDF("doc_id", "text")
    // 2 distinct tail keys (footer df=5, onward df=1) + 6 head keys
    val law = Dedup.suggestStitchMaxKeyDf(df, "doc_id", "text", w = 2)
    assert(law.nKeys == 8L && law.hotKeyBudget == 0L)
    assert(law.cap == 5) // max df (the hot footer tail-key), not the floor
    val auto = Dedup.boundaryOverlapPairsAuto(df, "doc_id", "text", w = 2)
    assert(auto.count() == 5L) // == uncapped pairs: small corpora keep recall
    assert(auto.select("max_key_df").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(5L))
    // large key population + one hot seam: budget > 0, the organic df
    // mass sits at 1, so the cap lands at the floor and the hot key
    // (df 50 > 4) is dropped -- candidates bounded by cap*n
    val organic = (1L to 2000L).map(i =>
      (i, s"organ$i one two three four five tail$i"))
    val hot = (3000L to 3049L).map(i => (i, s"start$i middle shared footer seam"))
    val big = (organic ++ hot).toDF("doc_id", "text")
    // 2001 tail keys (2000 organic + ONE shared hot) + 2050 head keys
    val law2 = Dedup.suggestStitchMaxKeyDf(big, "doc_id", "text", w = 2)
    assert(law2.nKeys == 4051L && law2.hotKeyBudget == 4L)
    assert(law2.cap == 4) // floorCap: p99.9 of keys has df 1
    val auto2 = Dedup.boundaryOverlapPairsAuto(big, "doc_id", "text", w = 2)
    assert(auto2.filter(col("overlap") === "footer seam").count() == 0L)
    intercept[IllegalArgumentException](
      Dedup.suggestStitchMaxKeyDf(df, "doc_id", "text", w = 0))
    intercept[IllegalArgumentException](
      Dedup.suggestStitchMaxKeyDf(df, "doc_id", "text", w = 2, hotKeyPpm = 0L))
  }

  test("suggestSeamWidth: smallest w with vocab^w >= ceil(nKeys/targetDf), " +
    "exact saturating power, minW floor (the vocab-saturation lever the " +
    "df-cap law refuses to emulate)") {
    // the BASELINE capped-gate fixture regime: a 30-word vocab needs
    // w=5 (30^4 = 810k < 12M <= 30^5 = 24.3M) once the seam-key
    // population hits 24M at targetDf=2
    val law = Dedup.suggestSeamWidth(vocabSize = 30L, nKeys = 24000000L)
    assert(law.w == 5 && law.neededKeySpace == 12000000L)
    assert(law.vocabSize == 30L && law.nKeys == 24000000L)
    // small corpus: 30^2 = 900 covers 1000 keys at targetDf=2 -> minW
    assert(Dedup.suggestSeamWidth(30L, 1000L).w == 2)
    // boundary exactness (no float-log drift): needed = 901 is the
    // first population where w=2's 900-key space no longer suffices
    assert(Dedup.suggestSeamWidth(30L, 1800L).w == 2) // needed = 900
    assert(Dedup.suggestSeamWidth(30L, 1802L).w == 3) // needed = 901
    // w is monotone in nKeys
    val ws = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L)
      .map(n => Dedup.suggestSeamWidth(30L, n).w)
    assert(ws == ws.sorted)
    // saturating power: vocab^2 overflows Long but saturation is exact,
    // so any representable population is covered at w = minW
    assert(Dedup.suggestSeamWidth(4000000000L, Long.MaxValue).w == 2)
    // degenerate one-word vocab can never cover: the loop stops at maxW
    assert(Dedup.suggestSeamWidth(1L, 1000L).w == 16)
    // minW floors the answer even when w=1 would cover
    assert(Dedup.suggestSeamWidth(1000L, 10L).w == 2)
    intercept[IllegalArgumentException](Dedup.suggestSeamWidth(0L, 10L))
    intercept[IllegalArgumentException](
      Dedup.suggestSeamWidth(30L, 10L, targetDf = 0))
    intercept[IllegalArgumentException](
      Dedup.suggestSeamWidth(30L, 10L, minW = 5, maxW = 4))
  }

  test("stitchReassemble: unambiguous pairs merge seam-once; fan-in is left alone") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),   // 1 → 2 unambiguous
      (2L, "gamma delta epsilon zeta"),
      (3L, "one two shared seam"),      // 3 and 4 both stitch into 5: fan-in
      (4L, "other words shared seam"),
      (5L, "shared seam continues here")
    ).toDF("doc_id", "text")
    val out = Dedup.stitchReassemble(df, "doc_id", "text", w = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[String]("text")))
    assert(out.toSet ==
      Set((1L, 2L, "alpha beta gamma delta epsilon zeta")), out.mkString(";"))
  }

  test("stitchReassemble: fragment round-trip reproduces the original") {
    val original = "the quick brown fox jumps over the lazy dog tonight"
    val frags = Seq(
      (10L, "the quick brown fox jumps over"),  // overlap w=2: "jumps over"
      (11L, "jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val out = Dedup.stitchReassemble(frags, "doc_id", "text", w = 2)
      .collect().map(_.getAs[String]("text"))
    assert(out.toSeq == Seq(original), out.mkString(";"))
  }

  test("amsJoinSizeReport: exact companions, bound holds, est deterministic") {
    import graft.operators.Sketches
    // A: key 1 ×3, key 2 ×2, key 3 ×1; B: key 1 ×2, key 3 ×4, key 9 ×5
    val a = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L)).toDF("k")
    val b = (Seq.fill(2)(1L) ++ Seq.fill(4)(3L) ++ Seq.fill(5)(9L)).toDF("k")
    val r = Sketches.amsJoinSizeReport(a, col("k"), b, col("k")).collect()(0)
    assert(r.getAs[Long]("n_a") == 6 && r.getAs[Long]("n_b") == 11)
    assert(r.getAs[Long]("exact_join") == 3 * 2 + 1 * 4, r.toString) // = 10
    assert(r.getAs[Long]("f2_a") == 9 + 4 + 1)
    assert(r.getAs[Long]("f2_b") == 4 + 16 + 25)
    assert(r.getAs[Long]("within_3sig") == 1L, r.toString)
    // determinism: md5-derived signs, exact median — same run twice
    val again = Sketches.amsJoinSizeReport(a, col("k"), b, col("k"))
      .collect()(0).getAs[Long]("est_join")
    assert(again == r.getAs[Long]("est_join"))
    // disjoint sides: exact 0, estimate inside the bound around 0
    val c = Seq(100L, 101L).toDF("k")
    val r2 = Sketches.amsJoinSizeReport(a, col("k"), c, col("k")).collect()(0)
    assert(r2.getAs[Long]("exact_join") == 0L)
    assert(r2.getAs[Long]("within_3sig") == 1L, r2.toString)
  }

  test("embeddingHealth: null/bad-dim/NaN/zero-norm classes + norm envelope") {
    import graft.operators.Diagnostics
    val rows: Seq[(Long, Option[Seq[Double]])] = Seq(
      (1L, Some(Seq(0.5, 0.5))),            // n2 = 2·(5e5)² = 5e11
      (1L, Some(Seq(1.0, 0.0))),            // n2 = 1e12
      (2L, None),                           // null
      (2L, Some(Seq(0.1))),                 // wrong dim
      (2L, Some(Seq(Double.NaN, 1.0))),     // NaN
      (2L, Some(Seq(0.0000001, 0.0))))      // floors to zero norm (healthy class)
    val df = rows.toDF("label", "emb")
    val out = Diagnostics.embeddingHealth(df, col("label"), col("emb"), dim = 2)
      .orderBy("stratum").collect()
    val l1 = out(0)
    assert(l1.getAs[Long]("n_vecs") == 2 && l1.getAs[Long]("n_null") == 0)
    assert(l1.getAs[Long]("min_norm2") == 500000000000L)
    assert(l1.getAs[Long]("max_norm2") == 1000000000000L)
    assert(l1.getAs[Long]("mean_norm2") == 750000000000L)
    val l2 = out(1)
    assert(l2.getAs[Long]("n_vecs") == 4 && l2.getAs[Long]("n_null") == 1 &&
      l2.getAs[Long]("n_bad_dim") == 1 && l2.getAs[Long]("n_nan") == 1 &&
      l2.getAs[Long]("n_zero_norm") == 1)
    assert(l2.getAs[Long]("min_norm2") == 0L && l2.getAs[Long]("mean_norm2") == 0L)
  }

  test("rpSigns: deterministic ±1 matrix, independent of requested shape") {
    val s1 = Similarity.rpSigns(4, 8)
    val s2 = Similarity.rpSigns(8, 16)
    assert(s1.flatten.forall(v => v == 1 || v == -1))
    // prefix stability: sign(j)(i) depends only on (j, i), so a wider
    // request agrees with a narrower one on the shared cells — this is
    // what makes prefix slices of one projection BE the narrower
    // projections (rpErrorSweep's one-pass sweep)
    for (j <- 0 until 4; i <- 0 until 8) assert(s1(j)(i) == s2(j)(i))
  }

  test("randomProject: hand-computed components + width guard") {
    val df = Seq((1L, Seq(0.5f, -0.25f, 1.0f).map(_.toDouble))).toDF("id", "emb")
    val row = Similarity.randomProject(df, outDims = 2, dim = 3).collect()(0)
    val out = row.getSeq[Long](row.fieldIndex("proj"))
    val signs = Similarity.rpSigns(2, 3)
    val xf = Seq(500000L, -250000L, 1000000L)
    val expect = (0 until 2).map(j =>
      (0 until 3).map(i => signs(j)(i) * xf(i)).sum)
    assert(out == expect, s"$out vs $expect")
    val narrow = Seq((1L, Seq(0.5, 0.5))).toDF("id", "emb")
    intercept[Exception] {
      Similarity.randomProject(narrow, outDims = 2, dim = 3).collect()
    }
  }

  test("rpScoreFixed: identical → 1e6, opposite → −1e6, zero-norm → 0") {
    val df = Seq((Seq(3L, 4L), Seq(3L, 4L), Seq(-3L, -4L), Seq(0L, 0L)))
      .toDF("a", "b", "neg", "z")
    val r = df.select(
      Similarity.rpScoreFixed(col("a"), col("b")).as("same"),
      Similarity.rpScoreFixed(col("a"), col("neg")).as("opp"),
      Similarity.rpScoreFixed(col("a"), col("z")).as("zero")).collect()(0)
    assert(r.getAs[Long]("same") == 1000000L)
    assert(r.getAs[Long]("opp") == -1000000L)
    assert(r.getAs[Long]("zero") == 0L)
  }

  test("rpErrorSweep: identical adjacent vectors land every pair in bucket 0") {
    val v = Seq(0.6, -0.3, 0.8, 0.2)
    val df = (1L to 4L).map(i => (i, v)).toDF("id", "emb")
    val rows = Similarity.rpErrorSweep(df, Seq(2, 4), dim = 4).collect()
    // identical vectors: projected cosine = exact cosine = 1e6 at any
    // width (unless the projection cancels to zero-norm, which this
    // vector does not) → every pair errs 0
    assert(rows.forall(_.getAs[Long]("bucket_lo_1e6") == 0L), rows.mkString(";"))
    assert(rows.map(r => (r.getAs[Long]("out_dims"), r.getAs[Long]("n_pairs")))
      .toSet == Set((2L, 3L), (4L, 3L)))
    assert(rows.forall(r => r.getAs[Long]("n_le") == r.getAs[Long]("n_pairs")))
  }

  test("rpRefineTopK: full shortlist ≡ exact brute force") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.1, 0.0)), (2L, Seq(0.9, 0.1, 0.0, 0.0)),
      (3L, Seq(1.0, 0.1, 0.1, 0.0)), (4L, Seq(0.0, 0.1, 0.9, 1.0)),
      (5L, Seq(0.1, 0.0, 1.0, 0.9)), (6L, Seq(0.0, 0.0, 1.0, 1.0)))
    val corpus = vecs.toDF("id", "emb")
    val queries = corpus.filter(col("id").isin(1L, 4L))
    val refined = Similarity.rpRefineTopK(corpus, queries, k = 2, kShort = 6,
        outDims = 3, dim = 4)
      .orderBy("query_id", "rank").collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("score_1e6")))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .orderBy("query_id", "rank").collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("score_1e6")))
    assert(refined.toSeq == exact.toSeq,
      s"refine=${refined.toSeq} exact=${exact.toSeq}")
  }
}
