package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Design for 100 TB: every variant is
  * shingle→hash→(band)→shuffle-by-small-key, i.e. the only wide
  * exchanges are group-bys on a hash or band bucket — never an
  * all-pairs join. Candidate pairs come out of LSH buckets whose size
  * is bounded by the band width, so the quadratic step is local per
  * bucket and skew-resistant (pathological buckets can be salted or
  * capped upstream). Hashes are md5-derived so results are
  * engine-reproducible (see graft.functions.md5Long).
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text with the
    * minimum id as the keeper and the duplicate count. Single
    * shuffle on the 128-bit hash — at 100 TB this is the cheapest
    * possible exact dedup (no text comparison after the map side).
    */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Mersenne prime 2^31−1: the minhash modulus. Base hashes are
    * reduced mod p before the affine step so a·h+b stays < 2^62
    * (ANSI-safe, no overflow). Single source of truth lives next to the
    * native expression ([[graft.expressions.MinhashSig]]).
    */
  val MinhashP: Long = graft.expressions.MinhashSig.P

  /** Deterministic affine coefficients (a_i, b_i) for the k-member
    * minhash family h_i(x) = (a_i·h(x) + b_i) mod p. Knuth
    * multiplicative constants — fixed, so the DuckDB oracle embeds the
    * same values (OracleSql generates its SQL from this list).
    */
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    graft.expressions.MinhashSig.coeffs(k)

  /** MinHash signature: k minima of the affine family over gram base
    * hashes (array<long> in [0, p), e.g. from [[gramHashes]]). k cheap
    * integer passes, zero hashing here.
    *
    * NOTE: pass an *attribute* (already-projected hash column), not
    * the hash expression itself — higher-order functions are
    * interpreted, and repeating the subtree under each of the k seeds
    * would recompute it k times per row. [[minhashLshPairs]] stages
    * the projection.
    */
  def minhashSignature(hashCol: Column, k: Int): Column = {
    val sigs = minhashCoeffs(k).map { case (a, b) =>
      array_min(transform(hashCol, h => pmod(h * a + b, lit(MinhashP))))
    }
    array(sigs: _*)
  }

  /** MinHash-LSH candidate pairs: signatures are split into `bands`
    * bands of `rowsPerBand` hashes; docs sharing any band bucket become
    * a candidate pair. Returns (id_a, id_b) with id_a < id_b, distinct.
    *
    * Plan shape: project signature → explode bands (×bands rows) →
    * shuffle by (band, bucket) → per-bucket self-join. The self-join is
    * an equi-join on the bucket key, so Spark plans a shuffled hash
    * join keyed on tiny bucket ids — no cartesian anywhere.
    */
  /** Polynomial combiner base for gram hashes (mod [[MinhashP]]). */
  val GramB: Long = graft.expressions.MinhashSig.B

  /** Per-row gram base hashes: md5 each token ONCE (mod p), then
    * combine n consecutive token hashes polynomially —
    * h(g) = (Σ h(t_i)·B^(n-1-i)) mod p. ~n× fewer md5 calls than
    * hashing each gram string, and no gram-string allocation at all.
    */
  def gramHashes(text: Column, n: Int): Column =
    let(transform(tokens(lower(text)), t => pmod(md5Long(t), lit(MinhashP))), th => {
      val idx = when(size(th) - (n - 1) <= 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), size(th) - n))
      transform(idx, i => {
        // each term is reduced mod p before summing: n·p < 2^35, no
        // ANSI overflow anywhere in the fold
        val terms = (0 until n).map { j =>
          val pow = Seq.fill(n - 1 - j)(GramB).foldLeft(1L)((a, b) => a * b % MinhashP)
          pmod(get(th, i + j) * pow, lit(MinhashP))
        }
        pmod(terms.reduce(_ + _), lit(MinhashP))
      })
    })

  /** @param maxBucketSize skew guard for corpus-scale runs: a bucket
    *   holding B docs emits B²/2 candidate pairs, so one boilerplate
    *   cluster of 10^6 identical pages would emit ~5·10^11 pairs. With
    *   a cap, oversized buckets are dropped — run [[exact]] dedup FIRST
    *   (identical texts collapse there for free), then LSH on the
    *   survivors; anything still exceeding the cap is a pathological
    *   template family better handled explicitly. None (default)
    *   disables the cap; the DuckDB oracle mirrors the uncapped form.
    */
  /** The signature stage of [[minhashLshPairs]], pre-materialization —
    * exposed so plan tests pin the native expression on the exact frame
    * the operator checkpoints.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    df.select(col(idCol).as("id"),
      graft.expressions.MinhashSig(col(textCol), n, k).as("sig"))

  /** (id, band, bucket) LSH band keys — the shared candidate-keying
    * stage of [[minhashLshPairs]] (self-join) and cross-table joins
    * (Decontaminate.nearDupContaminated). One native codegen'd
    * signature pass per row (MinhashSig ≡ gramHashes∘minhashSignature,
    * pinned by spec), materialized via localCheckpoint so downstream
    * joins don't recompute it. Docs with no gram (under n tokens)
    * yield a null signature; the null guard lives INSIDE the generator
    * input (null array → posexplode emits nothing) rather than as a
    * separate filter — a pushed-down `sig IS NOT NULL` predicate would
    * make Catalyst evaluate the signature a second time per row.
    * Checkpoint-block lifetime is GC-managed (ContextCleaner reclaims
    * after the frame is unreachable); long-running callers should
    * scope references per batch — graft.Bench nudges GC between
    * queries for exactly this reason.
    */
  def bandedBuckets(df: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, n: Int): DataFrame = {
    val k = bands * rowsPerBand
    val withSig = minhashSignatures(df, idCol, textCol, n, k).localCheckpoint()
    val bandBuckets = transform(sequence(lit(0), lit(bands - 1)), b => {
      val bandSlice = slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
      md5(array_join(transform(bandSlice, x => x.cast("string")), ","))
    })
    withSig.select(col("id"),
      posexplode(when(col("sig").isNotNull, bandBuckets)).as(Seq("band", "bucket")))
  }

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val bandedAll = bandedBuckets(df, idCol, textCol, bands, rowsPerBand, n)
    val banded = maxBucketSize match {
      case None => bandedAll
      case Some(cap) =>
        // one extra count-shuffle on the bucket key buys the B² bound
        val sizes = bandedAll.groupBy(col("band").as("sb"), col("bucket").as("sk"))
          .agg(count(lit(1)).as("_n")).filter(col("_n") <= cap)
        bandedAll.join(sizes,
          bandedAll("band") === col("sb") && bandedAll("bucket") === col("sk"), "left_semi")
    }
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** LSH band-plan sweep: the MEASURED candidate-pair workload of
    * every (bands, rowsPerBand) split of one k-perm signature, from
    * the corpus's real signatures — the planning table to read BEFORE
    * paying the pair explosion at scale. More bands (fewer rows per
    * band) = higher recall but more collisions; the S-curve formula
    * says where the threshold lands, but the COST side is corpus-
    * dependent (bucket skew, template families), so this measures it:
    * per config, Σ_buckets sz·(sz−1)/2 raw candidate pairs — the
    * pre-distinct join volume [[minhashLshPairs]] would actually
    * generate — plus bucket count and worst bucket.
    *
    * One native signature pass ([[minhashSignatures]],
    * localCheckpoint'd) serves every config; each config re-bands the
    * same signatures (map-side explode), and the stats are two
    * bounded groupBys. Cost: |configs| band shuffles over (id, band,
    * bucket) keys — a fraction of running even ONE config's full pair
    * join.
    *
    * Output: (bands, rows_per_band, n_buckets, n_candidate_pairs,
    * max_bucket) per config, widest banding first.
    */
  def lshBandSweep(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16,
      configs: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4), (2, 8))): DataFrame = {
    require(configs.nonEmpty && configs.forall { case (b, r) => b * r == k },
      s"every (bands, rowsPerBand) must multiply to k=$k: $configs")
    val sig = minhashSignatures(df, idCol, textCol, n, k).localCheckpoint()
    val perConfig = configs.map { case (bands, rpb) =>
      val bandBuckets = transform(sequence(lit(0), lit(bands - 1)), b => {
        val bandSlice = slice(col("sig"), b * rpb + 1, lit(rpb))
        md5(array_join(transform(bandSlice, x => x.cast("string")), ","))
      })
      sig.select(lit(bands.toLong).as("bands"),
        lit(rpb.toLong).as("rows_per_band"),
        posexplode(when(col("sig").isNotNull, bandBuckets)).as(Seq("band", "bucket")))
    }.reduce(_ unionAll _)
    perConfig
      .groupBy(col("bands"), col("rows_per_band"), col("band"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("(sz * (sz - 1)) DIV 2")).cast("long").as("n_candidate_pairs"),
        max(col("sz")).as("max_bucket"))
      .orderBy(col("bands").desc)
  }

  /** Cosine histogram of the SEMANTIC dedup candidate stream: all
    * within-cell pairs of a trained coarse quantizer
    * ([[graft.operators.Similarity.assignCells]] — the q86 candidate
    * population), bucketed by fixed-point cosine with a cumulative
    * ≥-bucket count — the threshold1e6 calibration table for
    * [[semanticDedup]] (the q134/q172 analog for the embedding
    * family): read it to see where the duplicate mass ends before
    * committing a cosine threshold at corpus scale.
    *
    * bucket_lo_1e6 = (cos div width)·width with TRUNCATING division
    * on both engines (negative cosines bucket toward zero — a label
    * convention, not a correctness hazard, and engine-identical).
    * Pair work is bounded by cell populations exactly as
    * semanticDedup's is; the histogram adds one bounded aggregate and
    * a ≤(2e6/width)-row cumulative window.
    *
    * Output: (bucket_lo_1e6, n_pairs, n_pairs_ge) ordered by bucket
    * descending.
    */
  def semanticCosineHistogram(corpus: DataFrame,
      centroids: Seq[(Int, Seq[Double])],
      bucketWidth1e6: Long = 50000L): DataFrame = {
    require(bucketWidth1e6 >= 1, s"bucket width must be positive: $bucketWidth1e6")
    val cells = graft.operators.Similarity.assignCells(corpus, centroids)
      .localCheckpoint()
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .select(graft.operators.Similarity.scoreFixedSafe(
        col("a.emb"), col("b.emb")).as("cos_1e6"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket_lo_1e6").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    pairs
      .withColumn("bucket_lo_1e6",
        expr(s"(cos_1e6 DIV $bucketWidth1e6) * $bucketWidth1e6"))
      .groupBy(col("bucket_lo_1e6")).agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_ge", sum(col("n_pairs")).over(w).cast("long"))
      .orderBy(col("bucket_lo_1e6").desc)
  }

  /** The LINEAR-pair-mass form of [[semanticCosineHistogram]]: the
    * same threshold-calibration table, but the candidate population
    * is [[semanticDedup2]]'s (cid, cid2) SUBCELLS instead of flat
    * √n cells. With k1·k2 ∝ n (see [[suggestSemantic2Params]]),
    * subcell populations are constant in expectation, so the pair
    * mass the histogram enumerates grows LINEARLY with the corpus —
    * the flat-cell form's measured 26.8× at 10× data (n^1.5 by
    * construction) is exactly what this twin exists to avoid. Use
    * the flat form only when the histogram must cover the flat
    * dedup's own candidate stream; calibrate thresholds at corpus
    * scale with this one.
    *
    * Output: (bucket_lo_1e6, n_pairs, n_pairs_ge) ordered by bucket
    * descending — same schema and bucketing convention as
    * [[semanticCosineHistogram]].
    */
  def semanticCosineHistogram2(corpus: DataFrame,
      level1: Seq[(Int, Seq[Double])], k2: Int, iters: Int,
      bucketWidth1e6: Long = 50000L): DataFrame = {
    require(bucketWidth1e6 >= 1, s"bucket width must be positive: $bucketWidth1e6")
    val cells1 = graft.operators.Similarity.assignCells(corpus, level1)
      .select(col("id"), col("emb"), col("cid"))
    val sub = graft.operators.Similarity.trainSubCentroids(cells1, k2, iters)
    val cells = graft.operators.Similarity.assignSubCells(cells1, sub)
      .select(col("id"), col("emb"), col("cid"), col("cid2"))
      .localCheckpoint()
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cid") === col("b.cid") && col("a.cid2") === col("b.cid2")
          && col("a.id") < col("b.id"))
      .select(graft.operators.Similarity.scoreFixedSafe(
        col("a.emb"), col("b.emb")).as("cos_1e6"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket_lo_1e6").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    pairs
      .withColumn("bucket_lo_1e6",
        expr(s"(cos_1e6 DIV $bucketWidth1e6) * $bucketWidth1e6"))
      .groupBy(col("bucket_lo_1e6")).agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_ge", sum(col("n_pairs")).over(w).cast("long"))
      .orderBy(col("bucket_lo_1e6").desc)
  }

  /** SimHash bit-vote fold over a *materialized* token-hash array
    * column (see the minhash note — don't inline the hash expression,
    * it would be re-evaluated once per bit).
    */
  def simhashFromHashes(hashCol: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val vote = aggregate(hashCol, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash: `bits`-bit fingerprint over whitespace tokens. Bit j of
    * the result is the sign of Σ_tokens (bit_j(md5Long(token)) ? +1 : -1).
    * Near-dup docs land within small Hamming distance. One native
    * codegen'd pass per row (graft.expressions.SimhashText ≡ the
    * composed [[simhashFromHashes]] fold, which re-walks the token
    * array once per bit interpreted; parity pinned by spec). No
    * shuffle.
    */
  def simhash(df: DataFrame, id: Column, text: Column, bits: Int = 16): DataFrame =
    df.select(id.as("id"), graft.expressions.SimhashText(text, bits).as("simhash"))

  /** The composed HOF form of [[simhash]]'s fingerprint (executable
    * spec for the native expression).
    */
  def simhashComposed(text: Column, bits: Int): Column =
    let(transform(tokens(lower(text)), t => md5Long(t)),
      h => simhashFromHashes(h, bits))

  /** SimHash near-dup candidate pairs — the simhash analogue of
    * [[minhashLshPairs]]: band the fingerprint bits, bucket-join on
    * (band, band-value), then verify with exact Hamming distance.
    * Within Hamming radius r, any pair agrees on at least one of
    * `bands` bands when r < bands (pigeonhole), so recall is exact for
    * maxHamming < bands.
    *
    * Scale: band values have 2^(bits/bands) distinct buckets — size
    * `bits`/`bands` so expected bucket population stays small (32-bit
    * fingerprints with 4 × 8-bit bands suit ~10^5 docs; at corpus
    * scale use 60-bit fingerprints with 15-bit bands, and set
    * `maxBucketSize`: near-identical boilerplate families share a
    * fingerprint, so one 10^6-doc template cluster would otherwise
    * emit ~10^12 candidate pairs — run [[exact]] dedup first, cap the
    * rest). Token-less docs have no signal (fingerprint 0) and are
    * excluded rather than paired with each other. The only shuffle is
    * the equi-join on tiny (band, value) keys.
    */
  /** Executable form of the sizing guidance above — candidate pairs
    * grow ~n²/2^bandBits at fixed parameters, so band width must grow
    * with log2(corpus): pick the narrowest bands that keep the
    * EXPECTED bucket population ≤ `targetBucket` (15-bit bands / 60-bit
    * fingerprints is the md5Long ceiling; past ~targetBucket·2^15 docs
    * the remaining lever is `maxBucketSize` + exact-dedup-first).
    * `targetBucket` defaults LOW (2) because simhash buckets are
    * skewed by construction — similar docs concentrate on popular
    * fingerprints, so the mean bucket badly understates the busy ones.
    */
  def suggestSimhashParams(estimatedDocs: Long, bands: Int = 4,
      targetBucket: Int = 2): (Int, Int) = {
    require(estimatedDocs > 0 && bands >= 1 && targetBucket >= 1)
    // total bits may never exceed SimhashText's 60-bit ceiling, so the
    // per-band cap shrinks as bands grow (more bands = exact recall at
    // larger Hamming radii, traded against band width)
    val maxBandBits = math.min(15, 60 / bands)
    require(maxBandBits >= 1, s"$bands bands cannot fit in 60 fingerprint bits")
    // ceil(log2(n / target)) in EXACT integer math (smallest b with
    // 2^b ≥ ⌈n/target⌉) — bit-identical to the SQL oracle's
    // re-derivation from count(*), with no float-log boundary risk
    val needed = log2Ceil( // overflow-safe ⌈n/target⌉ (n may be Long.Max)
      estimatedDocs / targetBucket + (if (estimatedDocs % targetBucket == 0) 0 else 1))
    val bandBits = math.min(maxBandBits, math.max(math.min(4, maxBandBits), needed))
    (bands * bandBits, bands)
  }

  /** ceil(log2(x)) for x ≥ 1 — exact (no float log), clamps x ≤ 0 to 0. */
  private[operators] def log2Ceil(x: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, x) - 1)

  /** The fingerprint stage of [[simhashPairs]], pre-materialization
    * (token-less docs carry no signal and are excluded).
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
      bits: Int): DataFrame =
    df.filter(tokenCount(col(textCol)) > 0)
      .select(col(idCol).as("id"),
        graft.expressions.SimhashText(col(textCol), bits).as("simhash"))

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32, bands: Int = 4, maxHamming: Int = 3,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(bits % bands == 0, "bits must divide evenly into bands")
    val bandBits = bits / bands
    fingerprintPairs(simhashSignatures(df, idCol, textCol, bits),
      "id", "simhash", bands = bands, strideBits = bandBits,
      maskBits = bandBits, maxHamming = maxHamming,
      maxBucketSize = maxBucketSize)
  }

  /** Banded near-dup candidate pairing over a PRECOMPUTED fingerprint
    * column — the modality-independent core of [[simhashPairs]]: any
    * fingerprint whose bits are independent hash-like signals (text
    * simhash, image aHash, audio envelope hash) bands identically.
    * Band b's key is `(fp >> b·strideBits) & (2^maskBits − 1)`, so a
    * full-width fingerprint (e.g. 64-bit, strideBits=16, bands=4)
    * bands on ADAPTIVELY-masked low bits without recomputing the
    * fingerprint — the [[suggestSimhashParams]] log2 law applies
    * verbatim (pass its bits/bands as maskBits). Hamming verifies over
    * the FULL fingerprint. Same shuffle shape as [[simhashPairs]]:
    * bounded band keys, never all-pairs; `maxBucketSize` is the skew
    * guard.
    */
  /** The banding stage of [[fingerprintPairs]] as a reusable frame:
    * (id, fp, band, bval) — one row per fingerprint per band, keyed
    * on the masked band value. Materialized once (localCheckpoint):
    * callers fan out into pairing, bucket-bipartite clustering, or
    * bucket-population audits without re-running the upstream
    * fingerprint computation (often a codec pass).
    */
  def fingerprintBands(df: DataFrame, idCol: String, fpCol: String,
      bands: Int, strideBits: Int, maskBits: Int): DataFrame = {
    require(bands >= 1 && strideBits >= 1 && maskBits >= 1,
      s"need positive bands/stride/mask, got $bands/$strideBits/$maskBits")
    require(maskBits <= strideBits, "mask wider than the band stride overlaps bands")
    require(bands * strideBits <= 64, "bands overrun the 64-bit fingerprint")
    // materialized once — same reason (and caveat) as minhashLshPairs
    val withFp = df.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .localCheckpoint()
    val bandVals = array((0 until bands).map(b =>
      shiftright(col("fp"), b * strideBits)
        .bitwiseAND(lit((1L << maskBits) - 1))): _*)
    withFp.select(col("id"), col("fp"),
      posexplode(bandVals).as(Seq("band", "bval")))
  }

  def fingerprintPairs(df: DataFrame, idCol: String, fpCol: String,
      bands: Int, strideBits: Int, maskBits: Int, maxHamming: Int,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val bandedAll = fingerprintBands(df, idCol, fpCol, bands, strideBits, maskBits)
    val banded = maxBucketSize match {
      case None => bandedAll
      case Some(cap) => // same B² bound as minhashLshPairs' skew guard
        val sizes = bandedAll.groupBy(col("band").as("sb"), col("bval").as("sk"))
          .agg(count(lit(1)).as("_n")).filter(col("_n") <= cap)
        bandedAll.join(sizes,
          bandedAll("band") === col("sb") && bandedAll("bval") === col("sk"), "left_semi")
    }
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Entity-level near-dup candidates from MULTI-fingerprint entities
    * (q228): an entity — a video as its per-frame perceptual hashes,
    * a document as its per-chunk fingerprints — pairs with another
    * when ANY of their fingerprints collide in a banded bucket, scored
    * by how many DISTINCT (band, bucket) cells the two entities share
    * (a whole shared frame contributes all `bands` cells, so identical
    * videos score bands·frames and a single-frame overlap scores
    * ≥ 1). The multi-fingerprint generalization of
    * [[fingerprintPairs]]: the per-entity distinct collapses repeated
    * frames BEFORE the join, the bucket cells bound the candidate
    * frontier exactly as in q209/q212 (adaptive maskBits keep expected
    * bucket size constant as the corpus grows), and `maxBucketSize`
    * is the same boilerplate-bucket guard as q205 (an intro card
    * shared by half the corpus must not mint B² pairs).
    *
    * Output: (id_a, id_b, n_shared_buckets), id_a < id_b.
    */
  def fingerprintOverlapPairs(df: DataFrame, idCol: String, fpCol: String,
      bands: Int, strideBits: Int, maskBits: Int,
      maxBucketSize: Option[Int] = None, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"need minShared >= 1, got $minShared")
    val cells = fingerprintBands(df.filter(col(fpCol).isNotNull),
        idCol, fpCol, bands, strideBits, maskBits)
      .select(col("id"), col("band"), col("bval")).distinct()
      .localCheckpoint(true) // one banding pass feeds both join sides
    val capped = maxBucketSize match {
      case None => cells
      case Some(cap) =>
        val sizes = cells.groupBy(col("band").as("sb"), col("bval").as("sk"))
          .agg(count(lit(1)).as("_n")).filter(col("_n") <= cap)
        cells.join(sizes,
          cells("band") === col("sb") && cells("bval") === col("sk"), "left_semi")
    }
    // minShared is the saturated-mask-regime precision valve: once the
    // adaptive mask hits its band-width cap (maskBits can't exceed the
    // stride), SINGLE-band random collisions grow ~n²/2^maskBits — but
    // a random pair overwhelmingly shares exactly one cell, while a
    // true near-dup entity pair shares many, so score ≥ 2 cuts the
    // collision floor quadratically (≈2^-2·maskBits per random pair).
    // The candidate shuffle still carries the floor (it is the groupBy
    // input); when even that is too wide, the q216 bucket-CC shape
    // answers cluster questions without materializing pairs at all.
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_buckets"))
      .filter(col("n_shared_buckets") >= minShared)
  }

  /** Hamming-distance histogram of the SimHash banded candidate
    * stream — [[simhashPairs]]' candidate pairs WITHOUT the verify
    * filter, bucketed by exact Hamming distance with a cumulative
    * ≤h count: the maxHamming-threshold calibration table (q134's
    * LSH-sweep analog for the simhash family). Read it to pick the
    * verify threshold BEFORE a corpus-scale run: the histogram shows
    * where the near-dup mass ends and the band-collision noise floor
    * begins.
    *
    * Same banding/self-join as simhashPairs (one native signature
    * pass, checkpointed); the histogram adds one ≤ bits+1-row
    * aggregate and an equally bounded cumsum window.
    *
    * Output: (hamming, n_pairs, n_pairs_le) ordered by hamming.
    */
  def simhashHammingHistogram(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, "bits must divide evenly into bands")
    val bandBits = bits / bands
    val withSim = simhashSignatures(df, idCol, textCol, bits).localCheckpoint()
    val bandVals = array((0 until bands).map(b =>
      shiftright(col("simhash"), b * bandBits)
        .bitwiseAND(lit((1L << bandBits) - 1))): _*)
    val banded = withSim.select(col("id"), col("simhash"),
      posexplode(bandVals).as(Seq("band", "bval")))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("hamming"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    pairs.groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_le", sum(col("n_pairs")).over(w).cast("long"))
      .orderBy(col("hamming"))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs. `candidates`
    * must have (id_a, id_b); df provides (id, text). Intended as the
    * verify stage after [[minhashLshPairs]] — joins are equi-joins on
    * ids and the set ops run per-row on the joined shingle arrays.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        ratio(size(array_intersect(col("sh_a"), col("sh_b"))),
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** SimHash PRECISION audit: every [[simhashPairs]]-verified pair
    * next to its exact word-n-gram Jaccard — measures what the
    * Hamming gate actually admits (q120 is this audit for the minhash
    * estimator; this is the simhash family's). A pair at hamming ≤
    * maxHamming with low exact Jaccard is a fingerprint collision —
    * their rate is the false-positive cost of the chosen bit width,
    * read together with [[simhashHammingHistogram]]'s recall side
    * before trusting the gate at corpus scale.
    *
    * Cost: the audited pair set is the (already bounded) verified
    * stream; the Jaccard adds two id-equi-joins against the shingle
    * projection and per-row set ops.
    *
    * Output: (id_a, id_b, hamming, jaccard_1e6) ordered by ids.
    */
  def simhashPrecisionAudit(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32, bands: Int = 4, maxHamming: Int = 3,
      n: Int = 3): DataFrame = {
    val pairs = simhashPairs(df, idCol, textCol, bits, bands, maxHamming)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("hamming"),
        floor(ratio(size(array_intersect(col("sh_a"), col("sh_b"))),
          size(array_union(col("sh_a"), col("sh_b")))) * lit(1000000.0))
          .cast("long").as("jaccard_1e6"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** CDC-based boilerplate removal: drop every chunk whose hash occurs
    * more than `maxDf` times corpus-wide, and reassemble each document
    * from its surviving chunks in order — sub-document dedup with
    * document RECONSTRUCTION (shared footers, navigation, license
    * blocks, re-quoted passages vanish; unique prose survives).
    * Because cut points are content-defined, a chunk that is pure
    * boilerplate hashes identically wherever it appears; only the seam
    * chunks straddling a boilerplate boundary can retain fragments
    * (they are unique to their context by construction).
    *
    * The rebuilt text is in the operator's normalized form (lowercased
    * whitespace tokens joined by single spaces) — the form dedup
    * pipelines feed downstream anyway.
    *
    * Scale shape: q116's chunk shuffle + join, then one per-doc
    * aggregate whose state is the doc's own surviving chunks
    * (bounded by document length). Fully-duplicated docs rebuild to
    * the empty string (kept via the left join, `kept_chunks` 0).
    *
    * Output: (id, clean_text, kept_chunks).
    */
  def deboilerplate(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, mask: Int = 16): DataFrame = {
    require(maxDf >= 1, s"maxDf must be positive, got $maxDf")
    val ch = cdcChunks(docs, idCol, textCol, mask, withText = true)
    val occ = ch.groupBy(col("chunk_h")).agg(count(lit(1)).as("occ"))
    val rebuilt = ch.join(occ, Seq("chunk_h"))
      .filter(col("occ") <= maxDf)
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_no"), col("chunk_str")))),
          s => s("chunk_str")), " ").as("clean_text"),
        count(lit(1)).as("kept_chunks"))
    docs.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"))
  }

  /** MinHash-estimated Jaccard alongside the exact value for every LSH
    * candidate pair — the estimator-quality view. The estimate is the
    * signature-agreement fraction (matching components / k, the
    * textbook unbiased MinHash estimator); the exact value is the
    * shingle-set Jaccard. At corpus scale the exact set intersection
    * is what you CANNOT afford beyond the candidate set, while the
    * estimate is a narrow zip over two k-int arrays the LSH pass
    * already materialized — this operator emits both on the (bounded)
    * candidate pairs so the estimator's error is measured on real data
    * before a pipeline trusts it standalone (e.g. as a cheap
    * pair-confirmation threshold replacing [[ngramJaccard]]).
    *
    * Output: (id_a, id_b, est_jaccard_1e6, jaccard_1e6).
    */
  def minhashJaccardEstimate(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(df, idCol, textCol, n, k).localCheckpoint()
    val pairs = minhashLshPairs(df, idCol, textCol, bands, rowsPerBand, n)
    val est = pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("matches"))
      .withColumn("est_jaccard_1e6", expr(s"matches * 1000000L DIV ${k}L"))
    val exact = ngramJaccard(df, idCol, textCol, pairs, n)
    est.join(exact, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("est_jaccard_1e6"),
        floor(col("jaccard") * 1000000.0).cast("long").as("jaccard_1e6"))
  }

  /** Asymmetric n-gram CONTAINMENT for candidate pairs: |A∩B| / |A|
    * and |A∩B| / |B| in 1e6 fixed point. Jaccard under-scores a short
    * document fully embedded in a long one (quotation, excerpting,
    * boilerplate wrapping — the partial-duplication cases a training
    * corpus cares about); containment of the shorter side stays ~1
    * regardless of the length gap. Same join shape as [[ngramJaccard]]
    * — shingle sets attach to the (bounded) candidate pair stream.
    */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    def fixed(c: Column): Column = floor(c * lit(1000000.0)).cast("long")
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        fixed(ratio(size(array_intersect(col("sh_a"), col("sh_b"))),
          size(col("sh_a")))).as("cont_a_1e6"),
        fixed(ratio(size(array_intersect(col("sh_a"), col("sh_b"))),
          size(col("sh_b")))).as("cont_b_1e6"))
  }

  /** Connected components over an undirected dup-pair graph: each node
    * gets the minimum id reachable from it (its cluster id).
    *
    * Algorithm: hash-to-min with pointer doubling. Each round first
    * takes the min over neighbor labels (one edge hop), then jumps
    * through the label itself (label(label(v))) — path lengths halve,
    * so convergence is O(log diameter) rounds instead of the O(diameter)
    * of plain one-hop propagation.
    *
    * Convergence is the fixpoint condition itself, probed directly
    * before each round: "no edge connects two different labels" ⟺ the
    * label is constant on every component — and since labels start as
    * node ids and only ever decrease toward in-component ids, that
    * constant is the component min. The probe is one limit-1 job over
    * edges⋈labels⋈labels (cheap; AQE broadcasts the label table), so a
    * graph whose init pass already converged — the common case for
    * near-dup clusters, which are dense — pays exactly one probe, not a
    * full extra propagation round.
    *
    * Scale: per round, equi-joins + one groupBy keyed on node id; state
    * is one (id,label) row per node, localCheckpoint'd so lineage stays
    * flat. No driver-side graph, no cartesian.
    */
  /** Duplication-mass histogram over a cluster labeling
    * ([[connectedComponents]] output): how many near-dup clusters exist
    * at each size and how many documents they tie up — the one-page
    * answer to "how much of the corpus is duplicated, and is it a few
    * giant templates or many small pairs" that decides whether dedup
    * is worth a cluster-day BEFORE running it. Two bounded groupBys
    * (clusters, then sizes); n_docs = size × count is exact.
    *
    * Output: (cluster_size, n_clusters, n_docs). Singletons never
    * appear (a clean doc joins no pair — by construction of the pair
    * stream).
    */
  def clusterSizeHistogram(clusters: DataFrame): DataFrame =
    clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))

  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the edge list once — its lineage (e.g. a whole
    // minhash pipeline) must not re-execute per iteration
    val (edges, nEdges) = graft.util.Actions.checkpointCounted(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct())
    // empty edge set (a clean corpus): no components to label — return
    // the empty (id, cluster_id) frame directly instead of paying the
    // label-init groupBy and fixpoint-probe jobs (the count rides the
    // checkpoint job as an observed metric — r16 action discipline)
    if (nEdges == 0L)
      return edges.select(col("src").as("id"), col("dst").as("cluster_id"))
    // init already folds the first hop: label(v) = min(v, min(N(v)))
    var labels = edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("m"))
      .select(col("id"), least(col("id"), col("m")).as("label"))
      .localCheckpoint(true)
    // Convergence detection FOLDED INTO the iteration (VERDICT r13
    // item 3): the former standalone atFixpoint probe paid two O(E)
    // label joins per round ON TOP of the round itself. Instead each
    // round carries its incoming label (`l0`) through the jump chain
    // and asks "did any label move" with one map-side filter over the
    // freshly checkpointed round output — O(V), zero joins, zero
    // shuffles. The two tests are equivalent: edges are symmetrized,
    // so a round that moves NO label means every edge already had
    // label(src) = label(dst) (the min over each neighborhood changed
    // nothing in either direction) — the old edge-fixpoint predicate
    // verbatim; conversely at edge-fixpoint a component's label is
    // uniform at its min id, whose own label is itself, so the jumps
    // cannot move anything either. Labels are exact whenever the
    // PRODUCTIVE round count fits maxIter, as before.
    //
    // The edge-probe is kept for the INIT check only (measured,
    // ScaleProbe ccconv at gen-sf1): most real dup graphs — stars and
    // small cliques — converge AT the init fold, where the folded
    // loop would pay one full no-op round (3 joins + a V-row
    // checkpoint; 0.37 s → 1.01 s, 12 → 19 jobs on the organic LSH
    // graph) while the probe exits for two bounded label joins. On
    // multi-round graphs the probe runs ONCE and the folded flag
    // replaces the per-round probes (path-4096: 87 → ~85 jobs), so
    // the hybrid dominates both pure forms at every scale: per-round
    // cost sheds the two O(E) shuffle joins (the 100-TB term), the
    // init-converged case sheds the no-op round (the local term).
    val la = labels.select(col("id").as("ia"), col("label").as("la"))
    val lb = labels.select(col("id").as("ib"), col("label").as("lb"))
    var iter = 0
    var converged = edges.join(la, edges("src") === col("ia"))
      .join(lb, edges("dst") === col("ib"))
      .filter(col("la") =!= col("lb")).isEmpty
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid")).agg(min(col("label")).as("nlabel"))
      val oneHop = labels.join(nbrMin, labels("id") === col("nid"), "left")
        .select(col("id"), col("label").as("l0"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("l1"))
      // pointer doubling ×2: follow the label's own label, twice —
      // path lengths shrink 4× per round for the cost of two cheap
      // label-table self-joins (l1 is always an existing node id, so
      // the joins hit; left join for safety)
      def jump(ls: DataFrame): DataFrame =
        ls.as("x")
          .join(ls.select(col("id").as("pid"), col("l1").as("pl")).as("y"),
            col("x.l1") === col("y.pid"), "left")
          .select(col("x.id").as("id"), col("x.l0").as("l0"),
            least(col("x.l1"), coalesce(col("y.pl"), col("x.l1"))).as("l1"))
      // the moved-label count rides the round's checkpoint job as an
      // observed metric (r16): the former standalone post-checkpoint
      // filter probe paid one extra dispatch round-trip per round
      val (next, m) = graft.util.Actions.checkpointObserved(
        jump(jump(oneHop)),
        "moved" -> count(when(col("l0") =!= col("l1"), 1)))
      converged = graft.util.Actions.longOr(m, "moved", 0L) == 0L
      labels = next.select(col("id"), col("l1").as("label"))
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Incremental connected-components maintenance — cluster labels
    * FOLLOW the lake (the q222/q233/q188 maintenance discipline on the
    * clustering lever): given the PRIOR labeling (a
    * [[connectedComponents]] output: every edge-touched id labeled
    * with its component's min id, reps present as (rep, rep) rows) and
    * the DELTA pair stream of a new ingest, produce the labeling a
    * full recompute over (prior edges ∪ delta) would — EXACTLY, not
    * approximately: contract each delta endpoint to its prior rep,
    * run CC over the CONTRACTED graph (touched reps + new ids only —
    * bounded by the delta, never by history), and map prior labels
    * through the resulting rep→rep' relabeling. Min-id determinism
    * makes this an identity with the recompute: a merged component's
    * global min id is the min over its priors' reps and the new ids —
    * precisely the contracted component's min node.
    *
    * Scale shape: history NEVER shuffles. The label table is scanned
    * twice, both map-side against broadcast relations — a left-semi
    * against the delta's node set (pruning it to ≤ 2·|delta| touched
    * rows before any join), and the final rep→rep' update join
    * (repMap is bounded by the contracted graph). The CC fixpoint runs
    * on the contracted graph alone. On a versioned lake, pair with
    * bucketed storage to rewrite only the buckets whose rep changed —
    * repMap lists exactly those components.
    *
    * Caveats: exact for ADDED edges only — edge/doc REMOVAL can split
    * a component, which min-label maintenance cannot see; route
    * takedowns through [[repairComponentsAfterDelete]] (component-
    * scoped repair over the persisted [[labelEdges]] relation — never
    * a full recompute). `prior` must honor the
    * [[connectedComponents]] contract (labels = component min id);
    * feeding an arbitrary labeling silently yields that labeling's
    * transitive merge instead. The DELTA is meant to be an ingest
    * batch (the broadcast economics assume the delta-derived maps fit
    * in memory); a backfill-sized delta trips the 4M-node valve, which
    * drops the hints and lets Spark pick join strategies — correct
    * either way, but past roughly half of history a recompute is the
    * cheaper plan.
    *
    * Output: (id, cluster_id) over nodes(prior) ∪ nodes(delta) — the
    * same scope a full recompute labels.
    */
  def maintainComponents(prior: DataFrame, deltaPairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    // prior is NOT checkpointed: it is scanned exactly twice (the
    // broadcast semi and the update join), its realistic lineage is a
    // parquet read or an already-checkpointed CC output, and eagerly
    // materializing a 10⁸-row label table costs more than both scans
    // (measured: the 100M ladder leg dropped 72 s → scan-speed)
    val p = prior.select(col("id").as("_pid"), col("cluster_id").as("_prep"))
    // the delta's emptiness guard rides the checkpoint job (r16)
    val (d, nD) = graft.util.Actions.checkpointCounted(
      deltaPairs.select(col("id_a"), col("id_b")).distinct())
    if (nD == 0L)
      return p.select(col("_pid").as("id"), col("_prep").as("cluster_id"))
    if (p.isEmpty) return connectedComponents(d, maxIter)
    val (repMap, newNodes, hint) = maintParts(p, d, maxIter)
    val updated = p.join(
        hint(repMap.select(col("id").as("_r"), col("cluster_id").as("_nr"))),
        col("_prep") === col("_r"), "left")
      .select(col("_pid").as("id"),
        coalesce(col("_nr"), col("_prep")).as("cluster_id"))
    updated.unionByName(newNodes)
  }

  /** The LAKE write set of [[maintainComponents]]: only labels that
    * CHANGED (members of components whose rep was displaced) or are
    * NEW (delta nodes absent from prior) — exactly the rows a
    * bucketed-table COW upsert should touch, so a 10⁸-label table pays
    * per-ingest IO proportional to the merge, not to history. Same
    * contract, same exactness: prior ⊎ this delta ≡ the full
    * [[maintainComponents]] output ≡ a full recompute. Re-delivering
    * an already-applied delta returns ZERO rows (its edges contract to
    * self-loops), making upsert loops idempotent for free.
    */
  def maintainComponentsDelta(prior: DataFrame, deltaPairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val p = prior.select(col("id").as("_pid"), col("cluster_id").as("_prep"))
    // the delta's emptiness guard rides the checkpoint job (r16)
    val (d, nD) = graft.util.Actions.checkpointCounted(
      deltaPairs.select(col("id_a"), col("id_b")).distinct())
    if (nD == 0L)
      return d.select(col("id_a").as("id"), col("id_b").as("cluster_id"))
    if (p.isEmpty) return connectedComponents(d, maxIter)
    val (repMap, newNodes, hint) = maintParts(p, d, maxIter)
    val changed = p.join(
        hint(repMap.select(col("id").as("_r"), col("cluster_id").as("_nr"))),
        col("_prep") === col("_r"))
      .filter(col("_nr") =!= col("_prep"))
      .select(col("_pid").as("id"), col("_nr").as("cluster_id"))
    changed.unionByName(newNodes)
  }

  /** Shared maintenance internals: (the contracted graph's rep→rep'
    * labeling, new-node labels, the broadcast-hint valve the callers
    * apply to their label-update join). See [[maintainComponents]]
    * for the scale argument.
    */
  private def maintParts(p: DataFrame, d: DataFrame, maxIter: Int)
      : (DataFrame, DataFrame, DataFrame => DataFrame) = {
    // node count (the broadcast valve) rides the checkpoint job (r16)
    val (dn, nDn) = graft.util.Actions.checkpointCounted(
      d.select(col("id_a").as("_n"))
        .unionByName(d.select(col("id_b").as("_n"))).distinct())
    // broadcast valve: the hints are only sound while the delta-derived
    // maps fit in executor/driver memory (~64 MB of long pairs). A
    // delta past the valve is a BACKFILL, not an ingest batch — drop
    // the hints and let Spark pick join strategies (same results, the
    // shuffle returns), instead of forcing a driver-OOM collect.
    val small = nDn <= 4000000L
    def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // the ONLY touches of the full label table: a map-side broadcast
    // semi (here) and the map-side broadcast update/changed join in
    // the callers
    val touched = p.join(hint(dn), col("_pid") === col("_n"), "left_semi")
      .localCheckpoint(true)
    val ta = touched.select(col("_pid").as("_a"), col("_prep").as("_ra"))
    val tb = touched.select(col("_pid").as("_b"), col("_prep").as("_rb"))
    val contracted = d
      .join(hint(ta), col("id_a") === col("_a"), "left")
      .join(hint(tb), col("id_b") === col("_b"), "left")
      .select(coalesce(col("_ra"), col("id_a")).as("id_a"),
        coalesce(col("_rb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // CC over touched reps + new ids — the delta-bounded fixpoint
    // (CC's result is a select over its own checkpointed labels, so
    // no extra pin job — r16)
    val repMap = connectedComponents(contracted, maxIter)
    // delta nodes absent from prior: labeled by the contracted CC; a
    // new node always survives contraction (its id can't equal a prior
    // rep), so the fallback-to-self only covers degenerate inputs
    val newNodes = dn
      .join(hint(touched), col("_n") === col("_pid"), "left_anti")
      .join(hint(repMap.select(col("id").as("_r2"),
        col("cluster_id").as("_nc"))), col("_n") === col("_r2"), "left")
      .select(col("_n").as("id"), coalesce(col("_nc"), col("_n")).as("cluster_id"))
    (repMap, newNodes, hint)
  }

  /** The persisted-EDGE discipline [[repairComponentsAfterDelete]]
    * reads: the pair relation labeled with its component id — one
    * equi-join on `id_a` only, because BOTH endpoints of an edge share
    * a component under the [[connectedComponents]] contract (an edge
    * is a path). Persist this next to the labels (the q250 write-set
    * discipline): with the edge store partitioned or bucketed by
    * `cluster_id`, a takedown's induced-subgraph read is partition-
    * pruned IO — proportional to the touched components, not history.
    * Output: (id_a, id_b, cluster_id).
    */
  def labelEdges(pairs: DataFrame, labels: DataFrame): DataFrame =
    pairs.join(labels.select(col("id").as("_le"), col("cluster_id")),
        col("id_a") === col("_le"))
      .select(col("id_a"), col("id_b"), col("cluster_id"))

  /** Deletion-aware cluster maintenance — the TAKEDOWN flow (VERDICT
    * r14 item 1): doc removal (right-to-be-forgotten, license
    * takedown) is a routine event in a training-data pipeline, yet
    * min-label maintenance cannot see a split ([[maintainComponents]]
    * is exact for ADDED edges only), and a full CC recompute per
    * takedown is exactly the history-scale cost the maintenance
    * design exists to avoid. This repairs COMPONENT-SCOPED: deletion
    * never MERGES components (edges only disappear), so every
    * component untouched by a deleted node keeps its labeling
    * verbatim, and the affected components' survivors are relabeled
    * by a CC fixpoint over their own induced surviving edges alone.
    * Exact — the output hash-equals a full recompute over (edges
    * minus every pair touching a deleted id): a surviving component's
    * min id cannot live on a deleted node or in another component.
    *
    * Inputs: `prior` = the [[connectedComponents]] labeling;
    * `labeledEdges` = the persisted (id_a, id_b, cluster_id) relation
    * from [[labelEdges]] — the write-set discipline's price paid once
    * at ingest; `deletedIds` = (id) docs to remove.
    *
    * Scale shape: deleted ids and the affected reps they map to are
    * takedown-bounded (broadcast, with [[maintainComponents]]' 4M
    * backfill valve); the label table and the edge relation are each
    * scanned ONCE, map-side against those broadcast relations (on a
    * cluster_id-partitioned edge store the edge scan is partition-
    * pruned outright); the CC fixpoint — the only iterative, shuffling
    * term — runs on the affected components' induced edges alone.
    * Nothing history-scale shuffles.
    *
    * Survivors whose component lost ALL edges drop out of the
    * labeling, exactly as a recompute over the surviving edge set
    * would drop them (the [[connectedComponents]] edge-node scope).
    * Deleting ids absent from `prior` touches nothing; re-delivering
    * a takedown is a no-op (the ids are already gone).
    *
    * Output: (id, cluster_id) over the surviving edge-touched nodes.
    */
  def repairComponentsAfterDelete(prior: DataFrame, labeledEdges: DataFrame,
      deletedIds: DataFrame, maxIter: Int = 20): DataFrame = {
    val p = prior.select(col("id").as("_pid"), col("cluster_id").as("_prep"))
    val (del, nDel) = graft.util.Actions.checkpointCounted(
      deletedIds.select(col(deletedIds.columns.head).as("_d")).distinct())
    if (nDel == 0L)
      return p.select(col("_pid").as("id"), col("_prep").as("cluster_id"))
    val (aff, _, repaired, hint) = repairParts(p, labeledEdges, del, maxIter)
    val untouched = p.join(hint(aff), col("_prep") === col("_ar"), "left_anti")
      .select(col("_pid").as("id"), col("_prep").as("cluster_id"))
    untouched.unionByName(repaired)
  }

  /** The LAKE write set of [[repairComponentsAfterDelete]] — what a
    * takedown should physically touch on a keyed label table:
    * `relabel` = surviving members of affected components whose label
    * MOVED (upsert these), `remove` = deleted ids plus survivors whose
    * component lost all edges (delete these). prior ⊖ remove ⊕ relabel
    * ≡ the full repair ≡ a full recompute over the surviving edges —
    * per-takedown IO tracks the touched components, never history.
    * Re-delivering a takedown yields two empty frames (idempotent).
    */
  def repairComponentsDeleteDelta(prior: DataFrame, labeledEdges: DataFrame,
      deletedIds: DataFrame, maxIter: Int = 20)
      : (DataFrame, DataFrame) = {
    val p = prior.select(col("id").as("_pid"), col("cluster_id").as("_prep"))
    val (del, nDel) = graft.util.Actions.checkpointCounted(
      deletedIds.select(col(deletedIds.columns.head).as("_d")).distinct())
    val empty = (p.limit(0).select(col("_pid").as("id"),
        col("_prep").as("cluster_id")),
      p.limit(0).select(col("_pid").as("id")))
    if (nDel == 0L) return empty
    val (aff, _, repaired, hint) = repairParts(p, labeledEdges, del, maxIter)
    deleteLabelWriteSets(p, aff, repaired, hint)
  }

  /** Shared label write-set derivation for the delete flows
    * ([[repairComponentsDeleteDelta]] and
    * [[graft.operators.IncrementalDedup]]'s takedown gate — one
    * derivation so a fix reaches both): the affected components'
    * prior rows are the ONE scan of the label table (map-side
    * broadcast semi, bounded by touched-component mass), relabel =
    * rows whose label moved, remove = rows absent from the repaired
    * labeling. Callers stamp/checkpoint/commit.
    */
  private[operators] def deleteLabelWriteSets(p: DataFrame, aff: DataFrame,
      repaired: DataFrame, hint: DataFrame => DataFrame)
      : (DataFrame, DataFrame) =
    deleteLabelWriteSetsFromRows(
      p.join(hint(aff), col("_prep") === col("_ar"), "left_semi")
        .localCheckpoint(true),
      repaired)

  /** [[deleteLabelWriteSets]] when the caller already holds the
    * affected components' label rows (`affRows` = (_pid, _prep)) —
    * the takedown gate derives them from a PRUNED read instead of a
    * label-table scan (r16: the last history-scale terms in the flow).
    */
  private[operators] def deleteLabelWriteSetsFromRows(affRows: DataFrame,
      repaired: DataFrame): (DataFrame, DataFrame) = {
    val relabel = repaired
      .join(affRows, col("id") === col("_pid"))
      .filter(col("cluster_id") =!= col("_prep"))
      .select(col("id"), col("cluster_id"))
    val remove = affRows
      .join(repaired.select(col("id").as("_ri")), col("_pid") === col("_ri"),
        "left_anti")
      .select(col("_pid").as("id"))
    (relabel, remove)
  }

  /** Shared takedown internals: (affected reps `_ar`, the affected
    * components' SURVIVING induced edges, their repaired labeling,
    * the broadcast-hint valve). See [[repairComponentsAfterDelete]]
    * for the scale argument; [[graft.operators.IncrementalDedup]]'s
    * takedown gate reuses the surviving-edge frame to maintain the
    * persisted edge relation itself.
    */
  /** The repairParts broadcast valve, exposed so a caller that needs
    * the affected set EARLY (the pruned edge read) shares one policy.
    */
  private[operators] def takedownHint(del: DataFrame): DataFrame => DataFrame =
    takedownHintN(del.count())

  /** [[takedownHint]] from an already-known deleted-id count — callers
    * that checkpoint the deleted set observe the count on that job
    * (r16 action discipline) instead of paying a second count action.
    */
  private[operators] def takedownHintN(nDel: Long): DataFrame => DataFrame = {
    // the maintParts backfill valve: broadcast only while the
    // takedown-derived relations are ingest-sized
    val small = nDel <= 4000000L
    df => if (small) broadcast(df) else df
  }

  /** Affected component reps — prior labels of the deleted nodes
    * (bounded by the takedown; ids never labeled touch no component).
    * Factored out of [[repairParts]] so the takedown gate can compute
    * it BEFORE reading the edge relation and hand the result to
    * [[graft.operators.VersionedTable.snapshotPrunedBy]] — the
    * cluster_id-pruned induced-subgraph read (VERDICT r15 item 2).
    */
  private[operators] def affectedReps(p: DataFrame, del: DataFrame,
      hint: DataFrame => DataFrame): DataFrame =
    affectedRepsCounted(p, del, hint)._1

  /** [[affectedReps]] with the rep count observed on the checkpoint
    * job (r16) — the takedown gate's re-delivery fast path needs the
    * count and should not pay a second isEmpty action for it.
    */
  private[operators] def affectedRepsCounted(p: DataFrame, del: DataFrame,
      hint: DataFrame => DataFrame): (DataFrame, Long) =
    graft.util.Actions.checkpointCounted(
      p.join(hint(del), col("_pid") === col("_d"), "left_semi")
        .select(col("_prep").as("_ar")).distinct())

  private[operators] def repairParts(p: DataFrame, labeledEdges: DataFrame,
      del: DataFrame, maxIter: Int,
      precomputed: Option[(DataFrame, DataFrame => DataFrame)] = None)
      : (DataFrame, DataFrame, DataFrame, DataFrame => DataFrame) = {
    val (aff, induced, surviving, repaired, hint) =
      repairPartsInduced(p, labeledEdges, del, maxIter, precomputed)
    val _ = induced
    (aff, surviving, repaired, hint)
  }

  /** [[repairParts]] exposing the pinned INDUCED edge frame with
    * endpoint-deletion flags (r16 optimization): the edge relation is
    * read EXACTLY ONCE per takedown — the former shape re-scanned it
    * for the surviving filter, the membership endpoints, the dead-edge
    * set and the moved-edge old values (four pruned reads on the
    * partitioned store, four FULL scans on an edge_key-bucketed one).
    * Every consumer now derives map-side from the one checkpointed
    * frame: surviving = rows with neither endpoint deleted, dead =
    * the rest, membership = the frame's endpoints, old cluster ids =
    * the frame's own `cluster_id` column.
    *
    * Returns (aff `_ar`, induced (id_a, id_b, cluster_id, _delA,
    * _delB), surviving (id_a, id_b), repaired labels, hint).
    */
  private[operators] def repairPartsInduced(p: DataFrame,
      labeledEdges: DataFrame, del: DataFrame, maxIter: Int,
      precomputed: Option[(DataFrame, DataFrame => DataFrame)] = None)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame => DataFrame) = {
    val hint = precomputed.map(_._2).getOrElse(takedownHint(del))
    val aff = precomputed.map(_._1).getOrElse(affectedReps(p, del, hint))
    // induced edges of the affected components: ONE map-side pass of
    // the edge relation (partition-pruned on a cluster_id-partitioned
    // store), endpoint-deletion flags attached in the same pass (the
    // deleted-id set is distinct, so the left joins multiply nothing)
    val induced = labeledEdges
      .join(hint(aff), col("cluster_id") === col("_ar"), "left_semi")
      .join(hint(del.select(col("_d").as("_da"))),
        col("id_a") === col("_da"), "left")
      .join(hint(del.select(col("_d").as("_db"))),
        col("id_b") === col("_db"), "left")
      .select(col("id_a"), col("id_b"), col("cluster_id"),
        col("_da").isNotNull.as("_delA"), col("_db").isNotNull.as("_delB"))
      .localCheckpoint(true)
    val surviving = induced.filter(!col("_delA") && !col("_delB"))
      .select(col("id_a"), col("id_b"))
    // the only iterative term — CC over the affected components'
    // surviving edges alone, never the full graph (CC materializes the
    // symmetrized edge list itself, so `surviving` stays a cheap
    // filter view over the pinned induced frame; CC's result is
    // likewise a select over its own checkpointed labels — no extra
    // pin job needed, r16)
    val repaired = connectedComponents(surviving, maxIter)
    (aff, induced, surviving, repaired, hint)
  }

  /** Quality-aware near-dup representative selection — production
    * dedup keeps each cluster's BEST member, not its smallest id:
    * min-id keeps whichever copy was crawled first; best-of keeps the
    * cleanest one (highest curation score). `scored` = (id, score)
    * for the whole corpus; `clusters` = [[connectedComponents]]
    * output over its near-dup pairs. Docs absent from `clusters`
    * (singletons) are their own cluster and keep themselves. The
    * (score DESC, id ASC) tie-break is total, so the pick is
    * engine- and partitioning-independent.
    *
    * Scale shape: the rank window runs over ONLY the clustered docs
    * (bounded by duplicate mass, ≪ corpus); singletons join in with
    * a left-anti (no window, no second shuffle of the full corpus).
    *
    * Output: (id, cluster_id, score, kept ∈ {0,1}).
    */
  /** Connected components over the doc–BUCKET bipartite graph — the
    * dense-graph cure for clustering banded candidates: where
    * [[connectedComponents]] over [[fingerprintPairs]] edges walks
    * Σ C(|bucket|, 2) pairwise edges (quadratic in bucket population
    * — the measured q212 wall: one giant component costs n² edge
    * traffic), this walks only the n·bands (doc, bucket) memberships.
    * Identical components by construction when the pair graph keeps
    * every bucket cohabitant (any two docs in one bucket connect
    * through the bucket node), i.e. the maxHamming = fingerprint-width
    * case; with a Hamming-filtered pair graph the bipartite form is
    * the UPPER approximation (bucket-transitive).
    *
    * Formulation: alternating minimization on the two bipartite
    * halves — bucket label = min member label, doc label = min over
    * its buckets, plus two pointer-doubling jumps on the doc labels —
    * so labels never leave doc-id space and each iteration is two
    * membership-keyed groupBys plus one label self-join, all linear.
    * (A first cut ran the generic node-union [[connectedComponents]]
    * over doc∪bucket nodes; measured 707 s at gen-sf0.1 with
    * per-iteration cost growing ~5× per round — the alternating form
    * runs the same graph in ~10 s. See BASELINE.)
    *
    * Input: the (id, band, bval) frame from [[fingerprintBands]].
    * Output: (id, cluster_id), cluster_id = min doc id of the
    * component — the [[connectedComponents]] contract, including its
    * edge-node scope (docs cohabiting no bucket are unlabeled).
    */
  def bucketConnectedComponents(banded: DataFrame, maxIter: Int = 20): DataFrame = {
    // (doc, bucket-key) membership — n·bands rows, materialized once.
    // Memberships in singleton buckets connect nothing; dropping them
    // up front both shrinks the loop's frames and matches the
    // pairwise contract exactly (a doc with NO cohabited bucket has
    // no edges, so pairwise CC never labels it — neither do we).
    val memAll = banded
      .select(col("id"), concat_ws(":", col("band"), col("bval")).as("bk"))
      .distinct()
    val social = memAll.groupBy(col("bk")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2).select(col("bk"))
    val mem = memAll.join(social, Seq("bk"), "left_semi")
      .localCheckpoint(true)
    var labels = mem.select(col("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // alternate the two bipartite halves: bucket label = min member
      // label, doc label = min over its buckets — one round trip is
      // one doc-graph hop, with labels never leaving doc-id space
      val bmin = mem.join(labels, Seq("id"))
        .groupBy(col("bk")).agg(min(col("label")).as("bl"))
      val dmin = mem.join(bmin, Seq("bk"))
        .groupBy(col("id")).agg(min(col("bl")).as("nl"))
      // the round's incoming label rides along as `l0` so convergence
      // is a map-side comparison observed ON the checkpoint job (r16) —
      // the former standalone probe paid a full label self-JOIN plus
      // its own dispatch round-trip per round
      val l1 = labels.join(dmin, Seq("id"), "left")
        .select(col("id"), col("label").as("l0"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("l1"))
      // pointer-doubling jumps ×2 on the doc labels (labels are doc
      // ids, so the label's own label exists) — path lengths shrink
      // 4× per round for two cheap label self-joins, halving the
      // iteration count on long-chain components
      def jump(ls: DataFrame): DataFrame =
        ls.as("x")
          .join(ls.select(col("id").as("pid"), col("l1").as("pl")).as("y"),
            col("x.l1") === col("y.pid"), "left")
          .select(col("x.id").as("id"), col("x.l0").as("l0"),
            least(col("x.l1"), coalesce(col("y.pl"), col("x.l1"))).as("l1"))
      val (next, m) = graft.util.Actions.checkpointObserved(
        jump(jump(l1)).withColumnRenamed("l1", "label"),
        "moved" -> count(when(col("l0") =!= col("label"), 1)))
      done = graft.util.Actions.longOr(m, "moved", 0L) == 0L
      labels = next.drop("l0")
      iter += 1
    }
    // a non-fixpoint result must not masquerade as final clusters:
    // downstream histograms would silently diverge from the full CC.
    // Pointer-doubling converges in O(log diameter) rounds, so hitting
    // the cap is an anomaly worth failing loudly on, not a tail case.
    if (!done) sys.error(
      s"bucketConnectedComponents did not reach a fixpoint in $maxIter " +
        "iterations; raise maxIter (rounds needed ~ log2 of the longest " +
        "bucket-chain diameter)")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  def keepBestOfCluster(scored: DataFrame, clusters: DataFrame): DataFrame = {
    val clustered = scored.join(clusters, Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("id"))
    val pickedClustered = clustered.withColumn("kept",
      when(row_number().over(w) === 1, lit(1L)).otherwise(lit(0L)))
    val singletons = scored
      .join(clusters.select(col("id")), Seq("id"), "left_anti")
      .withColumn("cluster_id", col("id"))
      .withColumn("kept", lit(1L))
    pickedClustered.unionByName(singletons)
      .select(col("id"), col("cluster_id"), col("score"), col("kept"))
  }

  /** Content-defined chunking (the FastCDC/rsync family, at word
    * granularity): a cut falls after token `e` whenever the 3-token
    * gram ENDING at `e` hashes to 0 mod `mask` — so boundaries are a
    * function of local content, not position. An insertion or deletion
    * re-synchronizes at the next content-derived boundary, leaving
    * every following chunk identical; fixed windows
    * ([[Chunker.chunkByTokens]]) misalign every window after the edit.
    * Expected chunk length ≈ `mask` tokens; no min/max clamps — the
    * stateless cut rule keeps the operator a pure per-row expression
    * (and DuckDB-replayable).
    *
    * Scale shape: tokens → gram hashes → cuts → spans is one narrow
    * codegen'd pass over arrays (the [[gramHashes]] machinery);
    * posexplode emits ~len/mask rows per doc. No shuffle here at all.
    *
    * Output: (id, [carry...], chunk_no, chunk_h, n_words
    * [, chunk_str]) — `chunk_h` the 60-bit md5 of the space-joined
    * chunk tokens, `chunk_str` those tokens themselves when
    * `withText` (only [[deboilerplate]] needs the strings; the dedup
    * report deliberately ships hashes alone). `carry` columns ride
    * along unchanged (e.g. an event-time column for the streaming
    * twin [[graft.streaming.StreamingDedup.dedupChunks]]).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      mask: Int = 16, carry: Seq[String] = Nil,
      withText: Boolean = false): DataFrame = {
    require(mask >= 2, s"mask must be >= 2, got $mask")
    val spans = docs
      .select(col(idCol).as("id") +: carry.map(col) :+
        tokens(lower(col(textCol))).as("tk") :+
        gramHashes(col(textCol), 3).as("hs"): _*)
      .withColumn("cuts", transform(
        filter(when(size(col("hs")) > 0, sequence(lit(0), size(col("hs")) - 1))
            .otherwise(array().cast("array<int>")),
          p => get(col("hs"), p) % mask === 0),
        p => p + 2))
      .withColumn("spans", filter(
        zip_with(
          concat(array(lit(0)), transform(col("cuts"), e => e + 1)),
          concat(col("cuts"), array(size(col("tk")) - 1)),
          (s, e) => struct(s.as("s"), e.as("e"))),
        sp => sp("s") <= sp("e")))
    val chunkStr = array_join(
      slice(col("tk"), col("sp.s") + 1, col("sp.e") - col("sp.s") + 1), " ")
    val textCols = if (withText) Seq(chunkStr.as("chunk_str")) else Nil
    spans
      .select(col("id") +: carry.map(col) :+ col("tk") :+
        posexplode(col("spans")).as(Seq("chunk_no", "sp")): _*)
      .select(col("id") +: carry.map(col) :+
        col("chunk_no").cast("long").as("chunk_no") :+
        md5Long(chunkStr).as("chunk_h") :+
        (col("sp.e") - col("sp.s") + 1).cast("long").as("n_words") :++
        textCols: _*)
  }

  /** Chunk-level dedup mass over [[cdcChunks]] — the storage/dedup
    * view: how much of each document is made of chunks that occur
    * more than once in the corpus (boilerplate, quoted passages,
    * partial duplicates that document-level dedup can't see).
    *
    * Scale shape: one groupBy on the chunk hash (the same shuffle
    * exact dedup pays) + one equi-join back on it; AQE handles hot
    * boilerplate chunks. Final per-doc aggregate; docs with no tokens
    * survive with zero counts via the left join.
    *
    * Output: (id, n_chunks, n_words, dup_chunks, dup_words).
    */
  def cdcDedupReport(docs: DataFrame, idCol: String, textCol: String,
      mask: Int = 16): DataFrame = {
    val ch = cdcChunks(docs, idCol, textCol, mask)
    val occ = ch.groupBy(col("chunk_h")).agg(count(lit(1)).as("occ"))
    val perDoc = ch.join(occ, Seq("chunk_h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_words")).as("n_words"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("occ") > 1, col("n_words")).otherwise(0L)).as("dup_words"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("dup_chunks"), lit(0L)).as("dup_chunks"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, bucketed
    * by sign-bit LSH to avoid the all-pairs join (see
    * [[Similarity.signBucket]]).
    *
    * Scale: size `signBits` so expected bucket population stays in the
    * thousands (buckets ≈ 2^signBits; pairs per bucket are quadratic).
    * 8 bits suits ~10^5-10^6 vectors; at 10^9 use ~16-20 bits or swap
    * the bucket fn for trained coarse centroids — the plan shape
    * (bucket equi-join, per-bucket scoring) is unchanged.
    */
  /** Sign-bucket width for [[embeddingNearDups]] at corpus size `n` —
    * the [[suggestSimhashParams]] analog: fixed buckets make candidate
    * pairs grow ~n²/2^bits (measured 9.4× runtime at 10× corpus with
    * the default 8 bits), so the bit count must track log2(n) to hold
    * pairs ~linear. Capped by the embedding dimension (each bit is one
    * component's sign) and 30 (the bucket fits an int-range mask).
    * Widening buckets trades recall for cost exactly like wider simhash
    * bands; pair the wider buckets with a lower `threshold` + exact
    * verify when recall matters.
    */
  def suggestSignBits(n: Long, dim: Int): Int = {
    require(n >= 1, s"corpus size must be >= 1, got $n")
    require(dim >= 1, s"embedding dimension must be >= 1, got $dim")
    // exact integer ceil(log2(n)) — same oracle-parity rationale as
    // suggestSimhashParams
    val want = log2Ceil(n)
    math.max(4, math.min(math.min(dim, 30), want))
  }

  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, signBits: Int = 8): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      Similarity.signBucket(col(embCol), signBits).as("bucket"))
    val l = b.as("l"); val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.scoreFixed(col("l.emb"), col("r.emb")).as("score_1e6"))
      .filter(col("score_1e6") >= math.floor(threshold * 1e6).toLong)
  }

  /** Paragraph/segment-level deduplication (the C4-style "drop
    * duplicated paragraphs corpus-wide, keep the documents" pass):
    * segments dedup globally by content hash — the FIRST occurrence in
    * (id, seg_no) order survives — and every document is reassembled
    * from its surviving segments in order.
    *
    * Segmentation is the caller's: pass (id, seg_no, seg) rows —
    * newline-split paragraphs for prose corpora, or
    * [[Chunker.chunkByTokens]] with zero overlap for flat text (the
    * battery's documents) — the dedup/reassembly is identical.
    *
    * Output: one row per input document — (id, text_dedup, n_kept,
    * n_segs); a document whose every segment was seen earlier keeps an
    * empty text_dedup, so downstream length gates drop it naturally.
    *
    * Scale: one shuffle on the segment hash (the exact-dedup shape), a
    * hash-equi-join back (Catalyst reuses the hash partitioning), and
    * one shuffle on id to reassemble; per-group state is bounded by a
    * single document's segment count. Never all-pairs, nothing
    * driver-side.
    */
  def segmentDedup(segments: DataFrame, joinSep: String = " "): DataFrame = {
    val s = segments.select(col("id"), col("seg_no"), col("seg"))
      .withColumn("h", md5(col("seg")))
    // lexicographic struct-min = first occurrence in (id, seg_no) order
    val first = s.groupBy(col("h"))
      .agg(min(struct(col("id"), col("seg_no"))).as("w"))
      .select(col("h"), col("w.id").as("kid"), col("w.seg_no").as("kseg"))
    val kept = s.join(first, Seq("h"))
      .filter(col("id") === col("kid") && col("seg_no") === col("kseg"))
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("seg_no"), col("seg")))).as("segs"))
      .select(col("id"),
        array_join(transform(col("segs"), x => x("seg")), joinSep).as("text_dedup"),
        size(col("segs")).cast("long").as("n_kept"))
    s.groupBy(col("id")).agg(count(lit(1)).as("n_segs"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("n_segs"))
  }

  /** Coarse-cell count for [[semanticDedup]] at corpus size `n` — the
    * [[suggestSimhashParams]]/[[suggestSignBits]] analog for TRAINED
    * cells: within-cell candidate pairs grow ~n²/2k while the flat
    * assign pays n·k centroid dots, so k* ≈ √n minimizes their sum
    * (FAISS's published ncells guidance for flat IVF is the same
    * √n-scaling). Fixed k=8 is the battery's oracle-pinned teaching
    * baseline (measured 35× at 10× data — the q45/q23 cliff family);
    * this is its executable cure. Exact integer floor-√ (no double
    * rounding at perfect squares) so any engine derives the same k
    * from the same count; floor 8, cap 4096 (the broadcast centroid
    * table stays driver-trivial: 4096·dim doubles ≈ 2 MB at dim 64).
    * At real scale pair the √n cells with hash-sample training —
    * a truly linear-total dedup needs a hierarchical quantizer, which
    * is an architecture change, not a parameter.
    */
  def suggestSemanticCells(n: Long): Int = {
    require(n >= 1, s"corpus size must be >= 1, got $n")
    var s = math.sqrt(n.toDouble).toLong
    while ((s + 1) * (s + 1) <= n) s += 1
    while (s * s > n) s -= 1
    math.max(8L, math.min(4096L, s)).toInt
  }

  /** Level-1/level-2 cell count for [[semanticDedup2]]: target a
    * CONSTANT cell population `targetPop`, so total subcells K =
    * ⌈n/targetPop⌉ grows LINEARLY with the corpus and within-cell
    * pair work stays ~n·targetPop/2 — linear total, the property √n
    * flat cells cannot have (their n^1.5 pair growth is the measured
    * q93 4.8× slope). Split K across two levels as k1 = k2 =
    * clamp(⌊√K⌋, 4, 4096) — level 1 stays a driver-trivial constants
    * assign while level 2 is the distributed
    * [[Similarity.trainSubCentroids]] table. Exact integer floor-√
    * (same discipline as [[suggestSemanticCells]]) so any engine
    * derives the same split from the same count.
    */
  def suggestSemantic2Params(n: Long, targetPop: Long = 32L): Int = {
    require(n >= 1 && targetPop >= 1, s"need n>=1, targetPop>=1; got $n/$targetPop")
    val kTot = (n + targetPop - 1) / targetPop
    var s = math.sqrt(kTot.toDouble).toLong
    while ((s + 1) * (s + 1) <= kTot) s += 1
    while (s * s > kTot) s -= 1
    math.max(4L, math.min(4096L, s)).toInt
  }

  /** Two-level hierarchical semantic dedup — the architecture change
    * [[semanticDedup]]'s scaladoc documents as the requirement for
    * truly-linear-total dedup: a k1-cell trained coarse quantizer
    * (level 1, constants assign) partitions the corpus, then EVERY
    * level-1 cell trains its own k2 sub-quantizer simultaneously via
    * the distributed [[Similarity.trainSubCentroids]] pass, candidate
    * pairs form only within a (cid, cid2) SUBCELL, and the same
    * threshold + connected-components tail elects representatives.
    * With k1·k2 ∝ n (see [[suggestSemantic2Params]]), subcell
    * populations are CONSTANT in expectation: pair work grows
    * linearly where flat √n cells grow n^1.5. The recall trade is the
    * SemDeDup one twice over (near-dups split across subcells are
    * missed) — the price of the bound, stated rather than hidden.
    *
    * Output: (id, rep_id, kept) for every corpus row, exactly like
    * [[semanticDedup]].
    */
  def semanticDedup2(corpus: DataFrame, level1: Seq[(Int, Seq[Double])],
      k2: Int, iters: Int, threshold1e6: Long): DataFrame = {
    val cells1 = Similarity.assignCells(corpus, level1)
      .select(col("id"), col("emb"), col("cid"))
    val sub = Similarity.trainSubCentroids(cells1, k2, iters)
    val cells = Similarity.assignSubCells(cells1, sub)
      .select(col("id"), col("emb"), col("cid"), col("cid2"))
    val l = cells.as("l"); val r = cells.as("r")
    val pairs = l.join(r, col("l.cid") === col("r.cid")
        && col("l.cid2") === col("r.cid2") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.scoreFixed(col("l.emb"), col("r.emb")).as("score_1e6"))
      .filter(col("score_1e6") >= threshold1e6)
      .select(col("id_a"), col("id_b"))
    val comps = connectedComponents(pairs)
    corpus.select(col("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("rep_id"))
      .withColumn("kept", (col("rep_id") === col("id")).cast("long"))
  }

  /** Per-level cell count for [[semanticDedup3]]: the bounded-fanout
    * THREE-level split of K = ⌈n/targetPop⌉ total subcells — smallest
    * c ≥ 2 with c³ ≥ K, exact integer (no float cbrt: engines disagree
    * on libm cube roots at boundaries), clamped to 1024. Three levels
    * shrink q164's residual superlinear term — the n·k1 level-1
    * assignment with k1 = √(n/32) — to n·(n/32)^⅓ while subcell
    * populations stay ~targetPop (measured at 200k vectors:
    * three-level end-to-end 23.1 s vs two-level 35.0 s, level-1
    * train+assign 4.0 s vs 10.0 s).
    */
  def suggestSemantic3Params(n: Long, targetPop: Long = 32L): Int = {
    require(n >= 1 && targetPop >= 1, s"need n>=1, targetPop>=1; got $n/$targetPop")
    val kTot = (n + targetPop - 1) / targetPop
    var c = 2L
    while (c * c * c < kTot && c < 1024L) c += 1
    c.toInt
  }

  /** Three-level hierarchical semantic dedup — [[semanticDedup2]] with
    * one more trained level: k cells (level 1, constants assign), each
    * splits into k sub-cells (level 2, [[Similarity.trainSubCentroids]]),
    * and each (cid, cid2) composite splits again into k sub-sub-cells
    * (level 3 — the SAME trainSubCentroids pass run on the composite
    * cid·k + cid2 key: the machinery is level-count-agnostic).
    * Candidate pairs form only within a level-3 subcell; same
    * threshold + connected-components tail. With k³ ∝ n
    * ([[suggestSemantic3Params]]) subcell populations stay constant
    * AND every level's fanout is ~(n/32)^⅓ — the bounded-fanout tree
    * shape whose per-level assignment cost grows as n·k instead of
    * q164's n·√(n/32). The recall trade is the SemDeDup one three
    * times over — stated, not hidden.
    *
    * Output: (id, rep_id, kept) for every corpus row, exactly like
    * [[semanticDedup]]/[[semanticDedup2]].
    */
  def semanticDedup3(corpus: DataFrame, level1: Seq[(Int, Seq[Double])],
      k: Int, iters: Int, threshold1e6: Long): DataFrame = {
    val cells1 = Similarity.assignCells(corpus, level1)
      .select(col("id"), col("emb"), col("cid"))
    val sub2 = Similarity.trainSubCentroids(cells1, k, iters)
    val cells2 = Similarity.assignSubCells(cells1, sub2)
      .select(col("id"), col("emb"), (col("cid") * k + col("cid2")).as("cid"))
    val sub3 = Similarity.trainSubCentroids(cells2, k, iters)
    val cells = Similarity.assignSubCells(cells2, sub3)
      .select(col("id"), col("emb"), col("cid"), col("cid2"))
    val l = cells.as("l"); val r = cells.as("r")
    val pairs = l.join(r, col("l.cid") === col("r.cid")
        && col("l.cid2") === col("r.cid2") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.scoreFixed(col("l.emb"), col("r.emb")).as("score_1e6"))
      .filter(col("score_1e6") >= threshold1e6)
      .select(col("id_a"), col("id_b"))
    val comps = connectedComponents(pairs)
    corpus.select(col("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("rep_id"))
      .withColumn("kept", (col("rep_id") === col("id")).cast("long"))
  }

  /** SemDeDup-style semantic deduplication: a trained coarse quantizer
    * ([[Similarity.trainCentroids]]) partitions the corpus into cells,
    * candidate pairs form ONLY within a cell (the published SemDeDup
    * recipe dedups inside k-means clusters for exactly this reason —
    * cross-cluster near-dups are the documented recall trade that
    * keeps the join bounded), pairs at/above `threshold1e6` fixed-point
    * cosine become edges, and [[connectedComponents]] elects one
    * representative (the min id) per duplicate group.
    *
    * Output: (id, rep_id, kept) for EVERY corpus row — `rep_id` = the
    * group representative (itself when unduplicated), `kept` = this
    * row survives dedup.
    *
    * Scale: cells bound pair counts the same way sign buckets do in
    * [[embeddingNearDups]], but the quantizer is TRAINED, so cell
    * populations track the data's actual cluster structure instead of
    * axis signs; size k so n/k stays in the low thousands and train on
    * a hash sample at real scale. The pair join is a cid equi-join —
    * never all-pairs — and the CC tail is O(log d) equi-join rounds.
    */
  def semanticDedup(corpus: DataFrame, centroids: Seq[(Int, Seq[Double])],
      threshold1e6: Long): DataFrame = {
    val cells = Similarity.assignCells(corpus, centroids)
      .select(col("id"), col("emb"), col("cid"))
    val l = cells.as("l"); val r = cells.as("r")
    val pairs = l.join(r, col("l.cid") === col("r.cid") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.scoreFixed(col("l.emb"), col("r.emb")).as("score_1e6"))
      .filter(col("score_1e6") >= threshold1e6)
      .select(col("id_a"), col("id_b"))
    val comps = connectedComponents(pairs)
    corpus.select(col("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("rep_id"))
      .withColumn("kept", (col("rep_id") === col("id")).cast("long"))
  }

  /** Exact substring-level duplication report — the span-granular
    * dedup signal of "Deduplicating Training Data Makes Language
    * Models Better" (Lee et al., 2022, arXiv:2107.06499): instead of
    * judging whole documents, find every token POSITION covered by a
    * word n-gram that occurs ≥ `minCount` times anywhere in the
    * corpus (other documents or elsewhere in the same one), merge
    * overlapping positions into maximal spans, and report per-doc
    * span counts and coverage. Downstream can cut the spans out
    * (ExactSubstr) or use the share as a quality gate.
    *
    * Output: (doc_id, n_tokens, n_spans, dup_tokens, dup_share_1e6)
    * for documents with ≥ 1 duplicated span.
    *
    * Scale shape: two corpus passes over ordered positional n-grams
    * (suffix arrays are the single-machine tool; corpus-wide
    * frequency of fixed-width grams is the shuffle-native equivalent
    * at 100 TB). Pass 1 counts gram occurrences (map-side partial
    * agg → one shuffle on the gram); pass 2 re-joins positions to the
    * ≥minCount grams, then the island merge is one window over each
    * doc's MARKED positions only (bounded by doc length, usually a
    * small fraction of it). Same-width intervals make the merge a
    * lag-gap test: a new span starts exactly when pos − prev > n − 1.
    */
  /** Maximal duplicated spans (doc_id, island, s, e) — the shared
    * core of [[duplicatedSpans]] (report) and
    * [[removeDuplicatedSpans]] (cut).
    */
  private def spansOf(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, minCount: Long): DataFrame = {
    require(n >= 1, s"n-gram width must be positive, got $n")
    require(minCount >= 2, s"minCount below 2 would mark everything: $minCount")
    val pos = corpus.select(col(idCol).as("doc_id"),
      posexplode(rawShingles(col(textCol), n)).as(Seq("pos", "gram")))
    val dup = pos.groupBy(col("gram"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= minCount)
      .select(col("gram"))
    val marked = pos.join(dup, "gram").select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= n - 1, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("s"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("e"))
  }

  def duplicatedSpans(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minCount: Long = 2L): DataFrame = {
    val spans = spansOf(corpus, idCol, textCol, n, minCount)
    val totals = corpus.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).as("n_tokens"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("dup_tokens"),
        expr("dup_tokens * 1000000L DIV n_tokens").as("dup_share_1e6"))
  }

  /** The cut step of ExactSubstr dedup (Lee et al., 2022): remove
    * every token covered by a duplicated span (ALL occurrences — the
    * conservative variant; to spare a canonical copy, gate the cut on
    * a keeper table upstream) and reassemble the residual tokens in
    * order. Whitespace normalizes to single spaces, like
    * [[segmentDedup]]'s reassembly.
    *
    * Output: (doc_id, text_clean, n_tokens, n_removed) for EVERY
    * corpus document (fully-duplicated docs keep an empty
    * text_clean).
    *
    * Scale shape: [[duplicatedSpans]]'s two gram passes, then the cut
    * is one anti-join of the token stream against the exploded span
    * ranges (both keyed (doc_id, pos) — co-partitioned by the join)
    * and one per-doc ordered reassembly, the same shuffle the
    * chunker/segment reassemblies already pay.
    */
  def removeDuplicatedSpans(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minCount: Long = 2L): DataFrame = {
    val spans = spansOf(corpus, idCol, textCol, n, minCount)
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("s"), col("e"))).as("pos"))
    val toks = corpus.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val kept = toks.withColumn("pos", col("pos").cast("long"))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    corpus.select(col(idCol).as("doc_id"), tokenCount(col(textCol)).as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Boundary-overlap stitch pairs — crawl/ingest FRAGMENT detection:
    * a pair (a, b) where a's trailing w tokens are exactly b's leading
    * w tokens is evidence the two rows are halves of one original
    * document (pagination, chunked exports, truncated-and-recrawled
    * continuations). The dedup families (q17–q20, q45) cannot see
    * this: the fragments share only the w-token seam, far below any
    * Jaccard or Hamming threshold — yet training on both teaches the
    * seam twice and splits every fact that straddles it.
    *
    * Shape: head/tail w-token windows and their md5 keys are narrow
    * map-side expressions; candidates come from ONE equi-join of tail
    * keys against head keys (never a corpus self-cross); the exact
    * w-token sequence equality rides the join (md5-collision guard,
    * the q45 verify discipline). `maxKeyDf` drops hot seams (shared
    * headers/footers/boilerplate) from EACH side before pair
    * formation — the q205 valve; with it a key contributes ≤ cap²
    * candidates. Docs shorter than w tokens cannot certify a w-token
    * overlap and are excluded; id inequality excludes a doc stitching
    * to itself.
    *
    * Output: (id_a, id_b, overlap) — a's tail stitches to b's head,
    * `overlap` is the space-joined seam (the provenance evidence).
    */
  def boundaryOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      w: Int, maxKeyDf: Option[Int] = None): DataFrame =
    boundaryOverlapPairsTok(tokProj(docs, idCol, textCol), idCol, "_tk",
      w, maxKeyDf)

  /** [[boundaryOverlapPairs]] over an ALREADY-TOKENIZED projection
    * (`tokCol` = the lowercased whitespace token array) — the shared-
    * tokenization seam (VERDICT r14 item 4): a caller that already
    * holds the token arrays (a cached corpus projection feeding the
    * width law, the fixture build, and detection) must not pay a
    * re-tokenize per stage when detection is tokenization-bound (the
    * r14 slope study's own finding). Identical output to the string
    * form by construction: `tokens` splits on whitespace and drops
    * empties, so tokenizing a space-joined token array is the
    * identity.
    */
  private[graft] def boundaryOverlapPairsTok(docs: DataFrame, idCol: String,
      tokCol: String, w: Int, maxKeyDf: Option[Int] = None): DataFrame = {
    require(w >= 1, s"need w >= 1, got $w")
    maxKeyDf.foreach(c => require(c >= 1, s"need maxKeyDf >= 1, got $c"))
    val base = seamBaseTok(docs, idCol, tokCol, w)
    def side(rel: DataFrame, keyCol: String): DataFrame = maxKeyDf match {
      case None => rel
      case Some(cap) =>
        val hot = rel.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > cap).select(col(keyCol))
        rel.join(broadcast(hot), Seq(keyCol), "left_anti")
    }
    val tails = side(base.select(col("id").as("id_a"),
      col("_tail").as("_seam_a"),
      md5Long(array_join(col("_tail"), " ")).as("_h")), "_h")
    val heads = side(base.select(col("id").as("id_b"),
      col("_head").as("_seam_b"),
      md5Long(array_join(col("_head"), " ")).as("_h")), "_h")
    tails.join(heads, Seq("_h"))
      .filter(col("id_a") =!= col("id_b") &&
        col("_seam_a") === col("_seam_b"))
      .select(col("id_a"), col("id_b"),
        array_join(col("_seam_a"), " ").as("overlap"))
  }

  /** (id, _head, _tail) seam windows — the shared prep of
    * [[boundaryOverlapPairs]] and [[suggestStitchMaxKeyDf]], factored
    * so the law sizes the EXACT key population the detector joins on.
    */
  private def seamBase(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    seamBaseTok(tokProj(docs, idCol, textCol), idCol, "_tk", w)

  /** The string→token-array projection the string-typed entry points
    * feed to their `*Tok` twins. */
  private def tokProj(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol), tokens(lower(col(textCol))).as("_tk"))

  private def seamBaseTok(docs: DataFrame, idCol: String, tokCol: String,
      w: Int): DataFrame =
    docs.select(col(idCol).as("id"), col(tokCol).as("_tk"))
      .filter(size(col("_tk")) >= w)
      .select(col("id"), slice(col("_tk"), 1, w).as("_head"),
        slice(col("_tk"), -w, w).as("_tail"))

  /** The [[suggestStitchMaxKeyDf]] law's audit triple: the chosen cap,
    * the seam-key population it was derived from, and the hot-key
    * budget (how many keys the cap is allowed to drop).
    */
  final case class StitchDfLaw(cap: Int, nKeys: Long, hotKeyBudget: Long)

  /** Cap-selection law for [[boundaryOverlapPairs]]' `maxKeyDf` valve
    * (VERDICT r12 item 3 — the one scale valve that was still
    * caller-supplied). The valve exists because templated seams
    * (shared headers/footers/boilerplate) make candidate pairs grow
    * super-linearly: the gen-sf10 legs measured q232/q236 at
    * 6.3×/5.4× per 10× data, all of it seam-df growth (BASELINE.md
    * round-12 session 2). Capping at c linearizes it outright: keys
    * above the cap are dropped per side, so every surviving key has
    * tail-df ≤ c, and Σ_k tail-df_k·head-df_k ≤ c·Σ_k head-df_k ≤ c·n
    * — candidates are ≤ cap·corpus regardless of the df distribution.
    *
    * The law picks the cap from the seam-key df distribution rather
    * than from a fixed constant: cap = the df of the ⌈N·hotKeyPpm/10⁶⌉
    * + 1-th key in descending-df order (exact integer order statistic
    * over the df HISTOGRAM — bounded at distinct df values, never the
    * key stream), floored at `floorCap`. Properties both engines
    * replay: at most hotKeyPpm of keys (default 0.1%) are ever
    * dropped, so recall loss is bounded a priori; corpora under
    * 1/hotKeyPpm keys get cap = max df and drop NOTHING (a small
    * corpus needs no valve); a heavy boilerplate head (the measured
    * regime — few keys, huge df) lands just above the organic df mass
    * and gets cut. True stitch seams have df ≈ 1 and survive any
    * floorCap ≥ 1; legitimate duplicate fragments survive up to
    * floorCap-way duplication even when the corpus is tiny.
    *
    * Scale shape: one groupBy to key dfs, one groupBy to the df
    * histogram, one driver walk over the histogram (distinct df
    * values — KBs at any corpus size).
    */
  def suggestStitchMaxKeyDf(docs: DataFrame, idCol: String, textCol: String,
      w: Int, hotKeyPpm: Long = 1000L, floorCap: Int = 4): StitchDfLaw =
    suggestStitchMaxKeyDfTok(tokProj(docs, idCol, textCol), idCol, "_tk",
      w, hotKeyPpm, floorCap)

  /** [[suggestStitchMaxKeyDf]] over an already-tokenized projection —
    * see [[boundaryOverlapPairsTok]] for why the seam exists. */
  private[graft] def suggestStitchMaxKeyDfTok(docs: DataFrame, idCol: String,
      tokCol: String, w: Int, hotKeyPpm: Long = 1000L,
      floorCap: Int = 4): StitchDfLaw = {
    require(w >= 1, s"need w >= 1, got $w")
    require(hotKeyPpm >= 1 && hotKeyPpm < 1000000L,
      s"need hotKeyPpm in [1, 1e6), got $hotKeyPpm")
    require(floorCap >= 1, s"need floorCap >= 1, got $floorCap")
    val base = seamBaseTok(docs, idCol, tokCol, w)
    val keys = base.select(lit("t").as("_s"),
        md5Long(array_join(col("_tail"), " ")).as("_k"))
      .unionAll(base.select(lit("h").as("_s"),
        md5Long(array_join(col("_head"), " ")).as("_k")))
    val hist = keys.groupBy(col("_s"), col("_k")).agg(count(lit(1)).as("_df"))
      .groupBy(col("_df")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val nKeys = hist.map(_._2).sum
    val budget = nKeys * hotKeyPpm / 1000000L
    // cap = max df whose descending cumulative key count reaches
    // budget+1 — i.e. the (budget+1)-th key's df, so keys STRICTLY
    // above the cap number at most `budget`
    var cum = 0L
    var capRaw = 1L
    val it = hist.iterator
    var found = false
    while (it.hasNext && !found) {
      val (df, c) = it.next()
      cum += c
      if (cum >= budget + 1) { capRaw = df; found = true }
    }
    StitchDfLaw(math.max(floorCap.toLong, capRaw)
      .min(Int.MaxValue.toLong).toInt, nKeys, budget)
  }

  /** [[boundaryOverlapPairs]] with the valve set by
    * [[suggestStitchMaxKeyDf]] — the kmvPairwiseJaccardAuto pattern:
    * callers get the scale-safe plan by default, the battery keeps
    * the uncapped q232 shape as the pinned baseline. The law columns
    * ride the output so the selection is hash-gated.
    * Output: (id_a, id_b, overlap, n_keys, hot_key_budget, max_key_df).
    */
  def boundaryOverlapPairsAuto(docs: DataFrame, idCol: String,
      textCol: String, w: Int, hotKeyPpm: Long = 1000L,
      floorCap: Int = 4): DataFrame =
    boundaryOverlapPairsAutoTok(tokProj(docs, idCol, textCol), idCol,
      "_tk", w, hotKeyPpm, floorCap)

  /** [[boundaryOverlapPairsAuto]] over an already-tokenized
    * projection — see [[boundaryOverlapPairsTok]]. */
  private[graft] def boundaryOverlapPairsAutoTok(docs: DataFrame,
      idCol: String, tokCol: String, w: Int, hotKeyPpm: Long = 1000L,
      floorCap: Int = 4): DataFrame = {
    val law = suggestStitchMaxKeyDfTok(docs, idCol, tokCol, w, hotKeyPpm,
      floorCap)
    boundaryOverlapPairsTok(docs, idCol, tokCol, w, Some(law.cap))
      .withColumn("n_keys", lit(law.nKeys))
      .withColumn("hot_key_budget", lit(law.hotKeyBudget))
      .withColumn("max_key_df", lit(law.cap.toLong))
  }

  /** The [[suggestSeamWidth]] law's audit triple: the chosen width,
    * the inputs it was derived from, and the key-space floor the width
    * had to clear.
    */
  final case class SeamWidthLaw(w: Int, vocabSize: Long, nKeys: Long,
      neededKeySpace: Long)

  /** Seam-WIDTH selection law for [[boundaryOverlapPairs]] (VERDICT
    * r13 item 2) — the lever for the VOCAB-SATURATION regime that the
    * df-cap law [[suggestStitchMaxKeyDf]] correctly refuses to touch:
    * when the corpus vocabulary is small relative to corpus size, the
    * w-token seam-key space (vocabSize^w keys) saturates and EVERY
    * key's df grows with the corpus — broad organic growth, not a few
    * hot boilerplate keys, so a df cap could only shed broad recall
    * (the BASELINE round-13 capped-gate study: a 30-word vocab has ≤
    * 27,000 3-token keys, and q232's candidate mass grew 6.3× per 10×
    * data entirely through that saturation). Widening the seam is the
    * structural fix: keys grow as vocabSize^w, so each +1 in w divides
    * the expected organic df by the vocabulary size.
    *
    * The law: the smallest w in [minW, maxW] with vocabSize^w ≥
    * ⌈nKeys / targetDf⌉ — i.e. a key space big enough that the
    * EXPECTED df per seam key is ≤ targetDf. `nKeys` is the seam-key
    * population the detector will join (for a fragment corpus: 2 keys
    * per fragment — head and tail). `targetDf` defaults LOW (2) for
    * the same reason [[suggestSimhashParams]]' targetBucket does: real
    * seam keys are Zipfian, so the mean df badly understates the busy
    * keys. All arithmetic is EXACT integer math — the power loop
    * saturates at Long.MaxValue (p > Long.Max/v ⟺ the true product
    * exceeds Long.Max, so saturation is exact), and the SQL oracle
    * replays the identical loop with a HUGEINT product capped at the
    * same bound — no float-log boundary risk.
    *
    * Trade-offs the caller owns: docs shorter than w tokens cannot
    * certify a w-token overlap and drop out of detection entirely
    * (`maxW` bounds that loss; fragments are usually ≫ 16 tokens), and
    * a TRUE stitch whose seam the upstream chunker cut narrower than w
    * is missed — w is a recall/precision dial, this law picks the
    * precision floor the corpus size demands. Hot BOILERPLATE seams
    * remain [[suggestStitchMaxKeyDf]]'s job: the two laws compose
    * (width for organic saturation, df cap for template spikes).
    */
  def suggestSeamWidth(vocabSize: Long, nKeys: Long, targetDf: Int = 2,
      minW: Int = 2, maxW: Int = 16): SeamWidthLaw = {
    require(vocabSize >= 1, s"need vocabSize >= 1, got $vocabSize")
    require(nKeys >= 0, s"need nKeys >= 0, got $nKeys")
    require(targetDf >= 1, s"need targetDf >= 1, got $targetDf")
    require(minW >= 1 && maxW >= minW,
      s"need 1 <= minW <= maxW, got minW=$minW maxW=$maxW")
    // overflow-safe ⌈nKeys/targetDf⌉
    val needed = nKeys / targetDf +
      (if (nKeys % targetDf == 0L) 0L else 1L)
    var w = 1
    var p = vocabSize // vocabSize^w, saturated at Long.MaxValue (exact)
    while (w < maxW && p < needed) {
      p = if (p > Long.MaxValue / vocabSize) Long.MaxValue
          else p * vocabSize
      w += 1
    }
    SeamWidthLaw(math.max(minW, w), vocabSize, nKeys, needed)
  }

  /** Reassemble stitched fragments — the CUT step after
    * [[boundaryOverlapPairs]]' detection (the duplicatedSpans →
    * removeDuplicatedSpans pairing, applied to fragment seams): every
    * UNAMBIGUOUS pair (a stitches to exactly one b AND b is stitched
    * by exactly one a) merges into one document, the seam kept once —
    * `a.text ⧺ b.text minus its leading w tokens`. Ambiguous fan-in or
    * fan-out (boilerplate seams, template heads) is left alone:
    * reassembly must never guess; run the maxKeyDf valve upstream and
    * review what remains. Tokens are the operator's lowercase
    * whitespace normalization, so output text is normalized.
    *
    * Shape: degree filters are two bounded groupBys on the pair list;
    * the rebuild joins the (bounded) unambiguous pairs back to the
    * fragment corpus twice — broadcast-sized whenever stitching is the
    * exception, which is the only regime where auto-merging is sane.
    *
    * Output: (id_a, id_b, text).
    */
  def stitchReassemble(frags: DataFrame, idCol: String, textCol: String,
      w: Int, maxKeyDf: Option[Int] = None): DataFrame = {
    val pairs = boundaryOverlapPairs(frags, idCol, textCol, w, maxKeyDf)
    val outDeg = pairs.groupBy(col("id_a")).agg(count(lit(1)).as("_od"))
    val inDeg = pairs.groupBy(col("id_b")).agg(count(lit(1)).as("_id"))
    val uniq = pairs.join(outDeg, Seq("id_a")).join(inDeg, Seq("id_b"))
      .filter(col("_od") === 1L && col("_id") === 1L)
      .select(col("id_a"), col("id_b"))
    val t = frags.select(col(idCol).as("_fid"),
      tokens(lower(col(textCol))).as("_tk"))
    uniq
      .join(t.select(col("_fid").as("id_a"), col("_tk").as("_ta")), Seq("id_a"))
      .join(t.select(col("_fid").as("id_b"), col("_tk").as("_tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        array_join(concat(col("_ta"),
          slice(col("_tb"), lit(w + 1),
            greatest(size(col("_tb")) - w, lit(0)))),
          " ").as("text"))
  }
}
