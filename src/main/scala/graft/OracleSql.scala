package graft

import graft.model.Seeds
import graft.operators.TextAnalysis

/** DuckDB oracle SQL for every SparkEntry query.
  *
  * Fragments that must mirror a Spark expression exactly (regex-rule
  * fold order, md5-derived hashes, float fold order) are generated from
  * the same Scala data the Spark plans are built from, so the two sides
  * cannot drift. Float summations use list_reduce with an explicit 0.0
  * init = the same left-to-right fold as Spark's `aggregate`.
  */
object OracleSql {

  /** 60-bit md5-derived hash — mirror of graft.functions.md5Long. */
  private def md5long(e: String): String =
    s"cast(('0x' || substr(md5($e),1,15)) as bigint)"

  /** Whitespace tokens, empties dropped — mirror of functions.tokens. */
  private def toks(e: String): String =
    s"list_filter(regexp_split_to_array(coalesce($e,''), '\\s+'), t -> t <> '')"

  /** Word 3-grams in document order — mirror of functions.rawShingles(_, 3). */
  private def rawShingles3(e: String): String = {
    val t = toks(s"lower($e)")
    s"""CASE WHEN len($t) >= 3
       THEN list_transform(range(len($t) - 2), i -> $t[i+1] || ' ' || $t[i+2] || ' ' || $t[i+3])
       ELSE []::VARCHAR[] END"""
  }

  /** Sorted distinct word 3-gram shingles — mirror of functions.shingles(_, 3). */
  private def shingles3(e: String): String =
    s"list_sort(list_distinct(${rawShingles3(e)}))"

  /** Token-hash + gram-hash CTE fragments — mirror of
    * Dedup.gramHashes(_, 3): md5 per token mod p, then polynomial
    * combine of 3 consecutive token hashes. Staged so DuckDB computes
    * the md5 list once per row.
    */
  private def tokenHashExpr(e: String): String = {
    val p = graft.operators.Dedup.MinhashP
    s"list_transform(${toks(s"lower($e)")}, t -> ${md5long("t")} % $p)"
  }

  /** Combine over a column named `th`. */
  private val gramFromTh: String = {
    val p = graft.operators.Dedup.MinhashP
    val b = graft.operators.Dedup.GramB
    val b2 = b * b % p
    s"""CASE WHEN len(th) >= 3 THEN
        list_transform(range(len(th) - 2), i ->
          (((th[i+1] * $b2) % $p) + ((th[i+2] * $b) % $p) + (th[i+3] % $p)) % $p)
       ELSE []::BIGINT[] END"""
  }

  /** Exact-dedup keepers + LSH reachability clusters — ends with
    * CL(node, cluster_id). Shared prefix of q44/q57/q118.
    */
  private def dedupClusterCtes: String =
    s"""KEEP AS (SELECT * FROM documents
                 WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))),
        ${lshPairCtes("KEEP")},
        EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                  UNION SELECT id_b, id_a FROM PAIRS),
        REACH(node, r) AS (
          SELECT src, src FROM EDGES
          UNION
          SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
        CL AS (SELECT node, min(r) AS cluster_id FROM REACH GROUP BY node)"""

  /** Quality + language gate signals over `src` — ends with
    * G(doc_id, quality_1e6, predicted_lang).
    */
  private def gateCtes(src: String): String = {
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted // de, en, es, fr
    val hits = langs.map(l => s"${hitsSql("text", l)} AS h_$l").mkString(", ")
    s"""BASE AS (SELECT doc_id,
            length(coalesce(text,''))::DOUBLE AS len,
            len(${toks("text")})::DOUBLE AS ntok,
            len(regexp_extract_all(coalesce(text,''), '[0-9]'))::DOUBLE AS digits,
            ${hitsSql("text", "en")}::DOUBLE AS stops,
            $hits
          FROM $src),
        SC AS (SELECT doc_id,
            CASE WHEN len >= 100 AND len <= 10000 THEN 1.0::DOUBLE
                 WHEN len < 100 THEN len / 100.0::DOUBLE
                 ELSE 10000.0::DOUBLE / len END AS ls,
            1.0::DOUBLE - (CASE WHEN len = 0 THEN 0.0::DOUBLE ELSE digits / len END) AS dp,
            least((CASE WHEN ntok = 0 THEN 0.0::DOUBLE ELSE stops / ntok END) * 5.0::DOUBLE, 1.0::DOUBLE) AS ss,
            h_de, h_en, h_es, h_fr
          FROM BASE),
        G AS (SELECT doc_id,
            cast(floor(((ls + dp + ss) / 3.0::DOUBLE) * 1000000.0::DOUBLE) as bigint) AS quality_1e6,
            CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                 WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                 WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                 WHEN h_es >= h_fr THEN 'es'
                 ELSE 'fr' END AS predicted_lang
          FROM SC)"""
  }

  /** Shared CTE chain of q44/q57 — exact-dedup keepers → LSH-pair
    * recursive-reachability pruning (min-id survivor) → gate signals
    * (G ends with quality_1e6 + predicted_lang per survivor).
    */
  private def curationCtes: String =
    s"""$dedupClusterCtes,
        SURV AS (SELECT * FROM KEEP
                 WHERE doc_id NOT IN (SELECT node FROM CL WHERE node <> cluster_id)),
        ${gateCtes("SURV")}"""

  /** Content-defined chunking chain — mirror of Dedup.cdcChunks at
    * mask 16: cuts after token p+2 where the 3-gram hash ≡ 0 mod 16,
    * spans between cuts, chunk text + 60-bit md5. Ends with
    * CH(doc_id, chunk_no, chunk_h, chunk_str, n_words); shared by
    * q116/q123.
    */
  private def cdcChunkCtes: String =
    s"""TH AS (SELECT doc_id, ${toks("lower(text)")} AS tk,
               ${tokenHashExpr("text")} AS th FROM documents),
        HS AS (SELECT doc_id, tk, $gramFromTh AS hs FROM TH),
        SP AS (SELECT doc_id, tk,
               list_concat([0], list_transform(cuts, e -> e + 1)) AS starts,
               list_concat(cuts, [len(tk) - 1]) AS ends
              FROM (SELECT doc_id, tk,
                  list_transform(list_filter(range(len(hs)),
                    i -> hs[i+1] % 16 = 0), i -> i + 2) AS cuts
                FROM HS)),
        CH AS (SELECT doc_id, chunk_no, ${md5long("chunk_str")} AS chunk_h,
               chunk_str, n_words
              FROM (SELECT doc_id, chunk_no,
                  array_to_string(tk[starts[j+1]+1:ends[j+1]+1], ' ') AS chunk_str,
                  ends[j+1] - starts[j+1] + 1 AS n_words
                FROM (SELECT doc_id, tk, starts, ends, unnest(keep) AS j,
                    generate_subscripts(keep, 1) - 1 AS chunk_no
                  FROM (SELECT *, list_filter(range(len(starts)),
                      j -> starts[j+1] <= ends[j+1]) AS keep FROM SP))))"""

  /** Left-to-right double fold — mirror of functions.dot. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE)),
        (acc, v) -> acc + v)"""

  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  private def scoreFixedSql(a: String, b: String): String =
    s"cast(floor(${cosineSql(a, b)} * 1000000.0) as bigint)"

  /** [[scoreFixedSql]] with the zero-norm guard of
    * Similarity.cellFromNorm / lutContrib: 0 when either side is the
    * zero vector (reachable for residual-PQ slices). A no-op wherever
    * norms are nonzero, so it cannot move existing hashes.
    */
  private def scoreFixedSafeSql(a: String, b: String): String =
    s"""CASE WHEN ${dotSql(a, a)} = 0.0 OR ${dotSql(b, b)} = 0.0
        THEN CAST(0 AS BIGINT) ELSE ${scoreFixedSql(a, b)} END"""

  /** ±1 random-projection literal sums over a fixed-point component
    * array column `xf` — mirror of Similarity.rpProjExpr, generated
    * from the SAME Scala sign matrix (Similarity.rpSigns) the Spark
    * plan interpolates, so the two sides cannot drift.
    */
  private def rpProjSql(outDims: Int, dim: Int): String = {
    val signs = graft.operators.Similarity.rpSigns(outDims, dim)
    (0 until outDims).map { j =>
      "(CAST(0 AS BIGINT)" + (0 until dim).map { i =>
        (if (signs(j)(i) > 0) " + " else " - ") + s"xf[${i + 1}]"
      }.mkString + ")"
    }.mkString("[", ", ", "]")
  }

  /** Exact integer dot over BIGINT list columns — mirror of the
    * integer fold inside Similarity.rpScoreFixed.
    */
  private def idotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(len($a)), i -> $a[i+1] * $b[i+1])),
        (acc, v) -> acc + v)"""

  /** Fixed-point cosine from staged integer dot/norm columns
    * (dd, na, nb) — mirror of Similarity.rpScoreFixed's final
    * normalize, zero-norm → 0.
    */
  private val rpCosFromDots: String =
    s"""CASE WHEN na = 0 OR nb = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(floor((dd::DOUBLE / (sqrt(na::DOUBLE) * sqrt(nb::DOUBLE)))
          * 1000000.0) AS BIGINT) END"""

  /** Sign-bit bucket — mirror of Similarity.signBucket. */
  private def signBucketSql(e: String, bits: Int): String =
    (0 until bits).map(j => s"(CASE WHEN $e[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Sequential 7-rule regex fold — mirror of Scrubber.applyRules over
    * Seeds.phiRulesV1 (rule_id order, case-insensitive, global).
    */
  private def scrubFold(e: String): String =
    Seeds.phiRulesV1.foldLeft(e) { (acc, r) =>
      val p = ("(?i)" + r.pattern).replace("'", "''")
      s"regexp_replace($acc, '$p', '${r.replacement}', 'g')"
    }

  /** SimHash bit-vote formula over a token-hash list column `H` —
    * mirror of Dedup.simhash / expressions.SimhashText (shared by q19
    * and q45 so the two can't drift).
    */
  private def simhashSql(bits: Int): String =
    s"""cast(list_sum(list_transform(range($bits), j ->
       CASE WHEN list_reduce(list_prepend(0::BIGINT,
              list_transform(H, h -> CASE WHEN ((h >> j) & 1) = 1 THEN 1::BIGINT ELSE (-1)::BIGINT END)),
              (a, b) -> a + b) > 0
            THEN (1::BIGINT << j) ELSE 0::BIGINT END)) as bigint)"""

  private def stopwordList(lang: String): String =
    TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** CTE chain `TH, HS, SIG, B, PAIRS` producing the MinHash-LSH
    * candidate pairs of `src` — mirror of Dedup.minhashLshPairs
    * (16 hashes, 4 bands × 4 rows, word 3-grams).
    */
  private def lshPairCtes(src: String): String = {
    val p = graft.operators.Dedup.MinhashP
    val sigExprs = graft.operators.Dedup.minhashCoeffs(16).map { case (a, b) =>
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $p))"
    }.mkString("[", ", ", "]")
    s"""TH AS (SELECT doc_id, ${tokenHashExpr("text")} AS th FROM $src),
        HS AS (SELECT doc_id, $gramFromTh AS hs FROM TH),
        SIG AS (SELECT doc_id, $sigExprs AS sig FROM HS WHERE len(hs) > 0),
        B AS (SELECT doc_id, t.band AS band,
               md5(array_to_string(list_transform(
                 list_slice(sig, t.band * 4 + 1, t.band * 4 + 4), x -> x::varchar), ',')) AS bucket
              FROM SIG CROSS JOIN (SELECT unnest(range(4)) AS band) t),
        PAIRS AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
                  FROM B a JOIN B b2 ON a.band = b2.band AND a.bucket = b2.bucket
                    AND a.doc_id < b2.doc_id)"""
  }

  /** One Lloyd's-k-means round for the q49 IVF oracle: assign every
    * corpus vector to its best cell in `prev` (score desc, cid asc —
    * the exact tie-break of Similarity.assignCell's first-max), then
    * per-dimension means from FIXED-POINT integer sums (associative,
    * so both engines compute bit-identical centroids), empty cells
    * carrying the previous centroid.
    */
  /** The nearest-cells CTE — the ONE place the assignment tie-break
    * (score DESC, cid ASC = Similarity.assignCell's first-max) lives;
    * training rounds, the final corpus assign, and the query probe all
    * reuse it (`probes` = 1 for assignment, nprobe for the probe).
    */
  private def ivfAssignCte(src: String, cents: String, out: String,
      probes: Int): String =
    s"""$out AS (SELECT id, emb, cid FROM (
          SELECT c.id, c.emb, s.cid,
            row_number() OVER (PARTITION BY c.id
              ORDER BY ${scoreFixedSafeSql("c.emb", "s.cemb")} DESC, s.cid) AS rn
          FROM $src c CROSS JOIN $cents s) WHERE rn <= $probes)"""

  private def ivfRound(prev: String, a: String, p: String, m: String,
      next: String, src: String = "C"): String =
    s"""${ivfAssignCte(src, prev, a, 1)},
        $p AS (SELECT cid, unnest(range(len(emb))) AS pos, emb FROM $a),
        $m AS (SELECT cid, pos,
                (sum(cast(floor(emb[pos+1]::DOUBLE * 1048576.0) as bigint))::DOUBLE
                  / count(*)::DOUBLE) / 1048576.0 AS mv
               FROM $p GROUP BY cid, pos),
        $next AS (SELECT s.cid, coalesce(n.cemb, s.cemb) AS cemb
                  FROM $prev s LEFT JOIN
                    (SELECT cid, list(mv ORDER BY pos) AS cemb FROM $m GROUP BY cid) n
                  ON n.cid = s.cid)"""

  /** One within-cell Lloyd's round for the two-level quantizer
    * (q164): like [[ivfRound]], but everything is PARTITIONED by the
    * level-1 cell — assignment joins each vector of `src` to its own
    * cell's sub-centroids in `prev` ((score desc, cid2 asc)
    * tie-break), means aggregate per (cid, cid2, pos) with the same
    * fixed-point sums, empty subcells carry their previous centroid.
    * Mirror of Similarity.trainSubCentroids' distributed iteration.
    */
  private def ivfSubRound(prev: String, a: String, p: String, m: String,
      next: String, src: String): String =
    s"""$a AS (SELECT id, emb, cid, cid2 FROM (
          SELECT c.id, c.emb, c.cid, s.cid2,
            row_number() OVER (PARTITION BY c.id
              ORDER BY ${scoreFixedSafeSql("c.emb", "s.cemb")} DESC, s.cid2) AS rn
          FROM $src c JOIN $prev s ON s.cid = c.cid) WHERE rn = 1),
        $p AS (SELECT cid, cid2, unnest(range(len(emb))) AS pos, emb FROM $a),
        $m AS (SELECT cid, cid2, pos,
                (sum(cast(floor(emb[pos+1]::DOUBLE * 1048576.0) as bigint))::DOUBLE
                  / count(*)::DOUBLE) / 1048576.0 AS mv
               FROM $p GROUP BY cid, cid2, pos),
        $next AS (SELECT s.cid, s.cid2, coalesce(n.cemb, s.cemb) AS cemb
                  FROM $prev s LEFT JOIN
                    (SELECT cid, cid2, list(mv ORDER BY pos) AS cemb
                     FROM $m GROUP BY cid, cid2) n
                  ON n.cid = s.cid AND n.cid2 = s.cid2)"""

  /** rep_1e6 over a gram-array column — mirror of
    * TextAnalysis.repetitionRatio × 1e6 (shared by q56/q57 so the two
    * can't drift).
    */
  private def repFixedSql(g: String): String =
    s"""CAST(floor(CASE WHEN len($g) = 0 THEN 0.0::DOUBLE
          ELSE (1.0::DOUBLE - len(list_distinct($g))::DOUBLE / len($g)::DOUBLE)
          END * 1000000.0::DOUBLE) AS BIGINT)"""

  /** Unrolled Morton interleave — generated by the same loop shape as
    * Layout.zValue so the two cannot drift (x bit i → 2i+1, y → 2i).
    */
  private def zOrderSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i + 1})",
      s"((($y >> $i) & 1) << ${2 * i})")).mkString(" + ")

  /** The battery's eval-slice shingle set (doc_id % mod = 0) — shared
    * by the q55/q57/q65 decontamination formulations.
    */
  private def benchGramsCte(mod: Int = 97): String =
    s"""BG AS (SELECT DISTINCT unnest(${shingles3("text")}) AS gram
           FROM documents WHERE doc_id % $mod = 0 AND doc_id < 5000)"""

  /** Fixed-point q41 quality score as a CTE, shared by q41/q115 —
    * mirror of TextAnalysis.qualityScoreRaw (same double ops in the
    * same order). Ends with QS(doc_id, quality_1e6).
    */
  private def qualityCte: String =
    s"""QS AS (SELECT doc_id, cast(floor(((ls + dp + ss) / 3.0::DOUBLE) * 1000000.0::DOUBLE) as bigint) AS quality_1e6
         FROM (SELECT doc_id,
             CASE WHEN len >= 100 AND len <= 10000 THEN 1.0::DOUBLE
                  WHEN len < 100 THEN len / 100.0::DOUBLE
                  ELSE 10000.0::DOUBLE / len END AS ls,
             1.0::DOUBLE - (CASE WHEN len = 0 THEN 0.0::DOUBLE ELSE digits / len END) AS dp,
             least((CASE WHEN ntok = 0 THEN 0.0::DOUBLE ELSE stops / ntok END) * 5.0::DOUBLE, 1.0::DOUBLE) AS ss
           FROM (SELECT doc_id,
               length(coalesce(text,''))::DOUBLE AS len,
               len(${toks("text")})::DOUBLE AS ntok,
               len(regexp_extract_all(coalesce(text,''), '[0-9]'))::DOUBLE AS digits,
               ${hitsSql("text", "en")}::DOUBLE AS stops
             FROM documents)))"""

  /** DSIR score chain shared by q105/q113 — corpus/target unigram
    * counts, size normalizers, per-token exact digit-count bit
    * scores, per-document totals; ends with
    * DS(id, n_tokens, dsir_bits, avg_dsir_1e6). Mirror of
    * TextAnalysis.dsirWeights with target = the short-doc slice
    * (n_chars < 150 — the driver-data carve-out with a genuinely
    * different token distribution; uniform-vocab slices cancel to
    * constant-zero scores).
    */
  private def dsirCtes: String =
    s"""E AS (SELECT doc_id, unnest(${toks("lower(text)")}) AS term FROM documents),
        CC AS (SELECT term, CAST(count(*) AS BIGINT) AS cc FROM E GROUP BY term),
        CT AS (SELECT term, CAST(count(*) AS BIGINT) AS ct FROM
               (SELECT unnest(${toks("lower(text)")}) AS term
                FROM documents WHERE n_chars < 150) GROUP BY term),
        NC AS (SELECT coalesce(CAST(sum(cc) AS BIGINT), 0) AS nc FROM CC),
        NT AS (SELECT coalesce(CAST(sum(ct) AS BIGINT), 0) AS nt FROM CT),
        SC AS (SELECT e.doc_id,
                CAST(length(bin(coalesce(t.ct, 0) + 1)) - length(bin(c.cc + 1))
                  + length(bin(nc.nc + 1)) - length(bin(nt.nt + 1)) AS BIGINT) AS s
               FROM E e JOIN CC c USING (term) LEFT JOIN CT t USING (term)
               CROSS JOIN NC nc CROSS JOIN NT nt),
        DS AS (SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(s) AS BIGINT) AS dsir_bits,
                (CAST(sum(s) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS avg_dsir_1e6
               FROM SC GROUP BY doc_id)"""

  /** BM25 stat chain shared by q51/q53/q60 — tokenized corpus (L, D),
    * corpus stats (ST), exploded term stream filtered by `eqFilter`
    * (EQ), df/idf (F, I), tf (T), and per-(doc, term) integer
    * contributions (SC). `mid` injects extra CTEs after D for
    * formulations whose term filter is itself derived from the data
    * (q60's seed-doc term set). Constants interpolate from the same
    * k1/b doubles the Spark plans use.
    */
  private def bm25ScCtes(eqFilter: String, mid: String = "",
      k1: Double = 1.2, b: Double = 0.75): String =
    s"""L AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
        D AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS dl FROM L),
        ${if (mid.isEmpty) "" else mid + ","}
        ST AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sdl
               FROM D),
        E AS (SELECT doc_id, dl, unnest(tk) AS term FROM D),
        EQ AS (SELECT * FROM E WHERE $eqFilter),
        F AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfd
              FROM EQ GROUP BY term),
        I AS (SELECT term,
               CAST(floor((1000000.0::DOUBLE * (st.n::DOUBLE - dfd + 0.5))
                    / (dfd + 0.5)) AS BIGINT) AS idf_1e6
              FROM F CROSS JOIN ST st),
        T AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT)::DOUBLE AS tf
              FROM EQ GROUP BY doc_id, dl, term),
        SC AS (SELECT t.doc_id, t.term,
                CAST(floor((i.idf_1e6::DOUBLE * (t.tf * ${k1 + 1.0}::DOUBLE))
                  / (t.tf + $k1::DOUBLE * (${1.0 - b}::DOUBLE
                      + ($b::DOUBLE * t.dl::DOUBLE)
                        / (st.sdl::DOUBLE / st.n::DOUBLE)))) AS BIGINT) AS c
               FROM T t JOIN I i USING (term) CROSS JOIN ST st)"""

  /** Coarse-quantizer CTE block shared by q49/q59: seeds (k lowest-id
    * vectors), two fixed-point Lloyd rounds, corpus assign (CC), query
    * slice (Q) and its nprobe-cell probe (QP).
    */
  private def ivfCoarseCtes(k: Int, nprobe: Int): String =
    s"""S0 AS (SELECT (row_number() OVER (ORDER BY id)) - 1 AS cid, emb AS cemb
           FROM (SELECT * FROM C ORDER BY id LIMIT $k)),
        ${ivfRound("S0", "A1", "P1", "M1", "S1")},
        ${ivfRound("S1", "A2", "P2", "M2", "S2")},
        ${ivfAssignCte("C", "S2", "CC", 1)},
        Q AS (SELECT id, emb FROM C WHERE id % 200 = 0 AND id < 2000),
        ${ivfAssignCte("Q", "S2", "QP", nprobe)}"""

  /** Per-subspace PQ CTE block shared by q58/q59: sliced corpus, its
    * own seeded k-means (two rounds), per-vector codes, sliced
    * queries, and the per-(query, cell) fixed-point contribution LUT.
    */
  /** Slice + per-subspace k-means + codes for subspace `s`, training
    * on `src` (raw vectors for q58/q59; the RES residual table for
    * q83 — identical derivation either way).
    */
  private def pqTrainCodesCtes(s: Int, kc: Int, sub: Int, src: String): String = {
    val c = s"C$s"
    val lo = s * sub + 1; val hi = (s + 1) * sub
    s"""$c AS (SELECT id, emb[$lo:$hi] AS emb FROM $src),
        PS0_$s AS (SELECT (row_number() OVER (ORDER BY id)) - 1 AS cid, emb AS cemb
               FROM (SELECT * FROM $c ORDER BY id LIMIT $kc)),
        ${ivfRound(s"PS0_$s", s"PA1_$s", s"PP1_$s", s"PM1_$s", s"PS1_$s", c)},
        ${ivfRound(s"PS1_$s", s"PA2_$s", s"PP2_$s", s"PM2_$s", s"PS2_$s", c)},
        ${ivfAssignCte(c, s"PS2_$s", s"CODE$s", 1)}"""
  }

  private def pqSubspaceCtes(m: Int, kc: Int, sub: Int): String =
    (0 until m).map { s =>
      val c = s"C$s"
      s"""${pqTrainCodesCtes(s, kc, sub, "C")},
          Q$s AS (SELECT id, emb FROM $c WHERE id % 200 = 0 AND id < 2000),
          LUT$s AS (SELECT q.id AS query_id, s2.cid,
                 ${scoreFixedSafeSql("q.emb", "s2.cemb")} AS contrib
                FROM Q$s q CROSS JOIN PS2_$s s2)"""
    }.mkString(",\n")

  private def hitsSql(e: String, lang: String): String =
    s"cast(len(list_filter(${toks(s"lower($e)")}, t -> list_contains(${stopwordList(lang)}, t))) as bigint)"

  /** Unrolled BPE trainer + encoder — mirror of operators.Bpe: vocab =
    * word-frequency dictionary capped by (freq DESC, word ASC); each
    * round counts adjacent symbol pairs (overlaps included) weighted
    * by word freq, picks the best by (cnt DESC, a ASC, b ASC), and
    * rewrites every word with ONE left-to-right non-overlapping fold
    * (list_reduce with '' init = the same fold as Spark `aggregate`;
    * string replace would skip every second adjacent occurrence).
    * A LEFT JOIN ON TRUE against the 1-row best keeps rounds after
    * pair exhaustion as no-ops instead of empty.
    *
    * Every CTE is MATERIALIZED: each round is referenced twice (pair
    * counting and the merge rewrite), and DuckDB inlines plain CTEs —
    * the chain would otherwise double per round (2^24 inlined scans;
    * observed as an fd-exhaustion failure before the total blowup).
    *
    * Parity with the Spark expression encoder holds whenever the
    * corpus has ≤ vocabCap distinct words (then the oracle's
    * dictionary join covers every occurrence; the cap is a no-op on
    * the test corpora).
    */
  private def bpeCtes(numMerges: Int, vocabCap: Int): String = {
    val sep = "chr(31)"
    def fold(ss: String, a: String, b: String): String =
      s"""list_reduce(list_prepend('', $ss), (acc, sy) ->
          CASE WHEN sy = $b AND ends_with(acc, $sep || $a)
               THEN substr(acc, 1, length(acc) - length($a) - 1) || $sep || $a || $b
               ELSE acc || $sep || sy END)"""
    val head =
      s"""TOK AS MATERIALIZED (SELECT unnest(${toks("lower(text)")}) AS w FROM documents),
          V AS MATERIALIZED (SELECT w, count(*)::BIGINT AS freq FROM TOK
               GROUP BY w ORDER BY freq DESC, w ASC LIMIT $vocabCap),
          S0 AS MATERIALIZED (SELECT w, freq,
               $sep || array_to_string(list_transform(range(length(w)),
                 i -> substr(w, i+1, 1)), $sep) AS seg FROM V)"""
    val rounds = (1 to numMerges).map { k =>
      val p = k - 1
      s"""Y$k AS MATERIALIZED (SELECT w, freq, seg,
             list_filter(string_split(seg, $sep), x -> x <> '') AS ss FROM S$p),
          P$k AS MATERIALIZED (SELECT pr.a AS a, pr.b AS b, sum(freq)::BIGINT AS cnt
              FROM (SELECT freq, unnest(list_transform(range(1, len(ss)),
                      i -> struct_pack(a := ss[i], b := ss[i+1]))) AS pr FROM Y$k)
              GROUP BY 1, 2),
          B$k AS MATERIALIZED (SELECT a, b, cnt FROM P$k ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
          S$k AS MATERIALIZED (SELECT y.w, y.freq,
               CASE WHEN bk.a IS NULL THEN y.seg
                    ELSE ${fold("y.ss", "bk.a", "bk.b")} END AS seg
              FROM Y$k y LEFT JOIN B$k bk ON TRUE)"""
    }.mkString(",\n")
    s"""$head,
        $rounds,
        WENC AS MATERIALIZED (SELECT w,
             (length(seg) - length(replace(seg, $sep, '')))::BIGINT AS ntok
            FROM S$numMerges),
        DT AS MATERIALIZED (SELECT doc_id, unnest(${toks("lower(text)")}) AS w FROM documents),
        AGG AS MATERIALIZED (SELECT dt.doc_id, count(*)::BIGINT AS ws_tokens,
             sum(we.ntok)::BIGINT AS bpe_tokens
            FROM DT dt JOIN WENC we USING (w) GROUP BY dt.doc_id)"""
  }

  /** Shared q263/q280 takedown-gate oracle: final labels = full
    * recompute over the %5-filtered pair set; stamp = 1 where the
    * takedown moved nothing, else 2 (a spurious re-delivery commit
    * would stamp 3+). q280 runs the same flow over a cluster_id-
    * partitioned edge store — layout must never change results.
    */
  private lazy val takedownGateOracle: String =
    s"""WITH RECURSIVE
        ${lshPairCtes("documents")},
        EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                  UNION SELECT id_b, id_a FROM PAIRS),
        REACH(node, r) AS (
          SELECT src, src FROM EDGES
          UNION
          SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
        FULLCC AS (SELECT node, min(r) AS cluster_id FROM REACH
                   GROUP BY node),
        SURV AS (SELECT id_a, id_b FROM PAIRS
                 WHERE id_a % 5 <> 0 AND id_b % 5 <> 0),
        EDGES_S AS (SELECT id_a AS src, id_b AS dst FROM SURV
                    UNION SELECT id_b, id_a FROM SURV),
        REACH_S(node, r) AS (
          SELECT src, src FROM EDGES_S
          UNION
          SELECT e.dst, r.r FROM REACH_S r JOIN EDGES_S e ON e.src = r.node),
        FINALCC AS (SELECT node, min(r) AS cluster_id FROM REACH_S
                    GROUP BY node)
        SELECT f.node AS doc_id, f.cluster_id,
          CASE WHEN p.cluster_id = f.cluster_id THEN CAST(1 AS BIGINT)
               ELSE CAST(2 AS BIGINT) END AS batch_no
        FROM FINALCC f JOIN FULLCC p ON p.node = f.node
        ORDER BY doc_id"""

  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         cast(sum(cast(floor(l_quantity * 100) as bigint)) as bigint) AS sum_qty_c,
         cast(sum(cast(floor(l_extendedprice * 100) as bigint)) as bigint) AS sum_base_c,
         cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint)) as bigint) AS sum_disc_c,
         cast(count(*) as bigint) AS n_rows
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_status_topk" ->
      """SELECT o_orderkey, o_custkey, cast(floor(o_totalprice * 100) as bigint) AS price_c
         FROM orders WHERE o_orderstatus = 'O'
         ORDER BY price_c DESC, o_orderkey LIMIT 25""",

    "q03_canonical_projection" ->
      """SELECT c_custkey AS patient_id, c_name AS patient_name,
         c_mktsegment AS segment, 'customer_src' AS source
         FROM customer ORDER BY patient_id""",

    "q04_scrub_documents" ->
      s"""SELECT doc_id, ${scrubFold("text")} AS scrubbed
         FROM documents ORDER BY doc_id""",

    "q05_sha_chain" ->
      """SELECT doc_id, sha256(text) AS text_sha256 FROM documents ORDER BY doc_id""",

    "q06_rollup_counts" ->
      """SELECT source, lang, cast(count(*) as bigint) AS n_docs,
         cast(sum(n_chars) as bigint) AS sum_chars
         FROM documents GROUP BY source, lang ORDER BY source, lang""",

    "q07_window_latest" ->
      """SELECT o_custkey, latest_orderkey, latest_ts FROM (
           SELECT o_custkey, o_orderkey AS latest_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_ts,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1 ORDER BY o_custkey""",

    "q08_join_revenue" ->
      """SELECT c_mktsegment,
         cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint) AS revenue_c,
         cast(count(*) as bigint) AS n_orders,
         cast(count(DISTINCT c_custkey) as bigint) AS n_customers
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q09_coalesce_fallback" ->
      """SELECT event_id, coalesce(nullif(event_type, ''), 'unknown') AS event_type_filled
         FROM events ORDER BY event_id""",

    "q10_union_sources" ->
      """SELECT * FROM (
           SELECT c_custkey AS id, c_name AS name, 'customer' AS source FROM customer
           UNION ALL
           SELECT s_suppkey AS id, s_name AS name, 'supplier' AS source FROM supplier)
         ORDER BY source, id""",

    "q11_distinct_types" ->
      """SELECT DISTINCT event_type FROM events ORDER BY event_type""",

    "q12_validation_probe" ->
      """SELECT cast(count(*) as bigint) AS n_rows,
         cast(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) as bigint) AS n_empty_text,
         cast(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) as bigint) AS n_len_mismatch,
         cast(sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 0 ELSE 1 END) as bigint) AS n_bad_lang
         FROM documents""",

    "q13_error_samples" ->
      """SELECT doc_id,
         concat('len_mismatch:', cast(n_chars as varchar), ':', cast(length(text) as varchar)) AS error
         FROM documents WHERE n_chars <> length(text)
         ORDER BY doc_id LIMIT 20""",

    "q14_date_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d%H%M%S') AS version_ts,
         concat_ws('_', o_orderpriority, cast(o_orderkey as varchar)) AS batch_id
         FROM orders ORDER BY o_orderkey""",

    "q15_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_value
         FROM events ORDER BY event_id""",

    "q16_positional_fields" ->
      """SELECT doc_id, parts[4] AS field_3,
         array_to_string(list_transform(range(len(parts)),
           i -> CASE WHEN i = 2 THEN '[MASKED]' ELSE parts[i+1] END), ' ') AS masked_text
         FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
         ORDER BY doc_id""",

    "q17_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
         cast(count(*) as bigint) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY content_hash""",

    "q18_minhash_lsh_pairs" -> {
      val p = graft.operators.Dedup.MinhashP
      val sigExprs = graft.operators.Dedup.minhashCoeffs(16).map { case (a, b) =>
        s"list_min(list_transform(hs, h -> (h * $a + $b) % $p))"
      }.mkString("[", ", ", "]")
      s"""WITH TH AS (SELECT doc_id, ${tokenHashExpr("text")} AS th FROM documents),
          HS AS (SELECT doc_id, $gramFromTh AS hs FROM TH),
          SIG AS (SELECT doc_id, $sigExprs AS sig FROM HS WHERE len(hs) > 0),
          B AS (SELECT doc_id, t.band AS band,
                 md5(array_to_string(list_transform(
                   list_slice(sig, t.band * 4 + 1, t.band * 4 + 4), x -> x::varchar), ',')) AS bucket
                FROM SIG CROSS JOIN (SELECT unnest(range(4)) AS band) t)
          SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
          FROM B a JOIN B b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
          ORDER BY id_a, id_b"""
    },

    "q19_simhash" -> {
      val hashes = s"list_transform(${toks("lower(text)")}, t -> ${md5long("t")})"
      s"""SELECT doc_id, ${simhashSql(16)} AS simhash16
         FROM (SELECT doc_id, $hashes AS H FROM documents) ORDER BY doc_id"""
    },

    "q20_ngram_jaccard" -> {
      val sh = shingles3("text")
      s"""WITH D AS (SELECT doc_id, $sh AS sh FROM documents WHERE doc_id % 29 = 0)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            cast(floor((CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
              ELSE len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END) * 1000000.0) as bigint) AS jaccard_1e6
          FROM D a JOIN D b ON a.doc_id < b.doc_id ORDER BY id_a, id_b"""
    },

    // LSH threshold sweep: exact q20 Jaccard on the q18 candidate
    // pairs, 0.1-wide bins (top bin merged into 9), cumulative from
    // above
    "q134_jaccard_sweep" -> {
      val sh = shingles3("text")
      s"""WITH ${lshPairCtes("documents")},
          SH2 AS (SELECT doc_id, $sh AS sh FROM documents),
          J2 AS (SELECT cast(floor((CASE
                  WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
                  ELSE len(list_intersect(a.sh, b.sh))::DOUBLE
                       / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE
                  END) * 1000000.0) as bigint) AS j1e6
                FROM PAIRS p
                JOIN SH2 a ON a.doc_id = p.id_a
                JOIN SH2 b ON b.doc_id = p.id_b),
          BINS AS (SELECT least(j1e6 // 100000, 9) AS bin,
                 CAST(count(*) AS BIGINT) AS n_pairs FROM J2 GROUP BY bin)
          SELECT bin * 100000 AS bin_lo_1e6, n_pairs,
            CAST(sum(n_pairs) OVER (ORDER BY bin DESC) AS BIGINT) AS n_at_or_above
          FROM BINS ORDER BY bin_lo_1e6"""
    },

    // recency decay: integer halving per day of age (non-negative
    // values, so Spark div ≡ DuckDB //), saturating at 30 shifts
    "q79_decayed_sum" ->
      """WITH E AS (SELECT user_id, epoch_us(ts) AS ts_us,
                CAST(round(value * 100) AS BIGINT) AS cents FROM events),
          R AS (SELECT max(ts_us) AS ref FROM E)
          SELECT user_id,
            CAST(sum(cents // (1::BIGINT <<
              CAST(least((r.ref - ts_us) // 86400000000, 30) AS INT)))
              AS BIGINT) AS decayed_c
          FROM E CROSS JOIN R r GROUP BY user_id ORDER BY user_id""",

    // equi-depth histogram: quantile_cont bounds (percentile parity),
    // CASE bucket assignment identical to the engine's when-chain
    "q80_equidepth_hist" -> {
      val ps = (1 until 10).map(_.toDouble / 10)
      val caseChain = ps.zipWithIndex
        .map { case (p, i) => s"WHEN cents <= b.bs[${i + 1}] THEN ${i}" }
        .mkString("CASE ", " ", " ELSE 9 END")
      s"""WITH E AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
                FROM events WHERE value IS NOT NULL),
          B AS (SELECT quantile_cont(cents, [${ps.mkString(", ")}]) AS bs FROM E),
          A AS (SELECT cents, CAST($caseChain AS BIGINT) AS bucket
                FROM E CROSS JOIN B b)
          SELECT bucket, CAST(count(*) AS BIGINT) AS n,
            CAST(min(cents) AS BIGINT) AS lo_c, CAST(max(cents) AS BIGINT) AS hi_c
          FROM A GROUP BY bucket ORDER BY bucket"""
    },

    // bounded-state top-k agg: the oracle is the WINDOW formulation —
    // the aggregate must rank identically (cents DESC, event_id ASC)
    "q78_topk_agg" ->
      """WITH E AS (SELECT event_type, event_id,
                CAST(round(value * 100) AS BIGINT) AS cents
               FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
          R AS (SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY cents DESC, event_id) AS rank FROM E)
          SELECT event_type, CAST(rank AS BIGINT) AS rank, cents, event_id
          FROM R WHERE rank <= 3 ORDER BY event_type, rank""",

    // fuzzy names: the oracle is the DIRECT all-pairs formulation —
    // names are 18 chars, so the engine's trigram blocking is exact by
    // the pigeonhole recall contract and must reproduce it
    "q76_fuzzy_names" ->
      """WITH N AS (SELECT c_custkey AS id, lower(trim(c_name)) AS nm
                FROM customer WHERE c_custkey % 31 = 0 AND c_custkey < 7500)
         SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         FROM N a JOIN N b ON a.id < b.id
         WHERE levenshtein(a.nm, b.nm) <= 2
         ORDER BY id_a, id_b""",

    // CUBE over (source, lang): all four grouping levels; GROUPING()
    // bitmask disambiguates roll-up nulls; NULLS FIRST pinned on both
    // engines (their defaults differ)
    "q77_cube_counts" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(GROUPING(source, lang) AS BIGINT) AS gid
         FROM documents GROUP BY CUBE (source, lang)
         ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""",

    // formatting-invariant dedup: mirror of TextAnalysis.normalizeForDedup
    // (lowercase → strip non-alnum → collapse whitespace → trim);
    // whitespace as the explicit class [ \t\n\x0B\f\r] because Java \s
    // includes \x0B and RE2 \s does not; DuckDB regexp_replace needs
    // the explicit 'g' flag Spark applies implicitly
    "q74_dedup_normalized" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(
           lower(coalesce(text, '')), '[^a-z0-9 \t\n\x0B\f\r]', '', 'g'),
           '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS content_hash,
         min(doc_id) AS keep_id, cast(count(*) as bigint) AS n_dups
         FROM documents GROUP BY 1 ORDER BY content_hash""",

    // asymmetric containment over the q20 pair set: |A∩B|/|A| and /|B|,
    // empty-denominator → 0 (the ratio() guard)
    "q75_ngram_containment" -> {
      val sh = shingles3("text")
      s"""WITH D AS (SELECT doc_id, $sh AS sh FROM documents WHERE doc_id % 29 = 0)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            cast(floor((CASE WHEN len(a.sh) = 0 THEN 0.0
              ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh)::DOUBLE
              END) * 1000000.0) as bigint) AS cont_a_1e6,
            cast(floor((CASE WHEN len(b.sh) = 0 THEN 0.0
              ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(b.sh)::DOUBLE
              END) * 1000000.0) as bigint) AS cont_b_1e6
          FROM D a JOIN D b ON a.doc_id < b.doc_id ORDER BY id_a, id_b"""
    },

    "q21_ann_brute_force" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          Q AS (SELECT * FROM C WHERE id % 200 = 0 AND id < 2000),
          S AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                 ${scoreFixedSql("q.emb", "c.emb")} AS score_1e6
                FROM C c CROSS JOIN Q q WHERE q.id <> c.id),
          R AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_1e6 DESC, neighbor_id) AS rank
                FROM S)
          SELECT query_id, rank, neighbor_id, score_1e6 FROM R WHERE rank <= 5
          ORDER BY query_id, rank""",

    "q22_ann_bucketed" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 6)} AS bucket FROM embeddings),
          Q AS (SELECT * FROM C WHERE id % 200 = 0 AND id < 2000),
          S AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                 ${scoreFixedSql("q.emb", "c.emb")} AS score_1e6
                FROM C c JOIN Q q ON q.bucket = c.bucket AND q.id <> c.id),
          R AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_1e6 DESC, neighbor_id) AS rank
                FROM S)
          SELECT query_id, rank, neighbor_id, score_1e6 FROM R WHERE rank <= 3
          ORDER BY query_id, rank""",

    "q23_embedding_near_dups" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 8)} AS bucket FROM embeddings)
          SELECT l.id AS id_a, r.id AS id_b, ${scoreFixedSql("l.emb", "r.emb")} AS score_1e6
          FROM C l JOIN C r ON l.bucket = r.bucket AND l.id < r.id
          WHERE ${scoreFixedSql("l.emb", "r.emb")} >= 950000
          ORDER BY id_a, id_b""",

    "q24_token_count" ->
      s"""SELECT doc_id, cast(len(${toks("text")}) as bigint) AS n_tokens
         FROM documents ORDER BY doc_id""",

    "q25_quality_signals" ->
      s"""SELECT doc_id, cast(length(text) as bigint) AS n_chars_obs,
         cast(len(${toks("text")}) as bigint) AS n_tokens,
         cast(len(regexp_extract_all(text, '[.!?,;:]')) as bigint) AS n_punct,
         cast(len(regexp_extract_all(text, '[0-9]')) as bigint) AS n_digits,
         ${hitsSql("text", "en")} AS n_stopwords
         FROM documents ORDER BY doc_id""",

    "q26_lang_id" -> {
      val langs = TextAnalysis.stopwords.keys.toSeq.sorted // de, en, es, fr
      val hits = langs.map(l => s"${hitsSql("text", l)} AS h_$l").mkString(", ")
      s"""SELECT doc_id, lang,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang
         FROM (SELECT doc_id, lang, $hits FROM documents) ORDER BY doc_id"""
    },

    "q27_fingerprint" -> {
      val norm = "regexp_replace(trim(lower(coalesce(text,''))), '\\s+', ' ', 'g')"
      val rolling = s"""list_reduce(list_prepend(0::BIGINT,
          list_transform(${toks("lower(text)")}, t -> ${md5long("t")} % 1000000007)),
          (acc, t) -> (acc * 131 + t) % 1000000007)"""
      s"""SELECT doc_id, ${md5long(norm)} AS fp60, $rolling AS rolling_fp
         FROM documents ORDER BY doc_id"""
    },

    "q28_multimodal_meta" ->
      """SELECT doc_id, cast(octet_length(encode(text)) as bigint) AS payload_bytes,
         cast(('0x' || substr(md5(text),1,4)) as bigint) % 3840 + 1 AS width,
         cast(('0x' || substr(md5(text),5,4)) as bigint) % 2160 + 1 AS height,
         cast(floor((cast(('0x' || substr(md5(text),9,4)) as bigint)::DOUBLE / 65536.0) * 1000000.0) as bigint) AS feat0_1e6
         FROM documents ORDER BY doc_id""",

    "q29_windowed_events" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, cast(count(*) as bigint) AS n_events,
         cast(sum(cast(floor(value * 100) as bigint)) as bigint) AS sum_value_c
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q30_rollup" ->
      """SELECT l_returnflag, l_linestatus, cast(count(*) as bigint) AS n_rows,
         cast(sum(cast(floor(l_quantity * 100) as bigint)) as bigint) AS sum_qty_c
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q31_semi_anti" ->
      """SELECT * FROM (
           SELECT c_custkey AS id, 'has_orders' AS bucket FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           UNION ALL
           SELECT c_custkey AS id, 'no_orders' AS bucket FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
         ORDER BY id""",

    "q32_asof_prev_click" ->
      """SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
           (SELECT max(epoch_us(b.ts)) FROM events b
            WHERE b.user_id = a.user_id AND b.event_type = 'click'
              AND epoch_us(b.ts) <= epoch_us(a.ts)) AS prev_click_us
         FROM events a ORDER BY a.event_id""",

    "q33_dedup_keep" ->
      """SELECT doc_id, source FROM documents
         WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
         ORDER BY doc_id""",

    "q34_scrub_rule_hits" -> {
      // nested SELECTs stage the fold: t0 = text, t_{i+1} = rule_i(t_i)
      val stageExprs = "text AS t0" +: Seeds.phiRulesV1.zipWithIndex.map { case (r, i) =>
        val p = ("(?i)" + r.pattern).replace("'", "''")
        s"regexp_replace(t$i, '$p', '${r.replacement}', 'g') AS t${i + 1}"
      }
      val inner = stageExprs.foldLeft("documents")((src, e) => s"(SELECT *, $e FROM $src)")
      val aggs = Seeds.phiRulesV1.zipWithIndex.map { case (r, i) =>
        s"cast(sum(CASE WHEN s.t$i <> s.t${i + 1} THEN 1 ELSE 0 END) as bigint) AS n_${r.ruleId.toLowerCase}"
      }.mkString(", ")
      s"SELECT $aggs FROM $inner s"
    },

    // Sketch values are engine-specific; the comparable surface is the
    // exact companions plus Spark-side error-bound flags (DuckDB emits
    // literal 1 — Spark emits 0 iff its sketch left tolerance).
    "q35_sketches" ->
      """SELECT cast(count(DISTINCT l_orderkey) as bigint) AS exact_orders,
         cast(count(DISTINCT l_partkey) as bigint) AS exact_parts,
         cast(floor(quantile_cont(l_extendedprice, 0.5) * 100) as bigint) AS p50_exact_c,
         cast(floor(quantile_cont(l_extendedprice, 0.99) * 100) as bigint) AS p99_exact_c,
         cast(1 as bigint) AS hll_orders_ok, cast(1 as bigint) AS hll_parts_ok,
         cast(1 as bigint) AS p50_ok, cast(1 as bigint) AS p99_ok
         FROM lineitem""",

    "q36_dup_clusters" ->
      // independent formulation: recursive reachability, cluster id =
      // min reachable node (Spark side iterates label propagation)
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                    UNION SELECT id_b, id_a FROM PAIRS),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node)
          SELECT node AS doc_id, min(r) AS cluster_id FROM REACH
          GROUP BY node ORDER BY doc_id""",

    // incremental cluster maintenance: the engine maintains (prior CC
    // over even-id pairs + the odd-touching delta through the
    // contracted rep graph); the oracle recomputes in FULL — q36's
    // recursive reachability verbatim — so maintained ≡ recompute is
    // the hash contract itself (the q216/q212 shared-oracle precedent)
    "q249_maintain_clusters" ->
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                    UNION SELECT id_b, id_a FROM PAIRS),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node)
          SELECT node AS doc_id, min(r) AS cluster_id FROM REACH
          GROUP BY node ORDER BY doc_id""",

    // cluster-maintenance write set: the engine emits
    // maintainComponentsDelta's changed/new labels; the oracle derives
    // the same set INDEPENDENTLY as full-recompute labels minus the
    // even-prior labels (absent id, or a differing cluster) — the
    // "only changed or new" contract hash-gated from the other side
    "q250_maintain_clusters_delta" ->
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                    UNION SELECT id_b, id_a FROM PAIRS),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
          FULLCC AS (SELECT node, min(r) AS cluster_id FROM REACH
                     GROUP BY node),
          PE AS (SELECT id_a, id_b FROM PAIRS
                 WHERE id_a % 2 = 0 AND id_b % 2 = 0),
          EDGES_E AS (SELECT id_a AS src, id_b AS dst FROM PE
                      UNION SELECT id_b, id_a FROM PE),
          REACH_E(node, r) AS (
            SELECT src, src FROM EDGES_E
            UNION
            SELECT e.dst, r.r FROM REACH_E r JOIN EDGES_E e ON e.src = r.node),
          PRIOR AS (SELECT node, min(r) AS cluster_id FROM REACH_E
                    GROUP BY node)
          SELECT f.node AS doc_id, f.cluster_id
          FROM FULLCC f LEFT JOIN PRIOR p ON p.node = f.node
          WHERE p.node IS NULL OR p.cluster_id <> f.cluster_id
          ORDER BY doc_id""",

    // cluster-maintenance ingest gate: the engine's label table after
    // three ingests (even prior at batchNo=1, odd delta at a RESET
    // batchNo=0 that the floor-monotone stamp must lift to 2, then a
    // re-delivery that must write nothing). The oracle re-derives the
    // labels by full recursive reachability (maintained ≡ recompute)
    // and the stamp from the prior-vs-full diff: 1 where the even-only
    // labeling already agreed, else 2 — a naive reset stamp loses the
    // precombine race (stale cluster_id), a non-idempotent re-delivery
    // stamps 3+; either goes hash-red here.
    "q255_maintain_gate" ->
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                    UNION SELECT id_b, id_a FROM PAIRS),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
          FULLCC AS (SELECT node, min(r) AS cluster_id FROM REACH
                     GROUP BY node),
          PE AS (SELECT id_a, id_b FROM PAIRS
                 WHERE id_a % 2 = 0 AND id_b % 2 = 0),
          EDGES_E AS (SELECT id_a AS src, id_b AS dst FROM PE
                      UNION SELECT id_b, id_a FROM PE),
          REACH_E(node, r) AS (
            SELECT src, src FROM EDGES_E
            UNION
            SELECT e.dst, r.r FROM REACH_E r JOIN EDGES_E e ON e.src = r.node),
          PRIOR AS (SELECT node, min(r) AS cluster_id FROM REACH_E
                    GROUP BY node)
          SELECT f.node AS doc_id, f.cluster_id,
            CASE WHEN p.node IS NOT NULL AND p.cluster_id = f.cluster_id
                 THEN CAST(1 AS BIGINT)
                 WHEN (SELECT count(*) FROM PRIOR) > 0 THEN CAST(2 AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS batch_no
          FROM FULLCC f LEFT JOIN PRIOR p ON p.node = f.node
          ORDER BY doc_id""",

    // deletion-aware repair: the engine repairs COMPONENT-SCOPED
    // (affected components' surviving induced edges only); the oracle
    // recomputes IN FULL over the pair set with every deleted-endpoint
    // pair dropped — repair ≡ full recompute is the hash contract,
    // splits included
    "q262_repair_after_delete" ->
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          SURV AS (SELECT id_a, id_b FROM PAIRS
                   WHERE id_a % 5 <> 0 AND id_b % 5 <> 0),
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM SURV
                    UNION SELECT id_b, id_a FROM SURV),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node)
          SELECT node AS doc_id, min(r) AS cluster_id FROM REACH
          GROUP BY node ORDER BY doc_id""",

    // takedown gate: final labels = full recompute over the filtered
    // pair set; stamp = 1 where the takedown moved nothing (full and
    // filtered labels agree), else 2 — a re-delivered takedown that
    // spuriously committed would stamp 3+ and go hash-red.
    // q280 runs the SAME flow over a cluster_id-PARTITIONED edge store
    // (file-pruned induced reads, move-aware writes) — layout must
    // never change results, so it shares this oracle verbatim
    "q263_takedown_gate" -> takedownGateOracle,
    "q280_takedown_pruned" -> takedownGateOracle,

    // takedown EVERYWHERE (the composition row): every maintained
    // structure RECOMPUTED from the surviving corpus alone — labels +
    // edges by recursive reachability over the %5-filtered pair set,
    // postings/rollup as plain aggregates of the surviving docs, the
    // buffered sample by the q279 branch walk (local repair vs
    // recompute on the hit count), and the IVF-PQ index by the q190
    // quantizer replay (trained on the FULL corpus — the engine froze
    // the codebooks before the takedown — assigned to survivors only).
    // maintained ≡ recompute on all six structures, in one hash
    "q281_takedown_everywhere" -> {
      val (m, kc, sub) = (2, 4, 32)
      val codeCtes = (0 until m).map { s =>
        val lo = s * sub + 1; val hi = (s + 1) * sub
        s"""CT$s AS (SELECT id, emb[$lo:$hi] AS emb FROM C),
            PS0_$s AS (SELECT (row_number() OVER (ORDER BY id)) - 1 AS cid, emb AS cemb
                   FROM (SELECT * FROM CT$s ORDER BY id LIMIT $kc)),
            ${ivfRound(s"PS0_$s", s"PA1_$s", s"PP1_$s", s"PM1_$s", s"PS1_$s", s"CT$s")},
            ${ivfRound(s"PS1_$s", s"PA2_$s", s"PP2_$s", s"PM2_$s", s"PS2_$s", s"CT$s")},
            FS$s AS (SELECT id, emb[$lo:$hi] AS emb FROM FIN),
            ${ivfAssignCte(s"FS$s", s"PS2_$s", s"CODE$s", 1)}"""
      }.mkString(",\n")
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          SURV AS (SELECT id_a, id_b FROM PAIRS
                   WHERE id_a % 5 <> 0 AND id_b % 5 <> 0),
          EDGES_S AS (SELECT id_a AS src, id_b AS dst FROM SURV
                      UNION SELECT id_b, id_a FROM SURV),
          REACH_S(node, r) AS (
            SELECT src, src FROM EDGES_S
            UNION
            SELECT e.dst, r.r FROM REACH_S r JOIN EDGES_S e ON e.src = r.node),
          FINALCC AS (SELECT node, min(r) AS cluster_id FROM REACH_S
                      GROUP BY node),
          SDOC AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
          PT AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM SDOC),
          PE AS (SELECT doc_id, unnest(tk) AS term FROM PT),
          PD AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
                 CAST(${md5long("CAST(doc_id AS VARCHAR)")} // n_chars
                   AS BIGINT) AS prio
                FROM documents),
          SP2 AS (SELECT id, prio, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                  FROM PD) WHERE r <= 64),
          SH AS (SELECT count(*) AS h FROM SP2 WHERE id % 5 = 0),
          SLOC AS (SELECT id, CAST(row_number() OVER (ORDER BY prio, id)
                   AS BIGINT) AS rank
                 FROM SP2 WHERE id % 5 <> 0),
          SREC AS (SELECT id, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                  FROM PD WHERE id % 5 <> 0) WHERE r <= 64),
          SAM AS (SELECT id, rank FROM SLOC
                   WHERE (SELECT h FROM SH) BETWEEN 1 AND 16 AND rank <= 48
                  UNION ALL
                  SELECT id, rank FROM SREC
                   WHERE ((SELECT h FROM SH) = 0 OR (SELECT h FROM SH) > 16)
                     AND rank <= 48),
          C0 AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          C AS (SELECT * FROM C0),
          S0 AS (SELECT (row_number() OVER (ORDER BY id)) - 1 AS cid, emb AS cemb
                 FROM (SELECT * FROM C ORDER BY id LIMIT 8)),
          ${ivfRound("S0", "QA1", "QP1", "QM1", "S1")},
          ${ivfRound("S1", "QA2", "QP2", "QM2", "S2")},
          FIN AS (SELECT * FROM C0 WHERE id % 5 <> 0),
          ${ivfAssignCte("FIN", "S2", "CCA", 1)},
          $codeCtes
          SELECT structure, k, v FROM (
            SELECT 'labels' AS structure, CAST(node AS VARCHAR) AS k,
              CAST(cluster_id AS BIGINT) AS v FROM FINALCC
            UNION ALL
            SELECT 'edges', e.id_a || ':' || e.id_b,
              CAST(f.cluster_id AS BIGINT)
            FROM SURV e JOIN FINALCC f ON f.node = e.id_a
            UNION ALL
            SELECT 'postings', term || ':' || doc_id,
              CAST(count(*) AS BIGINT)
            FROM PE GROUP BY term, doc_id
            UNION ALL
            SELECT 'rollup_n', lang, CAST(count(*) AS BIGINT)
            FROM SDOC GROUP BY lang
            UNION ALL
            SELECT 'rollup_sum', lang, CAST(sum(n_chars) AS BIGINT)
            FROM SDOC GROUP BY lang
            UNION ALL
            SELECT 'sample', CAST(id AS VARCHAR), rank FROM SAM
            UNION ALL
            SELECT 'pq', CAST(f.id AS VARCHAR),
              CAST(cc.cid * 10000 + c0.cid * 100 + c1.cid AS BIGINT)
            FROM FIN f JOIN CCA cc ON cc.id = f.id
            JOIN CODE0 c0 ON c0.id = f.id JOIN CODE1 c1 ON c1.id = f.id
          ) ORDER BY structure, k"""
    },

    // lake-backed maintained sample: final k-set = DIRECT recompute
    // over the full corpus (maintained ≡ recompute, the q233
    // contract); stamp = 1 where the row survived the odd ingest with
    // its rank intact, else 2 — a non-idempotent re-delivery would
    // stamp 3+
    "q264_sample_gate" ->
      s"""WITH D AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
                 CAST(${md5long("CAST(doc_id AS VARCHAR)")} // n_chars
                   AS BIGINT) AS prio
                FROM documents),
          P1 AS (SELECT id, weight, prio, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                  FROM D WHERE id % 2 = 0) WHERE r <= 64),
          F AS (SELECT id, weight, prio, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                  FROM D) WHERE r <= 64)
          SELECT f.id, f.weight, f.prio, f.rank,
            CASE WHEN p.id IS NOT NULL AND p.rank = f.rank
                 THEN CAST(1 AS BIGINT) ELSE CAST(2 AS BIGINT) END AS batch_no
          FROM F f LEFT JOIN P1 p ON p.id = f.id
          ORDER BY f.rank""",

    // buffered sample takedown: the oracle replays the engine's exact
    // walk — buffered bottom-64 cut after both ingests, hit count h
    // against the %5 takedown, then the SAME branch the gate takes:
    // local repair (1 <= h <= 16: survivors re-ranked, cap 64-h, every
    // survivor rewrites at stamp 3 because its cap changed), corpus
    // recompute (h > 16: fresh bottom-64 over survivors, cap back to
    // 64, unchanged (id, rank) rows keep their ingest stamps), or
    // no-op (h = 0). A re-delivered takedown that spuriously committed
    // would stamp 4+ — hash-red on any branch
    "q279_sample_takedown_gate" ->
      s"""WITH D AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
                 CAST(${md5long("CAST(doc_id AS VARCHAR)")} // n_chars
                   AS BIGINT) AS prio
                FROM documents),
          P1 AS (SELECT id, weight, prio, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                  FROM D WHERE id % 2 = 0) WHERE r <= 64),
          P2 AS (SELECT id, weight, prio, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                  FROM D) WHERE r <= 64),
          S2 AS (SELECT f.id, f.weight, f.prio, f.rank,
                   CASE WHEN p.id IS NOT NULL AND p.rank = f.rank
                        THEN CAST(1 AS BIGINT) ELSE CAST(2 AS BIGINT) END AS st
                 FROM P2 f LEFT JOIN P1 p ON p.id = f.id),
          H AS (SELECT count(*) AS h FROM P2 WHERE id % 5 = 0),
          LOCALREP AS (SELECT id, weight, prio,
                   CAST(row_number() OVER (ORDER BY prio, id) AS BIGINT)
                     AS rank,
                   CAST(64 - (SELECT h FROM H) AS BIGINT) AS cap,
                   CAST(3 AS BIGINT) AS batch_no
                 FROM P2 WHERE id % 5 <> 0),
          RECOMP0 AS (SELECT id, weight, prio, CAST(r AS BIGINT) AS rank,
                   CAST(64 AS BIGINT) AS cap FROM
                   (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                    FROM D WHERE id % 5 <> 0) WHERE r <= 64),
          RECOMP AS (SELECT r0.id, r0.weight, r0.prio, r0.rank, r0.cap,
                   CASE WHEN s.id IS NOT NULL AND s.rank = r0.rank THEN s.st
                        ELSE CAST(3 AS BIGINT) END AS batch_no
                 FROM RECOMP0 r0 LEFT JOIN S2 s ON s.id = r0.id)
          SELECT id, weight, prio, rank, cap, batch_no FROM LOCALREP
            WHERE (SELECT h FROM H) BETWEEN 1 AND 16
          UNION ALL
          SELECT id, weight, prio, rank, cap, batch_no FROM RECOMP
            WHERE (SELECT h FROM H) > 16
          UNION ALL
          SELECT id, weight, prio, rank, CAST(64 AS BIGINT) AS cap,
            st AS batch_no FROM S2
            WHERE (SELECT h FROM H) = 0
          ORDER BY rank""",

    // TPC-H Q13 shape, textbook form: right-side predicate in the
    // OUTER join condition, two-level aggregate with the null group
    "q265_cust_order_dist" ->
      """SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
         FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
               FROM customer c LEFT OUTER JOIN orders o
                 ON c.c_custkey = o.o_custkey
                AND o.o_orderpriority NOT LIKE '4-%'
               GROUP BY c.c_custkey) t
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    // TPC-H Q19 shape, textbook form: the whole OR-of-ANDs in WHERE
    // with the join equality repeated per branch
    "q266_disjunctive_revenue" ->
      """SELECT CAST(COALESCE(sum(CAST(floor(
             l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)), 0)
           AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem l, part p
         WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
                AND p.p_size BETWEEN 1 AND 5
                AND l.l_quantity BETWEEN 1 AND 11)
            OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
                AND p.p_size BETWEEN 1 AND 10
                AND l.l_quantity BETWEEN 10 AND 20)
            OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#15'
                AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 20 AND 30)""",

    // TPC-H Q4 shape, textbook form: correlated EXISTS per order;
    // lateness is the key-derived commit/receipt-offset twin
    // (SparkEntry.commitOff/receiptOff)
    "q267_priority_late_count" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
           AND o.o_orderdate < TIMESTAMP '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
               AND (l.l_orderkey*3 + l.l_linenumber*5) % 31 - 15 <
                   (l.l_orderkey + l.l_linenumber*2) % 14 + 1)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // TPC-H Q7 shape, textbook form: flat 6-relation join with the
    // symmetric nation-pair OR in WHERE
    "q268_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_c) AS BIGINT) AS revenue_c
         FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                 CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                   AS BIGINT) AS volume_c
               FROM supplier s, lineitem l, orders o, customer c,
                 nation n1, nation n2
               WHERE s.s_suppkey = l.l_suppkey
                 AND o.o_orderkey = l.l_orderkey
                 AND c.c_custkey = o.o_custkey
                 AND s.s_nationkey = n1.n_nationkey
                 AND c.c_nationkey = n2.n_nationkey
                 AND ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_8')
                   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_7'))
                 AND l.l_shipdate >= TIMESTAMP '1995-01-01'
                 AND l.l_shipdate < TIMESTAMP '1997-01-01') shipping
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",

    // TPC-H Q8 shape, textbook form: 8-relation join, CASE share
    // numerator; both sums emitted as integers (no double division)
    "q269_market_share" ->
      """SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_7' THEN volume_c
                         ELSE 0 END) AS BIGINT) AS nation_vol_c,
           CAST(sum(volume_c) AS BIGINT) AS total_vol_c
         FROM (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                   AS BIGINT) AS volume_c,
                 n2.n_name AS nation
               FROM part p, supplier s, lineitem l, orders o, customer c,
                 nation n1, nation n2, region r
               WHERE p.p_partkey = l.l_partkey
                 AND s.s_suppkey = l.l_suppkey
                 AND l.l_orderkey = o.o_orderkey
                 AND o.o_custkey = c.c_custkey
                 AND c.c_nationkey = n1.n_nationkey
                 AND n1.n_regionkey = r.r_regionkey
                 AND r.r_name = 'ASIA'
                 AND s.s_nationkey = n2.n_nationkey
                 AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o.o_orderdate < TIMESTAMP '1997-01-01'
                 AND p.p_type LIKE 'ECONOMY%') all_nations
         GROUP BY o_year ORDER BY o_year""",

    // TPC-H Q9 shape, textbook form: profit per nation-year with the
    // derived supplycost twin ((11p+19s) mod 900 + 100 cents),
    // amounts in 1e-4-dollar integer units
    "q270_product_profit" ->
      """SELECT nation, o_year, CAST(sum(amount_u) AS BIGINT) AS profit_u
         FROM (SELECT n.n_name AS nation,
                 CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT) * 100
                   - CAST(floor(l.l_quantity * 100) AS BIGINT) *
                     ((l.l_partkey*11 + l.l_suppkey*19) % 900 + 100)
                   AS amount_u
               FROM part p, supplier s, lineitem l, orders o, nation n
               WHERE s.s_suppkey = l.l_suppkey
                 AND p.p_partkey = l.l_partkey
                 AND o.o_orderkey = l.l_orderkey
                 AND s.s_nationkey = n.n_nationkey
                 AND p.p_name LIKE '%small%') profit
         GROUP BY nation, o_year ORDER BY nation, o_year DESC""",

    // TPC-H Q10 shape, textbook form: grouped by all customer
    // attributes through the join (the engine aggregates by custkey
    // first — equivalence hash-gated here)
    "q271_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(floor(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
             * 100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM customer c, orders o, lineitem l, nation n
         WHERE c.c_custkey = o.o_custkey
           AND l.l_orderkey = o.o_orderkey
           AND o.o_orderdate >= TIMESTAMP '1996-10-01'
           AND o.o_orderdate < TIMESTAMP '1997-01-01'
           AND l.l_returnflag = 'R'
           AND c.c_nationkey = n.n_nationkey
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue_c DESC, c.c_custkey LIMIT 20""",

    // TPC-H Q12 shape, textbook form over the derived shipmode /
    // commit / receipt twins; receipt-year via real date arithmetic
    "q272_shipmode_priority" ->
      """SELECT shipmode,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN
             ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
         FROM orders o,
           (SELECT l_orderkey,
              list_extract(['MAIL','SHIP','AIR','RAIL','TRUCK','FOB',
                'REG AIR'],
                CAST((l_orderkey*5 + l_linenumber*3) % 7 AS INTEGER) + 1)
                AS shipmode,
              (l_orderkey*3 + l_linenumber*5) % 31 - 15 AS coff,
              (l_orderkey + l_linenumber*2) % 14 + 1 AS roff,
              l_shipdate
            FROM lineitem) l
         WHERE o.o_orderkey = l.l_orderkey
           AND shipmode IN ('MAIL', 'SHIP')
           AND coff < roff AND coff > 0
           AND year(CAST(l_shipdate AS DATE) + CAST(roff AS INTEGER))
             = 1996
         GROUP BY shipmode ORDER BY shipmode""",

    // TPC-H Q14 shape, textbook form (integer sums instead of the
    // 100*promo/total double)
    "q273_promo_revenue" ->
      """SELECT CAST(COALESCE(sum(CASE WHEN p.p_type LIKE 'PROMO%'
             THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
               * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT)
             AS promo_revenue_c,
           CAST(COALESCE(sum(CAST(floor(l.l_extendedprice *
             (1 - l.l_discount) * 100) AS BIGINT)), 0) AS BIGINT)
             AS total_revenue_c
         FROM lineitem l, part p
         WHERE l.l_partkey = p.p_partkey
           AND l.l_shipdate >= TIMESTAMP '1996-09-01'
           AND l.l_shipdate < TIMESTAMP '1996-10-01'""",

    // TPC-H Q16 shape, textbook form: explicit DISTINCT pair set
    // (partsupp twin) + NOT IN complaint subquery (suppkey mod 7)
    "q274_supplier_part_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                 l_suppkey AS ps_suppkey FROM lineitem) ps, part p
         WHERE p.p_partkey = ps.ps_partkey
           AND p.p_brand <> 'Brand#13'
           AND p.p_type NOT LIKE 'MEDIUM%'
           AND p.p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
           AND ps.ps_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
         GROUP BY p.p_brand, p.p_type, p.p_size
         ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""",

    // TPC-H Q6 shape, textbook form: scan-only predicate aggregate;
    // discount band cast-exact to binary64 in both engines
    "q275_forecast_revenue" ->
      """SELECT CAST(COALESCE(sum(CAST(floor(l_extendedprice *
             l_discount * 100) AS BIGINT)), 0) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN CAST(0.05 AS DOUBLE)
             AND CAST(0.07 AS DOUBLE)
           AND l_quantity < 24""",

    // bucketed co-located join: the oracle runs the SAME join as plain
    // SQL over the raw parquet — physical layout must never change
    // results
    "q276_bucketed_colocated" ->
      """SELECT o.o_orderpriority,
           CAST(sum(CAST(floor(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_c_sum,
           CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem l, orders o
         WHERE l.l_orderkey = o.o_orderkey
         GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",

    // salted skew join: the oracle runs the PLAIN join — salting must
    // never change results
    "q277_salted_skew_join" ->
      """SELECT CAST(e.user_id % 5 AS BIGINT) AS tier,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
             AS value_c
         FROM events e, (SELECT DISTINCT user_id FROM events) u
         WHERE e.user_id = u.user_id
         GROUP BY 1 ORDER BY 1""",

    // skew-advisory law: the oracle replays the integer decision walk
    // (broadcast cap, 5x-mean shuffle band, ceil-salt clamp) verbatim
    "q278_skew_advisor" ->
      """WITH counts AS (
           SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
         dim AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                   AS dim_rows FROM events),
         top AS (SELECT key, n,
                   row_number() OVER (ORDER BY n DESC, key ASC NULLS LAST)
                     AS rank
                 FROM counts
                 ORDER BY n DESC, key ASC NULLS LAST LIMIT 20)
         SELECT CAST(t.rank AS BIGINT) AS rank, t.key, t.n,
           CAST(greatest(1, tot.total // 32) AS BIGINT) AS mean_part_n,
           CASE WHEN dim.dim_rows <= 1000 THEN 'broadcast'
                WHEN t.n <= greatest(1, tot.total // 32) * 5
                  THEN 'shuffle'
                ELSE 'aqe_or_salt' END AS advice,
           CAST(CASE WHEN dim.dim_rows <= 1000
                  OR t.n <= greatest(1, tot.total // 32) * 5 THEN 0
                ELSE least(64, greatest(2,
                  (t.n + greatest(1, tot.total // 32) - 1)
                    // greatest(1, tot.total // 32)))
                END AS BIGINT) AS salt
         FROM top t, tot, dim ORDER BY rank""",

    // duplication-mass histogram: q36's reachability clusters, then
    // clusters-per-size
    "q132_dup_mass" ->
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                    UNION SELECT id_b, id_a FROM PAIRS),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
          CL AS (SELECT node, min(r) AS cluster_id FROM REACH GROUP BY node),
          S AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                FROM CL GROUP BY cluster_id)
          SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
            cluster_size * CAST(count(*) AS BIGINT) AS n_docs
          FROM S GROUP BY cluster_size ORDER BY cluster_size""",

    "q37_sessionize" ->
      """WITH E AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
          L AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM E),
          N AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM L),
          S AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM N)
          SELECT user_id, cast(session_idx as bigint) AS session_idx,
            cast(count(*) as bigint) AS n_events,
            cast(min(ts_us) as bigint) AS start_us, cast(max(ts_us) as bigint) AS end_us,
            cast(sum(cast(floor(value * 100) as bigint)) as bigint) AS sum_value_c
          FROM S GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",

    "q38_string_funcs" ->
      """SELECT doc_id,
         cast(levenshtein(substr(text, 1, 12), lang) as bigint) AS lev_to_lang,
         regexp_replace(substr(text, 1, 30), 'the', 'THE', 'g') AS replaced,
         lpad(lang, 5, '_') AS padded,
         reverse(substr(text, 1, 10)) AS rev10
         FROM documents ORDER BY doc_id""",

    "q39_exact_median" ->
      """SELECT l_returnflag,
         cast(floor(quantile_cont(l_extendedprice, 0.5) * 100) as bigint) AS median_price_c,
         cast(count(*) as bigint) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q40_pivot_events" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cases = types.map(t =>
        s"""cast(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) as bigint) AS "$t"""").mkString(", ")
      s"""SELECT user_id % 10 AS user_bucket, $cases
         FROM events GROUP BY user_bucket ORDER BY user_bucket"""
    },

    // Mirror of TextAnalysis.qualityScoreRaw: same double ops in the
    // same order (IEEE-754 → bit-identical), compared in 1e-6 fixed pt.
    "q41_quality_score" ->
      s"""WITH $qualityCte
         SELECT doc_id, quality_1e6 FROM QS ORDER BY doc_id""",

    "q42_hl7_component" ->
      """SELECT doc_id, parts[1] AS comp1, parts[2] AS comp2, parts[5] AS comp5
         FROM (SELECT doc_id,
             string_split(regexp_replace(substr(text, 1, 40), ' ', '^', 'g'), '^') AS parts
           FROM documents)
         ORDER BY doc_id""",

    // independent formulation: plain range-predicate join (the Spark
    // side buckets by floor(ts/tol) and replicates right rows to the 3
    // neighbor buckets — same pair set, one equi-join)
    "q43_range_join" ->
      """WITH E AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
          P AS (SELECT user_id, epoch_us(ts) AS pts_us, event_id AS p_event_id
                FROM events WHERE event_type = 'purchase')
          SELECT e.event_id, cast(count(*) as bigint) AS n_nearby,
            cast(min(p.p_event_id) as bigint) AS first_p
          FROM E e JOIN P p ON e.user_id = p.user_id
            AND abs(e.ts_us - p.pts_us) <= 120000000
          GROUP BY e.event_id ORDER BY e.event_id""",

    // simhash banded pairs: 32-bit fingerprints (same bit-vote formula
    // as q19), 4 × 8-bit bands, Hamming-distance verify
    "q45_simhash_pairs" -> {
      val hashes = s"list_transform(${toks("lower(text)")}, t -> ${md5long("t")})"
      s"""WITH HS AS (SELECT doc_id, $hashes AS H FROM documents),
          S AS (SELECT doc_id, ${simhashSql(32)} AS sim FROM HS
                WHERE len(H) > 0),
          B AS (SELECT doc_id, sim, t.band AS band, (sim >> (t.band * 8)) & 255 AS bval
                FROM S CROSS JOIN (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  cast(bit_count(xor(a.sim, b2.sim)) as bigint) AS hamming
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id)
          SELECT id_a, id_b, hamming FROM P WHERE hamming <= 3
          ORDER BY id_a, id_b"""
    },

    // end-to-end curation: exact-dedup keepers → near-dup cluster
    // pruning (recursive reachability over the kept docs' LSH pairs) →
    // quality (q41 formula) + language (q26 formula) gates
    "q44_curation" ->
      s"""WITH RECURSIVE $curationCtes
          SELECT doc_id, quality_1e6, predicted_lang FROM G
          WHERE quality_1e6 >= 600000 AND predicted_lang = 'en'
          ORDER BY doc_id""",

    // curation v2: q44's chain plus the repetition cap (q56 formula)
    // and benchmark decontamination (q55 formula, eval = doc_id%97=0)
    "q57_curation_v2" ->
      s"""WITH RECURSIVE $curationCtes,
          ${benchGramsCte()},
          CONTAM AS (SELECT DISTINCT d.doc_id
                 FROM (SELECT doc_id, unnest(${shingles3("text")}) AS gram
                       FROM documents) d
                 JOIN BG USING (gram)),
          REP AS (SELECT doc_id, ${repFixedSql("g")} AS rep_1e6
              FROM (SELECT doc_id, ${rawShingles3("text")} AS g FROM documents))
          SELECT g.doc_id, g.quality_1e6, g.predicted_lang
          FROM G g JOIN REP r ON r.doc_id = g.doc_id
          WHERE g.quality_1e6 >= 600000 AND g.predicted_lang = 'en'
            AND r.rep_1e6 < 500000
            AND g.doc_id NOT IN (SELECT doc_id FROM CONTAM)
          ORDER BY g.doc_id""",

    // independent formulation of the COW upsert merge: the engine folds
    // three commits sequentially (pairwise max-precombine, tie → later
    // write); the oracle takes the global lexicographic max over
    // (pre DESC, commit seq DESC) — equal because each commit carries
    // at most one row per key
    "q46_cow_merge" ->
      """SELECT doc_id, txt, pre FROM (
           SELECT doc_id, txt, pre,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY pre DESC, seq DESC) AS rn
           FROM (
             SELECT doc_id, substr(text, 1, 30) AS txt,
               CAST(1 AS BIGINT) AS pre, 0 AS seq FROM documents
             UNION ALL
             SELECT doc_id, 'tie:' || substr(text, 1, 20),
               CAST(1 AS BIGINT), 1 FROM documents WHERE doc_id % 5 = 0
             UNION ALL
             SELECT doc_id, 'new:' || substr(text, 1, 20),
               CAST(2 AS BIGINT), 2 FROM documents WHERE doc_id % 7 = 0))
         WHERE rn = 1 ORDER BY doc_id""",

    // key-skew report: per-key counts, top-20 by (n desc, key), and a
    // 1-row distribution summary; quantile_cont ≡ Spark percentile
    "q73_key_skew" ->
      """WITH K AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY user_id),
          S AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 quantile_cont(n, 0.5) AS p50_n,
                 quantile_cont(n, 0.99) AS p99_n,
                 CAST(max(n) AS BIGINT) AS max_n FROM K),
          T AS (SELECT key, n,
                 row_number() OVER (ORDER BY n DESC, key) AS rank FROM K)
          SELECT CAST(t.rank AS BIGINT) AS rank, t.key, t.n,
            CAST(t.n * 1000000 // s.total AS BIGINT) AS share_1e6,
            s.n_keys, s.p50_n, s.p99_n, s.max_n
          FROM T t CROSS JOIN S s WHERE t.rank <= 20 ORDER BY rank""",

    // commit diff: replay base (A) and head (B = merge + inserts −
    // deletes), then the same key-level FULL OUTER classification
    "q72_commit_diff" ->
      """WITH A AS (SELECT doc_id, substr(text, 1, 20) AS txt,
                CAST(1 AS BIGINT) AS pre FROM documents),
          U AS (SELECT doc_id, 'upd:' || substr(text, 1, 15) AS txt,
                CAST(2 AS BIGINT) AS pre FROM documents WHERE doc_id % 5 = 0),
          I AS (SELECT doc_id + 1000000 AS doc_id, 'fresh' AS txt,
                CAST(1 AS BIGINT) AS pre FROM documents WHERE doc_id % 11 = 0),
          MB AS (SELECT doc_id, txt, pre FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC, seq DESC) AS rn
                 FROM (SELECT doc_id, txt, pre, 0 AS seq FROM A
                       UNION ALL SELECT doc_id, txt, pre, 1 FROM U
                       UNION ALL SELECT doc_id, txt, pre, 2 FROM I))
                WHERE rn = 1),
          B AS (SELECT * FROM MB WHERE doc_id NOT IN
                (SELECT doc_id FROM documents WHERE doc_id % 9 = 0)),
          D AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                 CASE WHEN a.doc_id IS NULL THEN 'insert'
                      WHEN b.doc_id IS NULL THEN 'delete'
                      WHEN NOT (a.txt IS NOT DISTINCT FROM b.txt
                                AND a.pre IS NOT DISTINCT FROM b.pre)
                        THEN 'update' END AS change_type,
                 a.txt AS before_txt, b.txt AS after_txt,
                 a.pre AS before_pre, b.pre AS after_pre
                FROM A a FULL JOIN B b ON a.doc_id = b.doc_id)
          SELECT doc_id, change_type, before_txt, after_txt,
            before_pre, after_pre
          FROM D WHERE change_type IS NOT NULL ORDER BY doc_id""",

    // release delta: q72's replay carrying source, aggregated by
    // (dimension from whichever image exists, change_type)
    "q131_release_delta" ->
      """WITH A AS (SELECT doc_id, source AS src, substr(text, 1, 20) AS txt,
                CAST(1 AS BIGINT) AS pre FROM documents),
          U AS (SELECT doc_id, source AS src, 'upd:' || substr(text, 1, 15) AS txt,
                CAST(2 AS BIGINT) AS pre FROM documents WHERE doc_id % 5 = 0),
          I AS (SELECT doc_id + 1000000 AS doc_id, 'newfeed' AS src, 'fresh' AS txt,
                CAST(1 AS BIGINT) AS pre FROM documents WHERE doc_id % 11 = 0),
          MB AS (SELECT doc_id, src, txt, pre FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC, seq DESC) AS rn
                 FROM (SELECT doc_id, src, txt, pre, 0 AS seq FROM A
                       UNION ALL SELECT doc_id, src, txt, pre, 1 FROM U
                       UNION ALL SELECT doc_id, src, txt, pre, 2 FROM I))
                WHERE rn = 1),
          B AS (SELECT * FROM MB WHERE doc_id NOT IN
                (SELECT doc_id FROM documents WHERE doc_id % 9 = 0)),
          D AS (SELECT coalesce(b.src, a.src) AS source,
                 CASE WHEN a.doc_id IS NULL THEN 'insert'
                      WHEN b.doc_id IS NULL THEN 'delete'
                      WHEN NOT (a.src IS NOT DISTINCT FROM b.src
                                AND a.txt IS NOT DISTINCT FROM b.txt
                                AND a.pre IS NOT DISTINCT FROM b.pre)
                        THEN 'update' END AS change_type
                FROM A a FULL JOIN B b ON a.doc_id = b.doc_id)
          SELECT source, change_type, CAST(count(*) AS BIGINT) AS n
          FROM D WHERE change_type IS NOT NULL
          GROUP BY source, change_type ORDER BY source, change_type""",

    // incremental rollup maintenance: the oracle is the FULL recompute
    // of the merged final state — the maintained summary must equal it
    "q71_rollup_maintain" ->
      s"""WITH B AS (SELECT doc_id, lang,
                 CAST(len(${toks("text")}) AS BIGINT) AS n_tokens,
                 1 AS pre, 0 AS seq FROM documents),
          U AS (SELECT doc_id, 'xx' AS lang, n_tokens + 5 AS n_tokens,
                 2 AS pre, 1 AS seq FROM B WHERE doc_id % 7 = 0),
          M AS (SELECT doc_id, lang, n_tokens FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC, seq DESC) AS rn
                 FROM (SELECT * FROM B UNION ALL SELECT * FROM U))
                WHERE rn = 1)
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
          FROM M GROUP BY lang ORDER BY lang""",

    // COW delete: commits 1+2 merge lexicographically (q46 argument),
    // the deleted slice drops, and the final commit merges on top —
    // its seq is strictly larger, so (pre DESC, seq DESC) reproduces
    // the engine's pairwise precombine/update-wins fold
    "q66_cow_delete" ->
      """WITH M12 AS (
           SELECT doc_id, txt, pre, seq FROM (
             SELECT doc_id, txt, pre, seq,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY pre DESC, seq DESC) AS rn
             FROM (
               SELECT doc_id, substr(text, 1, 30) AS txt,
                 CAST(1 AS BIGINT) AS pre, 0 AS seq FROM documents
               UNION ALL
               SELECT doc_id, 'tie:' || substr(text, 1, 20),
                 CAST(1 AS BIGINT), 1 FROM documents WHERE doc_id % 5 = 0))
           WHERE rn = 1),
         AD AS (SELECT * FROM M12 WHERE doc_id % 3 <> 0),
         F AS (
           SELECT doc_id, txt, pre,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY pre DESC, seq DESC) AS rn
           FROM (
             SELECT doc_id, txt, pre, seq FROM AD
             UNION ALL
             SELECT doc_id, 'b3:' || substr(text, 1, 20),
               CAST(2 AS BIGINT), 3 FROM documents WHERE doc_id % 4 = 0))
         SELECT doc_id, txt, pre FROM F WHERE rn = 1 ORDER BY doc_id""",

    // token-window chunking: 64-token windows, stride 48 (16 overlap);
    // final window is the remainder — mirror of Chunker.chunkByTokens
    "q47_chunking" ->
      s"""WITH T AS (SELECT doc_id, ${toks("text")} AS tk FROM documents),
          N AS (SELECT doc_id, tk, len(tk) AS ntok FROM T WHERE len(tk) > 0),
          C AS (SELECT doc_id, tk, ntok,
                  CASE WHEN ntok <= 64 THEN 1
                       ELSE CAST(floor((ntok - 64 + 47)::DOUBLE / 48) AS INT) + 1
                  END AS nchunks FROM N),
          X AS (SELECT doc_id, tk, ntok, unnest(range(nchunks)) AS i FROM C)
          SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
            array_to_string(list_slice(tk, i * 48 + 1, i * 48 + 64), ' ') AS chunk,
            CAST(least(ntok - i * 48, 64) AS BIGINT) AS chunk_tokens
          FROM X ORDER BY doc_id, chunk_no""",

    // deterministic stratified hash sample: membership is a pure
    // function of doc_id (md5-derived bucket vs per-lang ppm rate);
    // the CASE is generated from the SAME map the Spark plan uses
    "q48_stratified_sample" -> {
      val cases = graft.operators.Sampling.DemoRates.toSeq.sortBy(_._1)
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""SELECT doc_id, lang FROM documents
          WHERE (${md5long("cast(doc_id as varchar)")} % 1000000) <
                (CASE lang $cases ELSE 0 END)
          ORDER BY doc_id"""
    },

    // IVF ANN with trained centroids: the oracle re-runs the SAME
    // deterministic k-means (seeds = 8 lowest ids, 2 unrolled Lloyd
    // rounds, fixed-point means) and the same 2-cell probe search —
    // independent engine, identical arithmetic
    "q49_ann_ivf" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 2)},
          SC AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ${scoreFixedSql("q.emb", "c.emb")} AS score_1e6
                 FROM CC c JOIN QP q ON q.cid = c.cid AND q.id <> c.id),
          R AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score_1e6 DESC, neighbor_id) AS rank FROM SC)
          SELECT query_id, rank, neighbor_id, score_1e6 FROM R WHERE rank <= 3
          ORDER BY query_id, rank""",

    // PQ + ADC: per-subspace codebooks re-derived through the SAME
    // unrolled k-means CTEs as q49 (on sliced embeddings), codes =
    // per-subspace assign, scores = integer sums of per-(subspace,
    // cell) fixed-point cosine contributions
    "q58_pq_adc" -> {
      val (m, kc, sub) = (2, 4, 32)
      val unions = (0 until m).map(s =>
        s"SELECT l.query_id, c.id, l.contrib FROM CODE$s c JOIN LUT$s l ON l.cid = c.cid")
        .mkString(" UNION ALL ")
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${pqSubspaceCtes(m, kc, sub)},
          CONTRIB AS ($unions),
          ADC AS (SELECT query_id, id AS neighbor_id,
                  CAST(sum(contrib) AS BIGINT) AS adc_1e6
                  FROM CONTRIB WHERE query_id <> id GROUP BY query_id, id),
          R AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_1e6 DESC, neighbor_id) AS rank FROM ADC)
          SELECT query_id, rank, neighbor_id, adc_1e6 FROM R WHERE rank <= 3
          ORDER BY query_id, rank"""
    },

    // IVF-PQ: the q49 coarse probe prunes candidates, the q58 LUT
    // scores them from codes — both CTE blocks shared verbatim with
    // those oracles
    "q59_ivf_pq" -> {
      val (m, kc, sub) = (2, 4, 32)
      val unions = (0 until m).map(s =>
        s"""SELECT ca.query_id, ca.id, l.contrib
            FROM CAND ca JOIN CODE$s c$s ON c$s.id = ca.id
            JOIN LUT$s l ON l.cid = c$s.cid AND l.query_id = ca.query_id""")
        .mkString(" UNION ALL ")
      // no DISTINCT needed: each corpus vector has exactly one coarse
      // cid and a query's probed cids are distinct, so the cell
      // equi-join yields at most one row per (query, doc)
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 2)},
          ${pqSubspaceCtes(m, kc, sub)},
          CAND AS (SELECT q.id AS query_id, c.id
                   FROM CC c JOIN QP q ON q.cid = c.cid AND q.id <> c.id),
          CONTRIB AS ($unions),
          ADC AS (SELECT query_id, id AS neighbor_id,
                  CAST(sum(contrib) AS BIGINT) AS adc_1e6
                  FROM CONTRIB GROUP BY query_id, id),
          R AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_1e6 DESC, neighbor_id) AS rank FROM ADC)
          SELECT query_id, rank, neighbor_id, adc_1e6 FROM R WHERE rank <= 3
          ORDER BY query_id, rank"""
    },

    // hybrid retrieval: BM25 "more like this" (seed docs' own tokens
    // as query terms — QT is derived from the data, so EQ filters via
    // a semi-join instead of interpolated literals) fused with
    // brute-force cosine (q21's exact formulation) by reciprocal-rank
    // fusion — integer quotients 1e9 // (60 + rank), summed per
    // (query, doc). The BM25 chain is bm25ScCtes, shared with q51/q53.
    "q60_hybrid_rrf" -> {
      // each seed keeps only its 16 rarest corpus terms (df asc, term
      // asc) — the MoreLikeThis cap TextSearch.pruneQueryTermsByDf
      // applies; terms absent from the corpus drop via the inner join
      val qt = """QT0 AS (SELECT doc_id AS query_id, unnest(list_distinct(tk)) AS term
                  FROM D WHERE doc_id % 200 = 0 AND doc_id < 5000),
          DFX AS (SELECT term, CAST(count(*) AS BIGINT) AS dfx
                  FROM (SELECT doc_id, unnest(list_distinct(tk)) AS term FROM D)
                  GROUP BY term),
          QT AS (SELECT query_id, term FROM (
                  SELECT q.query_id, q.term,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY x.dfx, q.term) AS tr
                  FROM QT0 q JOIN DFX x USING (term))
                 WHERE tr <= 16)"""
      s"""WITH ${bm25ScCtes("term IN (SELECT term FROM QT)", mid = qt)},
          B AS (SELECT q.query_id, s.doc_id, CAST(sum(s.c) AS BIGINT) AS bm25
                FROM SC s JOIN QT q USING (term)
                GROUP BY q.query_id, s.doc_id),
          BR AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY bm25 DESC, doc_id) AS r
                 FROM B WHERE doc_id <> query_id),
          VC AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          VQ AS (SELECT * FROM VC WHERE id % 200 = 0 AND id < 2000),
          VS AS (SELECT q.id AS query_id, c.id AS doc_id,
                  ${scoreFixedSql("q.emb", "c.emb")} AS sc
                 FROM VC c CROSS JOIN VQ q WHERE q.id <> c.id),
          VR AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sc DESC, doc_id) AS r
                 FROM VS),
          CONTRIB AS (
            SELECT query_id, doc_id, 1000000000 // (r + 60) AS rc
            FROM BR WHERE r <= 20
            UNION ALL
            SELECT query_id, doc_id, 1000000000 // (r + 60) AS rc
            FROM VR WHERE r <= 20),
          RR AS (SELECT query_id, doc_id, CAST(sum(rc) AS BIGINT) AS rrf_1e9
                 FROM CONTRIB GROUP BY query_id, doc_id),
          RK AS (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY rrf_1e9 DESC, doc_id) AS rank FROM RR)
          SELECT query_id, rank, doc_id, rrf_1e9 FROM RK WHERE rank <= 10
          ORDER BY query_id, rank"""
    },

    // inverted index: postings recomputed straight from the corpus —
    // term list generated from the SAME DemoQuery the index lookup uses
    "q70_inverted_index" ->
      s"""WITH L AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          D AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
                 unnest(tk) AS term FROM L)
          SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf, dl
          FROM D
          WHERE term IN (${graft.operators.TextSearch.DemoQuery.toLowerCase
            .split("\\s+").map(t => s"'$t'").mkString(", ")})
          GROUP BY term, doc_id, dl
          ORDER BY term, doc_id""",

    // z-order: unrolled shift/mask interleave, generated from the same
    // loop as Layout.zValue
    "q69_zorder" ->
      s"""SELECT doc_id, x, y, CAST(${zOrderSql("x", "y", 16)} AS BIGINT) AS zv
          FROM (SELECT doc_id, doc_id % 65536 AS x,
                 length(coalesce(text, '')) % 65536 AS y FROM documents)
          ORDER BY doc_id""",

    // trailing 1h window: RANGE frame on integer µs — peers group
    // identically on both engines, so tie order can't matter; count
    // and cents-sum cast to BIGINT (the HUGEINT discipline)
    "q68_trailing_window" ->
      """WITH E AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events)
         SELECT event_id, user_id, ts_us,
           CAST(count(*) OVER w AS BIGINT) AS n_win,
           CAST(sum(cents) OVER w AS BIGINT) AS cents_win
         FROM E
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // ordered funnel: stage i's first time must be strictly after the
    // user's first completion of stage i-1 — sequential min-after-join
    // chain (the Spark side chains window mins on one user partition)
    "q63_funnel" ->
      """WITH E AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         U AS (SELECT DISTINCT user_id FROM E),
         V AS (SELECT user_id, min(ts_us) AS v FROM E
               WHERE event_type = 'view' GROUP BY user_id),
         C AS (SELECT e.user_id, min(e.ts_us) AS c FROM E e
               JOIN V ON V.user_id = e.user_id
               WHERE e.event_type = 'click' AND e.ts_us > V.v GROUP BY e.user_id),
         P AS (SELECT e.user_id, min(e.ts_us) AS p FROM E e
               JOIN C ON C.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts_us > C.c GROUP BY e.user_id)
         SELECT u.user_id,
           CAST((v.v IS NOT NULL)::INT + (c.c IS NOT NULL)::INT
                + (p.p IS NOT NULL)::INT AS BIGINT) AS stage_reached,
           v.v AS view_us, c.c AS click_us, p.p AS purchase_us
         FROM U u
         LEFT JOIN V v ON v.user_id = u.user_id
         LEFT JOIN C c ON c.user_id = u.user_id
         LEFT JOIN P p ON p.user_id = u.user_id
         ORDER BY u.user_id""",

    // cohort retention: first-event-day cohorts, distinct active users
    // per (cohort, day-offset) cell — all integer day buckets
    "q64_retention" ->
      """WITH E AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         F AS (SELECT user_id, min(day) AS cohort_day FROM E GROUP BY user_id),
         A AS (SELECT DISTINCT user_id, day FROM E)
         SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
         FROM A a JOIN F f ON f.user_id = a.user_id
         GROUP BY f.cohort_day, day_offset
         ORDER BY f.cohort_day, day_offset""",

    // heavy hitters: exact top-20 token counts next to the REPLAYED
    // portable count-min estimate — depth 5 × width 2719 from the
    // operator's (eps=0.001, confidence=0.99) defaults, the q217
    // md5Long cell hash, and both error flags computed here too
    // (VERDICT r12 item 2: no constant-asserted probabilistic flags)
    "q62_heavy_hitters" -> {
      val (depth, width, epsPpm) = (5, 2719, 1000L)
      val prefixes = (0 until depth).map(r => s"($r, 'cms$r:')").mkString(", ")
      s"""WITH E AS (SELECT unnest(${toks("lower(text)")}) AS token FROM documents),
          N AS (SELECT CAST(count(*) AS BIGINT) AS n FROM E),
          G AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM E GROUP BY token),
          R AS (SELECT token, cnt,
                 row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM G),
          T AS (SELECT token, cnt, CAST(rank AS BIGINT) AS rank
                FROM R WHERE rank <= 20),
          H(r, pre) AS (VALUES $prefixes),
          M AS (SELECT h.r, ${md5long("h.pre || e.token")} % $width AS cell,
                 CAST(count(*) AS BIGINT) AS c
                FROM E e, H h GROUP BY 1, 2),
          TE AS (SELECT t.token, t.rank, t.cnt,
                 CAST(min(m.c) AS BIGINT) AS est
                FROM T t JOIN H h ON TRUE
                JOIN M m ON m.r = h.r
                 AND m.cell = ${md5long("h.pre || t.token")} % $width
                GROUP BY 1, 2, 3)
          SELECT te.token, te.rank, te.cnt, te.est,
                 CAST(CASE WHEN te.est >= te.cnt THEN 1 ELSE 0 END
                   AS BIGINT) AS cms_lower_ok,
                 CAST(CASE WHEN te.est <= te.cnt
                      + (n.n * $epsPpm + 999999) // 1000000 THEN 1 ELSE 0 END
                   AS BIGINT) AS cms_upper_ok
          FROM TE te, N n
          ORDER BY te.rank"""
    },

    // mixture rebalance: per-stratum counts vs target ppm shares
    // (VALUES from the same Scala Seq the plan uses), achievable total
    // T = min(n·1e6 // s), per-stratum keep rate s·T // n, membership
    // by the same md5-ppm filter as q48 — all integer arithmetic
    "q61_mixture_rebalance" -> {
      val values = graft.operators.Sampling.DemoMixturePpm
        .map { case (s, p) => s"('$s', $p)" }.mkString(", ")
      s"""WITH TGT(stratum, s_ppm) AS (VALUES $values),
          CNT AS (SELECT t.stratum, t.s_ppm, CAST(count(d.doc_id) AS BIGINT) AS n
                  FROM TGT t LEFT JOIN documents d ON d.lang = t.stratum
                  GROUP BY t.stratum, t.s_ppm),
          TT AS (SELECT min(n * 1000000 // s_ppm) AS t FROM CNT),
          RT AS (SELECT stratum,
                  CASE WHEN n = 0 THEN 0 ELSE s_ppm * tt.t // n END AS rate_ppm
                 FROM CNT CROSS JOIN TT tt)
          SELECT d.doc_id, d.lang, CAST(r.rate_ppm AS BIGINT) AS rate_ppm
          FROM documents d JOIN RT r ON r.stratum = d.lang
          WHERE (${md5long("cast(doc_id as varchar)")} % 1000000) < r.rate_ppm
          ORDER BY d.doc_id"""
    },

    // deterministic train/val/test split: cumulative hash-bucket
    // ranges, CASE generated from the same Seq the Spark plan uses
    "q50_split" -> {
      val splits = graft.operators.Sampling.DemoSplits
      val uppers = splits.scanLeft(0L)(_ + _._2).tail
      val whens = splits.zip(uppers).init
        .map { case ((l, _), u) => s"WHEN b < $u THEN '$l'" }.mkString(" ")
      // null keys → null label, mirroring Sampling.splitLabel
      s"""SELECT doc_id,
            CASE WHEN b IS NULL THEN NULL $whens
                 ELSE '${splits.last._1}' END AS split
          FROM (SELECT doc_id,
                 (${md5long("cast(doc_id as varchar)")} % 1000000) AS b
                FROM documents)
          ORDER BY doc_id"""
    },

    // BM25 (graft's rational-idf variant — no ln, so bit-stable across
    // engines): every constant (k1, b, 1-b, k1+1) is interpolated from
    // the SAME Scala doubles the Spark plan uses; N, Σdl, df, tf are
    // re-derived in DuckDB; contributions floor to integers pre-sum
    "q51_bm25" -> {
      val terms = graft.operators.TextSearch.DemoQuery.toLowerCase
        .split("\\s+").filter(_.nonEmpty).distinct
        .map(t => s"'$t'").mkString("(", ", ", ")")
      s"""WITH ${bm25ScCtes(s"term IN $terms")}
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS bm25_1e6
          FROM SC GROUP BY doc_id
          ORDER BY bm25_1e6 DESC, doc_id"""
    },

    // multi-query BM25: identical stat derivations to q51, but SC keeps
    // the term and a VALUES-built (query_id, term) map fans the shared
    // per-(doc, term) contributions out per query — both the union term
    // set and the VALUES pairs are interpolated from the SAME Scala
    // DemoQueries the Spark plan uses
    "q53_bm25_multi" -> {
      val pairs = graft.operators.TextSearch.DemoQueries.flatMap { case (qid, q) =>
        q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(t => (qid, t)) }
      val union = pairs.map(_._2).distinct
        .map(t => s"'$t'").mkString("(", ", ", ")")
      val values = pairs.map { case (qid, t) => s"('$qid', '$t')" }.mkString(", ")
      s"""WITH ${bm25ScCtes(s"term IN $union")},
          Q(query_id, term) AS (VALUES $values)
          SELECT q.query_id, s.doc_id, CAST(sum(s.c) AS BIGINT) AS bm25_1e6
          FROM SC s JOIN Q q USING (term)
          GROUP BY q.query_id, s.doc_id
          ORDER BY q.query_id, bm25_1e6 DESC, s.doc_id"""
    },

    // sequence packing: per-md5-shard prefix token sums cut every 512
    // tokens — all-integer placement (mirror of Chunker.packSequences)
    "q52_packing" ->
      s"""WITH T AS (SELECT doc_id,
                 CAST(len(${toks("text")}) AS BIGINT) AS n_tokens,
                 ${md5long("cast(doc_id as varchar)")} % 4 AS shard
               FROM documents),
          P AS (SELECT doc_id, shard,
                 coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
                FROM T)
          SELECT doc_id, shard, CAST(prefix // 512 AS BIGINT) AS seq_id,
            CAST(prefix % 512 AS BIGINT) AS seq_offset
          FROM P ORDER BY doc_id""",

    // quantile gate: per-language exact interpolated percentile bands
    // (quantile_cont ≡ Spark percentile, the q39 parity result); the
    // band filter compares the same doubles on both engines
    "q67_quantile_gate" ->
      s"""WITH V AS (SELECT doc_id, lang,
                 CAST(len(${toks("text")}) AS BIGINT) AS n_tokens
               FROM documents),
          T AS (SELECT lang, quantile_cont(n_tokens, 0.05) AS qlo,
                 quantile_cont(n_tokens, 0.95) AS qhi
                FROM V GROUP BY lang)
          SELECT v.doc_id, v.lang, v.n_tokens
          FROM V v JOIN T t ON v.lang IS NOT DISTINCT FROM t.lang
          WHERE v.n_tokens >= t.qlo AND v.n_tokens <= t.qhi
          ORDER BY v.doc_id""",

    // repetition gate: duplicate word 3-gram fraction, same IEEE op
    // order as TextAnalysis.repetitionRatio (one div, one sub, floor)
    "q56_repetition" ->
      s"""SELECT doc_id, ${repFixedSql("g")} AS rep_1e6
          FROM (SELECT doc_id, ${rawShingles3("text")} AS g FROM documents)
          ORDER BY doc_id""",

    // bloom-prefiltered decontamination: the bloom stage is
    // semantics-free (exact join confirms survivors), so the oracle is
    // the exact q55 formula on the q65 eval slice (doc_id % 89 = 0)
    "q65_decontaminate_bloom" ->
      s"""WITH ${benchGramsCte(89)},
          C AS (SELECT doc_id, unnest(${shingles3("text")}) AS gram
               FROM documents WHERE NOT (doc_id % 89 = 0 AND doc_id < 5000))
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
          FROM C JOIN BG USING (gram)
          GROUP BY doc_id
          ORDER BY doc_id""",

    // benchmark decontamination: distinct shared word 3-grams between
    // each corpus doc and the eval slice (doc_id % 97 = 0)
    "q55_decontaminate" ->
      s"""WITH ${benchGramsCte()},
          C AS (SELECT doc_id, unnest(${shingles3("text")}) AS gram
               FROM documents WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000))
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
          FROM C JOIN BG USING (gram)
          GROUP BY doc_id
          ORDER BY doc_id""",

    // no-split packing: the greedy reset recurrence replayed as a
    // recursive CTE — each step advances every shard one document in
    // key order (rn + 1), carrying (seq_id, fill) state
    "q54_packing_nosplit" ->
      s"""WITH RECURSIVE T AS (SELECT doc_id,
                 CAST(len(${toks("text")}) AS BIGINT) AS n_tokens,
                 ${md5long("cast(doc_id as varchar)")} % 4 AS shard
               FROM documents),
          N AS (SELECT doc_id, n_tokens, shard,
                 row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
                FROM T),
          R AS (
            SELECT doc_id, shard, rn, n_tokens,
                   CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_offset,
                   n_tokens AS fill
            FROM N WHERE rn = 1
            UNION ALL
            SELECT n.doc_id, n.shard, n.rn, n.n_tokens,
              CASE WHEN r.fill > 0 AND r.fill + n.n_tokens > 512
                   THEN r.seq_id + 1 ELSE r.seq_id END,
              CASE WHEN r.fill > 0 AND r.fill + n.n_tokens > 512
                   THEN CAST(0 AS BIGINT) ELSE r.fill END,
              CASE WHEN r.fill > 0 AND r.fill + n.n_tokens > 512
                   THEN n.n_tokens ELSE r.fill + n.n_tokens END
            FROM R r JOIN N n ON n.shard = r.shard AND n.rn = r.rn + 1)
          SELECT doc_id, shard, seq_id, seq_offset FROM R ORDER BY doc_id""",

    // BPE token counts: the full trainer replayed as unrolled merge
    // rounds (bpeCtes), then each doc billed its per-word subword sum;
    // the LEFT JOIN keeps tokenless docs at 0 like the Spark fold
    "q81_bpe_tokens" ->
      s"""WITH ${bpeCtes(graft.operators.Bpe.DefaultMerges, graft.operators.Bpe.DefaultVocabCap)}
          SELECT d.doc_id, coalesce(a.ws_tokens, 0)::BIGINT AS ws_tokens,
            coalesce(a.bpe_tokens, 0)::BIGINT AS bpe_tokens
          FROM documents d LEFT JOIN AGG a USING (doc_id)
          ORDER BY doc_id""",

    // quality-aware dedup representative: q36's reachability clusters
    // + the shared q41 quality CTE; best (score desc, id) per cluster
    "q115_cluster_best" ->
      s"""WITH RECURSIVE
          ${lshPairCtes("documents")},
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                    UNION SELECT id_b, id_a FROM PAIRS),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
          CL AS (SELECT node, min(r) AS cluster_id FROM REACH GROUP BY node),
          $qualityCte,
          J AS (SELECT q.doc_id, coalesce(cl.cluster_id, q.doc_id) AS cluster_id,
                 q.quality_1e6
                FROM QS q LEFT JOIN CL cl ON cl.node = q.doc_id)
          SELECT doc_id, cluster_id, quality_1e6,
            CAST(CASE WHEN row_number() OVER (PARTITION BY cluster_id
                ORDER BY quality_1e6 DESC, doc_id) = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM J ORDER BY doc_id""",

    // content-defined chunk dedup: cuts after token p+2 where the
    // 3-gram hash ≡ 0 mod 16; spans between cuts; chunk = md5 of the
    // space-joined token slice; occurrence counts over chunk hashes
    "q116_cdc_dedup" ->
      s"""WITH $cdcChunkCtes,
          OCC AS (SELECT chunk_h, count(*) AS occ FROM CH GROUP BY chunk_h),
          AGG AS (SELECT doc_id, count(*) AS n_chunks,
                 CAST(sum(n_words) AS BIGINT) AS n_words,
                 CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
                 CAST(sum(CASE WHEN occ > 1 THEN n_words ELSE 0 END) AS BIGINT) AS dup_words
                FROM CH JOIN OCC USING (chunk_h) GROUP BY doc_id)
          SELECT d.doc_id, coalesce(n_chunks, 0) AS n_chunks,
            coalesce(a.n_words, 0) AS n_words,
            coalesce(dup_chunks, 0) AS dup_chunks,
            coalesce(dup_words, 0) AS dup_words
          FROM documents d LEFT JOIN AGG a USING (doc_id)
          ORDER BY d.doc_id""",

    // token-budget selection: global (quality desc, id) prefix sum cut
    // at 40% of corpus tokens — the direct formulation the engine's
    // binned plan must reproduce exactly
    "q117_token_budget" ->
      s"""WITH $qualityCte,
          TOKC AS (SELECT doc_id, CAST(len(${toks("text")}) AS BIGINT) AS ntok
                   FROM documents),
          J AS (SELECT q.doc_id, quality_1e6, ntok FROM QS q JOIN TOKC USING (doc_id)),
          B AS (SELECT CAST(sum(ntok) * 2 // 5 AS BIGINT) AS budget FROM J),
          R AS (SELECT doc_id, quality_1e6, ntok,
                 sum(ntok) OVER (ORDER BY quality_1e6 DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM J)
          SELECT doc_id, quality_1e6, ntok,
            CAST(CASE WHEN cum <= budget THEN 1 ELSE 0 END AS BIGINT) AS selected
          FROM R, B ORDER BY doc_id""",

    // curation v3: the q57 chain with (a) clusters keeping their BEST-
    // quality member instead of min-id (q115's rank) and (b) the final
    // q117 token-budget prefix cut over the clean survivors
    "q118_curation_v3" ->
      s"""WITH RECURSIVE $dedupClusterCtes,
          ${gateCtes("KEEP")},
          JB AS (SELECT k.doc_id, coalesce(cl.cluster_id, k.doc_id) AS cluster_id,
                 g.quality_1e6, g.predicted_lang
                FROM KEEP k JOIN G g USING (doc_id)
                LEFT JOIN CL cl ON cl.node = k.doc_id),
          BEST AS (SELECT doc_id, quality_1e6, predicted_lang FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster_id
                  ORDER BY quality_1e6 DESC, doc_id) AS rn FROM JB)
              WHERE rn = 1),
          ${benchGramsCte()},
          CONTAM AS (SELECT DISTINCT d.doc_id
                 FROM (SELECT doc_id, unnest(${shingles3("text")}) AS gram
                       FROM documents) d JOIN BG USING (gram)),
          REP AS (SELECT doc_id, ${repFixedSql("g")} AS rep_1e6
              FROM (SELECT doc_id, ${rawShingles3("text")} AS g FROM documents)),
          TOKC AS (SELECT doc_id, CAST(len(${toks("text")}) AS BIGINT) AS ntok
                   FROM documents),
          SURV3 AS (SELECT b.doc_id, b.quality_1e6, b.predicted_lang, t.ntok
                FROM BEST b JOIN REP r USING (doc_id) JOIN TOKC t USING (doc_id)
                WHERE b.quality_1e6 >= 600000 AND b.predicted_lang = 'en'
                  AND r.rep_1e6 < 500000
                  AND b.doc_id NOT IN (SELECT doc_id FROM CONTAM)),
          BGT AS (SELECT CAST(sum(ntok) * 2 // 5 AS BIGINT) AS budget FROM SURV3),
          R AS (SELECT doc_id, quality_1e6, predicted_lang, ntok,
                 sum(ntok) OVER (ORDER BY quality_1e6 DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM SURV3)
          SELECT doc_id, quality_1e6, predicted_lang, ntok
          FROM R, BGT WHERE cum <= budget ORDER BY doc_id""",

    // hard negatives: q60's pruned-term BM25 per seed, minus each
    // seed's LSH near-dups (q18's PAIRS, both orientations), ranked
    // AFTER the exclusion
    "q119_hard_negatives" -> {
      val qt = """QT0 AS (SELECT doc_id AS query_id, unnest(list_distinct(tk)) AS term
                  FROM D WHERE doc_id % 200 = 0 AND doc_id < 5000),
          DFX AS (SELECT term, CAST(count(*) AS BIGINT) AS dfx
                  FROM (SELECT doc_id, unnest(list_distinct(tk)) AS term FROM D)
                  GROUP BY term),
          QT AS (SELECT query_id, term FROM (
                  SELECT q.query_id, q.term,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY x.dfx, q.term) AS tr
                  FROM QT0 q JOIN DFX x USING (term))
                 WHERE tr <= 16)"""
      s"""WITH ${bm25ScCtes("term IN (SELECT term FROM QT)", mid = qt)},
          BS AS (SELECT q.query_id, s.doc_id, CAST(sum(s.c) AS BIGINT) AS bm25_1e6
                FROM SC s JOIN QT q USING (term)
                GROUP BY q.query_id, s.doc_id),
          ${lshPairCtes("documents")},
          ND AS (SELECT id_a AS query_id, id_b AS doc_id FROM PAIRS
                 UNION ALL SELECT id_b, id_a FROM PAIRS),
          FR AS (SELECT b.query_id, b.doc_id, b.bm25_1e6 FROM BS b
                 WHERE b.doc_id <> b.query_id AND NOT EXISTS (
                   SELECT 1 FROM ND n
                   WHERE n.query_id = b.query_id AND n.doc_id = b.doc_id)),
          RK AS (SELECT query_id, doc_id, bm25_1e6,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY bm25_1e6 DESC, doc_id) AS rank
                 FROM FR)
          SELECT query_id, doc_id AS neg_id, bm25_1e6, CAST(rank AS BIGINT) AS rank
          FROM RK WHERE rank <= 10 ORDER BY query_id, rank"""
    },

    // minhash estimator audit: signature-agreement estimate (q18's SIG)
    // next to the exact shingle jaccard (q20's formula) per LSH pair
    "q120_minhash_estimate" ->
      s"""WITH ${lshPairCtes("documents")},
          SH AS (SELECT doc_id, ${shingles3("text")} AS sh FROM documents),
          M AS (SELECT p.id_a, p.id_b,
                 CAST(len(list_filter(range(16),
                   i -> sa.sig[i+1] = sb.sig[i+1])) AS BIGINT) AS matches
                FROM PAIRS p JOIN SIG sa ON sa.doc_id = p.id_a
                JOIN SIG sb ON sb.doc_id = p.id_b)
          SELECT m.id_a, m.id_b,
            matches * 1000000 // 16 AS est_jaccard_1e6,
            cast(floor((CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
              ELSE len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END)
              * 1000000.0) as bigint) AS jaccard_1e6
          FROM M m JOIN SH a ON a.doc_id = m.id_a JOIN SH b ON b.doc_id = m.id_b
          ORDER BY id_a, id_b""",

    // source near-dup matrix: q18's PAIRS joined to sources twice,
    // unordered pair via least/greatest
    "q121_source_near_dups" ->
      s"""WITH ${lshPairCtes("documents")},
          S AS (SELECT doc_id, source FROM documents WHERE source IS NOT NULL)
          SELECT least(sa.source, sb.source) AS source_a,
            greatest(sa.source, sb.source) AS source_b,
            CAST(count(*) AS BIGINT) AS n_pairs
          FROM PAIRS p JOIN S sa ON sa.doc_id = p.id_a
          JOIN S sb ON sb.doc_id = p.id_b
          GROUP BY 1, 2 ORDER BY 1, 2""",

    // per-source percentile calibration: the direct rank-window
    // formulation ((rank-1)*1e6 // (n-1), min rank on ties) the
    // engine's counts-based plan must reproduce exactly
    "q122_score_calibration" ->
      s"""WITH $qualityCte,
          B AS (SELECT d.doc_id, d.source, q.quality_1e6
                FROM documents d JOIN QS q USING (doc_id)
                WHERE d.source IS NOT NULL),
          R AS (SELECT doc_id, source, quality_1e6,
                 CAST(rank() OVER (PARTITION BY source
                   ORDER BY quality_1e6) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
                FROM B)
          SELECT doc_id, source, quality_1e6,
            CAST(CASE WHEN n <= 1 THEN 0
                 ELSE (rk - 1) * 1000000 // (n - 1) END AS BIGINT) AS pct_1e6
          FROM R ORDER BY doc_id""",

    // boilerplate removal: q116's chunk chain, chunks with occ > 2
    // drop, survivors reassemble per doc in chunk order
    "q123_deboilerplate" ->
      s"""WITH $cdcChunkCtes,
          OCC AS (SELECT chunk_h, count(*) AS occ FROM CH GROUP BY chunk_h),
          KEPT AS (SELECT c.* FROM CH c JOIN OCC USING (chunk_h)
                   WHERE occ <= 2),
          AGG AS (SELECT doc_id,
                 string_agg(chunk_str, ' ' ORDER BY chunk_no) AS clean_text,
                 CAST(count(*) AS BIGINT) AS kept_chunks
                FROM KEPT GROUP BY doc_id)
          SELECT d.doc_id, coalesce(clean_text, '') AS clean_text,
            CAST(coalesce(kept_chunks, 0) AS BIGINT) AS kept_chunks
          FROM documents d LEFT JOIN AGG a USING (doc_id)
          ORDER BY d.doc_id""",

    // language-ID confidence margin: q26's per-language hit counts,
    // best/second via a sorted list, fixed-point per-token margin
    "q124_lang_margin" -> {
      val langs = TextAnalysis.stopwords.keys.toSeq.sorted // de, en, es, fr
      val hits = langs.map(l => s"${hitsSql("text", l)} AS h_$l").mkString(", ")
      s"""WITH H AS (SELECT doc_id, lang,
             cast(len(${toks("lower(text)")}) as bigint) AS n_tokens, $hits
            FROM documents),
          S AS (SELECT *,
                 list_sort([h_de, h_en, h_es, h_fr], 'DESC')[1] AS best_hits,
                 list_sort([h_de, h_en, h_es, h_fr], 'DESC')[2] AS second_hits
                FROM H)
          SELECT doc_id, lang,
            CASE WHEN best_hits = 0 THEN 'und'
                 WHEN h_de = best_hits THEN 'de'
                 WHEN h_en = best_hits THEN 'en'
                 WHEN h_es = best_hits THEN 'es'
                 ELSE 'fr' END AS predicted_lang,
            best_hits, (best_hits - second_hits) AS margin, n_tokens,
            CASE WHEN n_tokens = 0 THEN 0::BIGINT
                 ELSE ((best_hits - second_hits) * 1000000) // n_tokens
            END AS margin_1e6
          FROM S ORDER BY doc_id"""
    },

    // tokenizer fertility: q81's BPE chain re-used, per-source sums +
    // fixed-point subwords-per-word and chars-per-subword ratios
    "q114_tokenizer_fertility" ->
      s"""WITH ${bpeCtes(graft.operators.Bpe.DefaultMerges, graft.operators.Bpe.DefaultVocabCap)},
          J AS (SELECT d.doc_id, d.source, length(d.text)::BIGINT AS nch,
                 coalesce(a.ws_tokens, 0)::BIGINT AS ws,
                 coalesce(a.bpe_tokens, 0)::BIGINT AS bpe
                FROM documents d LEFT JOIN AGG a USING (doc_id))
          SELECT source, count(*)::BIGINT AS n_docs,
            sum(ws)::BIGINT AS ws_tokens, sum(bpe)::BIGINT AS bpe_tokens,
            sum(nch)::BIGINT AS n_chars,
            CASE WHEN sum(ws) = 0 THEN NULL
                 ELSE (sum(bpe)::BIGINT * 1000000) // sum(ws)::BIGINT END AS fertility_1e6,
            CASE WHEN sum(bpe) = 0 THEN NULL
                 ELSE (sum(nch)::BIGINT * 1000000) // sum(bpe)::BIGINT END AS chars_per_tok_1e6
          FROM J GROUP BY source ORDER BY source""",

    // adaptive simhash: band width re-derived from count(*) with the
    // same exact integer ceil-log2 as Dedup.suggestSimhashParams
    // (smallest b with 2^b ≥ ⌈n/2⌉, clamped to [4,15]); the 60-bit
    // fingerprint masked to 4·bandBits equals the narrow fingerprint
    // because each bit's majority vote is independent
    "q82_simhash_adaptive" -> {
      val hashes = s"list_transform(${toks("lower(text)")}, t -> ${md5long("t")})"
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb,
                 (4 * least(15, greatest(4, b)))::BIGINT AS bits
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          HS AS (SELECT doc_id, $hashes AS H FROM documents),
          S AS (SELECT doc_id,
                 ${simhashSql(60)} & ((1::BIGINT << bb.bits) - 1) AS sim,
                 bb.bb AS bandbits
                FROM HS, BB bb WHERE len(H) > 0),
          B AS (SELECT doc_id, sim, bandbits, t.band AS band,
                 (sim >> (t.band * bandbits)) & ((1::BIGINT << bandbits) - 1) AS bval
                FROM S CROSS JOIN (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  cast(bit_count(xor(a.sim, b2.sim)) as bigint) AS hamming
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id)
          SELECT id_a, id_b, hamming, (SELECT bits FROM BB) AS bits
          FROM P WHERE hamming <= 3
          ORDER BY id_a, id_b"""
    },

    // adaptive embedding near-dups: sign-bucket width from count(*)
    // (smallest b with 2^b ≥ n, clamped to [4, min(dim,30)]); the
    // 30-bit bucket masked to the chosen width equals the narrow
    // bucket because each bit is one component's sign
    "q84_near_dups_adaptive" ->
      s"""WITH NE AS (SELECT count(*)::BIGINT AS n FROM embeddings),
          SB AS (SELECT greatest(4, least(30, b))::BIGINT AS bits
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NE
                      WHERE (1::BIGINT << b) >= NE.n)),
          C AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 30)} & ((1::BIGINT << sb.bits) - 1) AS bucket
                FROM embeddings, SB sb)
          SELECT l.id AS id_a, r.id AS id_b,
            ${scoreFixedSql("l.emb", "r.emb")} AS score_1e6,
            (SELECT bits FROM SB) AS bits
          FROM C l JOIN C r ON l.bucket = r.bucket AND l.id < r.id
          WHERE ${scoreFixedSql("l.emb", "r.emb")} >= -1000000
          ORDER BY id_a, id_b""",

    // CDC rollup maintenance: the oracle is the full recompute of the
    // replayed base → move-update → DELETE → re-insert final state
    // (q66's lexicographic merge argument); the engine's maintained
    // summary — including delete-shrunk and emptied groups — must
    // equal it
    "q85_rollup_cdc" ->
      s"""WITH B AS (SELECT doc_id, lang,
                 CAST(len(${toks("text")}) AS BIGINT) AS n_tokens,
                 CAST(1 AS BIGINT) AS pre, 0 AS seq FROM documents),
          U2 AS (SELECT doc_id, 'xx' AS lang, n_tokens + 5 AS n_tokens,
                 CAST(2 AS BIGINT) AS pre, 1 AS seq FROM B WHERE doc_id % 7 = 0),
          M12 AS (SELECT doc_id, lang, n_tokens, pre, seq FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC, seq DESC) AS rn
                 FROM (SELECT * FROM B UNION ALL SELECT * FROM U2))
                WHERE rn = 1),
          AD AS (SELECT * FROM M12 WHERE doc_id % 5 <> 0),
          U4 AS (SELECT doc_id, 'yy' AS lang, n_tokens + 9 AS n_tokens,
                 CAST(3 AS BIGINT) AS pre, 3 AS seq FROM B WHERE doc_id % 4 = 0),
          F AS (SELECT doc_id, lang, n_tokens FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC, seq DESC) AS rn
                 FROM (SELECT * FROM AD UNION ALL SELECT * FROM U4))
                WHERE rn = 1)
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
          FROM F GROUP BY lang ORDER BY lang""",

    // SemDeDup: the q49 coarse quantizer (identical unrolled k-means
    // CTEs), candidate pairs ONLY within a cell, ≥0.95 fixed-point
    // cosine edges, recursive reachability (the q36 formulation) for
    // groups, min reachable id as representative
    "q86_semantic_dedup" ->
      s"""WITH RECURSIVE C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 2)},
          SPAIRS AS (SELECT a.id AS id_a, b.id AS id_b
                 FROM CC a JOIN CC b ON a.cid = b.cid AND a.id < b.id
                 WHERE ${scoreFixedSql("a.emb", "b.emb")} >= 950000),
          SEDGES AS (SELECT id_a AS src, id_b AS dst FROM SPAIRS
                 UNION SELECT id_b, id_a FROM SPAIRS),
          SREACH(node, r) AS (
            SELECT src, src FROM SEDGES
            UNION
            SELECT e.dst, r.r FROM SREACH r JOIN SEDGES e ON e.src = r.node),
          SCOMP AS (SELECT node AS id, min(r) AS rep FROM SREACH GROUP BY node)
          SELECT c.id, coalesce(p.rep, c.id) AS rep_id,
            CAST(CASE WHEN coalesce(p.rep, c.id) = c.id THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM C c LEFT JOIN SCOMP p USING (id) ORDER BY c.id""",

    // C4-style paragraph/segment dedup: the q47 chunk derivation at
    // 32/32 (zero overlap), global first-occurrence by (id, seg_no)
    // via a row_number over the md5 groups, ordered reassembly
    "q87_segment_dedup" ->
      s"""WITH T AS (SELECT doc_id, ${toks("text")} AS tk FROM documents),
          N AS (SELECT doc_id, tk, len(tk) AS ntok FROM T WHERE len(tk) > 0),
          C AS (SELECT doc_id, tk, ntok,
                  CASE WHEN ntok <= 32 THEN 1
                       ELSE CAST(floor((ntok - 32 + 31)::DOUBLE / 32) AS INT) + 1
                  END AS nchunks FROM N),
          X AS (SELECT doc_id, tk, ntok, unnest(range(nchunks)) AS i FROM C),
          S AS (SELECT doc_id AS id, CAST(i AS BIGINT) AS seg_no,
                 array_to_string(list_slice(tk, i * 32 + 1, i * 32 + 32), ' ') AS seg
                FROM X),
          H AS (SELECT *, md5(seg) AS h FROM S),
          K AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY h
                  ORDER BY id, seg_no) AS rn FROM H) WHERE rn = 1),
          R AS (SELECT id, array_to_string(list(seg ORDER BY seg_no), ' ') AS text_dedup,
                 CAST(count(*) AS BIGINT) AS n_kept FROM K GROUP BY id),
          D AS (SELECT id, CAST(count(*) AS BIGINT) AS n_segs FROM S GROUP BY id)
          SELECT d.id AS doc_id, coalesce(r.text_dedup, '') AS text_dedup,
            coalesce(r.n_kept, 0) AS n_kept, d.n_segs
          FROM D d LEFT JOIN R r USING (id) ORDER BY doc_id""",

    // unigram LM surprisal: corpus token counts, exact integer
    // floor-log2 via binary digit counts (bin()), per-doc bit sums —
    // the same arithmetic as TextAnalysis.unigramSurprisal
    "q88_lm_surprisal" ->
      s"""WITH E AS (SELECT doc_id, unnest(${toks("lower(text)")}) AS term FROM documents),
          CW AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM E GROUP BY term),
          NT AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM CW),
          SC AS (SELECT e.doc_id, CAST(length(bin(nt.n)) - length(bin(cw.c)) AS BIGINT) AS s
                 FROM E e JOIN CW cw USING (term) CROSS JOIN NT nt)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(s) AS BIGINT) AS surprisal_bits,
            (CAST(sum(s) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS avg_surprisal_1e6
          FROM SC GROUP BY doc_id ORDER BY doc_id""",

    // incremental index maintenance: the q85 replay shape (upsert →
    // delete → upsert with precombine priority), then postings of the
    // final state — maintained ≡ full recompute
    "q96_index_maintain" ->
      s"""WITH B AS (SELECT doc_id, text, CAST(1 AS BIGINT) AS pre, 0 AS seq FROM documents),
          U2 AS (SELECT doc_id, text || ' zz yy' AS text,
                 CAST(2 AS BIGINT) AS pre, 1 AS seq FROM documents WHERE doc_id % 7 = 0),
          M12 AS (SELECT doc_id, text, pre, seq FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC, seq DESC) AS rn
                 FROM (SELECT * FROM B UNION ALL SELECT * FROM U2))
                WHERE rn = 1),
          AD AS (SELECT * FROM M12 WHERE doc_id % 5 <> 0),
          U4 AS (SELECT doc_id, text || ' qq' AS text,
                 CAST(3 AS BIGINT) AS pre, 3 AS seq FROM documents WHERE doc_id % 4 = 0),
          F AS (SELECT doc_id, text FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC, seq DESC) AS rn
                 FROM (SELECT * FROM AD UNION ALL SELECT * FROM U4))
                WHERE rn = 1),
          T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM F),
          E AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term FROM T)
          SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
          FROM E GROUP BY term, doc_id, dl ORDER BY term, doc_id""",

    // span-level exact-substring duplication: ordered positional
    // 5-grams, corpus-wide occurrence counts, ≥2-count positions
    // merged into maximal spans by the lag-gap island test (same-width
    // intervals: new span iff pos - prev > 4)
    "q97_dup_spans" ->
      s"""WITH T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          P AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 4), i ->
                 {'pos': i, 'g': array_to_string(list_slice(tk, i+1, i+5), ' ')})) AS u
                FROM T WHERE len(tk) >= 5),
          Q AS (SELECT doc_id, CAST(u.pos AS INT) AS pos, u.g AS gram FROM P),
          D AS (SELECT gram FROM Q GROUP BY gram HAVING count(*) >= 2),
          M AS (SELECT doc_id, pos FROM Q JOIN D USING (gram)),
          B AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
                 (PARTITION BY doc_id ORDER BY pos) <= 4 THEN 0 ELSE 1 END AS brk
                FROM M),
          I AS (SELECT doc_id, pos, sum(brk) OVER
                 (PARTITION BY doc_id ORDER BY pos) AS island FROM B),
          S AS (SELECT doc_id, island, CAST(min(pos) AS BIGINT) AS s,
                 CAST(max(pos) + 4 AS BIGINT) AS e FROM I GROUP BY doc_id, island),
          A AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                 CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens FROM S GROUP BY doc_id),
          N AS (SELECT doc_id, CAST(len(${toks("text")}) AS BIGINT) AS n_tokens
                FROM documents)
          SELECT a.doc_id, n.n_tokens, a.n_spans, a.dup_tokens,
            (a.dup_tokens * 1000000) // n.n_tokens AS dup_share_1e6
          FROM A a JOIN N n USING (doc_id) ORDER BY a.doc_id""",

    // near-dup decontamination: the q18 LSH machinery split into a
    // corpus side and an eval side, candidates from the cross
    // band-bucket join, q20's fixed-point Jaccard as the verify
    "q100_near_dup_decontaminate" -> {
      val p = graft.operators.Dedup.MinhashP
      val sigExprs = graft.operators.Dedup.minhashCoeffs(16).map { case (a, b) =>
        s"list_min(list_transform(hs, h -> (h * $a + $b) % $p))"
      }.mkString("[", ", ", "]")
      val evalPred = "doc_id % 5 = 0 AND doc_id < 5000"
      def side(nm: String, filter: String) =
        s"""TH_$nm AS (SELECT doc_id, ${tokenHashExpr("text")} AS th
                FROM documents WHERE $filter),
            HS_$nm AS (SELECT doc_id, $gramFromTh AS hs FROM TH_$nm),
            SIG_$nm AS (SELECT doc_id, $sigExprs AS sig FROM HS_$nm WHERE len(hs) > 0),
            B_$nm AS (SELECT doc_id, t.band AS band,
                   md5(array_to_string(list_transform(
                     list_slice(sig, t.band * 4 + 1, t.band * 4 + 4), x -> x::varchar), ',')) AS bucket
                  FROM SIG_$nm CROSS JOIN (SELECT unnest(range(4)) AS band) t)"""
      s"""WITH ${side("c", s"NOT ($evalPred)")},
          ${side("e", evalPred)},
          CAND AS (SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS bench_id
                   FROM B_c c JOIN B_e e ON c.band = e.band AND c.bucket = e.bucket),
          SHC AS (SELECT doc_id, ${shingles3("text")} AS sh
                  FROM documents WHERE NOT ($evalPred)),
          SHE AS (SELECT doc_id AS bench_id, ${shingles3("text")} AS sh
                  FROM documents WHERE $evalPred),
          J AS (SELECT ca.doc_id, ca.bench_id,
                 cast(floor((CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
                   ELSE len(list_intersect(a.sh, b.sh))::DOUBLE
                        / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END)
                   * 1000000.0) as bigint) AS jaccard_1e6
                FROM CAND ca JOIN SHC a USING (doc_id) JOIN SHE b USING (bench_id))
          SELECT doc_id, bench_id, jaccard_1e6 FROM J WHERE jaccard_1e6 >= 200000
          ORDER BY doc_id, bench_id"""
    },

    // SQ8 scalar quantization: per-dim [lo, hi] bounds over 1e6
    // fixed-point values, 8-bit codes, integer reconstruction, MIPS
    // (dot) ranking — every step BIGINT, re-derived independently
    "q99_sq8_ann" ->
      s"""WITH F AS (SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000000) AS BIGINT)) AS fx
                FROM embeddings),
          E AS (SELECT unnest(fx) AS v, generate_subscripts(fx, 1) AS pos FROM F),
          ST AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM E GROUP BY pos),
          SL AS (SELECT list(mn ORDER BY pos) AS lo, list(mx ORDER BY pos) AS hi FROM ST),
          C AS (SELECT id, list_transform(range(len(fx)), i ->
                 CASE WHEN hi[i+1] > lo[i+1]
                   THEN least(255, greatest(0,
                     ((fx[i+1] - lo[i+1]) * 255) // (hi[i+1] - lo[i+1])))
                   ELSE 0 END) AS codes
                FROM F CROSS JOIN SL),
          DQ AS (SELECT id, list_transform(range(len(codes)), i ->
                  lo[i+1] + (codes[i+1] * (hi[i+1] - lo[i+1])) // 255) AS deq
                 FROM C CROSS JOIN SL),
          QF AS (SELECT id, fx FROM F WHERE id % 200 = 0 AND id < 2000),
          SC AS (SELECT q.id AS query_id, d.id AS neighbor_id,
                  CAST(list_sum(list_transform(range(len(q.fx)), i ->
                    q.fx[i+1] * d.deq[i+1])) AS BIGINT) AS score_1e12
                 FROM DQ d JOIN QF q ON q.id <> d.id),
          R AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score_1e12 DESC, neighbor_id) AS rank FROM SC)
          SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, score_1e12
          FROM R WHERE rank <= 3 ORDER BY query_id, rank""",

    // epoch-weighted mixture: per-source ppm weights (VALUES generated
    // from Sampling.DemoEpochsPpm), copies = floor + md5-ppm-gated
    // fractional extra, fanned out via range()
    "q98_epoch_mixture" -> {
      val vals = graft.operators.Sampling.DemoEpochsPpm.toSeq.sortBy(_._1)
        .map { case (s, w) => s"('$s', CAST($w AS BIGINT))" }.mkString(", ")
      s"""WITH W AS (SELECT * FROM (VALUES $vals) AS t(source, w)),
          C AS (SELECT doc_id, d.source AS source,
                 (w // 1000000) + CASE WHEN
                   (${md5long("cast(doc_id as varchar)")} % 1000000) < (w % 1000000)
                   THEN 1 ELSE 0 END AS copies
                FROM documents d JOIN W USING (source))
          SELECT doc_id, source, unnest(range(copies)) AS copy_no
          FROM C WHERE copies > 0 ORDER BY doc_id, copy_no"""
    },

    // the q97 span chain, then the CUT: anti-join original-case token
    // positions against exploded span ranges, ordered reassembly
    "q101_dup_span_removal" ->
      s"""WITH T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          P AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 4), i ->
                 {'pos': i, 'g': array_to_string(list_slice(tk, i+1, i+5), ' ')})) AS u
                FROM T WHERE len(tk) >= 5),
          Q AS (SELECT doc_id, CAST(u.pos AS INT) AS pos, u.g AS gram FROM P),
          D AS (SELECT gram FROM Q GROUP BY gram HAVING count(*) >= 2),
          M AS (SELECT doc_id, pos FROM Q JOIN D USING (gram)),
          B AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
                 (PARTITION BY doc_id ORDER BY pos) <= 4 THEN 0 ELSE 1 END AS brk
                FROM M),
          I AS (SELECT doc_id, pos, sum(brk) OVER
                 (PARTITION BY doc_id ORDER BY pos) AS island FROM B),
          S AS (SELECT doc_id, island, CAST(min(pos) AS BIGINT) AS s,
                 CAST(max(pos) + 4 AS BIGINT) AS e FROM I GROUP BY doc_id, island),
          V AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM S),
          TK AS (SELECT doc_id, unnest(tko) AS tok,
                  generate_subscripts(tko, 1) - 1 AS pos
                 FROM (SELECT doc_id, ${toks("text")} AS tko FROM documents)),
          K AS (SELECT t.doc_id, t.pos, t.tok FROM TK t
                LEFT JOIN V v ON v.doc_id = t.doc_id AND v.pos = t.pos
                WHERE v.pos IS NULL),
          RB AS (SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS text_clean,
                  CAST(count(*) AS BIGINT) AS n_kept FROM K GROUP BY doc_id),
          N AS (SELECT doc_id, CAST(len(${toks("text")}) AS BIGINT) AS n_tokens
                FROM documents)
          SELECT n.doc_id, coalesce(rb.text_clean, '') AS text_clean, n.n_tokens,
            n.n_tokens - coalesce(rb.n_kept, 0) AS n_removed
          FROM N n LEFT JOIN RB rb USING (doc_id) ORDER BY n.doc_id""",

    // fixed-N per-stratum head: rank by (60-bit md5, key string) per
    // source, keep the first 5
    "q106_stratified_head" ->
      s"""SELECT doc_id, source, pick_rank FROM (
            SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source
              ORDER BY ${md5long("cast(doc_id as varchar)")},
                cast(doc_id as varchar)) AS BIGINT) AS pick_rank
            FROM documents WHERE source IS NOT NULL)
          WHERE pick_rank <= 5 ORDER BY source, pick_rank""",

    // per-source dataset-card numbers; median length via quantile_cont
    // (the q39 parity) in 1e6 fixed point
    "q107_corpus_health" -> {
      val tc = s"CAST(len(${toks("text")}) AS BIGINT)"
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
            CAST(sum($tc) AS BIGINT) AS sum_tokens,
            CAST(floor(quantile_cont($tc, 0.5) * 1000000) AS BIGINT) AS p50_tokens_1e6
          FROM documents GROUP BY source ORDER BY source"""
    },

    // deterministic sharding: shard = 60-bit md5 mod 8, position =
    // rank by (hash, key string) within the shard
    "q108_shard_layout" ->
      s"""SELECT doc_id, shard_id,
            CAST(row_number() OVER (PARTITION BY shard_id
              ORDER BY h, cast(doc_id as varchar)) AS BIGINT) AS shard_pos
          FROM (SELECT doc_id,
                  ${md5long("cast(doc_id as varchar)")} % 8 AS shard_id,
                  ${md5long("cast(doc_id as varchar)")} AS h
                FROM documents)
          ORDER BY shard_id, shard_pos""",

    // sorted batching: per-shard rank by (ntok desc, hash, key),
    // batches of 32, per-batch padding = max·n − sum
    "q109_length_batches" ->
      s"""WITH D AS (SELECT doc_id,
                  CAST(len(${toks("text")}) AS BIGINT) AS ntok,
                  ${md5long("cast(doc_id as varchar)")} AS h
                FROM documents),
          A AS (SELECT ntok, h % 4 AS shard,
                  CAST(row_number() OVER (PARTITION BY h % 4
                    ORDER BY ntok DESC, h, cast(doc_id as varchar)) AS BIGINT) AS rk
                FROM D)
          SELECT shard, (rk - 1) // 32 AS batch_no,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(max(ntok) AS BIGINT) AS max_tok,
            CAST(sum(ntok) AS BIGINT) AS sum_tok,
            CAST(max(ntok) * count(*) - sum(ntok) AS BIGINT) AS pad_tokens
          FROM A GROUP BY shard, batch_no ORDER BY shard, batch_no""",

    // Zipf head: top-50 terms by (count desc, term), shares and
    // bounded cumulative shares in 1e9 fixed point
    "q110_vocab_report" ->
      s"""WITH T AS (SELECT unnest(${toks("lower(text)")}) AS term FROM documents),
          C AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM T GROUP BY term),
          TOT AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM C),
          K AS (SELECT term, n,
                  CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank,
                  CAST(sum(n) OVER (ORDER BY n DESC, term
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                FROM C ORDER BY n DESC, term LIMIT 50)
          SELECT rank, term, n, n * 1000000000 // total AS share_1e9,
            cum * 1000000000 // total AS cum_share_1e9
          FROM K CROSS JOIN TOT ORDER BY rank""",

    // leakage-free split: q50's CASE labels, then train docs sharing
    // >= 1 distinct 3-gram with the val/test side -> 'quarantined'
    "q111_decontaminated_split" -> {
      val splits = graft.operators.Sampling.DemoSplits
      val uppers = splits.scanLeft(0L)(_ + _._2).tail
      val whens = splits.zip(uppers).init
        .map { case ((l, _), u) => s"WHEN b < $u THEN '$l'" }.mkString(" ")
      s"""WITH L AS (SELECT doc_id, text,
                  CASE WHEN b IS NULL THEN NULL $whens
                       ELSE '${splits.last._1}' END AS split
                FROM (SELECT doc_id, text,
                       (${md5long("cast(doc_id as varchar)")} % 1000000) AS b
                      FROM documents)),
          HG AS (SELECT DISTINCT unnest(${shingles3("text")}) AS gram
                 FROM L WHERE split <> 'train'),
          TG AS (SELECT doc_id, unnest(${shingles3("text")}) AS gram
                 FROM L WHERE split = 'train'),
          C AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
                FROM TG JOIN HG USING (gram) GROUP BY doc_id)
          SELECT l.doc_id,
            CASE WHEN c.doc_id IS NOT NULL THEN 'quarantined' ELSE l.split END AS split,
            coalesce(c.n_shared, 0) AS n_shared
          FROM L l LEFT JOIN C c USING (doc_id) ORDER BY l.doc_id"""
    },

    // cluster-balanced sampling: q49's k-means cells (shared CTEs),
    // uniform div/mod shares in cell order, q61's rate math + md5 gate
    "q112_cluster_balance" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 1)},
          CNT AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM CC GROUP BY cid),
          M AS (SELECT CAST(count(*) AS BIGINT) AS m FROM CNT),
          SH AS (SELECT cid, n,
                  1000000 // m + (CASE WHEN row_number() OVER (ORDER BY cid)
                    <= 1000000 % m THEN 1 ELSE 0 END) AS s_ppm
                 FROM CNT CROSS JOIN M),
          T AS (SELECT min(n * 1000000 // s_ppm) AS t FROM SH),
          R AS (SELECT cid, CAST(s_ppm * t // n AS BIGINT) AS rate_ppm
                FROM SH CROSS JOIN T)
          SELECT c.id, c.cid, r.rate_ppm
          FROM CC c JOIN R USING (cid)
          WHERE (${md5long("cast(c.id as varchar)")} % 1000000) < r.rate_ppm
          ORDER BY c.id""",

    // DSIR: add-one-smoothed exact floor-log2 likelihood ratio,
    // target = short-doc slice, + the size normalizer per token
    "q105_dsir_weights" ->
      s"""WITH $dsirCtes
          SELECT id, n_tokens, dsir_bits, avg_dsir_1e6
          FROM DS ORDER BY id""",

    // DSIR selection: q113 = the q105 score chain + a quantile_cont
    // [p25, p100] band (top quartile, threshold ties keep)
    "q113_dsir_select" ->
      s"""WITH $dsirCtes,
          TH AS (SELECT quantile_cont(avg_dsir_1e6, 0.75) AS lo,
                  quantile_cont(avg_dsir_1e6, 1.0) AS hi FROM DS)
          SELECT id, n_tokens, dsir_bits, avg_dsir_1e6
          FROM DS CROSS JOIN TH
          WHERE avg_dsir_1e6 >= lo AND avg_dsir_1e6 <= hi
          ORDER BY id""",

    // winnowing: min gram-hash per w-window, rightmost tie — ONE
    // window min over enc = h·2^20 + (2^20−1−pos), full windows only
    "q103_winnowing" ->
      s"""WITH TH AS (SELECT doc_id, ${tokenHashExpr("text")} AS th FROM documents),
          HS AS (SELECT doc_id, $gramFromTh AS hs FROM TH),
          G AS (SELECT doc_id, unnest(hs) AS h,
                 generate_subscripts(hs, 1) - 1 AS pos FROM HS),
          N AS (SELECT doc_id, len(hs) AS n FROM HS),
          E AS (SELECT doc_id, pos, h * 1048576 + (1048575 - pos) AS enc FROM G),
          W AS (SELECT doc_id, pos, min(enc) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel FROM E),
          F AS (SELECT DISTINCT w.doc_id, sel FROM W w JOIN N USING (doc_id)
                WHERE pos <= n - 4)
          SELECT doc_id, sel // 1048576 AS fp_hash,
            1048575 - (sel % 1048576) AS fp_pos
          FROM F ORDER BY doc_id, fp_pos""",

    // winnowing pairs: the q103 chain deduped to (doc, hash), hash
    // self-join with id_a < id_b, distinct-shared-fingerprint count
    "q104_winnowing_pairs" ->
      s"""WITH TH AS (SELECT doc_id, ${tokenHashExpr("text")} AS th FROM documents),
          HS AS (SELECT doc_id, $gramFromTh AS hs FROM TH),
          G AS (SELECT doc_id, unnest(hs) AS h,
                 generate_subscripts(hs, 1) - 1 AS pos FROM HS),
          N AS (SELECT doc_id, len(hs) AS n FROM HS),
          E AS (SELECT doc_id, pos, h * 1048576 + (1048575 - pos) AS enc FROM G),
          W AS (SELECT doc_id, pos, min(enc) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel FROM E),
          F AS (SELECT DISTINCT w.doc_id, sel // 1048576 AS fp_hash
                FROM W w JOIN N USING (doc_id) WHERE pos <= n - 4),
          FD AS (SELECT fp_hash FROM F GROUP BY fp_hash HAVING count(*) <= 50),
          F2 AS (SELECT f.* FROM F f JOIN FD USING (fp_hash))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(count(*) AS BIGINT) AS n_shared
          FROM F2 a JOIN F2 b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3
          ORDER BY id_a, id_b""",

    // phrase search: positional base-votes (token at pos p matching
    // slot j votes for start p−j; full distinct-slot coverage = match)
    // from a VALUES slot table generated from TextSearch.DemoPhrases
    "q102_phrase_search" -> {
      val slots = graft.operators.TextSearch.DemoPhrases.flatMap { p =>
        val ts = p.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        ts.zipWithIndex.map { case (t, j) => s"('$p', $j, '$t', ${ts.length})" }
      }.mkString(", ")
      s"""WITH PH AS (SELECT * FROM (VALUES $slots) AS t(phrase, j, term, m)),
          T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          TK AS (SELECT doc_id, unnest(tk) AS term,
                  generate_subscripts(tk, 1) - 1 AS pos FROM T),
          V AS (SELECT ph.phrase, tk.doc_id, tk.pos - ph.j AS base,
                 count(DISTINCT ph.j) AS hits, min(ph.m) AS m
                FROM TK tk JOIN PH ph USING (term)
                GROUP BY ph.phrase, tk.doc_id, tk.pos - ph.j),
          G AS (SELECT phrase, doc_id, base FROM V WHERE hits = m)
          SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_matches,
            CAST(min(base) AS BIGINT) AS first_pos
          FROM G GROUP BY phrase, doc_id ORDER BY phrase, doc_id"""
    },

    // incremental dedup replay: first occurrence per content hash with
    // batch priority (batch asc, then doc_id asc) — one window over
    // the two-batch union replays the whole ingest history
    "q94_incremental_dedup" ->
      """WITH D AS (SELECT doc_id, md5(text) AS h,
                 CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS batch_no
                FROM documents),
          R AS (SELECT h, doc_id, batch_no, row_number() OVER
                 (PARTITION BY h ORDER BY batch_no, doc_id) AS rn FROM D)
          SELECT h, doc_id, batch_no FROM R WHERE rn = 1 ORDER BY h""",

    // stateless contamination gate: per-doc flag = any shared gram
    // with the eval slice's gram list (the q95 expression-literal gate)
    "q95_contamination_gate" ->
      s"""WITH ${benchGramsCte()},
          GL AS (SELECT list(gram ORDER BY gram) AS gs FROM BG)
          SELECT doc_id,
            CAST(CASE WHEN list_has_any(${shingles3("text")}, gl.gs)
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
          FROM documents CROSS JOIN GL gl
          WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)
          ORDER BY doc_id""",

    // adaptive-k semantic dedup: q86's derivation, but the seed count
    // comes from the corpus itself — k = clamp(floor(sqrt(n)), 8,
    // 4096), the same formula as Dedup.suggestSemanticCells (exact:
    // IEEE sqrt is correctly rounded and perfect squares < 2^52 are
    // exact doubles). The k-means round/assign CTEs are structurally
    // k-free, so only the seed CTE changes
    "q93_semantic_adaptive" ->
      s"""WITH RECURSIVE C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          KP AS (SELECT CAST(least(4096, greatest(8,
                   floor(sqrt(count(*)::DOUBLE)))) AS BIGINT) AS k FROM C),
          S0 AS (SELECT rn - 1 AS cid, emb AS cemb FROM
                 (SELECT row_number() OVER (ORDER BY id) AS rn, emb FROM C)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfRound("S0", "A1", "P1", "M1", "S1")},
          ${ivfRound("S1", "A2", "P2", "M2", "S2")},
          ${ivfAssignCte("C", "S2", "CC", 1)},
          SPAIRS AS (SELECT a.id AS id_a, b.id AS id_b
                 FROM CC a JOIN CC b ON a.cid = b.cid AND a.id < b.id
                 WHERE ${scoreFixedSql("a.emb", "b.emb")} >= 950000),
          SEDGES AS (SELECT id_a AS src, id_b AS dst FROM SPAIRS
                 UNION SELECT id_b, id_a FROM SPAIRS),
          SREACH(node, r) AS (
            SELECT src, src FROM SEDGES
            UNION
            SELECT e.dst, r.r FROM SREACH r JOIN SEDGES e ON e.src = r.node),
          SCOMP AS (SELECT node AS id, min(r) AS rep FROM SREACH GROUP BY node)
          SELECT c.id, coalesce(p.rep, c.id) AS rep_id,
            CAST(CASE WHEN coalesce(p.rep, c.id) = c.id THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM C c LEFT JOIN SCOMP p USING (id) ORDER BY c.id""",

    // span-level contamination report: q55's gram join plus per-doc
    // distinct-gram totals (len of the distinct shingle list — no
    // second explode) and the lexicographic-min shared gram
    "q91_contamination_report" ->
      s"""WITH ${benchGramsCte()},
          C AS (SELECT doc_id, unnest(${shingles3("text")}) AS gram
               FROM documents WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)),
          T AS (SELECT doc_id, CAST(len(${shingles3("text")}) AS BIGINT) AS n_grams
               FROM documents WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)),
          S AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared,
                 min(gram) AS first_gram
                FROM C JOIN BG USING (gram) GROUP BY doc_id)
          SELECT s.doc_id, t.n_grams, s.n_shared,
            (s.n_shared * 1000000) // t.n_grams AS share_1e6, s.first_gram
          FROM S s JOIN T t USING (doc_id) ORDER BY s.doc_id""",

    // pairwise source overlap: distinct (gram, source), gram-keyed
    // self-join with source_a < source_b, counted per pair
    "q92_source_overlap" ->
      s"""WITH GS AS (SELECT DISTINCT gram, source FROM
                (SELECT unnest(${shingles3("text")}) AS gram, source FROM documents))
          SELECT a.source AS source_a, b.source AS source_b,
            CAST(count(*) AS BIGINT) AS n_shared_grams
          FROM GS a JOIN GS b ON a.gram = b.gram AND a.source < b.source
          GROUP BY a.source, b.source ORDER BY source_a, source_b""",

    // temperature-flattened mixture sampling: α=0.5 source weights
    // (exact floor(sqrt) of the counts), all-BIGINT rate derivation,
    // md5-ppm membership — the q48 hash filter with DATA-derived rates
    "q89_temperature_sample" ->
      s"""WITH N AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                FROM documents GROUP BY source),
          W AS (SELECT source, n, CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS w FROM N),
          SW AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM W),
          R AS (SELECT source,
                 least(1000000, (200 * 1000000 * w) // (sw * n)) AS rate_ppm
                FROM W CROSS JOIN SW)
          SELECT d.doc_id, d.source, CAST(r.rate_ppm AS BIGINT) AS rate_ppm
          FROM documents d JOIN R r USING (source)
          WHERE (${md5long("cast(doc_id as varchar)")} % 1000000) < r.rate_ppm
          ORDER BY d.doc_id""",

    // bigram surprisal: adjacent-pair stream, unigram/bigram counts,
    // exact binary-digit-count log2s — same arithmetic as the Spark
    // TextAnalysis.bigramSurprisal plan
    "q90_bigram_surprisal" ->
      s"""WITH B AS (SELECT doc_id, tk FROM
                (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents)
                WHERE len(tk) >= 2),
          UC AS (SELECT l, CAST(count(*) AS BIGINT) AS cu FROM
                (SELECT unnest(tk) AS l FROM B) GROUP BY l),
          P AS (SELECT doc_id, tk[i+1] AS l, tk[i+1] || ' ' || tk[i+2] AS bg
                FROM (SELECT doc_id, tk, unnest(range(len(tk)-1)) AS i FROM B)),
          BC AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM P GROUP BY bg),
          SC AS (SELECT p.doc_id,
                  CAST(length(bin(uc.cu)) - length(bin(bc.cb)) AS BIGINT) AS s
                 FROM P p JOIN BC bc USING (bg) JOIN UC uc USING (l))
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
            CAST(sum(s) AS BIGINT) AS surprisal_bits,
            (CAST(sum(s) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS avg_surprisal_1e6
          FROM SC GROUP BY doc_id ORDER BY doc_id""",

    // feature hashing: md5-long token hash, low 6 bits = bucket, bit 6
    // = sign, zero-sum buckets dropped
    "q130_hashed_tf" ->
      s"""WITH E AS (SELECT doc_id, unnest(${toks("lower(text)")}) AS term FROM documents),
          H AS (SELECT doc_id, ${md5long("term")} AS h FROM E)
          SELECT doc_id, (h & 63) AS bucket,
            CAST(sum(CASE WHEN ((h >> 6) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS weight
          FROM H GROUP BY doc_id, bucket
          HAVING sum(CASE WHEN ((h >> 6) & 1) = 1 THEN 1 ELSE -1 END) <> 0
          ORDER BY doc_id, bucket""",

    // CCNet buckets: q88's surprisal chain, q122's per-source min-rank
    // percentile math, exact integer tertile compares
    "q129_ccnet_buckets" ->
      s"""WITH E AS (SELECT doc_id, unnest(${toks("lower(text)")}) AS term FROM documents),
          CW AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM E GROUP BY term),
          NT AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM CW),
          SC AS (SELECT e.doc_id, CAST(length(bin(nt.n)) - length(bin(cw.c)) AS BIGINT) AS s
                 FROM E e JOIN CW cw USING (term) CROSS JOIN NT nt),
          SUR AS (SELECT doc_id,
                 (CAST(sum(s) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS avg_surprisal_1e6
                FROM SC GROUP BY doc_id),
          B AS (SELECT d.doc_id, d.source, u.avg_surprisal_1e6
                FROM documents d JOIN SUR u USING (doc_id)
                WHERE d.source IS NOT NULL),
          R AS (SELECT doc_id, source, avg_surprisal_1e6,
                 CAST(rank() OVER (PARTITION BY source
                   ORDER BY avg_surprisal_1e6) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
                FROM B),
          P AS (SELECT doc_id, source, avg_surprisal_1e6,
                 CAST(CASE WHEN n <= 1 THEN 0
                      ELSE (rk - 1) * 1000000 // (n - 1) END AS BIGINT) AS pct_1e6
                FROM R)
          SELECT doc_id, source, avg_surprisal_1e6, pct_1e6,
            CASE WHEN pct_1e6 * 3 < 1000000 THEN 'head'
                 WHEN pct_1e6 * 3 < 2000000 THEN 'middle'
                 ELSE 'tail' END AS bucket
          FROM P ORDER BY doc_id""",

    // MMR re-rank: brute-force top-6 candidates (q21 shape), pairwise
    // candidate sims, then 3 unrolled greedy rounds — margin = rel −
    // max(sim to picked), rank window (m DESC, nid) per round
    "q133_mmr_rerank" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          Q AS (SELECT id, emb FROM C WHERE id % 200 = 0 AND id < 2000),
          SC AS (SELECT q.id AS query_id, c.id AS nid,
                  ${scoreFixedSql("q.emb", "c.emb")} AS rel, c.emb AS cemb
                 FROM C c JOIN Q q ON q.id <> c.id),
          CAND AS (SELECT query_id, nid, rel, cemb FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY rel DESC, nid) AS rn FROM SC) WHERE rn <= 6),
          SIM AS (SELECT x.query_id, x.nid AS a, y.nid AS b,
                  ${scoreFixedSql("x.cemb", "y.cemb")} AS sim
                 FROM CAND x JOIN CAND y
                   ON x.query_id = y.query_id AND x.nid <> y.nid),
          S1 AS (SELECT query_id, nid, rel AS m FROM (
                 SELECT query_id, nid, rel, row_number() OVER (PARTITION BY query_id
                   ORDER BY rel DESC, nid) AS rn FROM CAND) WHERE rn = 1),
          M2 AS (SELECT c.query_id, c.nid, c.rel - max(s.sim) AS m
                 FROM CAND c
                 JOIN S1 p ON p.query_id = c.query_id AND p.nid <> c.nid
                 JOIN SIM s ON s.query_id = c.query_id AND s.a = c.nid AND s.b = p.nid
                 GROUP BY c.query_id, c.nid, c.rel),
          S2 AS (SELECT query_id, nid, m FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY m DESC, nid) AS rn FROM M2) WHERE rn = 1),
          S12 AS (SELECT query_id, nid FROM S1
                  UNION ALL SELECT query_id, nid FROM S2),
          M3 AS (SELECT c.query_id, c.nid, c.rel - max(s.sim) AS m
                 FROM CAND c
                 JOIN S12 p ON p.query_id = c.query_id
                 JOIN SIM s ON s.query_id = c.query_id AND s.a = c.nid AND s.b = p.nid
                 WHERE NOT EXISTS (SELECT 1 FROM S12 w
                   WHERE w.query_id = c.query_id AND w.nid = c.nid)
                 GROUP BY c.query_id, c.nid, c.rel),
          S3 AS (SELECT query_id, nid, m FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY m DESC, nid) AS rn FROM M3) WHERE rn = 1)
          SELECT query_id, CAST(pick_no AS BIGINT) AS pick_no,
            nid AS neighbor_id, CAST(m AS BIGINT) AS mmr_1e6 FROM (
            SELECT query_id, 1 AS pick_no, nid, m FROM S1
            UNION ALL SELECT query_id, 2, nid, m FROM S2
            UNION ALL SELECT query_id, 3, nid, m FROM S3)
          ORDER BY query_id, pick_no""",

    // cluster cohesion: q49's coarse-quantizer chain (identical CTEs),
    // then per-cell mean/min member-to-own-centroid fixed cosine; the
    // mean is offset-positive floor division so // and DIV agree for
    // negative score sums
    "q128_cluster_cohesion" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 2)},
          SC AS (SELECT c.cid, ${scoreFixedSafeSql("c.emb", "s.cemb")} AS s
                 FROM CC c JOIN S2 s USING (cid))
          SELECT CAST(cid AS BIGINT) AS cid,
            CAST(count(*) AS BIGINT) AS n,
            (CAST(sum(s) AS BIGINT) + CAST(count(*) AS BIGINT) * 1000000)
              // CAST(count(*) AS BIGINT) - 1000000 AS avg_cos_1e6,
            CAST(min(s) AS BIGINT) AS min_cos_1e6
          FROM SC GROUP BY cid ORDER BY cid""",

    // gate-attrition funnel: first-fail attribution over the q44/q57
    // gate stack — dedup keepers + clusters (q44 CTEs), gates (G),
    // repetition (q56), contamination (q57 eval slice), one CASE
    "q127_gate_attrition" ->
      s"""WITH RECURSIVE $dedupClusterCtes,
          ${gateCtes("documents")},
          ${benchGramsCte()},
          CONTAM AS (SELECT DISTINCT d.doc_id
                 FROM (SELECT doc_id, unnest(${shingles3("text")}) AS gram
                       FROM documents) d
                 JOIN BG USING (gram)),
          REP AS (SELECT doc_id, ${repFixedSql("g")} AS rep_1e6
              FROM (SELECT doc_id, ${rawShingles3("text")} AS g FROM documents)),
          V AS (SELECT d.doc_id,
                 CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM KEEP) THEN '1_exact_dup'
                      WHEN d.doc_id IN (SELECT node FROM CL WHERE node <> cluster_id) THEN '2_near_dup'
                      WHEN g.quality_1e6 < 600000 THEN '3_quality'
                      WHEN g.predicted_lang <> 'en' THEN '4_language'
                      WHEN r.rep_1e6 >= 500000 THEN '5_repetition'
                      WHEN d.doc_id IN (SELECT doc_id FROM CONTAM) THEN '6_contaminated'
                      ELSE '7_pass' END AS gate
                FROM documents d JOIN G g USING (doc_id) JOIN REP r USING (doc_id)),
          T AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
          SELECT gate, CAST(count(*) AS BIGINT) AS n_docs,
            (CAST(count(*) AS BIGINT) * 1000000) // t.total AS share_1e6
          FROM V CROSS JOIN T t GROUP BY gate, t.total ORDER BY gate""",

    // Markov transitions: lead() over (epoch µs, event_id) per user,
    // exact fixed-point row probabilities
    "q137_markov_matrix" ->
      """WITH E AS (SELECT user_id, event_type, event_id,
                epoch_us(ts) AS ts_us FROM events),
          P AS (SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id) AS to_type FROM E),
          C AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
                FROM P WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
          T AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
                FROM C GROUP BY from_type)
          SELECT c.from_type, c.to_type, c.n,
            (c.n * 1000000) // t.t AS p_1e6
          FROM C c JOIN T t USING (from_type)
          ORDER BY from_type, to_type""",

    // per-user cap: row_number over (id-hash DESC, id) per user — the
    // direct window formulation of the engine's bounded TopKPairs
    "q138_user_cap" ->
      s"""SELECT user_id, CAST(rn AS BIGINT) AS keep_rank, event_id FROM (
            SELECT user_id, event_id,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ${md5long("cast(event_id as varchar)")} DESC, event_id) AS rn
            FROM events)
          WHERE rn <= 20 ORDER BY user_id, keep_rank""",

    // rolling 7-day actives: dedup (user, day), window via BETWEEN
    // range join, exact distinct counts per observed day
    "q139_rolling_active" ->
      """WITH E AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         A AS (SELECT DISTINCT user_id, day FROM E),
         D AS (SELECT DISTINCT day FROM A),
         DAU AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
                 FROM A GROUP BY day),
         R AS (SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS rolling_active
               FROM D d JOIN A a ON a.day BETWEEN d.day - 6 AND d.day
               GROUP BY d.day)
         SELECT dau.day, dau.dau, r.rolling_active
         FROM DAU dau JOIN R r ON r.day = dau.day
         ORDER BY dau.day""",

    // curriculum ordinal: the operator's realized global order
    // (bin, shard, hash, id) as one row_number — the independent
    // formulation of the sharded prefix-sum plan
    "q140_curriculum" ->
      s"""WITH B AS (SELECT doc_id,
            CAST(length(bin(coalesce(n_chars, 0))) AS BIGINT) AS len_bits,
            ${md5long("cast(doc_id as varchar)")} AS h
          FROM documents)
          SELECT doc_id, len_bits,
            CAST(row_number() OVER (ORDER BY len_bits, h % 8, h, doc_id)
                 AS BIGINT) AS ordinal
          FROM B ORDER BY ordinal""",

    // last-click attribution: interval LEFT JOIN + rank tail, NULLs
    // kept for unattributed purchases — the stream-stream join's
    // batch-twin oracle
    "q141_attribution" ->
      """WITH C AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
                    FROM events WHERE event_type = 'click'),
         P AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
               FROM events WHERE event_type = 'purchase'),
         J AS (SELECT p.user_id, p.purchase_id, p.pus, c.click_id, c.cus
               FROM P p LEFT JOIN C c ON c.user_id = p.user_id
                 AND c.cus <= p.pus AND c.cus >= p.pus - 1800000000),
         R AS (SELECT *, row_number() OVER (PARTITION BY purchase_id
                 ORDER BY cus DESC NULLS LAST, click_id DESC NULLS LAST) AS rn
               FROM J)
         SELECT user_id, purchase_id, pus AS purchase_us, click_id,
           cus AS click_us
         FROM R WHERE rn = 1 ORDER BY purchase_id""",

    // PageRank over the q18 LSH pair graph: the operator's three
    // supersteps unrolled — out = pr // deg, pr' = 150000 +
    // (850000 * in) // 1e6, all-integer so the replay is exact
    "q142_pagerank" -> {
      val step = (i: Int) =>
        s"""I$i AS (SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS m
               FROM E e JOIN P${i - 1} p ON p.node = e.src
               JOIN D d ON d.src = e.src
               GROUP BY e.dst),
           P$i AS (SELECT node, 150000 + (850000 * m) // 1000000 AS pr FROM I$i)"""
      s"""WITH ${lshPairCtes("documents")},
          E AS (SELECT id_a AS src, id_b AS dst FROM PAIRS
                UNION SELECT id_b, id_a FROM PAIRS),
          D AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM E GROUP BY src),
          P0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM D),
          ${(1 to 3).map(step).mkString(",\n")}
          SELECT node AS doc_id, pr AS pr_1e6 FROM P3 ORDER BY doc_id"""
    },

    // day-over-day event-mix drift: q135's smoothed-KL bits idiom
    // joined to the consecutive day only
    "q143_event_drift" ->
      """WITH E AS (SELECT epoch_us(ts) // 86400000000 AS bucket, event_type AS cat
                    FROM events),
         CNT AS (SELECT bucket, cat, CAST(count(*) AS BIGINT) AS c
                 FROM E GROUP BY bucket, cat),
         TOT AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n FROM CNT GROUP BY bucket),
         V AS (SELECT CAST(count(DISTINCT cat) AS BIGINT) AS v FROM CNT),
         X AS (SELECT a.bucket, ta.n AS na, tb.n AS nb, a.c AS ca,
                coalesce(b.c, 0) AS cb, vv.v
               FROM CNT a
               JOIN TOT ta ON ta.bucket = a.bucket
               JOIN TOT tb ON tb.bucket = a.bucket - 1
               LEFT JOIN CNT b ON b.bucket = a.bucket - 1 AND b.cat = a.cat
               CROSS JOIN V vv),
         K AS (SELECT bucket, na,
                CAST(sum(ca * ((length(bin(nb + v)) - length(bin(cb + 1)))
                      - (length(bin(na + v)) - length(bin(ca + 1))))) AS BIGINT) AS num
               FROM X GROUP BY bucket, na)
         SELECT bucket AS day, ((num + 63 * na) * 1000) // na - 63000 AS kl_mbits
         FROM K ORDER BY day""",

    // source-centroid cosine matrix: per-source integer-sum means
    // (the ivfRound discipline), list rebuilt in pos order, pairwise
    // cosine over |S| rows
    "q144_source_centroids" ->
      s"""WITH J AS (SELECT d.source, e.embedding AS emb
                     FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
          P AS (SELECT source, unnest(range(len(emb))) AS pos, emb FROM J),
          M AS (SELECT source, pos,
                 (sum(cast(floor(emb[pos+1]::DOUBLE * 1048576.0) as bigint))::DOUBLE
                   / count(*)::DOUBLE) / 1048576.0 AS mv
                FROM P GROUP BY source, pos),
          CENT AS (SELECT source, list(mv ORDER BY pos) AS cent FROM M GROUP BY source)
          SELECT a.source AS source_a, b.source AS source_b,
            ${scoreFixedSql("a.cent", "b.cent")} AS cos_1e6
          FROM CENT a JOIN CENT b ON a.source < b.source
          ORDER BY source_a, source_b""",

    // mutual-best linkage: brute-force the small slices (blocking is
    // recall-complete at maxDist 2 — the q76 pigeonhole contract),
    // then both argmaxes as rank-1 windows
    "q145_mutual_best" ->
      """WITH L AS (SELECT c_custkey AS id, lower(trim(c_name)) AS nm
                    FROM customer WHERE c_custkey % 31 = 0 AND c_custkey < 7500),
         R AS (SELECT c_custkey AS id, lower(trim(c_name)) AS nm
               FROM customer WHERE c_custkey % 17 = 0 AND c_custkey < 7500),
         P AS (SELECT l.id AS id_l, r.id AS id_r,
                CAST(levenshtein(l.nm, r.nm) AS BIGINT) AS dist
               FROM L l JOIN R r ON levenshtein(l.nm, r.nm) <= 2),
         BL AS (SELECT id_l, id_r, dist FROM (
                 SELECT *, row_number() OVER (PARTITION BY id_l
                   ORDER BY dist, id_r) AS rn FROM P) WHERE rn = 1),
         BR AS (SELECT id_l, id_r FROM (
                 SELECT *, row_number() OVER (PARTITION BY id_r
                   ORDER BY dist, id_l) AS rn FROM P) WHERE rn = 1)
         SELECT bl.id_l, bl.id_r, bl.dist
         FROM BL bl JOIN BR br ON br.id_l = bl.id_l AND br.id_r = bl.id_r
         ORDER BY bl.id_l""",

    // exact-quota stratified split: stratum rank over the operator's
    // realized (shard, hash, id) order vs floor(n_s·ppm/1e6)
    "q146_quota_split" ->
      s"""WITH B AS (SELECT doc_id, source,
            ${md5long("cast(doc_id as varchar)")} AS h
          FROM documents),
          R AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                   ORDER BY h % 8, h, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
                FROM B)
          SELECT doc_id, source, (rn <= (n * 100000) // 1000000) AS heldout
          FROM R ORDER BY doc_id""",

    // eval-coverage: q55's gram machinery flipped — per eval doc, the
    // share of its distinct shingles present anywhere in the corpus
    "q147_eval_coverage" ->
      s"""WITH EG AS (SELECT doc_id AS eval_id, unnest(${shingles3("text")}) AS gram
                      FROM documents WHERE doc_id % 97 = 0 AND doc_id < 5000),
          M AS (SELECT DISTINCT c.gram
                FROM (SELECT unnest(${shingles3("text")}) AS gram FROM documents
                      WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)) c
                JOIN (SELECT DISTINCT gram FROM EG) g ON g.gram = c.gram),
          T AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_grams
                FROM EG GROUP BY eval_id),
          V AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_covered
                FROM EG JOIN M USING (gram) GROUP BY eval_id)
          SELECT t.eval_id, t.n_grams, coalesce(v.n_covered, 0) AS n_covered,
            CASE WHEN t.n_grams = 0 THEN 0
                 ELSE (coalesce(v.n_covered, 0) * 1000000) // t.n_grams
            END AS share_1e6
          FROM T t LEFT JOIN V v ON v.eval_id = t.eval_id
          ORDER BY t.eval_id""",

    // Gopher rule gate: every rule an integer comparison; tokenizer,
    // line split, and replace-based occurrence counts mirror the Spark
    // expressions exactly
    "q148_gopher_rules" ->
      s"""WITH B AS (SELECT doc_id, coalesce(text, '') AS tx,
                 ${toks("text")} AS tk,
                 string_split(coalesce(text, ''), chr(10)) AS ln
               FROM documents),
          C AS (SELECT doc_id,
                 CAST(len(tk) AS BIGINT) AS n_words,
                 CAST(coalesce(list_sum(list_transform(tk, t -> length(t))), 0)
                   AS BIGINT) AS word_chars,
                 CAST(len(ln) AS BIGINT) AS n_lines,
                 CAST(len(list_filter(ln, l -> starts_with(l, '- ')
                   OR starts_with(l, '* '))) AS BIGINT) AS bullet_lines,
                 CAST(len(list_filter(ln, l -> ends_with(l, '...')))
                   AS BIGINT) AS ellipsis_lines,
                 CAST(length(tx) - length(replace(tx, '#', ''))
                   + (length(tx) - length(replace(tx, '...', ''))) // 3
                   AS BIGINT) AS n_symbols,
                 CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]')))
                   AS BIGINT) AS alpha_words,
                 CAST(len(list_intersect(list_transform(tk, t -> lower(t)),
                   ['the', 'a'])) AS BIGINT) AS stop_hits
                FROM B)
          SELECT doc_id, n_words,
            (n_words >= 40 AND n_words <= 120) AS ok_words,
            (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
              AS ok_mean_len,
            (10 * n_symbols <= n_words) AS ok_symbols,
            (10 * bullet_lines <= 9 * n_lines) AS ok_bullets,
            (10 * ellipsis_lines <= 3 * n_lines) AS ok_ellipsis,
            (5 * alpha_words >= 4 * n_words) AS ok_alpha,
            (stop_hits >= 2) AS ok_stops,
            ((n_words >= 40 AND n_words <= 120)
             AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
             AND (10 * n_symbols <= n_words)
             AND (10 * bullet_lines <= 9 * n_lines)
             AND (10 * ellipsis_lines <= 3 * n_lines)
             AND (5 * alpha_words >= 4 * n_words)
             AND (stop_hits >= 2)) AS pass
          FROM C ORDER BY doc_id""",

    // repeated n-gram report: word 6-grams in ≥2 docs, df + total
    // occurrences, top 20 (gram as the unique last sort key)
    "q149_repeated_ngrams" ->
      s"""WITH T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          G AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 5), i ->
                  array_to_string(tk[i+1:i+6], ' '))) AS gram
                FROM T WHERE len(tk) >= 6),
          D AS (SELECT gram, doc_id, CAST(count(*) AS BIGINT) AS c
                FROM G GROUP BY gram, doc_id)
          SELECT gram, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(c) AS BIGINT) AS n_occ
          FROM D GROUP BY gram HAVING count(*) >= 2
          ORDER BY n_docs DESC, n_occ DESC, gram LIMIT 20""",

    // priority sampling: rank = md5-hash DIV weight, k smallest win,
    // ties to smaller id — the weighted-without-replacement sample
    "q150_priority_sample" ->
      s"""WITH W AS (SELECT doc_id,
                 CAST(len(${toks("text")}) + 1 AS BIGINT) AS weight
               FROM documents),
          R AS (SELECT doc_id, weight,
                 ${md5long("cast(doc_id as varchar)")} // weight AS prio
                FROM W)
          SELECT doc_id, weight, prio,
            CAST(row_number() OVER (ORDER BY prio, doc_id) AS BIGINT) AS rank
          FROM R ORDER BY prio, doc_id LIMIT 25""",

    // daily anomaly flags: per-type daily counts, trailing 7-OBSERVED-
    // day integer z-test — (n·x−S)²·(n−1) > σ²·n·(n·Q−S²), all BIGINT
    "q151_daily_anomaly" ->
      """WITH D AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
          W AS (SELECT event_type, day, cnt,
                 CAST(count(*) OVER w AS BIGINT) AS n_prev,
                 CAST(coalesce(sum(cnt) OVER w, 0) AS BIGINT) AS s_prev,
                 CAST(coalesce(sum(cnt*cnt) OVER w, 0) AS BIGINT) AS q_prev
                FROM D WINDOW w AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
          SELECT event_type, day, cnt, n_prev,
            CAST((n_prev*cnt - s_prev)*(n_prev*cnt - s_prev)*(n_prev - 1)
              AS BIGINT) AS dev_sq,
            CAST(4*n_prev*(n_prev*q_prev - s_prev*s_prev) AS BIGINT) AS bound_sq,
            ((n_prev >= 4) AND
             ((n_prev*cnt - s_prev)*(n_prev*cnt - s_prev)*(n_prev - 1)
              > 4*n_prev*(n_prev*q_prev - s_prev*s_prev))) AS is_anomaly
          FROM W ORDER BY event_type, day""",

    // per-doc TF-IDF keywords, idf = bit-length log2 surrogate (exact
    // integer, same trick as q88's surprisal), top 3 per doc
    "q152_tfidf_keywords" ->
      s"""WITH T AS (SELECT doc_id, unnest(${toks("lower(text)")}) AS term
                FROM documents),
          TF AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                 FROM T GROUP BY 1, 2),
          DF AS (SELECT term, CAST(count(*) AS BIGINT) AS df_docs
                 FROM TF GROUP BY term),
          N AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          S AS (SELECT tf.doc_id, tf.term, tf.tf, df.df_docs,
                 CAST(tf.tf * (length(bin(n.n_docs)) - length(bin(df.df_docs)))
                   AS BIGINT) AS score
                FROM TF tf JOIN DF df USING (term) CROSS JOIN N n),
          R AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term) AS rank FROM S)
          SELECT doc_id, term, tf, df_docs, score, CAST(rank AS BIGINT) AS rank
          FROM R WHERE rank <= 3 ORDER BY doc_id, rank""",

    // corpus novelty curve: distinct vs first-seen word 3-grams per
    // 100-doc bucket, running distinct total, fixed-point novelty rate
    "q153_novelty_curve" ->
      s"""WITH G AS (SELECT doc_id AS id, unnest(${rawShingles3("text")}) AS gram
                FROM documents),
          PB AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_distinct
                 FROM (SELECT DISTINCT id // 100 AS bucket, gram FROM G)
                 GROUP BY bucket),
          FS AS (SELECT first_id // 100 AS bucket,
                  CAST(count(*) AS BIGINT) AS n_new
                 FROM (SELECT gram, min(id) AS first_id FROM G GROUP BY gram)
                 GROUP BY 1),
          J AS (SELECT pb.bucket, pb.n_distinct,
                 CAST(coalesce(fs.n_new, 0) AS BIGINT) AS n_new
                FROM PB pb LEFT JOIN FS fs USING (bucket))
          SELECT bucket, n_distinct, n_new,
            CAST(sum(n_new) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_grams,
            (n_new * 1000000) // n_distinct AS novelty_1e6
          FROM J ORDER BY bucket""",

    // PMI collocations over adjacent word pairs: fixed-point odds
    // ratio (c_ab·N·1e6) // (c_a·c_b), marginals from the same bigram
    // stream, min count 10, top 20
    "q154_pmi_collocations" ->
      s"""WITH T AS (SELECT ${toks("lower(text)")} AS tk FROM documents),
          G AS (SELECT unnest(list_transform(range(len(tk) - 1),
                  i -> tk[i+1] || ' ' || tk[i+2])) AS gram
                FROM T WHERE len(tk) >= 2),
          C AS (SELECT gram, CAST(count(*) AS BIGINT) AS c_ab
                FROM G GROUP BY gram),
          C2 AS (SELECT gram, c_ab, split_part(gram, ' ', 1) AS l,
                  split_part(gram, ' ', 2) AS r FROM C),
          N AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM C),
          L AS (SELECT l, CAST(sum(c_ab) AS BIGINT) AS c_l FROM C2 GROUP BY l),
          R AS (SELECT r, CAST(sum(c_ab) AS BIGINT) AS c_r FROM C2 GROUP BY r)
          SELECT c2.gram, c2.c_ab, lt.c_l, rt.c_r,
            (c2.c_ab * n.n_bi * 1000000) // (lt.c_l * rt.c_r) AS ratio_1e6
          FROM C2 c2 JOIN L lt USING (l) JOIN R rt USING (r) CROSS JOIN N n
          WHERE c2.c_ab >= 10
          ORDER BY ratio_1e6 DESC, gram LIMIT 20""",

    // ANN recall@3: bucketed top-3 (q22's plan) audited against the
    // brute-force top-3 (q21's plan), per query — shared tie order
    // (score desc, neighbor asc) makes the intersection exact
    "q155_ann_recall" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 6)} AS bucket FROM embeddings),
          Q AS (SELECT * FROM C WHERE id % 200 = 0 AND id < 2000),
          SE AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ${scoreFixedSql("q.emb", "c.emb")} AS score_1e6
                 FROM C c CROSS JOIN Q q WHERE q.id <> c.id),
          RE AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score_1e6 DESC, neighbor_id) AS rank FROM SE),
          E AS (SELECT query_id, neighbor_id FROM RE WHERE rank <= 3),
          SB AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ${scoreFixedSql("q.emb", "c.emb")} AS score_1e6
                 FROM C c JOIN Q q ON q.bucket = c.bucket AND q.id <> c.id),
          RB AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score_1e6 DESC, neighbor_id) AS rank FROM SB),
          A AS (SELECT query_id, neighbor_id FROM RB WHERE rank <= 3),
          H AS (SELECT e.query_id,
                 CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
                 CAST(count(*) AS BIGINT) AS n_exact
                FROM E e LEFT JOIN A a USING (query_id, neighbor_id)
                GROUP BY e.query_id)
          SELECT query_id, n_hits, (n_hits * 1000000) // n_exact AS recall_1e6
          FROM H ORDER BY query_id""",

    // user feature snapshot: q37's sessionization folded to one row
    // per user + spend cents + active days + watermark recency
    "q156_user_features" ->
      """WITH E AS (SELECT user_id, epoch_us(ts) AS ts_us, value,
                 event_type FROM events),
          L AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
                 ORDER BY ts_us) AS prev_us FROM E),
          N AS (SELECT *, CASE WHEN prev_us IS NULL
                 OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END
                 AS new_session FROM L),
          U AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_purchases,
                 CAST(sum(new_session) AS BIGINT) AS n_sessions,
                 CAST(count(DISTINCT ts_us // 86400000000) AS BIGINT)
                   AS active_days,
                 CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_c,
                 CAST(max(ts_us) AS BIGINT) AS last_us
                FROM N GROUP BY user_id),
          M AS (SELECT CAST(max(ts_us) AS BIGINT) AS mx_us FROM E)
          SELECT user_id, n_events, n_purchases, n_sessions, active_days,
            sum_value_c, last_us, (m.mx_us - last_us) // 86400000000
              AS recency_days
          FROM U CROSS JOIN M m ORDER BY user_id""",

    // token frequency spectrum: Zipf profile in log2 bands
    // (band = bitlen(term count)), type/occurrence mass + share
    "q157_freq_spectrum" ->
      s"""WITH T AS (SELECT unnest(${toks("lower(text)")}) AS term
                FROM documents),
          C AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM T
                GROUP BY term),
          B AS (SELECT CAST(length(bin(c)) AS BIGINT) AS band,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(c) AS BIGINT) AS n_tokens
                FROM C GROUP BY 1),
          TT AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM B)
          SELECT band, n_types, n_tokens,
            (n_tokens * 1000000) // tt.tot AS share_1e6
          FROM B CROSS JOIN TT tt ORDER BY band""",

    // cluster purity: q49's trained quantizer (identical CTE chain)
    // audited against the label column — majority label per cell,
    // ties to the lower label, fixed-point purity
    "q158_cell_purity" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 1)},
          J AS (SELECT cc.cid, e.label
                FROM CC cc JOIN (SELECT vec_id AS id, label FROM embeddings) e
                  USING (id)),
          G AS (SELECT CAST(cid AS BIGINT) AS cid, CAST(label AS BIGINT) AS label,
                 CAST(count(*) AS BIGINT) AS cnt FROM J GROUP BY 1, 2),
          R AS (SELECT *, row_number() OVER (PARTITION BY cid
                 ORDER BY cnt DESC, label) AS rn FROM G),
          T AS (SELECT cid, CAST(sum(cnt) AS BIGINT) AS n FROM G GROUP BY cid)
          SELECT t.cid, t.n, r.label AS major_label, r.cnt AS n_major,
            (r.cnt * 1000000) // t.n AS purity_1e6
          FROM T t JOIN R r USING (cid) WHERE r.rn = 1 ORDER BY t.cid""",

    // source token-mass Gini: per-source shares ranked (tokens asc,
    // source asc) + exact-integer Gini of the distribution
    "q159_source_gini" ->
      s"""WITH P AS (SELECT source,
                 CAST(sum(len(${toks("text")})) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source),
          R AS (SELECT source, n_tokens,
                 CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT)
                   AS rank
                FROM P),
          T AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS s,
                 CAST(sum(rank * n_tokens) AS BIGINT) AS srt,
                 CAST(count(*) AS BIGINT) AS n FROM R)
          SELECT r.source, r.n_tokens, r.rank,
            (r.n_tokens * 1000000) // t.s AS share_1e6,
            (2 * t.srt * 1000000 - (t.n + 1) * t.s * 1000000) // (t.n * t.s)
              AS gini_1e6
          FROM R r CROSS JOIN T t ORDER BY r.rank""",

    // audience overlap: exact per-type distincts + pairwise
    // intersections; the HLL flag is pinned 1 (q35 sketch-contract
    // style — the estimate is engine-specific, the bound must hold)
    "q160_audience_overlap" ->
      """WITH DU AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
          P AS (SELECT t, CAST(count(*) AS BIGINT) AS nd FROM DU GROUP BY t),
          B AS (SELECT a.t AS type_a, b.t AS type_b,
                 CAST(count(*) AS BIGINT) AS exact_both
                FROM DU a JOIN DU b ON a.u = b.u AND a.t < b.t
                GROUP BY 1, 2)
          SELECT pa.t AS type_a, pb.t AS type_b,
            pa.nd AS exact_a, pb.nd AS exact_b,
            CAST(coalesce(b.exact_both, 0) AS BIGINT) AS exact_both,
            CAST(1 AS BIGINT) AS est_ok
          FROM P pa JOIN P pb ON pa.t < pb.t
          LEFT JOIN B b ON b.type_a = pa.t AND b.type_b = pb.t
          ORDER BY type_a, type_b""",

    // Gram matrix over the first 8 dims: per-row floor(x_i·x_j·1e6)
    // summed as BIGINT — floor-before-sum, exact on both engines
    "q161_gram_matrix" ->
      """WITH E AS (SELECT embedding AS emb FROM embeddings),
          IJ AS (SELECT i.i, j.j
                 FROM generate_series(0, 7) AS i(i)
                 JOIN generate_series(0, 7) AS j(j) ON i.i <= j.j)
          SELECT CAST(ij.i AS BIGINT) AS i, CAST(ij.j AS BIGINT) AS j,
            CAST(sum(CAST(floor(e.emb[ij.i + 1]::DOUBLE
              * e.emb[ij.j + 1]::DOUBLE * 1000000.0) AS BIGINT)) AS BIGINT)
              AS sum_1e6,
            CAST(count(*) AS BIGINT) AS n_rows
          FROM E e CROSS JOIN IJ ij
          GROUP BY ij.i, ij.j ORDER BY i, j""",

    // dup-graph triangles: node-ordered enumeration over q18's LSH
    // candidate pairs (a<b, b<c wedges closed by the a<c edge)
    "q162_dup_triangles" ->
      s"""WITH ${lshPairCtes("documents")},
          E AS (SELECT DISTINCT id_a, id_b FROM PAIRS)
          SELECT ab.id_a AS id_a, ab.id_b AS id_b, bc.id_b AS id_c
          FROM E ab
          JOIN E bc ON ab.id_b = bc.id_a
          JOIN E ac ON ac.id_a = ab.id_a AND ac.id_b = bc.id_b
          ORDER BY id_a, id_b, id_c""",

    // sample-trained semantic dedup: q93's derivation, but the two
    // Lloyd rounds run over the md5-ppm 25% HASH SAMPLE (the
    // trainCentroids scaladoc contract) — seeds are the k lowest-id
    // SAMPLED vectors, k still sized to the full corpus, and the
    // final assign + dedup tail runs over the full corpus
    "q163_semantic_sampled" ->
      s"""WITH RECURSIVE C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          T AS (SELECT * FROM C
                WHERE (${md5long("cast(id as varchar)")} % 1000000) < 250000),
          KP AS (SELECT CAST(least(4096, greatest(8,
                   floor(sqrt(count(*)::DOUBLE)))) AS BIGINT) AS k FROM C),
          S0 AS (SELECT rn - 1 AS cid, emb AS cemb FROM
                 (SELECT row_number() OVER (ORDER BY id) AS rn, emb FROM T)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfRound("S0", "A1", "P1", "M1", "S1", src = "T")},
          ${ivfRound("S1", "A2", "P2", "M2", "S2", src = "T")},
          ${ivfAssignCte("C", "S2", "CC", 1)},
          SPAIRS AS (SELECT a.id AS id_a, b.id AS id_b
                 FROM CC a JOIN CC b ON a.cid = b.cid AND a.id < b.id
                 WHERE ${scoreFixedSql("a.emb", "b.emb")} >= 950000),
          SEDGES AS (SELECT id_a AS src, id_b AS dst FROM SPAIRS
                 UNION SELECT id_b, id_a FROM SPAIRS),
          SREACH(node, r) AS (
            SELECT src, src FROM SEDGES
            UNION
            SELECT e.dst, r.r FROM SREACH r JOIN SEDGES e ON e.src = r.node),
          SCOMP AS (SELECT node AS id, min(r) AS rep FROM SREACH GROUP BY node)
          SELECT c.id, coalesce(p.rep, c.id) AS rep_id,
            CAST(CASE WHEN coalesce(p.rep, c.id) = c.id THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM C c LEFT JOIN SCOMP p USING (id) ORDER BY c.id""",

    // two-level hierarchical semantic dedup: level 1 = q93's trained
    // coarse cells at k1 = floor(sqrt(ceil(n/32))); level 2 = a k2
    // sub-quantizer per cell, trained with two PARTITIONED Lloyd
    // rounds (ivfSubRound — all cells at once); pairs only within a
    // (cid, cid2) subcell, same CC tail. k1·k2 ∝ n keeps subcell
    // populations constant — the linear-total form
    "q164_semantic_2level" ->
      s"""WITH RECURSIVE C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          KP AS (SELECT CAST(least(4096, greatest(4, floor(sqrt(
                   ((count(*) + 31) // 32)::DOUBLE)))) AS BIGINT) AS k FROM C),
          S0 AS (SELECT rn - 1 AS cid, emb AS cemb FROM
                 (SELECT row_number() OVER (ORDER BY id) AS rn, emb FROM C)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfRound("S0", "A1", "P1", "M1", "S1")},
          ${ivfRound("S1", "A2", "P2", "M2", "S2")},
          ${ivfAssignCte("C", "S2", "CC1", 1)},
          SS0 AS (SELECT cid, rn - 1 AS cid2, emb AS cemb FROM
                 (SELECT cid, emb, row_number() OVER (PARTITION BY cid
                    ORDER BY id) AS rn FROM CC1)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfSubRound("SS0", "AA1", "PP1", "MM1", "SS1", "CC1")},
          ${ivfSubRound("SS1", "AA2", "PP2", "MM2", "SS2", "CC1")},
          CC2 AS (SELECT id, emb, cid, cid2 FROM (
                 SELECT c.id, c.emb, c.cid, s.cid2,
                   row_number() OVER (PARTITION BY c.id
                     ORDER BY ${scoreFixedSafeSql("c.emb", "s.cemb")} DESC, s.cid2) AS rn
                 FROM CC1 c JOIN SS2 s ON s.cid = c.cid) WHERE rn = 1),
          SPAIRS AS (SELECT a.id AS id_a, b.id AS id_b
                 FROM CC2 a JOIN CC2 b ON a.cid = b.cid AND a.cid2 = b.cid2
                   AND a.id < b.id
                 WHERE ${scoreFixedSql("a.emb", "b.emb")} >= 950000),
          SEDGES AS (SELECT id_a AS src, id_b AS dst FROM SPAIRS
                 UNION SELECT id_b, id_a FROM SPAIRS),
          SREACH(node, r) AS (
            SELECT src, src FROM SEDGES
            UNION
            SELECT e.dst, r.r FROM SREACH r JOIN SEDGES e ON e.src = r.node),
          SCOMP AS (SELECT node AS id, min(r) AS rep FROM SREACH GROUP BY node)
          SELECT c.id, coalesce(p.rep, c.id) AS rep_id,
            CAST(CASE WHEN coalesce(p.rep, c.id) = c.id THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM C c LEFT JOIN SCOMP p USING (id) ORDER BY c.id""",

    // health heatmap: q41's quality CTE joined to char lengths, exact
    // integer buckets
    "q136_health_heatmap" ->
      s"""WITH $qualityCte
          SELECT CAST(length(bin(length(coalesce(d.text,''))::BIGINT)) AS BIGINT) AS len_bits,
            least(q.quality_1e6 // 100000, 9) AS q_decile,
            CAST(count(*) AS BIGINT) AS n_docs
          FROM documents d JOIN QS q USING (doc_id)
          GROUP BY len_bits, q_decile ORDER BY len_bits, q_decile""",

    // source divergence: add-one-smoothed KL in exact binary-digit
    // bits, offset-positive millibit quotient
    "q135_source_divergence" ->
      s"""WITH E AS (SELECT source, unnest(${toks("lower(text)")}) AS term FROM documents),
          CNT AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
                  FROM E GROUP BY source, term),
          TOT AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM CNT GROUP BY source),
          V AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM CNT),
          X AS (SELECT a.source AS source_a, tb.source AS source_b,
                 ta.n AS na, tb.n AS nb, a.term, a.c AS ca,
                 coalesce(b.c, 0) AS cb, vv.v
                FROM CNT a
                JOIN TOT ta ON ta.source = a.source
                JOIN TOT tb ON tb.source <> a.source
                LEFT JOIN CNT b ON b.source = tb.source AND b.term = a.term
                CROSS JOIN V vv),
          K AS (SELECT source_a, source_b, na,
                 CAST(sum(ca * ((length(bin(nb + v)) - length(bin(cb + 1)))
                       - (length(bin(na + v)) - length(bin(ca + 1))))) AS BIGINT) AS num
                FROM X GROUP BY source_a, source_b, na)
          SELECT source_a, source_b,
            ((num + 63 * na) * 1000) // na - 63000 AS kl_mbits
          FROM K ORDER BY source_a, source_b""",

    // ANALYZE-style column stats: one branch per column (union all),
    // min/max rendered VARCHAR so types share a schema
    "q126_column_stats" -> {
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count($c) AS BIGINT) AS n_nonnull,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             CAST(min($c) AS VARCHAR) AS min_value,
             CAST(max($c) AS VARCHAR) AS max_value FROM documents"""
      }.mkString("", " UNION ALL ", " ORDER BY column_name")
    },

    // Kneser-Ney bigram LM: q90's adjacent-pair stream, then the
    // interpolated-KN rational — num/den in HUGEINT (Spark side uses
    // DECIMAL(38,0)), D = 3/4, singleton rows pruned after stats
    "q125_kneser_ney" ->
      s"""WITH B AS (SELECT doc_id, tk FROM
                (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents)
                WHERE len(tk) >= 2),
          P AS (SELECT tk[i+1] AS a, tk[i+2] AS b
                FROM (SELECT tk, unnest(range(len(tk)-1)) AS i FROM B)),
          BG AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
                 FROM P GROUP BY a, b),
          L AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a,
                 CAST(count(*) AS BIGINT) AS n1_fwd FROM BG GROUP BY a),
          R AS (SELECT b, CAST(count(*) AS BIGINT) AS n1_bwd FROM BG GROUP BY b),
          T AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM BG)
          SELECT g.a, g.b, g.c_ab, l.c_a, l.n1_fwd, r.n1_bwd,
            CAST((((4*g.c_ab - 3)::HUGEINT * t.n_types
                   + 3::HUGEINT * l.n1_fwd * r.n1_bwd) * 1000000)
                 // (4::HUGEINT * l.c_a * t.n_types) AS BIGINT) AS p_kn_1e6
          FROM BG g JOIN L l USING (a) JOIN R r USING (b) CROSS JOIN T t
          WHERE g.c_ab >= 2
          ORDER BY g.a, g.b""",

    // residual IVF-PQ: the q59 composition, but codes quantize
    // RESIDUALS (vector − assigned coarse centroid) and each query's
    // LUT is per probed cell (its residual against THAT cell); the
    // per-subspace k-means chains are the same q58 derivations run on
    // the residual table
    "q83_ivf_pq_residual" -> {
      val (m, kc, sub) = (2, 4, 32)
      val residual = (src: String, cells: String) =>
        s"""list_transform(range(len($src.emb)),
            i -> $src.emb[i+1]::DOUBLE - $cells.cemb[i+1])"""
      val trains = (0 until m).map(s => pqTrainCodesCtes(s, kc, sub, "RES"))
        .mkString(",\n")
      val qluts = (0 until m).map { s =>
        val lo = s * sub + 1; val hi = (s + 1) * sub
        s"""QR$s AS (SELECT id, cell, emb[$lo:$hi] AS emb FROM QR),
            RLUT$s AS (SELECT q.id AS query_id, q.cell, s2.cid,
                   ${scoreFixedSafeSql("q.emb", "s2.cemb")} AS contrib
                  FROM QR$s q CROSS JOIN PS2_$s s2)"""
      }.mkString(",\n")
      val unions = (0 until m).map(s =>
        s"""SELECT ca.query_id, ca.id, l.contrib
            FROM CAND ca JOIN CODE$s c$s ON c$s.id = ca.id
            JOIN RLUT$s l ON l.cid = c$s.cid AND l.query_id = ca.query_id
              AND l.cell = ca.cell""")
        .mkString(" UNION ALL ")
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 2)},
          RES AS (SELECT c.id, ${residual("c", "s")} AS emb
                  FROM CC c JOIN S2 s USING (cid)),
          $trains,
          QR AS (SELECT q.id, q.cid AS cell, ${residual("q", "s")} AS emb
                 FROM QP q JOIN S2 s ON s.cid = q.cid),
          $qluts,
          CAND AS (SELECT q.id AS query_id, q.cid AS cell, c.id
                   FROM CC c JOIN QP q ON q.cid = c.cid AND q.id <> c.id),
          CONTRIB AS ($unions),
          ADC AS (SELECT query_id, id AS neighbor_id,
                  CAST(sum(contrib) AS BIGINT) AS adc_1e6
                  FROM CONTRIB GROUP BY query_id, id),
          R AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_1e6 DESC, neighbor_id) AS rank FROM ADC)
          SELECT query_id, rank, neighbor_id, adc_1e6 FROM R WHERE rank <= 3
          ORDER BY query_id, rank"""
    },

    // per-document Kneser-Ney surprisal: q125's stats re-derived from
    // the per-doc pair weights, pruned pairs (c_ab < 2) scored with
    // the interpolation's own backoff mass ((4c_ab-3) -> 0 limit),
    // probabilities clamped >= 1, bits = 20 - bitlen (q88 idiom)
    "q165_doc_lm_bits" ->
      s"""WITH B AS (SELECT doc_id, tk FROM
                (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents)
                WHERE len(tk) >= 2),
          DP AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS w FROM
                 (SELECT doc_id, tk[i+1] AS a, tk[i+2] AS b
                  FROM (SELECT doc_id, tk, unnest(range(len(tk)-1)) AS i FROM B))
                 GROUP BY doc_id, a, b),
          BG AS (SELECT a, b, CAST(sum(w) AS BIGINT) AS c_ab FROM DP GROUP BY a, b),
          L AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a,
                 CAST(count(*) AS BIGINT) AS n1_fwd FROM BG GROUP BY a),
          R AS (SELECT b, CAST(count(*) AS BIGINT) AS n1_bwd FROM BG GROUP BY b),
          T AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM BG),
          SB AS (SELECT g.a, g.b,
                  CAST(20 - length(bin(greatest(CASE WHEN g.c_ab >= 2
                    THEN CAST((((4*g.c_ab - 3)::HUGEINT * t.n_types
                               + 3::HUGEINT * l.n1_fwd * r.n1_bwd) * 1000000)
                         // (4::HUGEINT * l.c_a * t.n_types) AS BIGINT)
                    ELSE CAST((3::HUGEINT * l.n1_fwd * r.n1_bwd * 1000000)
                         // (4::HUGEINT * l.c_a * t.n_types) AS BIGINT)
                  END, CAST(1 AS BIGINT)))) AS BIGINT) AS bits
                 FROM BG g JOIN L l USING (a) JOIN R r USING (b) CROSS JOIN T t)
          SELECT dp.doc_id, CAST(sum(dp.w) AS BIGINT) AS n_pairs,
            CAST(sum(dp.w * sb.bits) AS BIGINT) AS sum_bits,
            CAST((sum(dp.w * sb.bits) * 1000) // sum(dp.w) AS BIGINT) AS avg_millibits
          FROM DP dp JOIN SB sb ON sb.a = dp.a AND sb.b = dp.b
          GROUP BY dp.doc_id ORDER BY dp.doc_id""",

    // PC1 outliers: q161's gram matrix symmetrized, three unrolled
    // power-iteration rounds in HUGEINT (renormalize by max |w| with
    // truncating //, = Scala BigInt / on the Spark driver), then the
    // top-10 docs by |projection| onto the resulting direction
    "q166_pc1_outliers" -> {
      val rounds = (1 to 3).map { r =>
        val pv = s"V${r - 1}"
        s"""W$r AS (SELECT m.i AS d, CAST(sum(m.g * v.v) AS HUGEINT) AS w
               FROM M m JOIN $pv v ON v.d = m.j GROUP BY m.i),
            N$r AS (SELECT max(abs(w)) AS mx FROM W$r),
            V$r AS (SELECT d, CASE WHEN n.mx = 0 THEN 1000000::HUGEINT
                    ELSE (w * 1000000) // n.mx END AS v
                    FROM W$r CROSS JOIN N$r n)"""
      }.mkString(",\n")
      s"""WITH E AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          GP AS (SELECT i.i, j.j FROM generate_series(0, 7) AS i(i)
                 JOIN generate_series(0, 7) AS j(j) ON i.i <= j.j),
          G0 AS (SELECT gp.i, gp.j,
                 CAST(sum(CAST(floor(e.emb[gp.i + 1]::DOUBLE
                   * e.emb[gp.j + 1]::DOUBLE * 1000000.0) AS BIGINT)) AS HUGEINT) AS g
                 FROM E e CROSS JOIN GP gp GROUP BY gp.i, gp.j),
          M AS (SELECT i, j, g FROM G0
                UNION ALL SELECT j AS i, i AS j, g FROM G0 WHERE i <> j),
          V0 AS (SELECT unnest(range(8)) AS d, 1000000::HUGEINT AS v),
          $rounds,
          PROJ AS (SELECT e.id,
                   CAST(sum(CAST(floor(e.emb[v.d + 1]::DOUBLE * 1000000.0) AS BIGINT)
                     * v.v) AS BIGINT) AS proj_fp
                   FROM E e CROSS JOIN V3 v GROUP BY e.id),
          RK AS (SELECT id, proj_fp,
                 CAST(row_number() OVER (ORDER BY abs(proj_fp) DESC, id) AS BIGINT) AS rank
                 FROM PROJ)
          SELECT id, proj_fp, rank FROM RK WHERE rank <= 10 ORDER BY rank"""
    },

    // IVF-PQ + exact refine: q59's chain cut at rank <= 10 (the ADC
    // shortlist), true embeddings re-score only those rows, exact
    // fixed cosine re-ranks the final top-3
    "q167_ivf_pq_refine" -> {
      val (m, kc, sub) = (2, 4, 32)
      val unions = (0 until m).map(s =>
        s"""SELECT ca.query_id, ca.id, l.contrib
            FROM CAND ca JOIN CODE$s c$s ON c$s.id = ca.id
            JOIN LUT$s l ON l.cid = c$s.cid AND l.query_id = ca.query_id""")
        .mkString(" UNION ALL ")
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 2)},
          ${pqSubspaceCtes(m, kc, sub)},
          CAND AS (SELECT q.id AS query_id, c.id
                   FROM CC c JOIN QP q ON q.cid = c.cid AND q.id <> c.id),
          CONTRIB AS ($unions),
          ADC AS (SELECT query_id, id AS neighbor_id,
                  CAST(sum(contrib) AS BIGINT) AS adc_1e6
                  FROM CONTRIB GROUP BY query_id, id),
          SHORT AS (SELECT query_id, neighbor_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adc_1e6 DESC, neighbor_id) AS rn FROM ADC)
                    WHERE rn <= 10),
          EX AS (SELECT s.query_id, s.neighbor_id,
                 ${scoreFixedSafeSql("q.emb", "c.emb")} AS score_1e6
                 FROM SHORT s JOIN C c ON c.id = s.neighbor_id
                 JOIN Q q ON q.id = s.query_id),
          R2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score_1e6 DESC, neighbor_id) AS BIGINT) AS rank FROM EX)
          SELECT query_id, rank, neighbor_id, score_1e6 FROM R2 WHERE rank <= 3
          ORDER BY query_id, rank"""
    },

    // LSH band-plan sweep: one 16-perm signature derivation (q18's
    // SIG), re-banded per (bands, rows) config; per config the raw
    // candidate workload sum(sz*(sz-1))//2 over band buckets
    "q168_lsh_band_sweep" -> {
      val p = graft.operators.Dedup.MinhashP
      val sigExprs = graft.operators.Dedup.minhashCoeffs(16).map { case (a, b) =>
        s"list_min(list_transform(hs, h -> (h * $a + $b) % $p))"
      }.mkString("[", ", ", "]")
      val perConfig = Seq((16, 1), (8, 2), (4, 4), (2, 8)).map { case (bands, rpb) =>
        s"""SELECT ${bands}::BIGINT AS bands, ${rpb}::BIGINT AS rows_per_band,
              t.band AS band,
              md5(array_to_string(list_transform(
                list_slice(sig, t.band * $rpb + 1, t.band * $rpb + $rpb),
                x -> x::varchar), ',')) AS bucket
            FROM SIG CROSS JOIN (SELECT unnest(range($bands)) AS band) t"""
      }.mkString(" UNION ALL ")
      s"""WITH TH AS (SELECT doc_id, ${tokenHashExpr("text")} AS th FROM documents),
          HS AS (SELECT doc_id, $gramFromTh AS hs FROM TH),
          SIG AS (SELECT doc_id, $sigExprs AS sig FROM HS WHERE len(hs) > 0),
          BB AS ($perConfig),
          SZ AS (SELECT bands, rows_per_band, band, bucket,
                 CAST(count(*) AS BIGINT) AS sz
                 FROM BB GROUP BY bands, rows_per_band, band, bucket)
          SELECT bands, rows_per_band, CAST(count(*) AS BIGINT) AS n_buckets,
            CAST(sum((sz * (sz - 1)) // 2) AS BIGINT) AS n_candidate_pairs,
            CAST(max(sz) AS BIGINT) AS max_bucket
          FROM SZ GROUP BY bands, rows_per_band ORDER BY bands DESC"""
    },

    // refine recall lift: exact brute-force top-3 (q21 chain) checked
    // for membership against the plain ADC top-3 (q59 chain) and the
    // refined top-3 (q167 chain); per-query denominators
    "q169_refine_recall" -> {
      val (m, kc, sub) = (2, 4, 32)
      val unions = (0 until m).map(s =>
        s"""SELECT ca.query_id, ca.id, l.contrib
            FROM CAND ca JOIN CODE$s c$s ON c$s.id = ca.id
            JOIN LUT$s l ON l.cid = c$s.cid AND l.query_id = ca.query_id""")
        .mkString(" UNION ALL ")
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          ${ivfCoarseCtes(8, 2)},
          ${pqSubspaceCtes(m, kc, sub)},
          CAND AS (SELECT q.id AS query_id, c.id
                   FROM CC c JOIN QP q ON q.cid = c.cid AND q.id <> c.id),
          CONTRIB AS ($unions),
          ADC AS (SELECT query_id, id AS neighbor_id,
                  CAST(sum(contrib) AS BIGINT) AS adc_1e6
                  FROM CONTRIB GROUP BY query_id, id),
          ADCR AS (SELECT query_id, neighbor_id FROM (
                   SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY adc_1e6 DESC, neighbor_id) AS rn FROM ADC)
                   WHERE rn <= 3),
          SHORT AS (SELECT query_id, neighbor_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adc_1e6 DESC, neighbor_id) AS rn FROM ADC)
                    WHERE rn <= 100),
          EXR AS (SELECT s.query_id, s.neighbor_id,
                  ${scoreFixedSafeSql("q.emb", "c.emb")} AS score_1e6
                  FROM SHORT s JOIN C c ON c.id = s.neighbor_id
                  JOIN Q q ON q.id = s.query_id),
          REFR AS (SELECT query_id, neighbor_id FROM (
                   SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY score_1e6 DESC, neighbor_id) AS rn FROM EXR)
                   WHERE rn <= 3),
          BS AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                 ${scoreFixedSql("q.emb", "c.emb")} AS s
                 FROM C c CROSS JOIN Q q WHERE q.id <> c.id),
          BR AS (SELECT query_id, neighbor_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY s DESC, neighbor_id) AS rn FROM BS)
                 WHERE rn <= 3),
          J AS (SELECT b.query_id,
                 CASE WHEN EXISTS (SELECT 1 FROM ADCR a
                   WHERE a.query_id = b.query_id
                     AND a.neighbor_id = b.neighbor_id) THEN 1 ELSE 0 END AS in_adc,
                 CASE WHEN EXISTS (SELECT 1 FROM REFR r
                   WHERE r.query_id = b.query_id
                     AND r.neighbor_id = b.neighbor_id) THEN 1 ELSE 0 END AS in_ref
                FROM BR b)
          SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact,
            CAST(sum(in_adc) AS BIGINT) AS hits_adc,
            CAST(sum(in_ref) AS BIGINT) AS hits_refine,
            CAST((sum(in_adc) * 1000000) // count(*) AS BIGINT) AS recall_adc_1e6,
            CAST((sum(in_ref) * 1000000) // count(*) AS BIGINT) AS recall_refine_1e6
          FROM J GROUP BY query_id ORDER BY query_id"""
    },

    // vocab/OOV coverage: per-(source, term) counts, top-10 vocabulary
    // by (count desc, term asc), OOV mass + type counts per source
    "q170_vocab_coverage" ->
      s"""WITH TS AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
                 FROM (SELECT source, unnest(${toks("lower(text)")}) AS term
                       FROM documents)
                 GROUP BY source, term),
          V AS (SELECT term FROM (SELECT term, sum(cnt) AS tc FROM TS GROUP BY term)
                ORDER BY tc DESC, term LIMIT 10)
          SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN term NOT IN (SELECT term FROM V) THEN cnt ELSE 0 END)
              AS BIGINT) AS n_oov,
            CAST(sum(CASE WHEN term NOT IN (SELECT term FROM V) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_oov_types,
            CAST(CASE WHEN sum(cnt) = 0 THEN 0
              ELSE (sum(CASE WHEN term NOT IN (SELECT term FROM V) THEN cnt ELSE 0 END)
                    * 1000000) // sum(cnt) END AS BIGINT) AS oov_ppm
          FROM TS GROUP BY source ORDER BY source""",

    // per-source dedup savings: q44's exact-keeper + LSH reachability
    // chain, token mass summed before / after each stage
    "q171_dedup_savings" ->
      s"""WITH RECURSIVE BASE AS (SELECT doc_id, source,
                 CAST(len(${toks("text")}) AS BIGINT) AS n_tok FROM documents),
          $dedupClusterCtes,
          SURV AS (SELECT doc_id FROM KEEP
                   WHERE doc_id NOT IN (SELECT node FROM CL WHERE node <> cluster_id)),
          A AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM BASE GROUP BY source),
          KE AS (SELECT b.source, CAST(sum(b.n_tok) AS BIGINT) AS t FROM BASE b
                JOIN (SELECT doc_id FROM KEEP) k USING (doc_id) GROUP BY b.source),
          SV AS (SELECT b.source, CAST(sum(b.n_tok) AS BIGINT) AS t FROM BASE b
                 JOIN SURV s USING (doc_id) GROUP BY b.source)
          SELECT a.source, a.n_docs, a.n_tokens,
            CAST(coalesce(ke.t, 0) AS BIGINT) AS tokens_after_exact,
            CAST(coalesce(sv.t, 0) AS BIGINT) AS tokens_after_neardup,
            CAST(CASE WHEN a.n_tokens = 0 THEN 0
              ELSE (coalesce(sv.t, 0) * 1000000) // a.n_tokens END AS BIGINT)
              AS retained_ppm
          FROM A a LEFT JOIN KE ke USING (source) LEFT JOIN SV sv USING (source)
          ORDER BY a.source""",

    // simhash Hamming histogram: q45's banded candidate stream WITHOUT
    // the verify filter, bucketed by Hamming distance + cumulative;
    // band width ADAPTIVE from count(*) (the q82 derivation — the
    // unfiltered stream is the n²/2^bandBits cliff population, so the
    // histogram must size itself)
    "q172_simhash_hamming" -> {
      val hashes = s"list_transform(${toks("lower(text)")}, t -> ${md5long("t")})"
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb,
                 (4 * least(15, greatest(4, b)))::BIGINT AS bits
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          HS AS (SELECT doc_id, $hashes AS H FROM documents),
          S AS (SELECT doc_id,
                 ${simhashSql(60)} & ((1::BIGINT << bb.bits) - 1) AS sim,
                 bb.bb AS bandbits
                FROM HS, BB bb WHERE len(H) > 0),
          B AS (SELECT doc_id, sim, bandbits, t.band AS band,
                 (sim >> (t.band * bandbits)) & ((1::BIGINT << bandbits) - 1) AS bval
                FROM S CROSS JOIN (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  cast(bit_count(xor(a.sim, b2.sim)) as bigint) AS hamming
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id),
          H AS (SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
                FROM P GROUP BY hamming)
          SELECT hamming, n_pairs,
            CAST(sum(n_pairs) OVER (ORDER BY hamming
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS n_pairs_le,
            (SELECT bits FROM BB) AS bits
          FROM H ORDER BY hamming"""
    },

    // incremental near-dup admit: q94's two-batch replay, but batch-2
    // rejection = exact md5 OR (shared LSH band AND >= 50% signature
    // agreement) against batch 1's admitted signature index
    "q173_inc_near_dup" -> {
      val p = graft.operators.Dedup.MinhashP
      val sigExprs = graft.operators.Dedup.minhashCoeffs(16).map { case (a, b) =>
        s"list_min(list_transform(hs, h -> (h * $a + $b) % $p))"
      }.mkString("[", ", ", "]")
      s"""WITH D AS (SELECT doc_id, text, md5(text) AS h,
                 CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS bno
                FROM documents),
          F AS (SELECT bno, h, doc_id, text FROM (
                SELECT *, row_number() OVER (PARTITION BY bno, h
                  ORDER BY doc_id) AS rn FROM D) WHERE rn = 1),
          TH AS (SELECT doc_id, ${tokenHashExpr("text")} AS th FROM F),
          HS AS (SELECT doc_id, $gramFromTh AS hs FROM TH),
          SG AS (SELECT doc_id,
                 CASE WHEN len(hs) > 0 THEN $sigExprs ELSE NULL END AS sig FROM HS),
          FS AS (SELECT f.bno, f.h, f.doc_id, s.sig
                 FROM F f JOIN SG s USING (doc_id)),
          A1 AS (SELECT * FROM FS WHERE bno = 1),
          EXN AS (SELECT * FROM FS WHERE bno = 2
                  AND h NOT IN (SELECT h FROM A1)),
          REJ AS (SELECT DISTINCT e.doc_id FROM EXN e JOIN A1 a
                  ON e.sig IS NOT NULL AND a.sig IS NOT NULL
                  AND len(list_filter(range(4), b ->
                      list_slice(e.sig, b*4 + 1, b*4 + 4)
                        = list_slice(a.sig, b*4 + 1, b*4 + 4))) > 0
                  AND len(list_filter(range(16), i ->
                      e.sig[i+1] = a.sig[i+1])) * 1000000 >= 500000 * 16),
          A2 AS (SELECT * FROM EXN
                 WHERE doc_id NOT IN (SELECT doc_id FROM REJ))
          SELECT doc_id, h, bno AS batch_no FROM A1
          UNION ALL SELECT doc_id, h, bno FROM A2
          ORDER BY doc_id"""
    },

    // k-center coreset: 3 unrolled greedy farthest-point rounds —
    // seed = min id, then argmin of best-coverage cosine (ties low)
    "q174_kcenter_coreset" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          S1 AS (SELECT id AS c1, emb AS e1 FROM C
                 WHERE id = (SELECT min(id) FROM C)),
          COV1 AS (SELECT c.id, c.emb,
                   ${scoreFixedSafeSql("c.emb", "s.e1")} AS ms
                   FROM C c CROSS JOIN S1 s WHERE c.id <> s.c1),
          F2 AS (SELECT id, ms FROM COV1 ORDER BY ms, id LIMIT 1),
          S2 AS (SELECT f.id AS c2, c.emb AS e2, f.ms AS ms2
                 FROM F2 f JOIN C c ON c.id = f.id),
          COV2 AS (SELECT v.id, v.emb,
                   greatest(v.ms, ${scoreFixedSafeSql("v.emb", "s.e2")}) AS ms
                   FROM COV1 v CROSS JOIN S2 s WHERE v.id <> s.c2),
          F3 AS (SELECT id, ms FROM COV2 ORDER BY ms, id LIMIT 1)
          SELECT CAST(1 AS BIGINT) AS pick_no, c1 AS center_id,
            CAST(NULL AS BIGINT) AS cover_sim_1e6 FROM S1
          UNION ALL SELECT CAST(2 AS BIGINT), c2, CAST(ms2 AS BIGINT) FROM S2
          UNION ALL SELECT CAST(3 AS BIGINT), id, CAST(ms AS BIGINT) FROM F3
          ORDER BY pick_no""",

    // semantic cosine histogram: the within-cell candidate pairs
    // bucketed by truncating 50k-wide cosine buckets + cumulative >=;
    // cell count ADAPTIVE from count(*) (the q93 KP derivation — the
    // within-cell population is n²/k, so fixed k is a cliff)
    "q175_semantic_cos_hist" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          KP AS (SELECT CAST(least(4096, greatest(8,
                   floor(sqrt(count(*)::DOUBLE)))) AS BIGINT) AS k FROM C),
          S0 AS (SELECT rn - 1 AS cid, emb AS cemb FROM
                 (SELECT row_number() OVER (ORDER BY id) AS rn, emb FROM C)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfRound("S0", "A1", "P1", "M1", "S1")},
          ${ivfRound("S1", "A2", "P2", "M2", "S2")},
          ${ivfAssignCte("C", "S2", "CC", 1)},
          SP AS (SELECT ${scoreFixedSafeSql("a.emb", "b.emb")} AS cos
                 FROM CC a JOIN CC b ON a.cid = b.cid AND a.id < b.id),
          HB AS (SELECT (cos // 50000) * 50000 AS bucket_lo_1e6,
                 CAST(count(*) AS BIGINT) AS n_pairs FROM SP GROUP BY 1)
          SELECT bucket_lo_1e6, n_pairs,
            CAST(sum(n_pairs) OVER (ORDER BY bucket_lo_1e6 DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS n_pairs_ge
          FROM HB ORDER BY bucket_lo_1e6 DESC""",

    // per-source attrition: q127's first-fail CASE joined with source,
    // shares within each source's own total
    "q176_attrition_by_source" ->
      s"""WITH RECURSIVE $dedupClusterCtes,
          ${gateCtes("documents")},
          ${benchGramsCte()},
          CONTAM AS (SELECT DISTINCT d.doc_id
                 FROM (SELECT doc_id, unnest(${shingles3("text")}) AS gram
                       FROM documents) d
                 JOIN BG USING (gram)),
          REP AS (SELECT doc_id, ${repFixedSql("g")} AS rep_1e6
              FROM (SELECT doc_id, ${rawShingles3("text")} AS g FROM documents)),
          V AS (SELECT d.doc_id, d.source,
                 CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM KEEP) THEN '1_exact_dup'
                      WHEN d.doc_id IN (SELECT node FROM CL WHERE node <> cluster_id) THEN '2_near_dup'
                      WHEN g.quality_1e6 < 600000 THEN '3_quality'
                      WHEN g.predicted_lang <> 'en' THEN '4_language'
                      WHEN r.rep_1e6 >= 500000 THEN '5_repetition'
                      WHEN d.doc_id IN (SELECT doc_id FROM CONTAM) THEN '6_contaminated'
                      ELSE '7_pass' END AS gate
                FROM documents d JOIN G g USING (doc_id) JOIN REP r USING (doc_id)),
          CT AS (SELECT source, gate, CAST(count(*) AS BIGINT) AS n_docs
                 FROM V GROUP BY source, gate),
          TT AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS t
                 FROM CT GROUP BY source)
          SELECT c.source, c.gate, c.n_docs,
            (c.n_docs * 1000000) // t.t AS share_1e6
          FROM CT c JOIN TT t USING (source)
          ORDER BY c.source, c.gate""",

    // held-out KN perplexity: stats from the even-id half only, the
    // odd-id half scored with interpolated -> backoff -> unseen floor
    "q177_lm_heldout" ->
      s"""WITH TRP AS (SELECT tk[i+1] AS a, tk[i+2] AS b
                FROM (SELECT tk, unnest(range(len(tk)-1)) AS i
                      FROM (SELECT ${toks("lower(text)")} AS tk FROM documents
                            WHERE doc_id % 2 = 0)
                      WHERE len(tk) >= 2)),
          BG AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
                 FROM TRP GROUP BY a, b),
          L AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a,
                 CAST(count(*) AS BIGINT) AS n1_fwd FROM BG GROUP BY a),
          R AS (SELECT b, CAST(count(*) AS BIGINT) AS n1_bwd FROM BG GROUP BY b),
          T AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM BG),
          DP AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS w FROM
                 (SELECT doc_id, tk[i+1] AS a, tk[i+2] AS b
                  FROM (SELECT doc_id, tk, unnest(range(len(tk)-1)) AS i
                        FROM (SELECT doc_id, ${toks("lower(text)")} AS tk
                              FROM documents WHERE doc_id % 2 = 1)
                        WHERE len(tk) >= 2))
                 GROUP BY doc_id, a, b),
          SC AS (SELECT dp.doc_id, dp.w,
                  CAST(20 - length(bin(greatest(CASE
                    WHEN g.c_ab IS NOT NULL AND g.c_ab >= 2
                    THEN CAST((((4*g.c_ab - 3)::HUGEINT * t.n_types
                               + 3::HUGEINT * l.n1_fwd * r.n1_bwd) * 1000000)
                         // (4::HUGEINT * l.c_a * t.n_types) AS BIGINT)
                    WHEN l.c_a IS NOT NULL AND r.n1_bwd IS NOT NULL
                    THEN CAST((3::HUGEINT * l.n1_fwd * r.n1_bwd * 1000000)
                         // (4::HUGEINT * l.c_a * t.n_types) AS BIGINT)
                    ELSE CAST(1 AS BIGINT)
                  END, CAST(1 AS BIGINT)))) AS BIGINT) AS bits
                 FROM DP dp
                 LEFT JOIN BG g ON g.a = dp.a AND g.b = dp.b
                 LEFT JOIN L l ON l.a = dp.a
                 LEFT JOIN R r ON r.b = dp.b
                 CROSS JOIN T t)
          SELECT doc_id, CAST(sum(w) AS BIGINT) AS n_pairs,
            CAST(sum(w * bits) AS BIGINT) AS sum_bits,
            CAST((sum(w * bits) * 1000) // sum(w) AS BIGINT) AS avg_millibits
          FROM SC GROUP BY doc_id ORDER BY doc_id""",

    // per-doc word entropy: exact-integer bits over the doc's own
    // word distribution + type/token ratio, all list ops
    "q178_word_entropy" ->
      s"""WITH TK AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents)
          SELECT doc_id,
            CAST(len(tk) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(tk)) AS BIGINT) AS n_types,
            CAST(CASE WHEN len(tk) = 0 THEN 0 ELSE coalesce(list_sum(
              list_transform(list_distinct(tk), w ->
                len(list_filter(tk, t -> t = w))::BIGINT
                  * (length(bin(len(tk)::BIGINT))
                     - length(bin(len(list_filter(tk, t -> t = w))::BIGINT))))),
              0) END AS BIGINT) AS sum_bits,
            CAST(CASE WHEN len(tk) = 0 THEN 0
              ELSE (len(list_distinct(tk))::BIGINT * 1000000) // len(tk) END
              AS BIGINT) AS ttr_ppm
          FROM TK ORDER BY doc_id""",

    // PQ quantization error: q58's per-subspace codes joined back to
    // their centroids, reconstruction cosine bucketed + cumulative
    "q179_pq_error" -> {
      val (m, kc, sub) = (2, 4, 32)
      val trains = (0 until m).map(s => pqTrainCodesCtes(s, kc, sub, "C"))
        .mkString(",\n")
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          $trains,
          RC AS (SELECT c.id, c.emb, list_concat(p0.cemb, p1.cemb) AS recon
                 FROM C c
                 JOIN CODE0 c0 ON c0.id = c.id JOIN PS2_0 p0 ON p0.cid = c0.cid
                 JOIN CODE1 c1 ON c1.id = c.id JOIN PS2_1 p1 ON p1.cid = c1.cid),
          SC AS (SELECT ${scoreFixedSafeSql("rc.emb", "rc.recon")} AS cos
                 FROM RC rc),
          HB AS (SELECT (cos // 10000) * 10000 AS bucket_lo_1e6,
                 CAST(count(*) AS BIGINT) AS n_vectors FROM SC GROUP BY 1)
          SELECT bucket_lo_1e6, n_vectors,
            CAST(sum(n_vectors) OVER (ORDER BY bucket_lo_1e6 DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS n_ge
          FROM HB ORDER BY bucket_lo_1e6 DESC"""
    },

    // dup-graph degree histogram: q18's PAIRS both directions, per-node
    // degree, degree-bucketed counts + cumulative from the top
    "q180_dup_degree_hist" ->
      s"""WITH ${lshPairCtes("documents")},
          E AS (SELECT id_a AS id, id_b AS nb FROM PAIRS
                UNION SELECT id_b, id_a FROM PAIRS),
          DG AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
                 FROM E GROUP BY id),
          H AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
                FROM DG GROUP BY degree)
          SELECT degree, n_nodes,
            CAST(sum(n_nodes) OVER (ORDER BY degree DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS n_nodes_ge
          FROM H ORDER BY degree DESC""",

    // per-user event-type entropy: (user, type) counts, exact integer
    // bits = c * (bitlen(n) - bitlen(c)) summed per user
    "q181_user_entropy" ->
      """WITH CT AS (SELECT user_id, event_type,
                CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY user_id, event_type),
          TOT AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
                  CAST(count(*) AS BIGINT) AS n_types FROM CT GROUP BY user_id)
          SELECT t.user_id, t.n_events, t.n_types,
            CAST(sum(c.c * (length(bin(t.n_events)) - length(bin(c.c))))
              AS BIGINT) AS sum_bits
          FROM CT c JOIN TOT t USING (user_id)
          GROUP BY t.user_id, t.n_events, t.n_types
          ORDER BY t.user_id""",

    // DSIR resampling: q105's DS scores, per-doc linear keep rate on
    // the corpus score range, md5-ppm gate
    "q182_dsir_resample" ->
      s"""WITH $dsirCtes,
          RG AS (SELECT min(avg_dsir_1e6) AS lo, max(avg_dsir_1e6) AS hi FROM DS),
          RT AS (SELECT ds.*, CAST(CASE WHEN r.hi = r.lo THEN 1000000
                 ELSE ((ds.avg_dsir_1e6 - r.lo) * 1000000) // (r.hi - r.lo)
                 END AS BIGINT) AS rate_ppm
                 FROM DS ds CROSS JOIN RG r)
          SELECT id, n_tokens, dsir_bits, avg_dsir_1e6, rate_ppm
          FROM RT
          WHERE (${md5long("cast(id as varchar)")} % 1000000) < rate_ppm
          ORDER BY id""",

    // char-class profile: exact class counts via class-delete regex
    // lengths, per-source sums, other = remainder
    "q183_char_classes" -> {
      val t = "coalesce(text, '')"
      val cnt = (cls: String) =>
        s"(length($t) - length(regexp_replace($t, '$cls', '', 'g')))::BIGINT"
      s"""WITH P AS (SELECT source, length($t)::BIGINT AS c,
                 ${cnt("[A-Za-z]")} AS l, ${cnt("[0-9]")} AS d,
                 ${cnt("[.!?,;:]")} AS p, ${cnt("""\s""")} AS w
                FROM documents)
          SELECT source, CAST(sum(c) AS BIGINT) AS n_chars,
            CAST(sum(l) AS BIGINT) AS n_letters,
            CAST(sum(d) AS BIGINT) AS n_digits,
            CAST(sum(p) AS BIGINT) AS n_punct,
            CAST(sum(w) AS BIGINT) AS n_space,
            CAST(sum(c) - sum(l) - sum(d) - sum(p) - sum(w) AS BIGINT) AS n_other,
            CAST(CASE WHEN sum(c) = 0 THEN 0
              ELSE ((sum(c) - sum(l) - sum(d) - sum(p) - sum(w)) * 1000000)
                   // sum(c) END AS BIGINT) AS other_ppm
          FROM P GROUP BY source ORDER BY source"""
    },

    // simhash precision audit: ADAPTIVE-band verified pairs (the q82
    // derivation) + the exact q20 Jaccard on the pair texts
    "q184_simhash_precision" -> {
      val hashes = s"list_transform(${toks("lower(text)")}, t -> ${md5long("t")})"
      val sh = shingles3("text")
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb,
                 (4 * least(15, greatest(4, b)))::BIGINT AS bits
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          HS AS (SELECT doc_id, $hashes AS H FROM documents),
          S AS (SELECT doc_id,
                 ${simhashSql(60)} & ((1::BIGINT << bb.bits) - 1) AS sim,
                 bb.bb AS bandbits
                FROM HS, BB bb WHERE len(H) > 0),
          B AS (SELECT doc_id, sim, bandbits, t.band AS band,
                 (sim >> (t.band * bandbits)) & ((1::BIGINT << bandbits) - 1) AS bval
                FROM S CROSS JOIN (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  cast(bit_count(xor(a.sim, b2.sim)) as bigint) AS hamming
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id),
          D AS (SELECT doc_id, $sh AS sh FROM documents)
          SELECT p.id_a, p.id_b, p.hamming,
            cast(floor((CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
              ELSE len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END)
              * 1000000.0) as bigint) AS jaccard_1e6,
            (SELECT bits FROM BB) AS bits
          FROM (SELECT * FROM P WHERE hamming <= 3) p
          JOIN D a ON a.doc_id = p.id_a JOIN D b ON b.doc_id = p.id_b
          ORDER BY id_a, id_b"""
    },

    // sentence stats: [.!?]+ segments with >= 1 whitespace token,
    // per-doc count/total/max/avg — all list ops
    "q185_sentence_stats" ->
      s"""WITH SS AS (SELECT doc_id, list_filter(list_transform(
               regexp_split_to_array(coalesce(text, ''), '[.!?]+'),
               s -> len(list_filter(regexp_split_to_array(s, '\\s+'),
                        t -> t <> ''))::BIGINT),
               c -> c > 0) AS wc FROM documents)
          SELECT doc_id, CAST(len(wc) AS BIGINT) AS n_sentences,
            CAST(coalesce(list_sum(wc), 0) AS BIGINT) AS n_words,
            CAST(coalesce(list_max(wc), 0) AS BIGINT) AS max_words,
            CAST(CASE WHEN len(wc) = 0 THEN 0
              ELSE (coalesce(list_sum(wc), 0) * 1000000) // len(wc) END
              AS BIGINT) AS avg_words_ppm
          FROM SS ORDER BY doc_id""",

    // packing budget sweep: per-shard token totals, n_seqs =
    // ceil(total/budget) per shard, tail padding summed per budget
    "q186_packing_sweep" ->
      s"""WITH TC AS (SELECT doc_id, CAST(len(${toks("text")}) AS BIGINT) AS n_tokens
                 FROM documents),
          SH AS (SELECT (${md5long("cast(doc_id as varchar)")} % 4) AS shard,
                 CAST(sum(n_tokens) AS BIGINT) AS tot FROM TC GROUP BY 1),
          BD AS (SELECT unnest([128, 256, 512, 1024]) AS budget),
          X AS (SELECT b.budget::BIGINT AS budget, s.tot,
                ((s.tot + b.budget - 1) // b.budget)::BIGINT AS ns
                FROM SH s CROSS JOIN BD b)
          SELECT budget, CAST(count(*) AS BIGINT) AS n_shards,
            CAST(sum(ns) AS BIGINT) AS n_seqs,
            CAST(sum(ns * budget) - sum(tot) AS BIGINT) AS n_pad,
            CAST(CASE WHEN sum(ns) = 0 THEN 0
              ELSE ((sum(ns * budget) - sum(tot)) * 1000000)
                   // (sum(ns) * budget) END AS BIGINT) AS pad_ppm
          FROM X GROUP BY budget ORDER BY budget""",

    // windowed PMI: pair lists for offsets 1..3 (sorted members),
    // unigram marginals, q154's fixed-point odds ratio, top-20
    "q187_windowed_pmi" ->
      s"""WITH TKD AS (SELECT ${toks("lower(text)")} AS tk FROM documents),
          PR AS (SELECT unnest(list_concat(list_concat(
                 list_transform(range(greatest(len(tk) - 1, 0)), i ->
                   least(tk[i+1], tk[i+2]) || ' ' || greatest(tk[i+1], tk[i+2])),
                 list_transform(range(greatest(len(tk) - 2, 0)), i ->
                   least(tk[i+1], tk[i+3]) || ' ' || greatest(tk[i+1], tk[i+3]))),
                 list_transform(range(greatest(len(tk) - 3, 0)), i ->
                   least(tk[i+1], tk[i+4]) || ' ' || greatest(tk[i+1], tk[i+4]))))
                 AS pair FROM TKD),
          PC AS (SELECT pair, CAST(count(*) AS BIGINT) AS c_ab
                 FROM PR GROUP BY pair),
          TC AS (SELECT t, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT unnest(tk) AS t FROM TKD) GROUP BY t),
          NP AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_pairs FROM PC)
          SELECT pair, c_ab, a.c AS c_a, b.c AS c_b,
            CAST((c_ab * np.n_pairs * 1000000) // (a.c * b.c) AS BIGINT)
              AS ratio_1e6
          FROM PC JOIN TC a ON a.t = split_part(pair, ' ', 1)
          JOIN TC b ON b.t = split_part(pair, ' ', 2)
          CROSS JOIN NP np
          WHERE c_ab >= 10
          ORDER BY ratio_1e6 DESC, pair LIMIT 20""",

    // incremental decontamination: the oracle recomputes flags against
    // the FINAL eval state (both committed slices) — maintained ≡ full
    "q188_inc_decontam" ->
      s"""WITH BG AS (SELECT DISTINCT gram FROM (
                 SELECT unnest(${shingles3("text")}) AS gram FROM documents
                 WHERE (doc_id % 97 = 0 OR doc_id % 89 = 0) AND doc_id < 5000)),
          C AS (SELECT doc_id, unnest(${shingles3("text")}) AS gram FROM documents
                WHERE NOT ((doc_id % 97 = 0 AND doc_id < 5000)
                        OR (doc_id % 89 = 0 AND doc_id < 5000)))
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
          FROM C JOIN BG USING (gram) GROUP BY doc_id ORDER BY doc_id""",

    // per-source KS distance: (source, len) counts, per-source vs
    // corpus CDFs on the shared length grid, max |cross-product gap|
    // in HUGEINT, final ppm
    "q189_source_ks" ->
      s"""WITH B AS (SELECT source, CAST(len(${toks("text")}) AS BIGINT) AS len
                 FROM documents),
          SC AS (SELECT source, len, CAST(count(*) AS BIGINT) AS sc
                 FROM B GROUP BY source, len),
          LENS AS (SELECT DISTINCT len FROM SC),
          SRC AS (SELECT source, CAST(sum(sc) AS BIGINT) AS n_s
                  FROM SC GROUP BY source),
          CCT AS (SELECT len, CAST(sum(sc) AS BIGINT) AS cc
                  FROM SC GROUP BY len),
          TOT AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM B),
          G AS (SELECT s.source, l.len, s.n_s,
                CAST(coalesce(x.sc, 0) AS BIGINT) AS sc, c.cc, t.n_tot
                FROM SRC s CROSS JOIN LENS l
                LEFT JOIN SC x ON x.source = s.source AND x.len = l.len
                JOIN CCT c ON c.len = l.len CROSS JOIN TOT t),
          W AS (SELECT source, n_s, n_tot,
                 abs(CAST(sum(sc) OVER win AS HUGEINT) * n_tot
                   - CAST(sum(cc) OVER win AS HUGEINT) * n_s) AS gap
                FROM G WINDOW win AS (PARTITION BY source ORDER BY len
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
            CAST((max(gap) * 1000000)
              // (CAST(max(n_s) AS HUGEINT) * max(n_tot)) AS BIGINT) AS ks_ppm
          FROM W GROUP BY source ORDER BY source""",

    // incremental ANN index: full re-encode of the corpus's FINAL
    // state (evens minus %10 deletes, plus odds) under quantizers
    // trained on the COMMIT-1 corpus (evens) — maintained ≡ full
    "q190_index_maintain_ann" -> {
      val (m, kc, sub) = (2, 4, 32)
      val codeCtes = (0 until m).map { s =>
        val lo = s * sub + 1; val hi = (s + 1) * sub
        s"""CT$s AS (SELECT id, emb[$lo:$hi] AS emb FROM C),
            PS0_$s AS (SELECT (row_number() OVER (ORDER BY id)) - 1 AS cid, emb AS cemb
                   FROM (SELECT * FROM CT$s ORDER BY id LIMIT $kc)),
            ${ivfRound(s"PS0_$s", s"PA1_$s", s"PP1_$s", s"PM1_$s", s"PS1_$s", s"CT$s")},
            ${ivfRound(s"PS1_$s", s"PA2_$s", s"PP2_$s", s"PM2_$s", s"PS2_$s", s"CT$s")},
            FS$s AS (SELECT id, emb[$lo:$hi] AS emb FROM FIN),
            ${ivfAssignCte(s"FS$s", s"PS2_$s", s"CODE$s", 1)}"""
      }.mkString(",\n")
      s"""WITH C0 AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          C AS (SELECT * FROM C0 WHERE id % 2 = 0),
          S0 AS (SELECT (row_number() OVER (ORDER BY id)) - 1 AS cid, emb AS cemb
                 FROM (SELECT * FROM C ORDER BY id LIMIT 8)),
          ${ivfRound("S0", "A1", "P1", "M1", "S1")},
          ${ivfRound("S1", "A2", "P2", "M2", "S2")},
          FIN AS (SELECT * FROM C0 WHERE id % 10 <> 0),
          ${ivfAssignCte("FIN", "S2", "CC", 1)},
          $codeCtes
          SELECT f.id, cc.cid, c0.cid AS c0, c1.cid AS c1
          FROM FIN f JOIN CC cc ON cc.id = f.id
          JOIN CODE0 c0 ON c0.id = f.id JOIN CODE1 c1 ON c1.id = f.id
          ORDER BY f.id"""
    },

    // recall curve: q21/q22's rank lists at kmax = 10, per-k filters
    "q191_recall_curve" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          Q AS (SELECT * FROM C WHERE id % 200 = 0 AND id < 2000),
          BS AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                 ${scoreFixedSql("q.emb", "c.emb")} AS s
                 FROM C c CROSS JOIN Q q WHERE q.id <> c.id),
          BR AS (SELECT query_id, neighbor_id, rn AS er FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY s DESC, neighbor_id) AS rn FROM BS) WHERE rn <= 10),
          CB AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 6)} AS bucket FROM embeddings),
          QB AS (SELECT * FROM CB WHERE id % 200 = 0 AND id < 2000),
          SB2 AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ${scoreFixedSql("q.emb", "c.emb")} AS s
                  FROM CB c JOIN QB q ON q.bucket = c.bucket AND q.id <> c.id),
          AR AS (SELECT query_id, neighbor_id, rn AS ar FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY s DESC, neighbor_id) AS rn FROM SB2) WHERE rn <= 10),
          J AS (SELECT b.query_id, b.er, a.ar FROM BR b
                LEFT JOIN AR a ON a.query_id = b.query_id
                  AND a.neighbor_id = b.neighbor_id),
          K AS (SELECT unnest([1, 3, 5, 10]) AS k),
          X AS (SELECT k.k::BIGINT AS k, j.query_id, j.er, j.ar
                FROM J CROSS JOIN K k WHERE j.er <= k.k)
          SELECT k, CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
            CAST(count(*) AS BIGINT) AS sum_exact,
            CAST(sum(CASE WHEN ar IS NOT NULL AND ar <= k THEN 1 ELSE 0 END)
              AS BIGINT) AS sum_hits,
            CAST((sum(CASE WHEN ar IS NOT NULL AND ar <= k THEN 1 ELSE 0 END)
              * 1000000) // count(*) AS BIGINT) AS recall_1e6
          FROM X GROUP BY k ORDER BY k""",

    // per-doc gate verdicts: q127's V table, row by row
    "q192_gate_verdicts" ->
      s"""WITH RECURSIVE $dedupClusterCtes,
          ${gateCtes("documents")},
          ${benchGramsCte()},
          CONTAM AS (SELECT DISTINCT d.doc_id
                 FROM (SELECT doc_id, unnest(${shingles3("text")}) AS gram
                       FROM documents) d
                 JOIN BG USING (gram)),
          REP AS (SELECT doc_id, ${repFixedSql("g")} AS rep_1e6
              FROM (SELECT doc_id, ${rawShingles3("text")} AS g FROM documents)),
          V AS (SELECT d.doc_id,
                 CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM KEEP) THEN '1_exact_dup'
                      WHEN d.doc_id IN (SELECT node FROM CL WHERE node <> cluster_id) THEN '2_near_dup'
                      WHEN g.quality_1e6 < 600000 THEN '3_quality'
                      WHEN g.predicted_lang <> 'en' THEN '4_language'
                      WHEN r.rep_1e6 >= 500000 THEN '5_repetition'
                      WHEN d.doc_id IN (SELECT doc_id FROM CONTAM) THEN '6_contaminated'
                      ELSE '7_pass' END AS gate
                FROM documents d JOIN G g USING (doc_id) JOIN REP r USING (doc_id))
          SELECT doc_id, gate FROM V ORDER BY doc_id""",

    // KMV distinct estimate: k = 256 smallest distinct gram hashes,
    // est = (k-1)*2^60 // h_k in HUGEINT, 3-sigma/sqrt(k) bound flag
    "q193_kmv_distinct" ->
      s"""WITH H AS (SELECT DISTINCT ${md5long("g")} AS h FROM
                 (SELECT unnest(${rawShingles3("text")}) AS g FROM documents)),
          MK AS (SELECT h FROM H ORDER BY h LIMIT 256),
          KT AS (SELECT max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS n_seen
                 FROM MK),
          EX AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM H),
          E AS (SELECT kt.kth_hash, ex.exact_distinct,
                 CASE WHEN kt.n_seen < 256 THEN ex.exact_distinct
                 ELSE CAST((255::HUGEINT * 1152921504606846976) // kt.kth_hash
                      AS BIGINT) END AS est_distinct
                FROM KT kt CROSS JOIN EX ex)
          SELECT CAST(256 AS BIGINT) AS k, kth_hash, est_distinct,
            exact_distinct,
            CAST(CASE WHEN (est_distinct::HUGEINT - exact_distinct)
                * (est_distinct::HUGEINT - exact_distinct) * 256
                <= 9::HUGEINT * exact_distinct * exact_distinct
              THEN 1 ELSE 0 END AS BIGINT) AS within_bound
          FROM E""",

    // MRR by label: exact and sign-bucket top-5 rankings, first
    // same-label neighbor's reciprocal rank, scalar-subquery totals
    // so zero-hit paths still emit their row
    "q194_mrr_by_label" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          LAB AS (SELECT vec_id AS id, label FROM embeddings),
          Q AS (SELECT * FROM C WHERE id % 200 = 0 AND id < 2000),
          NQ AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM Q),
          BS AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                 ${scoreFixedSql("q.emb", "c.emb")} AS s
                 FROM C c CROSS JOIN Q q WHERE q.id <> c.id),
          BR AS (SELECT query_id, neighbor_id, rn FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY s DESC, neighbor_id) AS rn FROM BS) WHERE rn <= 5),
          CB AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 6)} AS bucket FROM embeddings),
          QB AS (SELECT * FROM CB WHERE id % 200 = 0 AND id < 2000),
          SB2 AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ${scoreFixedSql("q.emb", "c.emb")} AS s
                  FROM CB c JOIN QB q ON q.bucket = c.bucket AND q.id <> c.id),
          AR AS (SELECT query_id, neighbor_id, rn FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY s DESC, neighbor_id) AS rn FROM SB2) WHERE rn <= 5),
          ER AS (SELECT r.query_id, min(r.rn) AS r FROM BR r
                 JOIN LAB nl ON nl.id = r.neighbor_id
                 JOIN LAB ql ON ql.id = r.query_id AND ql.label = nl.label
                 GROUP BY r.query_id),
          ARH AS (SELECT r.query_id, min(r.rn) AS r FROM AR r
                  JOIN LAB nl ON nl.id = r.neighbor_id
                  JOIN LAB ql ON ql.id = r.query_id AND ql.label = nl.label
                  GROUP BY r.query_id),
          EH AS (SELECT CAST(count(*) AS BIGINT) AS n_hit,
                 CAST(coalesce(sum(1000000 // r), 0) AS BIGINT) AS srr FROM ER),
          AH AS (SELECT CAST(count(*) AS BIGINT) AS n_hit,
                 CAST(coalesce(sum(1000000 // r), 0) AS BIGINT) AS srr FROM ARH)
          SELECT 'bucketed' AS path, nq.n_queries, ah.n_hit,
            CAST(ah.srr // nq.n_queries AS BIGINT) AS mrr_1e6
          FROM NQ nq CROSS JOIN AH ah
          UNION ALL
          SELECT 'exact', nq.n_queries, eh.n_hit,
            CAST(eh.srr // nq.n_queries AS BIGINT)
          FROM NQ nq CROSS JOIN EH eh
          ORDER BY path""",

    // correlation report: one-pass integer sums, r^2 in ppm + sign,
    // quality pre-scaled by 1000 so HUGEINT products stay bounded
    "q195_corr_report" ->
      s"""WITH ${gateCtes("documents")},
          XY AS (SELECT CAST(len(${toks("text")}) AS BIGINT) AS x,
                 (g.quality_1e6 // 1000) AS y
                 FROM documents d JOIN G g USING (doc_id)),
          SUMS AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,
                   sum(y::HUGEINT * y) AS syy FROM XY)
          SELECT n,
            CAST(CASE WHEN n * sxx - sx::HUGEINT * sx = 0
                   OR n * syy - sy::HUGEINT * sy = 0 THEN 0
              ELSE ((n * sxy - sx::HUGEINT * sy) * (n * sxy - sx::HUGEINT * sy)
                    * 1000000)
                   // ((n * sxx - sx::HUGEINT * sx) * (n * syy - sy::HUGEINT * sy))
              END AS BIGINT) AS r2_ppm,
            CAST(CASE WHEN n * sxy - sx::HUGEINT * sy > 0 THEN 1
              WHEN n * sxy - sx::HUGEINT * sy < 0 THEN -1
              ELSE 0 END AS BIGINT) AS sign
          FROM SUMS""",

    // inter-arrival bands: per-user lag gaps, bitlen band (0 for
    // equal timestamps), per-type histogram
    "q196_interarrival" ->
      """WITH E AS (SELECT user_id, event_type, event_id,
                epoch_us(ts) AS ts_us FROM events),
          P AS (SELECT event_type, ts_us - lag(ts_us) OVER (
                 PARTITION BY user_id ORDER BY ts_us, event_id) AS gap FROM E),
          B AS (SELECT event_type,
                 CASE WHEN gap = 0 THEN 0
                 ELSE CAST(length(bin(gap)) AS BIGINT) END AS band
                FROM P WHERE gap IS NOT NULL)
          SELECT event_type, band, CAST(count(*) AS BIGINT) AS n_gaps
          FROM B GROUP BY event_type, band ORDER BY event_type, band""",

    // dataset card: one per-doc projection (hash + tokens + gates),
    // totals + TakeOrdered(1) language mode
    "q197_dataset_card" ->
      s"""WITH ${gateCtes("documents")},
          PD AS (SELECT d.doc_id, md5(d.text) AS h,
                 CAST(len(${toks("text")}) AS BIGINT) AS ntok,
                 g.quality_1e6 AS q, g.predicted_lang AS lang
                 FROM documents d JOIN G g USING (doc_id)),
          T AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(ntok) AS BIGINT) AS n_tokens,
                CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_content,
                CAST(sum(q) AS BIGINT) AS sq FROM PD),
          TOP AS (SELECT lang AS majority_lang, CAST(count(*) AS BIGINT) AS ln
                  FROM PD GROUP BY lang ORDER BY ln DESC, lang LIMIT 1)
          SELECT t.n_docs, t.n_tokens, t.n_distinct_content,
            ((t.n_docs - t.n_distinct_content) * 1000000) // t.n_docs
              AS exact_dup_ppm,
            t.sq // t.n_docs AS mean_quality_1e6,
            top.majority_lang,
            (top.ln * 1000000) // t.n_docs AS majority_ppm
          FROM T t CROSS JOIN TOP top""",

    // bucket balance: md5 mod 16 buckets, shares + max/mean ppm
    "q198_bucket_balance" ->
      s"""WITH B AS (SELECT (${md5long("cast(doc_id as varchar)")} % 16) AS bucket
                 FROM documents),
          C AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
                FROM B GROUP BY bucket),
          T AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t,
                CAST(max(n_rows) AS BIGINT) AS mx,
                CAST(count(*) AS BIGINT) AS nb FROM C)
          SELECT bucket, n_rows,
            (n_rows * 1000000) // t.t AS share_ppm,
            (t.mx * t.nb * 1000000) // t.t AS imbalance_ppm
          FROM C CROSS JOIN T t ORDER BY bucket""",

    // pipeline run report: the q127 verdict chain folded to stage
    // counts, survivors projected once for split/token/packing math
    "q199_pipeline_report" -> {
      val splits = graft.operators.Sampling.DemoSplits
      val uppers = splits.scanLeft(0L)(_ + _._2).tail
      val cases = splits.zip(uppers).init
        .map { case ((l, _), u) => s"WHEN b < $u THEN '$l'" }.mkString(" ")
      val splitCase = s"CASE $cases ELSE '${splits.last._1}' END"
      s"""WITH RECURSIVE $dedupClusterCtes,
          ${gateCtes("documents")},
          ${benchGramsCte()},
          CONTAM AS (SELECT DISTINCT d.doc_id
                 FROM (SELECT doc_id, unnest(${shingles3("text")}) AS gram
                       FROM documents) d
                 JOIN BG USING (gram)),
          REP AS (SELECT doc_id, ${repFixedSql("g")} AS rep_1e6
              FROM (SELECT doc_id, ${rawShingles3("text")} AS g FROM documents)),
          V AS (SELECT d.doc_id,
                 CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM KEEP) THEN '1_exact_dup'
                      WHEN d.doc_id IN (SELECT node FROM CL WHERE node <> cluster_id) THEN '2_near_dup'
                      WHEN g.quality_1e6 < 600000 THEN '3_quality'
                      WHEN g.predicted_lang <> 'en' THEN '4_language'
                      WHEN r.rep_1e6 >= 500000 THEN '5_repetition'
                      WHEN d.doc_id IN (SELECT doc_id FROM CONTAM) THEN '6_contaminated'
                      ELSE '7_pass' END AS gate
                FROM documents d JOIN G g USING (doc_id) JOIN REP r USING (doc_id)),
          CN AS (SELECT CAST(count(*) AS BIGINT) AS n_raw,
                 CAST(sum(CASE WHEN gate <> '1_exact_dup' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_after_exact,
                 CAST(sum(CASE WHEN gate NOT IN ('1_exact_dup', '2_near_dup')
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_after_near,
                 CAST(sum(CASE WHEN gate = '7_pass' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_curated FROM V),
          P AS (SELECT d.doc_id, CAST(len(${toks("text")}) AS BIGINT) AS ntok,
                 (${md5long("cast(d.doc_id as varchar)")} % 1000000) AS b,
                 (${md5long("cast(d.doc_id as varchar)")} % 4) AS shard
                FROM documents d JOIN V v ON v.doc_id = d.doc_id
                  AND v.gate = '7_pass'),
          PA AS (SELECT CAST(sum(ntok) AS BIGINT) AS tokens_curated,
                 CAST(sum(CASE WHEN ($splitCase) = 'train' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_train,
                 CAST(sum(CASE WHEN ($splitCase) = 'val' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_val,
                 CAST(sum(CASE WHEN ($splitCase) = 'test' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_test FROM P),
          SQ AS (SELECT CAST(sum((tot + 511) // 512) AS BIGINT) AS n_seqs
                 FROM (SELECT shard, CAST(sum(ntok) AS BIGINT) AS tot
                       FROM P GROUP BY shard))
          SELECT cn.n_raw, cn.n_after_exact, cn.n_after_near, cn.n_curated,
            pa.tokens_curated, pa.n_train, pa.n_val, pa.n_test, sq.n_seqs
          FROM CN cn CROSS JOIN PA pa CROSS JOIN SQ sq"""
    },

    // TPC-H Q5 shape: 6-table local-supplier volume, floor-cents sum
    "q200_local_supplier_volume" ->
      """SELECT n_name,
           cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100)
             as bigint)) as bigint) AS revenue_c,
           cast(count(*) as bigint) AS n_lineitems
         FROM region JOIN nation ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
           AND s_nationkey = c_nationkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue_c DESC, n_name""",

    // q175's calibration histogram over q164's two-level (cid, cid2)
    // subcells — the linear-pair-mass production form: the oracle
    // re-derives both quantizer levels exactly as q164 does, then
    // runs q175's bucket/cumulative tail over the subcell pairs
    "q201_semantic_cos_hist2" ->
      s"""WITH C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          KP AS (SELECT CAST(least(4096, greatest(4, floor(sqrt(
                   ((count(*) + 31) // 32)::DOUBLE)))) AS BIGINT) AS k FROM C),
          S0 AS (SELECT rn - 1 AS cid, emb AS cemb FROM
                 (SELECT row_number() OVER (ORDER BY id) AS rn, emb FROM C)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfRound("S0", "A1", "P1", "M1", "S1")},
          ${ivfRound("S1", "A2", "P2", "M2", "S2")},
          ${ivfAssignCte("C", "S2", "CC1", 1)},
          SS0 AS (SELECT cid, rn - 1 AS cid2, emb AS cemb FROM
                 (SELECT cid, emb, row_number() OVER (PARTITION BY cid
                    ORDER BY id) AS rn FROM CC1)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfSubRound("SS0", "AA1", "PP1", "MM1", "SS1", "CC1")},
          ${ivfSubRound("SS1", "AA2", "PP2", "MM2", "SS2", "CC1")},
          CC2 AS (SELECT id, emb, cid, cid2 FROM (
                 SELECT c.id, c.emb, c.cid, s.cid2,
                   row_number() OVER (PARTITION BY c.id
                     ORDER BY ${scoreFixedSafeSql("c.emb", "s.cemb")} DESC, s.cid2) AS rn
                 FROM CC1 c JOIN SS2 s ON s.cid = c.cid) WHERE rn = 1),
          SP AS (SELECT ${scoreFixedSafeSql("a.emb", "b.emb")} AS cos
                 FROM CC2 a JOIN CC2 b ON a.cid = b.cid AND a.cid2 = b.cid2
                   AND a.id < b.id),
          HB AS (SELECT (cos // 50000) * 50000 AS bucket_lo_1e6,
                 CAST(count(*) AS BIGINT) AS n_pairs FROM SP GROUP BY 1)
          SELECT bucket_lo_1e6, n_pairs,
            CAST(sum(n_pairs) OVER (ORDER BY bucket_lo_1e6 DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS n_pairs_ge
          FROM HB ORDER BY bucket_lo_1e6 DESC""",

    // KMV production form: q193 minus the exact-distinct audit — the
    // k-set alone determines the row; when fewer than k distinct
    // grams exist the k-set holds all of them, so the estimate IS
    // that count
    "q202_kmv_sketch" ->
      s"""WITH H AS (SELECT DISTINCT ${md5long("g")} AS h FROM
                 (SELECT unnest(${rawShingles3("text")}) AS g FROM documents)),
          MK AS (SELECT h FROM H ORDER BY h LIMIT 256),
          KT AS (SELECT max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS n_seen
                 FROM MK)
          SELECT CAST(256 AS BIGINT) AS k, kth_hash,
            CAST(CASE WHEN n_seen < 256 THEN n_seen
                 ELSE CAST((255::HUGEINT * 1152921504606846976) // kth_hash
                      AS BIGINT) END AS BIGINT) AS est_distinct
          FROM KT""",

    // three-level semantic dedup: the q164 chain + a THIRD trained
    // level keyed on the composite cid·k + cid2 (ivfSubRound is
    // level-count-agnostic once the composite is renamed cid); k per
    // level = smallest c >= 2 with c^3 >= ceil(n/32), exact integer
    // via the q84 range-scan idiom, clamped to 1024 like the engine.
    // CB is MATERIALIZED: without the barrier DuckDB inlines the full
    // level-1+2 chain into every one of the level-3 rounds' multiple
    // CB references and the doubled-depth expansion OOMs the oracle
    // even at 500 vectors (measured); with it the query runs in ~4 s
    "q203_semantic_3level" ->
      s"""WITH RECURSIVE C AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          KT3 AS (SELECT ((count(*) + 31) // 32) AS kt FROM C),
          KP AS (SELECT CAST(least(1024, greatest(2, coalesce(
                   (SELECT min(b) FROM range(2, 1026) t(b), KT3
                    WHERE b*b*b >= KT3.kt), 1024))) AS BIGINT) AS k),
          S0 AS (SELECT rn - 1 AS cid, emb AS cemb FROM
                 (SELECT row_number() OVER (ORDER BY id) AS rn, emb FROM C)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfRound("S0", "A1", "P1", "M1", "S1")},
          ${ivfRound("S1", "A2", "P2", "M2", "S2")},
          ${ivfAssignCte("C", "S2", "CC1", 1)},
          SS0 AS (SELECT cid, rn - 1 AS cid2, emb AS cemb FROM
                 (SELECT cid, emb, row_number() OVER (PARTITION BY cid
                    ORDER BY id) AS rn FROM CC1)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfSubRound("SS0", "AA1", "PP1", "MM1", "SS1", "CC1")},
          ${ivfSubRound("SS1", "AA2", "PP2", "MM2", "SS2", "CC1")},
          CC2 AS (SELECT id, emb, cid, cid2 FROM (
                 SELECT c.id, c.emb, c.cid, s.cid2,
                   row_number() OVER (PARTITION BY c.id
                     ORDER BY ${scoreFixedSafeSql("c.emb", "s.cemb")} DESC, s.cid2) AS rn
                 FROM CC1 c JOIN SS2 s ON s.cid = c.cid) WHERE rn = 1),
          CB AS MATERIALIZED (SELECT id, emb,
                 cid * (SELECT k FROM KP) + cid2 AS cid FROM CC2),
          TT0 AS (SELECT cid, rn - 1 AS cid2, emb AS cemb FROM
                 (SELECT cid, emb, row_number() OVER (PARTITION BY cid
                    ORDER BY id) AS rn FROM CB)
                 WHERE rn <= (SELECT k FROM KP)),
          ${ivfSubRound("TT0", "BB1", "QQ1", "NN1", "TT1", "CB")},
          ${ivfSubRound("TT1", "BB2", "QQ2", "NN2", "TT2", "CB")},
          CC3 AS (SELECT id, emb, cid, cid2 FROM (
                 SELECT c.id, c.emb, c.cid, s.cid2,
                   row_number() OVER (PARTITION BY c.id
                     ORDER BY ${scoreFixedSafeSql("c.emb", "s.cemb")} DESC, s.cid2) AS rn
                 FROM CB c JOIN TT2 s ON s.cid = c.cid) WHERE rn = 1),
          SPAIRS AS (SELECT a.id AS id_a, b.id AS id_b
                 FROM CC3 a JOIN CC3 b ON a.cid = b.cid AND a.cid2 = b.cid2
                   AND a.id < b.id
                 WHERE ${scoreFixedSql("a.emb", "b.emb")} >= 950000),
          SEDGES AS (SELECT id_a AS src, id_b AS dst FROM SPAIRS
                 UNION SELECT id_b, id_a FROM SPAIRS),
          SREACH(node, r) AS (
            SELECT src, src FROM SEDGES
            UNION
            SELECT e.dst, r.r FROM SREACH r JOIN SEDGES e ON e.src = r.node),
          SCOMP AS (SELECT node AS id, min(r) AS rep FROM SREACH GROUP BY node)
          SELECT c.id, coalesce(p.rep, c.id) AS rep_id,
            CAST(CASE WHEN coalesce(p.rep, c.id) = c.id THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM C c LEFT JOIN SCOMP p USING (id) ORDER BY c.id""",

    // incremental semantic admission: replay of the two-batch ingest —
    // batch 1 admits everything into the empty index, batch 2 rejects
    // on (shared adaptive sign bucket ∧ cosine ≥ threshold) against
    // batch 1's admitted set; bits re-derived from count(*), the q84
    // idiom
    "q204_inc_semantic" ->
      s"""WITH NE AS (SELECT count(*)::BIGINT AS n FROM embeddings),
          SB AS (SELECT greatest(4, least(30, b))::BIGINT AS bits
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NE
                      WHERE (1::BIGINT << b) >= NE.n)),
          C AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 30)} & ((1::BIGINT << sb.bits) - 1) AS bucket
                FROM embeddings, SB sb),
          B1 AS (SELECT * FROM C WHERE id % 2 = 0),
          B2 AS (SELECT * FROM C WHERE id % 2 = 1),
          REJ AS (SELECT DISTINCT b.id FROM B2 b JOIN B1 h ON b.bucket = h.bucket
                  WHERE ${scoreFixedSafeSql("b.emb", "h.emb")} >= 200000)
          SELECT id, bucket, CAST(batch_no AS BIGINT) AS batch_no FROM (
            SELECT id, bucket, 1 AS batch_no FROM B1
            UNION ALL
            SELECT id, bucket, 2 AS batch_no FROM B2
            WHERE id NOT IN (SELECT id FROM REJ))
          ORDER BY id""",

    // semantic ingest gate over a PQ-CODED index: the q204 replay with
    // history scored from codes alone — training (two deterministic
    // k-means rounds per subspace), codes, buckets, the batch-2 LUT
    // and the ADC reject set all re-derived here; the snapshot's code
    // columns are part of the compared output
    "q246_inc_semantic_pq" -> {
      val (m, kc, sub) = (2, 4, 32)
      val trains = (0 until m).map(s =>
        pqTrainCodesCtes(s, kc, sub, "CE")).mkString(",\n")
      val luts = (0 until m).map(s =>
        s"""LUT$s AS (SELECT c.id AS query_id, s2.cid,
             ${scoreFixedSafeSql("c.emb", "s2.cemb")} AS contrib
            FROM C$s c CROSS JOIN PS2_$s s2 WHERE c.id % 2 = 1)""")
        .mkString(",\n")
      val contribs = (0 until m).map(s =>
        s"""SELECT p.bid, p.hid, l.contrib
            FROM PAIR p JOIN CODE$s ch ON ch.id = p.hid
            JOIN LUT$s l ON l.query_id = p.bid AND l.cid = ch.cid""")
        .mkString(" UNION ALL ")
      s"""WITH NE AS (SELECT count(*)::BIGINT AS n FROM embeddings),
          SB AS (SELECT greatest(4, least(30, b))::BIGINT AS bits
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NE
                      WHERE (1::BIGINT << b) >= NE.n)),
          CE AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
          BKT AS (SELECT vec_id AS id,
                 ${signBucketSql("embedding", 30)}
                   & ((1::BIGINT << sb.bits) - 1) AS bucket
                FROM embeddings, SB sb),
          $trains,
          $luts,
          PAIR AS (SELECT b.id AS bid, h.id AS hid
                   FROM BKT b JOIN BKT h ON b.bucket = h.bucket
                   WHERE b.id % 2 = 1 AND h.id % 2 = 0),
          CONTRIB AS ($contribs),
          ADC AS (SELECT bid, hid, CAST(sum(contrib) AS BIGINT) AS adc
                  FROM CONTRIB GROUP BY 1, 2),
          REJ AS (SELECT DISTINCT bid AS id FROM ADC
                  WHERE adc >= ${200000L * m}),
          SNAP AS (SELECT c0.id, CAST(c0.cid AS BIGINT) AS code0,
                    CAST(c1.cid AS BIGINT) AS code1
                   FROM CODE0 c0 JOIN CODE1 c1 ON c1.id = c0.id)
          SELECT s.id, b.bucket, s.code0, s.code1,
            CAST(CASE WHEN s.id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
              AS batch_no
          FROM SNAP s JOIN BKT b ON b.id = s.id
          WHERE s.id % 2 = 0 OR s.id NOT IN (SELECT id FROM REJ)
          ORDER BY s.id"""
    },

    // q45's skew-cap path: identical banding, but buckets with more
    // than 8 members are dropped wholesale before any pair forms
    "q205_simhash_capped" -> {
      val hashes = s"list_transform(${toks("lower(text)")}, t -> ${md5long("t")})"
      s"""WITH HS AS (SELECT doc_id, $hashes AS H FROM documents),
          S AS (SELECT doc_id, ${simhashSql(32)} AS sim FROM HS
                WHERE len(H) > 0),
          B AS (SELECT doc_id, sim, t.band AS band, (sim >> (t.band * 8)) & 255 AS bval
                FROM S CROSS JOIN (SELECT unnest(range(4)) AS band) t),
          SZ AS (SELECT band, bval FROM
                 (SELECT band, bval, count(*) AS n FROM B GROUP BY band, bval)
                 WHERE n <= 8),
          BC AS (SELECT b.doc_id, b.sim, b.band, b.bval
                 FROM B b JOIN SZ USING (band, bval)),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  cast(bit_count(xor(a.sim, b2.sim)) as bigint) AS hamming
                FROM BC a JOIN BC b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id)
          SELECT id_a, id_b, hamming FROM P WHERE hamming <= 3
          ORDER BY id_a, id_b"""
    },

    // perceptual aHash over the engine's synthesize→BMP-encode→decode
    // round-trip: BMP is lossless, so the oracle re-derives every
    // pixel from the same md5 chain arithmetically (no codec) — for
    // the 8x8 raster each pixel is its own cell, so bit i = 64·g_i >
    // Σg. The 64-bit hash assembles in HUGEINT (DuckDB refuses
    // 1<<63 in BIGINT) and wraps to two's complement at the end
    "q206_image_ahash" ->
      s"""WITH SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|' || i::VARCHAR")} & 255) AS g
                FROM SD),
          S AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS total FROM G),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S)
          SELECT doc_id,
            CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
                 THEN uh - 18446744073709551616::HUGEINT ELSE uh END
                 AS BIGINT) AS ahash,
            CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height
          FROM H ORDER BY doc_id""",

    // audio-envelope fingerprint over the engine's synthesize→WAV-
    // encode→decode round-trip: PCM WAV is lossless, so the oracle
    // re-derives every sample from the same md5 chain arithmetically
    // (no codec) — 128 samples in 64 blocks of 2, bit b =
    // 64·(s_{2b}+s_{2b+1}) > Σs (the cross-multiplied block-mean-vs-
    // global-mean compare with n=128, blockN=2). HUGEINT assembly +
    // two's-complement wrap, the q206 idiom
    "q207_audio_envelope" ->
      s"""WITH SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 128), i ->
                   ${md5long("seed || '|a' || i::VARCHAR")} & 255) AS s
                FROM SD),
          S AS (SELECT doc_id, s, CAST(list_sum(s) AS BIGINT) AS total FROM G),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), b ->
                   CASE WHEN 64 * (s[2*b+1] + s[2*b+2]) > total
                     THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)) AS uh
                FROM S)
          SELECT doc_id,
            CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
                 THEN uh - 18446744073709551616::HUGEINT ELSE uh END
                 AS BIGINT) AS afp,
            CAST(128 AS BIGINT) AS n_samples,
            CAST(8000 AS BIGINT) AS sample_rate_hz
          FROM H ORDER BY doc_id""",

    // audio near-dup candidates: the q207 fingerprint CTE feeds the
    // q82 banding idiom — 16-bit band strides masked to the
    // count(*)-derived width (suggestSimhashParams' log2 law), every
    // bucket-cohabiting pair kept (the q23 rationale), hamming over
    // the full 64-bit fingerprint via xor/bit_count on the signed wrap
    "q208_audio_neardup" ->
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 128), i ->
                   ${md5long("seed || '|a' || i::VARCHAR")} & 255) AS s
                FROM SD),
          S AS (SELECT doc_id, s, CAST(list_sum(s) AS BIGINT) AS total FROM G),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), b ->
                   CASE WHEN 64 * (s[2*b+1] + s[2*b+2]) > total
                     THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)) AS uh
                FROM S),
          F AS (SELECT doc_id, uh,
                 CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
                      THEN uh - 18446744073709551616::HUGEINT ELSE uh END
                      AS BIGINT) AS afp
                FROM H),
          B AS (SELECT doc_id, afp, t.band AS band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM F, BB bb, (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  cast(bit_count(xor(a.afp, b2.afp)) as bigint) AS hamming
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id)
          SELECT id_a, id_b, hamming, (SELECT bb FROM BB) AS mask_bits
          FROM P ORDER BY id_a, id_b""",

    // image near-dup candidates: the q206 aHash CTE through the q208
    // banding oracle verbatim (one fingerprint-pairing semantics for
    // every modality)
    "q209_image_neardup" ->
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|' || i::VARCHAR")} & 255) AS g
                FROM SD),
          S AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS total FROM G),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S),
          F AS (SELECT doc_id, uh,
                 CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
                      THEN uh - 18446744073709551616::HUGEINT ELSE uh END
                      AS BIGINT) AS ahash
                FROM H),
          B AS (SELECT doc_id, ahash, t.band AS band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM F, BB bb, (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                  cast(bit_count(xor(a.ahash, b2.ahash)) as bigint) AS hamming
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id)
          SELECT id_a, id_b, hamming, (SELECT bb FROM BB) AS mask_bits
          FROM P ORDER BY id_a, id_b""",

    // audio resample: the q207 samples decimated 2:1 by exact
    // box-filter floor-average (// truncates; levels non-negative, so
    // floor ≡ trunc on both engines), then the 64-sample envelope
    // fingerprint (block size 1: bit b = 64·s2_b > Σs2) — the engine
    // pays two real codec round-trips for the same arithmetic
    "q210_audio_resample" ->
      s"""WITH SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 128), i ->
                   ${md5long("seed || '|a' || i::VARCHAR")} & 255) AS s
                FROM SD),
          D AS (SELECT doc_id,
                 list_transform(range(0, 64), i ->
                   (s[2*i+1] + s[2*i+2]) // 2) AS s2
                FROM G),
          S AS (SELECT doc_id, s2, CAST(list_sum(s2) AS BIGINT) AS total FROM D),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), b ->
                   CASE WHEN 64 * s2[b+1] > total
                     THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)) AS uh
                FROM S)
          SELECT doc_id,
            CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
                 THEN uh - 18446744073709551616::HUGEINT ELSE uh END
                 AS BIGINT) AS afp,
            CAST(64 AS BIGINT) AS n_samples,
            CAST(4000 AS BIGINT) AS sample_rate_hz
          FROM H ORDER BY doc_id""",

    // MP4 demux: the synthesized layout is deterministic — ftyp(16) +
    // mdat header(8) = 24, then 32-byte frames in 3-frame chunks with
    // 8 pad bytes before every chunk after the first, so frame i sits
    // at 24 + 32·i + 8·(i div 3); the ENGINE must re-derive these by
    // actually walking stco/stsc/stsz. Frame content pins via
    // md5Long of the sliced ASCII bytes (= the frame's hex string)
    "q211_video_frames" ->
      s"""WITH SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          F AS (SELECT doc_id, t.i AS i,
                 md5(seed || '|v' || t.i::VARCHAR) AS fhex
                FROM SD, (SELECT unnest(range(8)) AS i) t)
          SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
            CAST(24 + 32 * i + 8 * (i // 3) AS BIGINT) AS frame_off,
            CAST(32 AS BIGINT) AS frame_len,
            ${md5long("fhex")} AS frame_fp
          FROM F ORDER BY doc_id, frame_no""",

    // image dup-mass histogram: the q209 candidate graph through the
    // q36 recursive-reachability clustering and the q132 size rollup
    "q212_image_dup_clusters" ->
      s"""WITH RECURSIVE
          NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|' || i::VARCHAR")} & 255) AS g
                FROM SD),
          S AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS total FROM G),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S),
          B AS (SELECT doc_id, t.band AS band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM H, BB bb, (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id),
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM P
                    UNION SELECT id_b, id_a FROM P),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
          CL AS (SELECT node, min(r) AS cluster_id FROM REACH GROUP BY node),
          SZ AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                FROM CL GROUP BY cluster_id)
          SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
            cluster_size * CAST(count(*) AS BIGINT) AS n_docs
          FROM SZ GROUP BY cluster_size ORDER BY cluster_size""",

    // the bipartite-CC twin shares q212's oracle verbatim: identical
    // components by construction (see qImageDupClusters2)
    "q216_image_dup_clusters2" ->
      s"""WITH RECURSIVE
          NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|' || i::VARCHAR")} & 255) AS g
                FROM SD),
          S AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS total FROM G),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S),
          B AS (SELECT doc_id, t.band AS band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM H, BB bb, (SELECT unnest(range(4)) AS band) t),
          P AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
                FROM B a JOIN B b2 ON a.band = b2.band AND a.bval = b2.bval
                  AND a.doc_id < b2.doc_id),
          EDGES AS (SELECT id_a AS src, id_b AS dst FROM P
                    UNION SELECT id_b, id_a FROM P),
          REACH(node, r) AS (
            SELECT src, src FROM EDGES
            UNION
            SELECT e.dst, r.r FROM REACH r JOIN EDGES e ON e.src = r.node),
          CL AS (SELECT node, min(r) AS cluster_id FROM REACH GROUP BY node),
          SZ AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                FROM CL GROUP BY cluster_id)
          SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
            cluster_size * CAST(count(*) AS BIGINT) AS n_docs
          FROM SZ GROUP BY cluster_size ORDER BY cluster_size""",

    // distributed BPE training: the q81 unrolled merge rounds, but the
    // CHECKED OUTPUT is the training trace itself — each round's
    // winning pair and its freq-weighted count (B$k now carries cnt)
    "q213_bpe_train" -> {
      val n = graft.operators.Bpe.DefaultMerges
      s"""WITH ${bpeCtes(n, graft.operators.Bpe.DefaultVocabCap)}
          SELECT * FROM (${(1 to n).map(k =>
            s"SELECT CAST($k AS BIGINT) AS round, a AS sym_a, b AS sym_b, " +
            s"cnt AS pair_count FROM B$k").mkString(" UNION ALL ")})
          ORDER BY round"""
    },

    // incremental multimodal admission: evens ingest into an empty
    // index (distinct-fp firsts all admit), odds then reject on exact
    // fp identity OR any masked-band collision with the committed
    // evens (the engine's maxHamming=64 keeps every collision) — the
    // q209 aHash CTEs + the q82 width derivation, replayed as the
    // two-batch admission sequence
    "q214_inc_media" ->
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((NB.n + 1) // 2))),
          SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          G AS (SELECT doc_id,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|' || i::VARCHAR")} & 255) AS g
                FROM SD),
          S AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS total FROM G),
          H AS (SELECT doc_id,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S),
          F AS (SELECT doc_id, uh,
                 CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
                      THEN uh - 18446744073709551616::HUGEINT ELSE uh END
                      AS BIGINT) AS ahash
                FROM H),
          A1 AS (SELECT min(doc_id) AS media_id, ahash, uh
                FROM F WHERE doc_id % 2 = 0 GROUP BY ahash, uh),
          F2 AS (SELECT min(doc_id) AS media_id, ahash, uh
                FROM F WHERE doc_id % 2 = 1 GROUP BY ahash, uh),
          X2 AS (SELECT f2.* FROM F2 f2
                WHERE f2.ahash NOT IN (SELECT ahash FROM A1)),
          BA1 AS (SELECT media_id, t.band AS band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM A1, BB bb, (SELECT unnest(range(4)) AS band) t),
          BX2 AS (SELECT media_id, t.band AS band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM X2, BB bb, (SELECT unnest(range(4)) AS band) t),
          RJ AS (SELECT DISTINCT x.media_id FROM BX2 x
                JOIN BA1 a ON x.band = a.band AND x.bval = a.bval),
          A2 AS (SELECT x.media_id, x.ahash FROM X2 x
                WHERE x.media_id NOT IN (SELECT media_id FROM RJ))
          SELECT media_id, ahash AS fp, CAST(1 AS BIGINT) AS batch_no FROM A1
          UNION ALL
          SELECT media_id, ahash, CAST(2 AS BIGINT) FROM A2
          ORDER BY media_id""",

    // KMV mergeability: per-source k-min sets, plus the `_merged` row
    // rebuilt ONLY from those k-sets (union → distinct → k smallest) —
    // losslessly equal to the direct global sketch (q202's formula)
    "q215_kmv_merge" ->
      s"""WITH D AS (SELECT DISTINCT source, ${md5long("g")} AS h FROM
                 (SELECT source, unnest(${rawShingles3("text")}) AS g
                  FROM documents)),
          MS AS (SELECT source, h FROM
                 (SELECT source, h, row_number() OVER
                    (PARTITION BY source ORDER BY h) AS rn FROM D)
                WHERE rn <= 256),
          PS AS (SELECT source, max(h) AS kth_hash,
                 CAST(count(*) AS BIGINT) AS n FROM MS GROUP BY source),
          MM AS (SELECT h FROM (SELECT DISTINCT h FROM MS)
                ORDER BY h LIMIT 256),
          MK AS (SELECT max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS n
                FROM MM)
          SELECT source, CAST(256 AS BIGINT) AS k, kth_hash,
            CAST(CASE WHEN n < 256 THEN n
                 ELSE CAST((255::HUGEINT * 1152921504606846976) // kth_hash
                      AS BIGINT) END AS BIGINT) AS est_distinct
          FROM (SELECT source, kth_hash, n FROM PS
                UNION ALL SELECT '_merged', kth_hash, n FROM MK)
          ORDER BY source""",

    // count-min mergeability, PORTABLE form: the sketch's md5-hashed
    // cells and depth×width counter relation are replayed verbatim
    // here, so the estimates and ALL flags — including the
    // probabilistic upper bound that rounds 7–11 asserted as a
    // constant — are computed identically on both engines (the
    // q221/q224 within_bound idiom): an out-of-bound item would emit
    // 0 on BOTH sides and still hash-match. merged = per-source
    // counters summed (counter addition IS the CMS merge), direct =
    // counted straight off the stream; est = min over depth cells.
    "q217_cms_merge" -> {
      val (depth, width) = (4, 8192)
      val prefixes = (0 until depth).map(r => s"($r, 'cms$r:')").mkString(", ")
      s"""WITH E AS (SELECT source, unnest(${toks("lower(text)")}) AS token
                FROM documents),
          N AS (SELECT CAST(count(*) AS BIGINT) AS n FROM E),
          G AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM E GROUP BY token),
          R AS (SELECT token, cnt,
                 row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM G),
          T AS (SELECT token, cnt, CAST(rank AS BIGINT) AS rank
                FROM R WHERE rank <= 20),
          H(r, pre) AS (VALUES $prefixes),
          X AS (SELECT e.source, h.r,
                 ${md5long("h.pre || e.token")} % $width AS cell
                FROM E e, H h),
          PS AS (SELECT source, r, cell, CAST(count(*) AS BIGINT) AS c
                FROM X GROUP BY 1, 2, 3),
          M AS (SELECT r, cell, CAST(sum(c) AS BIGINT) AS c
                FROM PS GROUP BY 1, 2),
          DIR AS (SELECT r, cell, CAST(count(*) AS BIGINT) AS c
                FROM X GROUP BY 1, 2),
          TE AS (SELECT t.token, t.rank, t.cnt,
                 CAST(min(m.c) AS BIGINT) AS est,
                 CAST(min(d.c) AS BIGINT) AS est_direct
                FROM T t JOIN H h ON TRUE
                JOIN M m ON m.r = h.r
                 AND m.cell = ${md5long("h.pre || t.token")} % $width
                JOIN DIR d ON d.r = h.r AND d.cell = m.cell
                GROUP BY 1, 2, 3)
          SELECT te.token, te.rank, te.cnt, te.est,
                 CAST(CASE WHEN te.est = te.est_direct THEN 1 ELSE 0 END
                   AS BIGINT) AS merged_eq_direct,
                 CAST(CASE WHEN te.est >= te.cnt THEN 1 ELSE 0 END
                   AS BIGINT) AS cms_lower_ok,
                 CAST(CASE WHEN te.est <= te.cnt
                      + 3 * ((n.n + ${width - 1}) // $width) THEN 1 ELSE 0 END
                   AS BIGINT) AS cms_upper_ok
          FROM TE te, N n
          ORDER BY te.rank"""
    },

    // schema evolution: replay both commits — commit 2 adds n_tokens
    // — and the precombine merge; pre-evolution rows surface NULL for
    // the added column (the engine's allowMissingColumns/mergeSchema
    // path)
    "q218_schema_evolution" ->
      s"""WITH B1 AS (SELECT doc_id, lang,
                 CAST(NULL AS BIGINT) AS n_tokens,
                 CAST(1 AS BIGINT) AS batch_no FROM documents),
          U2 AS (SELECT doc_id, 'xx' AS lang,
                 CAST(len(${toks("text")}) AS BIGINT) AS n_tokens,
                 CAST(2 AS BIGINT) AS batch_no
                FROM documents WHERE doc_id % 5 = 0),
          M AS (SELECT doc_id, lang, n_tokens, batch_no FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY batch_no DESC) AS rn
                 FROM (SELECT * FROM B1 UNION ALL SELECT * FROM U2))
                WHERE rn = 1)
          SELECT doc_id, lang, n_tokens, batch_no
          FROM M ORDER BY doc_id""",

    // adaptive sign-bucket audit: bits re-derived from count(*) (the
    // q84 derivation), bucket geometry + exact pair mass via integer
    // division (both engines truncate: DuckDB // , Spark div), dup
    // count at q23's production threshold
    "q219_signbits_audit" ->
      s"""WITH NE AS (SELECT count(*)::BIGINT AS n FROM embeddings),
          SB AS (SELECT greatest(4, least(30, b))::BIGINT AS bits
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NE
                      WHERE (1::BIGINT << b) >= NE.n)),
          C AS (SELECT vec_id AS id, embedding AS emb,
                 ${signBucketSql("embedding", 30)} & ((1::BIGINT << sb.bits) - 1) AS bucket
                FROM embeddings, SB sb),
          P AS (SELECT bucket, count(*)::BIGINT AS pop FROM C GROUP BY bucket),
          G AS (SELECT (SELECT bits FROM SB) AS bits,
                 count(*)::BIGINT AS n_buckets,
                 max(pop)::BIGINT AS max_pop,
                 (sum(pop * (pop - 1)) // 2)::BIGINT AS cand_pairs
                FROM P),
          D AS (SELECT count(*)::BIGINT AS dup_pairs
                FROM C l JOIN C r ON l.bucket = r.bucket AND l.id < r.id
                WHERE ${scoreFixedSql("l.emb", "r.emb")} >= 950000)
          SELECT G.bits, G.n_buckets, G.max_pop, G.cand_pairs, D.dup_pairs
          FROM G, D""",

    // schema-migration lifecycle: replay the merge (q218's window
    // idiom); the dropped lang column never surfaces, n_tok reads wide
    // (commit-2 values exceed Int.MaxValue) under its post-rename
    // name. The flags are deterministic schema contracts the engine
    // computes from actual schemas (the q217 merged_eq_direct idiom).
    "q220_schema_migrations" ->
      s"""WITH B1 AS (SELECT doc_id,
                 CAST(len(${toks("text")}) AS BIGINT) AS tok_count,
                 CAST(1 AS BIGINT) AS pre FROM documents),
          U2 AS (SELECT doc_id,
                 CAST(len(${toks("text")}) AS BIGINT) + 3000000000 AS tok_count,
                 CAST(2 AS BIGINT) AS pre
                FROM documents WHERE doc_id % 5 = 0),
          M AS (SELECT doc_id, tok_count FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY pre DESC) AS rn
                 FROM (SELECT * FROM B1 UNION ALL SELECT * FROM U2))
                WHERE rn = 1)
          SELECT doc_id, tok_count,
            CAST(1 AS BIGINT) AS old_has_lang,
            CAST(1 AS BIGINT) AS old_n_tok_int,
            CAST(1 AS BIGINT) AS live_migrated,
            CAST(1 AS BIGINT) AS live_wide
          FROM M ORDER BY doc_id""",

    // mergeable quantile sketch: per-source bottom-k-by-hash samples,
    // `_merged` rebuilt ONLY from the k-sets (lossless — bottom-k of a
    // union is inside the union of bottom-k's, so merged_eq_direct is
    // literal 1 here and COMPUTED on the Spark side, the q215/q217
    // idiom); est = sample's ceil(q·m)-th value with (v, h) tie-break,
    // rank interval audited against the full population; the 4-sigma
    // band constants come from the same Sketches.quantileBoundPpm the
    // engine uses
    "q221_quantile_merge" -> {
      val k = 128
      val bands = Seq(50, 90, 99)
        .map(p => s"($p, ${graft.operators.Sketches.quantileBoundPpm(p, k)})")
        .mkString(", ")
      s"""WITH B AS (SELECT source,
                 ${md5long("CAST(doc_id AS VARCHAR)")} AS h,
                 CAST(n_chars AS BIGINT) AS v FROM documents),
          S AS (SELECT source, h, v FROM
                 (SELECT source, h, v, row_number() OVER
                    (PARTITION BY source ORDER BY h, v) AS rn FROM B
                  WHERE v IS NOT NULL)
                WHERE rn <= $k),
          M AS (SELECT '_merged' AS source, h, v FROM
                 (SELECT h, v, row_number() OVER (ORDER BY h, v) AS rn
                  FROM S)
                WHERE rn <= $k),
          A AS (SELECT source, h, v FROM S
                UNION ALL SELECT source, h, v FROM M),
          MS AS (SELECT source, CAST(count(*) AS BIGINT) AS m_sample
                FROM A GROUP BY source),
          R AS (SELECT source, h, v, row_number() OVER
                 (PARTITION BY source ORDER BY v, h) AS srn FROM A),
          Q(q_pct, band) AS (VALUES $bands),
          E AS (SELECT r.source, q.q_pct, q.band, ms.m_sample,
                 r.v AS est_value
                FROM R r JOIN MS ms ON ms.source = r.source
                JOIN Q q ON r.srn = (q.q_pct * ms.m_sample + 99) // 100),
          P AS (SELECT source, v FROM B
                UNION ALL SELECT '_merged', v FROM B),
          K AS (SELECT e.source, e.q_pct, e.band, e.m_sample, e.est_value,
                 CAST(count(*) AS BIGINT) AS n_pop,
                 CAST(sum(CASE WHEN p.v < e.est_value THEN 1 ELSE 0 END)
                      AS BIGINT) AS lt,
                 CAST(sum(CASE WHEN p.v <= e.est_value THEN 1 ELSE 0 END)
                      AS BIGINT) AS le
                FROM P p JOIN E e ON e.source = p.source
                GROUP BY 1, 2, 3, 4, 5)
          SELECT source, CAST(q_pct AS BIGINT) AS q_pct, n_pop, m_sample,
            est_value,
            CAST(lt * 1000000 // n_pop AS BIGINT) AS lo_ppm,
            CAST(le * 1000000 // n_pop AS BIGINT) AS hi_ppm,
            CAST(CASE WHEN n_pop <= $k THEN 1
                 WHEN q_pct * 10000 >= lt * 1000000 // n_pop - band
                  AND q_pct * 10000 <= le * 1000000 // n_pop + band THEN 1
                 ELSE 0 END AS BIGINT) AS within_bound,
            CAST(1 AS BIGINT) AS merged_eq_direct
          FROM K ORDER BY source, q_pct"""
    },

    // incremental sketch maintenance on the versioned lake: the
    // engine seeds the per-source bottom-64 sample at commit 1 and
    // maintains it from commit 2's change feed alone; lossless merge
    // makes maintained ≡ full recompute EXACTLY (adds-only commits —
    // deletes force recompute, the q188 caveat), so the oracle is the
    // full-corpus bottom-64 with literal flag 1 and the engine
    // COMPUTES maintained_eq_full (the q85/q188 maintained≡recomputed
    // idiom); p50/p90 are the sample's ceil(q·m)-th values by (v, h)
    "q222_sketch_maintain" ->
      s"""WITH B AS (SELECT source,
                 ${md5long("CAST(doc_id AS VARCHAR)")} AS h,
                 CAST(n_chars AS BIGINT) AS v FROM documents),
          S AS (SELECT source, h, v FROM
                 (SELECT source, h, v, row_number() OVER
                    (PARTITION BY source ORDER BY h, v) AS rn FROM B
                  WHERE v IS NOT NULL)
                WHERE rn <= 64),
          MS AS (SELECT source, CAST(count(*) AS BIGINT) AS m_sample
                FROM S GROUP BY source),
          R AS (SELECT source, v, row_number() OVER
                 (PARTITION BY source ORDER BY v, h) AS srn FROM S)
          SELECT r.source, ms.m_sample,
            CAST(max(CASE WHEN r.srn = (50 * ms.m_sample + 99) // 100
                 THEN r.v END) AS BIGINT) AS est_p50,
            CAST(max(CASE WHEN r.srn = (90 * ms.m_sample + 99) // 100
                 THEN r.v END) AS BIGINT) AS est_p90,
            CAST(1 AS BIGINT) AS maintained_eq_full
          FROM R r JOIN MS ms ON ms.source = r.source
          GROUP BY 1, 2 ORDER BY r.source""",

    // sketch-thresholded quantile gate: [p10, p90] per source from the
    // bottom-128 sample's order statistics (reproducible on any engine
    // that can hash and sort — the cure for approx_percentile's
    // engine-specific internals), then a scan-speed BETWEEN filter
    "q223_sketch_gate" ->
      s"""WITH B AS (SELECT source,
                 ${md5long("CAST(doc_id AS VARCHAR)")} AS h,
                 CAST(n_chars AS BIGINT) AS v FROM documents),
          S AS (SELECT source, h, v FROM
                 (SELECT source, h, v, row_number() OVER
                    (PARTITION BY source ORDER BY h, v) AS rn FROM B
                  WHERE v IS NOT NULL)
                WHERE rn <= 128),
          MS AS (SELECT source, CAST(count(*) AS BIGINT) AS m_sample
                FROM S GROUP BY source),
          R AS (SELECT source, v, row_number() OVER
                 (PARTITION BY source ORDER BY v, h) AS srn FROM S),
          T AS (SELECT r.source,
                 max(CASE WHEN r.srn = (10 * ms.m_sample + 99) // 100
                     THEN r.v END) AS lo,
                 max(CASE WHEN r.srn = (90 * ms.m_sample + 99) // 100
                     THEN r.v END) AS hi
                FROM R r JOIN MS ms ON ms.source = r.source
                GROUP BY 1)
          SELECT b.source, CAST(count(*) AS BIGINT) AS n_pass,
            CAST(min(b.v) AS BIGINT) AS min_kept,
            CAST(max(b.v) AS BIGINT) AS max_kept
          FROM B b JOIN T t ON t.source = b.source
          WHERE b.v >= t.lo AND b.v <= t.hi
          GROUP BY 1 ORDER BY b.source""",

    // KMV pairwise Jaccard: per-source k-min gram sketches → per pair,
    // the k smallest of A_k ∪ B_k sampled-in-both fraction (Broder's
    // estimator); exact Jaccard from the distinct-gram self-join as
    // the audit; the 3σ band flag is all-integer and COMPUTED on both
    // engines, so an outside-band pair still hash-matches
    "q224_kmv_jaccard" ->
      s"""WITH D AS (SELECT DISTINCT source, ${md5long("g")} AS h FROM
                 (SELECT source, unnest(${rawShingles3("text")}) AS g
                  FROM documents)),
          MS AS (SELECT source, h FROM
                 (SELECT source, h, row_number() OVER
                    (PARTITION BY source ORDER BY h) AS rn FROM D)
                WHERE rn <= 256),
          P AS (SELECT a.source AS src_a, b.source AS src_b
                FROM (SELECT DISTINCT source FROM MS) a,
                     (SELECT DISTINCT source FROM MS) b
                WHERE a.source < b.source),
          U2 AS (SELECT src_a, src_b, h,
                  max(ia) AS ia, max(ib) AS ib FROM (
                  SELECT p.src_a, p.src_b, m.h, 1 AS ia, 0 AS ib
                  FROM P p JOIN MS m ON m.source = p.src_a
                  UNION ALL
                  SELECT p.src_a, p.src_b, m.h, 0 AS ia, 1 AS ib
                  FROM P p JOIN MS m ON m.source = p.src_b)
                 GROUP BY 1, 2, 3),
          E AS (SELECT src_a, src_b,
                 CAST(count(*) AS BIGINT) AS m_union_k,
                 CAST(sum(ia * ib) AS BIGINT) AS j_num
                FROM (SELECT *, row_number() OVER
                       (PARTITION BY src_a, src_b ORDER BY h) AS urn FROM U2)
                WHERE urn <= 256 GROUP BY 1, 2),
          N AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                FROM D GROUP BY source),
          I AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS inter_exact
                FROM D a JOIN D b ON a.h = b.h AND a.source < b.source
                GROUP BY 1, 2),
          X AS (SELECT p.src_a, p.src_b,
                 CAST(coalesce(i.inter_exact, 0) AS BIGINT) AS inter_exact,
                 CAST(na.n + nb.n - coalesce(i.inter_exact, 0) AS BIGINT)
                   AS union_exact
                FROM P p JOIN N na ON na.source = p.src_a
                JOIN N nb ON nb.source = p.src_b
                LEFT JOIN I i ON i.src_a = p.src_a AND i.src_b = p.src_b),
          F AS (SELECT e.src_a, e.src_b, e.m_union_k, e.j_num,
                 CAST(e.j_num * 1000000 // e.m_union_k AS BIGINT) AS est_ppm,
                 x.inter_exact, x.union_exact,
                 CAST(x.inter_exact * 1000000 // x.union_exact AS BIGINT)
                   AS exact_ppm
                FROM E e JOIN X x ON x.src_a = e.src_a AND x.src_b = e.src_b)
          SELECT src_a, src_b, m_union_k, j_num, est_ppm, inter_exact,
            union_exact, exact_ppm,
            CAST(CASE WHEN (est_ppm - exact_ppm) * (est_ppm - exact_ppm) * 256
                 <= 9 * (exact_ppm * (1000000 - exact_ppm) + 1000000) THEN 1
                 ELSE 0 END AS BIGINT) AS within_3sig
          FROM F ORDER BY src_a, src_b""",

    // robust outlier report: per-source median + MAD from the
    // bottom-128 sample's ceil-rank order statistics (two "medians"
    // that never touch the data), then the scan-speed 3-MAD count
    "q225_robust_outliers" ->
      s"""WITH B AS (SELECT source,
                 ${md5long("CAST(doc_id AS VARCHAR)")} AS h,
                 CAST(n_chars AS BIGINT) AS v FROM documents),
          S AS (SELECT source, h, v FROM
                 (SELECT source, h, v, row_number() OVER
                    (PARTITION BY source ORDER BY h, v) AS rn FROM B
                  WHERE v IS NOT NULL)
                WHERE rn <= 128),
          MS AS (SELECT source, CAST(count(*) AS BIGINT) AS m
                FROM S GROUP BY source),
          MED AS (SELECT r.source, r.v AS med_est FROM
                 (SELECT source, v, row_number() OVER
                    (PARTITION BY source ORDER BY v, h) AS srn FROM S) r
                JOIN MS ms ON ms.source = r.source
                WHERE r.srn = (50 * ms.m + 99) // 100),
          MAD AS (SELECT r.source, r.med_est, r.dev AS mad_est FROM
                 (SELECT s.source, med.med_est, abs(s.v - med.med_est) AS dev,
                   row_number() OVER (PARTITION BY s.source
                     ORDER BY abs(s.v - med.med_est), s.h) AS srn
                  FROM S s JOIN MED med ON med.source = s.source) r
                JOIN MS ms ON ms.source = r.source
                WHERE r.srn = (50 * ms.m + 99) // 100)
          SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(t.med_est AS BIGINT) AS med_est,
            CAST(t.mad_est AS BIGINT) AS mad_est,
            CAST(sum(CASE WHEN b.v IS NOT NULL
                 AND abs(b.v - t.med_est) > 3 * t.mad_est
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          FROM B b JOIN MAD t ON t.source = b.source
          GROUP BY 1, 3, 4 ORDER BY b.source""",

    // sparse pairwise Jaccard: q224 with the pair frontier from the
    // k-set self-join — only pairs sharing a sketch hash materialize
    // (a candidate can still score 0; disjoint pairs never appear)
    "q226_kmv_jaccard_sparse" ->
      s"""WITH D AS (SELECT DISTINCT source, ${md5long("g")} AS h FROM
                 (SELECT source, unnest(${rawShingles3("text")}) AS g
                  FROM documents)),
          MS AS (SELECT source, h FROM
                 (SELECT source, h, row_number() OVER
                    (PARTITION BY source ORDER BY h) AS rn FROM D)
                WHERE rn <= 256),
          P AS (SELECT DISTINCT a.source AS src_a, b.source AS src_b
                FROM MS a JOIN MS b ON a.h = b.h AND a.source < b.source),
          U2 AS (SELECT src_a, src_b, h,
                  max(ia) AS ia, max(ib) AS ib FROM (
                  SELECT p.src_a, p.src_b, m.h, 1 AS ia, 0 AS ib
                  FROM P p JOIN MS m ON m.source = p.src_a
                  UNION ALL
                  SELECT p.src_a, p.src_b, m.h, 0 AS ia, 1 AS ib
                  FROM P p JOIN MS m ON m.source = p.src_b)
                 GROUP BY 1, 2, 3),
          E AS (SELECT src_a, src_b,
                 CAST(count(*) AS BIGINT) AS m_union_k,
                 CAST(sum(ia * ib) AS BIGINT) AS j_num
                FROM (SELECT *, row_number() OVER
                       (PARTITION BY src_a, src_b ORDER BY h) AS urn FROM U2)
                WHERE urn <= 256 GROUP BY 1, 2),
          N AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                FROM D GROUP BY source),
          I AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS inter_exact
                FROM D a JOIN D b ON a.h = b.h AND a.source < b.source
                GROUP BY 1, 2),
          X AS (SELECT p.src_a, p.src_b,
                 CAST(coalesce(i.inter_exact, 0) AS BIGINT) AS inter_exact,
                 CAST(na.n + nb.n - coalesce(i.inter_exact, 0) AS BIGINT)
                   AS union_exact
                FROM P p JOIN N na ON na.source = p.src_a
                JOIN N nb ON nb.source = p.src_b
                LEFT JOIN I i ON i.src_a = p.src_a AND i.src_b = p.src_b),
          F AS (SELECT e.src_a, e.src_b, e.m_union_k, e.j_num,
                 CAST(e.j_num * 1000000 // e.m_union_k AS BIGINT) AS est_ppm,
                 x.inter_exact, x.union_exact,
                 CAST(x.inter_exact * 1000000 // x.union_exact AS BIGINT)
                   AS exact_ppm
                FROM E e JOIN X x ON x.src_a = e.src_a AND x.src_b = e.src_b)
          SELECT src_a, src_b, m_union_k, j_num, est_ppm, inter_exact,
            union_exact, exact_ppm,
            CAST(CASE WHEN (est_ppm - exact_ppm) * (est_ppm - exact_ppm) * 256
                 <= 9 * (exact_ppm * (1000000 - exact_ppm) + 1000000) THEN 1
                 ELSE 0 END AS BIGINT) AS within_3sig
          FROM F ORDER BY src_a, src_b""",

    // compressed-frame decode through the real codec seam: 4 PNG
    // frames per doc inside a real MP4; PNG is lossless, so each
    // decoded frame's pixels re-derive arithmetically from the md5
    // chain and the per-frame aHash is the q206 8x8 form (each pixel
    // its own cell: bit i = 64·g_i > Σg, HUGEINT assembly +
    // two's-complement wrap). A hash mismatch anywhere in synth → PNG
    // encode → mux → demux → ImageIO decode → luma → aHash trips this.
    "q227_frame_decode" ->
      s"""WITH SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          FG AS (SELECT doc_id, t.f AS f,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|f' || t.f::VARCHAR || '|' || i::VARCHAR")}
                     & 255) AS g
                FROM SD, (SELECT unnest(range(4)) AS f) t),
          S AS (SELECT doc_id, f, g, CAST(list_sum(g) AS BIGINT) AS total
                FROM FG),
          H AS (SELECT doc_id, f,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S)
          SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
            CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
                 THEN uh - 18446744073709551616::HUGEINT ELSE uh END
                 AS BIGINT) AS frame_hash
          FROM H ORDER BY doc_id, frame_no""",

    // video-level near-dup candidates: the q227 frame-hash chain (PNG
    // lossless => hashes re-derive arithmetically) banded by the q212
    // idiom with the mask width re-derived from count(*)·4 frames on
    // both engines; per pair, count of DISTINCT shared (band, bucket)
    // cells. uh stays unsigned HUGEINT through the shifts — identical
    // low bits to Spark's arithmetic shiftright + sub-16-bit mask
    "q228_video_neardup" ->
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((4 * NB.n + 1) // 2))),
          SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          FG AS (SELECT doc_id, t.f AS f,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|f' || t.f::VARCHAR || '|' || i::VARCHAR")}
                     & 255) AS g
                FROM SD, (SELECT unnest(range(4)) AS f) t),
          S AS (SELECT doc_id, f, g, CAST(list_sum(g) AS BIGINT) AS total
                FROM FG),
          H AS (SELECT doc_id, f,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S),
          B AS (SELECT DISTINCT doc_id, t.band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM H, BB bb, (SELECT unnest(range(4)) AS band) t)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(count(*) AS BIGINT) AS n_shared_buckets,
            (SELECT bb FROM BB) AS mask_bits
          FROM B a JOIN B b ON a.band = b.band AND a.bval = b.bval
            AND a.doc_id < b.doc_id
          GROUP BY 1, 2 ORDER BY id_a, id_b""",

    // frontier-law audit: the q224 sketch estimates with the auto
    // path's selection law re-derived from count(DISTINCT source) —
    // at the battery's 20 sources the law routes dense, so the rows
    // are q224's sketch columns plus the law columns
    "q229_jaccard_frontier_law" ->
      s"""WITH NS AS (SELECT count(DISTINCT source)::BIGINT AS ns
                FROM documents),
          D AS (SELECT DISTINCT source, ${md5long("g")} AS h FROM
                 (SELECT source, unnest(${rawShingles3("text")}) AS g
                  FROM documents)),
          MS AS (SELECT source, h FROM
                 (SELECT source, h, row_number() OVER
                    (PARTITION BY source ORDER BY h) AS rn FROM D)
                WHERE rn <= 256),
          P AS (SELECT a.source AS src_a, b.source AS src_b
                FROM (SELECT DISTINCT source FROM MS) a,
                     (SELECT DISTINCT source FROM MS) b
                WHERE a.source < b.source),
          U2 AS (SELECT src_a, src_b, h,
                  max(ia) AS ia, max(ib) AS ib FROM (
                  SELECT p.src_a, p.src_b, m.h, 1 AS ia, 0 AS ib
                  FROM P p JOIN MS m ON m.source = p.src_a
                  UNION ALL
                  SELECT p.src_a, p.src_b, m.h, 0 AS ia, 1 AS ib
                  FROM P p JOIN MS m ON m.source = p.src_b)
                 GROUP BY 1, 2, 3),
          E AS (SELECT src_a, src_b,
                 CAST(count(*) AS BIGINT) AS m_union_k,
                 CAST(sum(ia * ib) AS BIGINT) AS j_num
                FROM (SELECT *, row_number() OVER
                       (PARTITION BY src_a, src_b ORDER BY h) AS urn FROM U2)
                WHERE urn <= 256 GROUP BY 1, 2)
          SELECT src_a, src_b, m_union_k, j_num,
            CAST(j_num * 1000000 // m_union_k AS BIGINT) AS est_ppm,
            ns.ns AS n_sources,
            CAST(CASE WHEN ns.ns >= 64 THEN 1 ELSE 0 END AS BIGINT)
              AS use_sparse
          FROM E, NS ns ORDER BY src_a, src_b""",

    "q230_rp_error_sweep" ->
      s"""WITH B AS (SELECT vec_id AS id, embedding AS emb,
                 list_transform(embedding,
                   v -> CAST(floor(v::DOUBLE * 1000000.0) AS BIGINT)) AS xf
                FROM embeddings),
          P AS (SELECT id, emb, ${rpProjSql(32, 64)} AS proj FROM B),
          PR AS (SELECT ${scoreFixedSql("a.emb", "b.emb")} AS ex,
                  a.proj AS pa, b.proj AS pb
                 FROM P a JOIN P b ON a.id + 1 = b.id),
          S AS (SELECT d.out_dims,
                 list_slice(pr.pa, 1, d.out_dims) AS sa,
                 list_slice(pr.pb, 1, d.out_dims) AS sb, pr.ex
                FROM PR pr CROSS JOIN (SELECT unnest([8, 16, 32]) AS out_dims) d),
          I AS (SELECT out_dims, ex, ${idotSql("sa", "sb")} AS dd,
                 ${idotSql("sa", "sa")} AS na, ${idotSql("sb", "sb")} AS nb
                FROM S),
          E AS (SELECT out_dims, abs(($rpCosFromDots) - ex) AS err FROM I),
          H AS (SELECT CAST(out_dims AS BIGINT) AS out_dims,
                 CAST((err // 50000) * 50000 AS BIGINT) AS bucket_lo_1e6,
                 CAST(count(*) AS BIGINT) AS n_pairs
                FROM E GROUP BY 1, 2)
          SELECT out_dims, bucket_lo_1e6, n_pairs,
            CAST(sum(n_pairs) OVER (PARTITION BY out_dims
              ORDER BY bucket_lo_1e6
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS n_le
          FROM H ORDER BY out_dims, bucket_lo_1e6""",

    "q231_rp_refine" ->
      s"""WITH B AS (SELECT vec_id AS id, embedding AS emb,
                 list_transform(embedding,
                   v -> CAST(floor(v::DOUBLE * 1000000.0) AS BIGINT)) AS xf
                FROM embeddings),
          P AS (SELECT id, emb, ${rpProjSql(16, 64)} AS proj FROM B),
          Q AS (SELECT * FROM P WHERE id % 200 = 0 AND id < 2000),
          RS AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ${idotSql("q.proj", "c.proj")} AS dd,
                  ${idotSql("q.proj", "q.proj")} AS na,
                  ${idotSql("c.proj", "c.proj")} AS nb
                 FROM P c CROSS JOIN Q q WHERE q.id <> c.id),
          RP AS (SELECT query_id, neighbor_id, $rpCosFromDots AS rp_1e6 FROM RS),
          SHORT AS (SELECT query_id, neighbor_id FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rp_1e6 DESC, neighbor_id) AS r FROM RP)
                WHERE r <= 32),
          REF AS (SELECT s.query_id, s.neighbor_id,
                  ${scoreFixedSafeSql("qe.emb", "ce.emb")} AS score_1e6
                 FROM SHORT s
                 JOIN P ce ON ce.id = s.neighbor_id
                 JOIN Q qe ON qe.id = s.query_id),
          TOPR AS (SELECT query_id, CAST(r AS BIGINT) AS rank, neighbor_id,
                  score_1e6 FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY score_1e6 DESC, neighbor_id) AS r FROM REF)
                WHERE r <= 3),
          BS AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ${scoreFixedSql("q.emb", "c.emb")} AS s
                 FROM P c CROSS JOIN Q q WHERE q.id <> c.id),
          BT AS (SELECT query_id, neighbor_id FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY s DESC, neighbor_id) AS r FROM BS)
                WHERE r <= 3)
          SELECT t.query_id, t.rank, t.neighbor_id, t.score_1e6,
            CAST(CASE WHEN EXISTS (SELECT 1 FROM BT b
              WHERE b.query_id = t.query_id
                AND b.neighbor_id = t.neighbor_id) THEN 1 ELSE 0 END
              AS BIGINT) AS in_exact
          FROM TOPR t ORDER BY t.query_id, t.rank""",

    "q232_stitch_pairs" ->
      s"""WITH T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          S AS (SELECT doc_id, tk, len(tk) AS n, len(tk) // 2 AS m
                FROM T WHERE len(tk) >= 8),
          F AS (SELECT doc_id * 2 AS fid, list_slice(tk, 1, m + 3) AS ft
                 FROM S
                UNION ALL
                SELECT doc_id * 2 + 1, list_slice(tk, m + 1, n) FROM S),
          HT AS (SELECT fid, list_slice(ft, 1, 3) AS head,
                  list_slice(ft, len(ft) - 2, len(ft)) AS tail
                 FROM F WHERE len(ft) >= 3)
          SELECT a.fid AS id_a, b.fid AS id_b,
            array_to_string(a.tail, ' ') AS overlap
          FROM HT a JOIN HT b ON a.tail = b.head AND a.fid <> b.fid
          ORDER BY id_a, id_b""",

    "q233_maintain_prio_sample" ->
      s"""WITH D AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
                 CAST(${md5long("CAST(doc_id AS VARCHAR)")} // n_chars
                   AS BIGINT) AS prio
                FROM documents),
          P1 AS (SELECT id, weight, prio FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r
                  FROM D WHERE id % 2 = 0) WHERE r <= 64),
          U AS (SELECT id, weight, prio FROM P1
                UNION ALL
                SELECT id, weight, prio FROM D WHERE id % 2 <> 0),
          M AS (SELECT id, weight, prio, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r FROM U)
                WHERE r <= 64),
          F AS (SELECT id, weight, prio, CAST(r AS BIGINT) AS rank FROM
                 (SELECT *, row_number() OVER (ORDER BY prio, id) AS r FROM D)
                WHERE r <= 64),
          BADG AS (SELECT id, prio, rank FROM
                 (SELECT id, prio, rank FROM M
                  UNION ALL SELECT id, prio, rank FROM F)
                GROUP BY id, prio, rank HAVING count(*) <> 2)
          SELECT m.id, m.weight, m.prio, m.rank,
            CAST(CASE WHEN (SELECT count(*) FROM BADG) = 0
              THEN 1 ELSE 0 END AS BIGINT) AS maintained_eq_full
          FROM M m ORDER BY m.rank""",

    "q234_prio_sample_stratum" ->
      s"""WITH D AS (SELECT source, doc_id,
                 CAST(${md5long("CAST(doc_id AS VARCHAR)")} // n_chars
                   AS BIGINT) AS prio
                FROM documents)
          SELECT source, CAST(r AS BIGINT) AS rank, doc_id, prio FROM
           (SELECT source, doc_id, prio, row_number() OVER
              (PARTITION BY source ORDER BY prio, doc_id) AS r FROM D)
          WHERE r <= 8 ORDER BY source, rank""",

    "q235_embedding_health" ->
      s"""WITH S AS (SELECT CAST(label AS BIGINT) AS label,
                 CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS is_null,
                 CASE WHEN embedding IS NOT NULL AND len(embedding) <> 64
                   THEN 1 ELSE 0 END AS bad,
                 CASE WHEN embedding IS NOT NULL AND len(embedding) = 64
                       AND len(list_filter(embedding,
                             v -> isnan(v::DOUBLE))) > 0
                   THEN 1 ELSE 0 END AS nan,
                 CASE WHEN embedding IS NOT NULL AND len(embedding) = 64
                       AND len(list_filter(embedding,
                             v -> isnan(v::DOUBLE))) = 0
                   THEN list_reduce(list_prepend(CAST(0 AS HUGEINT),
                     list_transform(embedding,
                       v -> CAST(floor(v::DOUBLE * 1000000.0) AS HUGEINT)
                          * CAST(floor(v::DOUBLE * 1000000.0) AS HUGEINT))),
                     (a, b) -> a + b)
                   ELSE NULL END AS n2
                FROM embeddings)
          SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
            CAST(sum(is_null) AS BIGINT) AS n_null,
            CAST(sum(bad) AS BIGINT) AS n_bad_dim,
            CAST(sum(nan) AS BIGINT) AS n_nan,
            CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_zero_norm,
            CAST(least(min(n2), 9223372036854775807::HUGEINT) AS BIGINT)
              AS min_norm2,
            CAST(least(max(n2), 9223372036854775807::HUGEINT) AS BIGINT)
              AS max_norm2,
            CAST(CASE WHEN count(n2) = 0 THEN NULL
              ELSE least(sum(n2) // count(n2),
                         9223372036854775807::HUGEINT) END AS BIGINT)
              AS mean_norm2
          FROM S GROUP BY label ORDER BY label""",

    "q236_stitch_reassemble" ->
      s"""WITH T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          S AS (SELECT doc_id, tk, len(tk) AS n, len(tk) // 2 AS m
                FROM T WHERE len(tk) >= 8),
          F AS (SELECT doc_id * 2 AS fid, list_slice(tk, 1, m + 3) AS ft
                 FROM S
                UNION ALL
                SELECT doc_id * 2 + 1, list_slice(tk, m + 1, n) FROM S),
          HT AS (SELECT fid, ft, list_slice(ft, 1, 3) AS head,
                  list_slice(ft, len(ft) - 2, len(ft)) AS tail
                 FROM F WHERE len(ft) >= 3),
          P AS (SELECT a.fid AS id_a, b.fid AS id_b
                FROM HT a JOIN HT b ON a.tail = b.head AND a.fid <> b.fid),
          OD AS (SELECT id_a, count(*) AS c FROM P GROUP BY 1),
          IND AS (SELECT id_b, count(*) AS c FROM P GROUP BY 1),
          U AS (SELECT p.id_a, p.id_b FROM P p
                JOIN OD o ON o.id_a = p.id_a
                JOIN IND i ON i.id_b = p.id_b
                WHERE o.c = 1 AND i.c = 1),
          R AS (SELECT u.id_a, u.id_b,
                 array_to_string(list_concat(fa.ft,
                   list_slice(fb.ft, 4, len(fb.ft))), ' ') AS text
                FROM U u
                JOIN F fa ON fa.fid = u.id_a
                JOIN F fb ON fb.fid = u.id_b)
          SELECT r.id_a // 2 AS doc_id, r.id_a, r.id_b,
            CAST(CASE WHEN r.text = array_to_string(t2.tk, ' ')
              THEN 1 ELSE 0 END AS BIGINT) AS matches_original
          FROM R r JOIN T t2 ON t2.doc_id = r.id_a // 2
          ORDER BY doc_id, id_a, id_b""",

    // q228's chain with the saturated-mask precision valve: score >= 2
    "q237_video_neardup2" ->
      s"""WITH NB AS (SELECT count(*)::BIGINT AS n FROM documents),
          BB AS (SELECT least(15, greatest(4, b))::BIGINT AS bb
                FROM (SELECT min(b)::INT AS b FROM range(0, 61) t(b), NB
                      WHERE (1::BIGINT << b) >= ((4 * NB.n + 1) // 2))),
          SD AS (SELECT doc_id, md5(coalesce(text,'')) AS seed
                FROM documents),
          FG AS (SELECT doc_id, t.f AS f,
                 list_transform(range(0, 64), i ->
                   ${md5long("seed || '|f' || t.f::VARCHAR || '|' || i::VARCHAR")}
                     & 255) AS g
                FROM SD, (SELECT unnest(range(4)) AS f) t),
          S AS (SELECT doc_id, f, g, CAST(list_sum(g) AS BIGINT) AS total
                FROM FG),
          H AS (SELECT doc_id, f,
                 list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN 64 * g[i+1] > total
                     THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS uh
                FROM S),
          B AS (SELECT DISTINCT doc_id, t.band,
                 CAST((uh >> (t.band * 16)) & ((1::HUGEINT << bb.bb) - 1)
                      AS BIGINT) AS bval
                FROM H, BB bb, (SELECT unnest(range(4)) AS band) t)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(count(*) AS BIGINT) AS n_shared_buckets,
            (SELECT bb FROM BB) AS mask_bits
          FROM B a JOIN B b ON a.band = b.band AND a.bval = b.bval
            AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY id_a, id_b""",

    "q238_big_orders" ->
      """WITH BIG AS (SELECT l_orderkey,
                cast(sum(cast(floor(l_quantity * 100) as bigint)) as bigint)
                  AS total_qty_c
               FROM lineitem GROUP BY l_orderkey
               HAVING sum(cast(floor(l_quantity * 100) as bigint)) > 25000)
         SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           b.total_qty_c
         FROM BIG b
         JOIN orders o ON o.o_orderkey = b.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         ORDER BY b.total_qty_c DESC, o.o_orderkey LIMIT 20""",

    // q232's pair set with the two-batch ingest attribution: batch 1 =
    // even fids (first halves), batch 2 = odd fids; a pair is found at
    // the ingest where its LATER side arrived
    // Bloom semi-join pruning audit: the identical md5Long bit
    // positions replayed here (m re-derived from count(*) via the
    // suggestBloomBits integer law), pass counts weighted by fact-key
    // multiplicity, false positives counted exactly, the no-false-
    // negative hard guarantee COUNTED not asserted
    "q245_bloom_prune" -> {
      val mSub = "(SELECT m FROM M)"
      // Kirsch–Mitzenmacher double hashing, mirroring Sketches.bloomPos:
      // ONE md5 per key, pos_i = (h1 + i·h2odd) mod m
      def pos(h: String, i: String) =
        s"""(($h & 1073741823)
            + $i * ((($h >> 30) & 1073741823) * 2 + 1)) % $mSub"""
      s"""WITH D AS (SELECT DISTINCT o_orderkey AS k FROM orders
                WHERE o_orderpriority = '1-URGENT'),
          N AS (SELECT CAST(count(*) AS BIGINT) AS n FROM D),
          M AS (SELECT CAST(greatest(n, 1) * 5 * 14427 // 10000 + 1
                 AS BIGINT) AS m FROM N),
          DH AS (SELECT ${md5long("CAST(k AS VARCHAR)")} AS h FROM D),
          DP AS (SELECT DISTINCT ${pos("dh.h", "t.i")} AS pos
                FROM DH dh, range(5) t(i)),
          FK AS (SELECT fk, c, ${md5long("CAST(fk AS VARCHAR)")} AS h FROM
                 (SELECT l_orderkey AS fk, CAST(count(*) AS BIGINT) AS c
                  FROM lineitem GROUP BY 1)),
          HIT AS (SELECT f.fk, f.c, CAST(count(dp.pos) AS BIGINT) AS h
                  FROM FK f CROSS JOIN range(5) t(i)
                  LEFT JOIN DP dp ON dp.pos = ${pos("f.h", "t.i")}
                  GROUP BY 1, 2),
          AG AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_fact,
                  CAST(coalesce(sum(CASE WHEN h = 5 THEN c ELSE 0 END), 0)
                    AS BIGINT) AS bloom_pass
                 FROM HIT),
          EXA AS (SELECT CAST(coalesce(sum(f.c), 0) AS BIGINT) AS exact_pass,
                   CAST(coalesce(sum(CASE WHEN hi.h = 5 THEN 0 ELSE f.c END),
                     0) AS BIGINT) AS dropped
                  FROM FK f JOIN D d ON d.k = f.fk
                  JOIN HIT hi ON hi.fk = f.fk)
          SELECT ag.n_fact, n.n AS n_dim_keys, $mSub AS m_bits,
            CAST(5 AS BIGINT) AS k, ag.bloom_pass, exa.exact_pass,
            ag.bloom_pass - exa.exact_pass AS false_pos,
            CAST(CASE WHEN exa.dropped = 0 THEN 1 ELSE 0 END AS BIGINT)
              AS no_false_neg
          FROM AG ag, N n, EXA exa"""
    },

    // KMV key-overlap report: both bottom-256 key sketches, the union
    // k-set Broder estimator, the q215 union-size estimate, and the
    // exact distinct-key audits replayed in SQL — every column a
    // deterministic integer function of the key sets (HUGEINT where
    // (k-1)·2^60 exceeds BIGINT, mirroring the engine's DECIMAL(38,0)).
    // KA/KB drop NULL keys (ADVICE r13): the operator filters
    // h IS NOT NULL on both legs, and md5long is NULL-preserving, so
    // the key-column filter states the identical rule — without it
    // DuckDB's DISTINCT would keep a NULL row and seat it NULLS LAST
    // in the k-min cut on nullable key columns
    "q251_kmv_key_overlap" -> {
      val k = 256
      def est(m: String, kth: String, sub: String) =
        s"""CASE WHEN $m < $k THEN $sub
            ELSE CAST((${k - 1}::HUGEINT * (1::HUGEINT << 60)) // $kth
                 AS BIGINT) END"""
      s"""WITH KA AS (SELECT DISTINCT ${md5long("CAST(c_custkey AS VARCHAR)")}
                 AS h FROM customer WHERE c_custkey IS NOT NULL),
          KB AS (SELECT DISTINCT ${md5long("CAST(o_custkey AS VARCHAR)")}
                 AS h FROM orders WHERE o_custkey IS NOT NULL),
          MA AS (SELECT h FROM KA ORDER BY h LIMIT $k),
          MB AS (SELECT h FROM KB ORDER BY h LIMIT $k),
          UK AS (SELECT h, max(ia) AS ia, max(ib) AS ib FROM (
                  SELECT h, 1 AS ia, 0 AS ib FROM MA
                  UNION ALL SELECT h, 0, 1 FROM MB) GROUP BY h
                 ORDER BY h LIMIT $k),
          SK AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS kth,
                  CAST(coalesce(sum(ia * ib), 0) AS BIGINT) AS j FROM UK),
          SA AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS kth FROM MA),
          SB AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS kth FROM MB),
          NA AS (SELECT CAST(count(*) AS BIGINT) AS n FROM KA),
          NB AS (SELECT CAST(count(*) AS BIGINT) AS n FROM KB),
          XI AS (SELECT CAST(count(*) AS BIGINT) AS i
                 FROM KA a JOIN KB b ON a.h = b.h),
          E AS (SELECT sk.m AS m_union_k, sk.j AS j_num,
                 ${est("sa.m", "sa.kth", "sa.m")} AS est_n_a,
                 ${est("sb.m", "sb.kth", "sb.m")} AS est_n_b,
                 ${est("sk.m", "sk.kth", "sk.m")} AS est_union,
                 na.n AS n_a, nb.n AS n_b, xi.i AS inter_exact,
                 na.n + nb.n - xi.i AS union_exact
                FROM SK sk, SA sa, SB sb, NA na, NB nb, XI xi),
          E2 AS (SELECT *,
                 CAST(CASE WHEN m_union_k = 0 THEN 0
                   ELSE j_num * 1000000 // m_union_k END AS BIGINT)
                   AS j_est_ppm,
                 CAST(CASE WHEN union_exact = 0 THEN 0
                   ELSE inter_exact * 1000000 // union_exact END AS BIGINT)
                   AS j_exact_ppm
                FROM E)
          SELECT CAST($k AS BIGINT) AS k, m_union_k, j_num,
            est_n_a, est_n_b, est_union,
            CAST(CASE WHEN m_union_k = 0 THEN 0
              ELSE j_num * est_union // m_union_k END AS BIGINT) AS est_inter,
            j_est_ppm, n_a, n_b, inter_exact, union_exact, j_exact_ppm,
            CAST(CASE WHEN (j_est_ppm - j_exact_ppm) * (j_est_ppm - j_exact_ppm)
                * $k <= 9 * (j_exact_ppm * (1000000 - j_exact_ppm) + 1000000)
              THEN 1 ELSE 0 END AS BIGINT) AS within_3sig
          FROM E2"""
    },

    // KMV key-overlap, estimate-only: q251's sketch CTEs alone (no
    // exact-audit legs) — the production sizing call's columns
    "q252_kmv_key_overlap_est" -> {
      val k = 256
      def est(m: String, kth: String, sub: String) =
        s"""CASE WHEN $m < $k THEN $sub
            ELSE CAST((${k - 1}::HUGEINT * (1::HUGEINT << 60)) // $kth
                 AS BIGINT) END"""
      s"""WITH KA AS (SELECT DISTINCT ${md5long("CAST(c_custkey AS VARCHAR)")}
                 AS h FROM customer WHERE c_custkey IS NOT NULL),
          KB AS (SELECT DISTINCT ${md5long("CAST(o_custkey AS VARCHAR)")}
                 AS h FROM orders WHERE o_custkey IS NOT NULL),
          MA AS (SELECT h FROM KA ORDER BY h LIMIT $k),
          MB AS (SELECT h FROM KB ORDER BY h LIMIT $k),
          UK AS (SELECT h, max(ia) AS ia, max(ib) AS ib FROM (
                  SELECT h, 1 AS ia, 0 AS ib FROM MA
                  UNION ALL SELECT h, 0, 1 FROM MB) GROUP BY h
                 ORDER BY h LIMIT $k),
          SK AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS kth,
                  CAST(coalesce(sum(ia * ib), 0) AS BIGINT) AS j FROM UK),
          SA AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS kth FROM MA),
          SB AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS kth FROM MB),
          E AS (SELECT sk.m AS m_union_k, sk.j AS j_num,
                 ${est("sa.m", "sa.kth", "sa.m")} AS est_n_a,
                 ${est("sb.m", "sb.kth", "sb.m")} AS est_n_b,
                 ${est("sk.m", "sk.kth", "sk.m")} AS est_union
                FROM SK sk, SA sa, SB sb)
          SELECT CAST($k AS BIGINT) AS k, m_union_k, j_num,
            est_n_a, est_n_b, est_union,
            CAST(CASE WHEN m_union_k = 0 THEN 0
              ELSE j_num * est_union // m_union_k END AS BIGINT) AS est_inter,
            CAST(CASE WHEN m_union_k = 0 THEN 0
              ELSE j_num * 1000000 // m_union_k END AS BIGINT) AS j_est_ppm
          FROM E"""
    },

    // Bloom prune, relation form: the SAME bits and double-hash
    // positions as q245 (m re-derived from count(*) via the
    // suggestBloomBits law — greatest(n, 1) mirrors the engine's
    // math.max(1L, n) clamp exactly, ADVICE r13, so the identical-bits
    // invariant holds even on an empty dim), survivors aggregated per
    // returnflag — the pruned SET itself hash-gates through the
    // relation path
    "q247_bloom_prune_rel" -> {
      val mSub = "(SELECT m FROM M)"
      def pos(h: String, i: String) =
        s"""(($h & 1073741823)
            + $i * ((($h >> 30) & 1073741823) * 2 + 1)) % $mSub"""
      s"""WITH D AS (SELECT DISTINCT o_orderkey AS k FROM orders
                WHERE o_orderpriority = '1-URGENT'),
          N AS (SELECT CAST(count(*) AS BIGINT) AS n FROM D),
          M AS (SELECT CAST(greatest(n, 1) * 5 * 14427 // 10000 + 1
                 AS BIGINT) AS m FROM N),
          DH AS (SELECT ${md5long("CAST(k AS VARCHAR)")} AS h FROM D),
          DP AS (SELECT DISTINCT ${pos("dh.h", "t.i")} AS pos
                FROM DH dh, range(5) t(i)),
          FK AS (SELECT fk, ${md5long("CAST(fk AS VARCHAR)")} AS h FROM
                 (SELECT DISTINCT l_orderkey AS fk FROM lineitem)),
          HIT AS (SELECT f.fk, CAST(count(dp.pos) AS BIGINT) AS h
                  FROM FK f CROSS JOIN range(5) t(i)
                  LEFT JOIN DP dp ON dp.pos = ${pos("f.h", "t.i")}
                  GROUP BY 1),
          P AS (SELECT fk FROM HIT WHERE h = 5)
          SELECT l.l_returnflag,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_keys,
            CAST(sum(CAST(floor(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
              AS qty_c
          FROM lineitem l JOIN P p ON p.fk = l.l_orderkey
          GROUP BY 1 ORDER BY 1"""
    },

    // TPC-H Q21 shape: the TEXTBOOK exists/not-exists formulation —
    // the engine runs the per-order aggregate rewrite, so this oracle
    // hash-gates the rewrite's equivalence itself. numwait counts l1
    // rows (a supplier's multiple late lines on one order each count),
    // matching the engine's late-line sum
    "q248_waiting_suppliers" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM supplier s
         JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
         WHERE o.o_orderstatus = 'F'
           AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                       WHERE l3.l_orderkey = l1.l_orderkey
                         AND l3.l_suppkey <> l1.l_suppkey
                         AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""",

    // TPC-H Q3 shape: selective-filter three-way join funnel, revenue
    // in floor-cents (identical IEEE double product order on both
    // engines before the floor), top-10 with full tiebreak
    "q244_shipping_priority" ->
      """SELECT l.l_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
             AS BIGINT)) AS BIGINT) AS revenue_c
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1995-03-15'
           AND l.l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY 1, 2, 3
         ORDER BY revenue_c DESC, o_orderdate, l.l_orderkey LIMIT 10""",

    "q239_stitch_ingest" ->
      s"""WITH T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          S AS (SELECT doc_id, tk, len(tk) AS n, len(tk) // 2 AS m
                FROM T WHERE len(tk) >= 8),
          F AS (SELECT doc_id * 2 AS fid, list_slice(tk, 1, m + 3) AS ft
                 FROM S
                UNION ALL
                SELECT doc_id * 2 + 1, list_slice(tk, m + 1, n) FROM S),
          HT AS (SELECT fid, list_slice(ft, 1, 3) AS head,
                  list_slice(ft, len(ft) - 2, len(ft)) AS tail
                 FROM F WHERE len(ft) >= 3)
          SELECT CAST(CASE WHEN a.fid % 2 = 1 OR b.fid % 2 = 1
              THEN 2 ELSE 1 END AS BIGINT) AS ingest_no,
            a.fid AS id_a, b.fid AS id_b,
            array_to_string(a.tail, ' ') AS overlap
          FROM HT a JOIN HT b ON a.tail = b.head AND a.fid <> b.fid
          ORDER BY ingest_no, id_a, id_b""",

    "q240_ams_join_size" -> amsJoinSizeSql(32, lawPpm = None),

    // the m-selection law audit: same report at the m suggestAmsM
    // derives for a 50% target (m = ceil(2e12/ppm^2) = 8), the law
    // re-derived in SQL integer math so the route is hash-gated
    "q241_ams_m_law" -> amsJoinSizeSql(8, lawPpm = Some(500000L)),

    // the estimate-only sizing call: the q240 sketch legs alone (one
    // aggregate pass per side), no exact/F2 audit CTEs
    "q243_ams_estimate" -> amsJoinSizeSql(32, lawPpm = None,
      estimateOnly = true),

    // stitch hot-seam cap law: q232's fragments and pair join, with
    // maxKeyDf re-derived here as the same exact order statistic the
    // Scala law walks — the df of the (budget+1)-th seam key in
    // descending-df order (budget = floor(n_keys/1000)), floored at 4
    // — and the per-side hot-key drops applied before pairing
    "q242_stitch_df_law" ->
      s"""WITH T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          S AS (SELECT doc_id, tk, len(tk) AS n, len(tk) // 2 AS m
                FROM T WHERE len(tk) >= 8),
          F AS (SELECT doc_id * 2 AS fid, list_slice(tk, 1, m + 3) AS ft
                 FROM S
                UNION ALL
                SELECT doc_id * 2 + 1, list_slice(tk, m + 1, n) FROM S),
          HT AS (SELECT fid, list_slice(ft, 1, 3) AS head,
                  list_slice(ft, len(ft) - 2, len(ft)) AS tail
                 FROM F WHERE len(ft) >= 3),
          K AS (SELECT 't' AS side, array_to_string(tail, ' ') AS key FROM HT
                UNION ALL
                SELECT 'h', array_to_string(head, ' ') FROM HT),
          DF AS (SELECT side, key, CAST(count(*) AS BIGINT) AS df
                 FROM K GROUP BY 1, 2),
          HG AS (SELECT df, CAST(count(*) AS BIGINT) AS c FROM DF GROUP BY df),
          NK AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_keys FROM HG),
          CUM AS (SELECT df, sum(c) OVER (ORDER BY df DESC) AS cum FROM HG),
          CAP AS (SELECT greatest(4, coalesce(
                   (SELECT max(df) FROM CUM, NK
                    WHERE cum >= n_keys * 1000 // 1000000 + 1), 1)) AS cap)
          SELECT a.fid AS id_a, b.fid AS id_b,
            array_to_string(a.tail, ' ') AS overlap,
            nk.n_keys,
            CAST(nk.n_keys * 1000 // 1000000 AS BIGINT) AS hot_key_budget,
            CAST(cap.cap AS BIGINT) AS max_key_df
          FROM HT a JOIN HT b ON a.tail = b.head AND a.fid <> b.fid,
            NK nk, CAP cap
          WHERE NOT EXISTS (SELECT 1 FROM DF d WHERE d.side = 't'
                  AND d.key = array_to_string(a.tail, ' ') AND d.df > cap.cap)
            AND NOT EXISTS (SELECT 1 FROM DF d WHERE d.side = 'h'
                  AND d.key = array_to_string(b.head, ' ') AND d.df > cap.cap)
          ORDER BY id_a, id_b""",

    // seam-width law: suggestSeamWidth re-derived in SQL — the SAME
    // saturating integer power loop (recursive CTE, HUGEINT product
    // capped at Long.Max exactly like the Scala law's overflow guard),
    // then the fragment fixture BUILT at the law's width and the pair
    // join run at it, so the width selection and the detection it
    // buys hash-gate together
    "q253_seam_width_law" ->
      s"""WITH RECURSIVE
          T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          V AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
                FROM (SELECT unnest(tk) AS t FROM T)),
          NK AS (SELECT CAST(4 * count(*) AS BIGINT) AS nk FROM T),
          ND AS (SELECT CAST(nk // 2
                  + CASE WHEN nk % 2 = 0 THEN 0 ELSE 1 END AS BIGINT)
                  AS needed FROM NK),
          PW(w, p) AS (
            SELECT 1, (SELECT v FROM V)::HUGEINT
            UNION ALL
            SELECT w + 1, least(p * (SELECT v FROM V),
                9223372036854775807::HUGEINT)
            FROM PW WHERE w < 16 AND p < (SELECT needed FROM ND)),
          W AS (SELECT greatest(2, max(w)) AS sw FROM PW),
          S AS (SELECT doc_id, tk, len(tk) AS n, len(tk) // 2 AS m
                FROM T, W WHERE len(tk) >= 2 * W.sw + 2),
          F AS (SELECT doc_id * 2 AS fid,
                  list_slice(tk, 1, m + (SELECT sw FROM W)) AS ft FROM S
                UNION ALL
                SELECT doc_id * 2 + 1, list_slice(tk, m + 1, n) FROM S),
          HT AS (SELECT fid, list_slice(ft, 1, W.sw) AS head,
                  list_slice(ft, len(ft) - W.sw + 1, len(ft)) AS tail
                 FROM F, W WHERE len(ft) >= W.sw)
          SELECT a.fid AS id_a, b.fid AS id_b,
            array_to_string(a.tail, ' ') AS overlap,
            v.v AS vocab_size, nk.nk AS n_keys,
            nd.needed AS needed_key_space,
            CAST(w.sw AS BIGINT) AS seam_w
          FROM HT a JOIN HT b ON a.tail = b.head AND a.fid <> b.fid,
            V v, NK nk, ND nd, W w
          ORDER BY id_a, id_b""",

    // composed stitch laws: the q253 saturating-power width loop AND
    // the q242 df-histogram/order-statistic cap replayed in ONE body —
    // the fixture is built at the width law's w, the df valve guards
    // the law-width keys, and every audit column of both levers rides
    // the rows (inert valve at battery scale, the q242 precedent)
    "q261_seam_laws_composed" ->
      s"""WITH RECURSIVE
          T AS (SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
          V AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
                FROM (SELECT unnest(tk) AS t FROM T)),
          NKW AS (SELECT CAST(4 * count(*) AS BIGINT) AS nk FROM T),
          ND AS (SELECT CAST(nk // 2
                  + CASE WHEN nk % 2 = 0 THEN 0 ELSE 1 END AS BIGINT)
                  AS needed FROM NKW),
          PW(w, p) AS (
            SELECT 1, (SELECT v FROM V)::HUGEINT
            UNION ALL
            SELECT w + 1, least(p * (SELECT v FROM V),
                9223372036854775807::HUGEINT)
            FROM PW WHERE w < 16 AND p < (SELECT needed FROM ND)),
          W AS (SELECT greatest(2, max(w)) AS sw FROM PW),
          S AS (SELECT doc_id, tk, len(tk) AS n, len(tk) // 2 AS m
                FROM T, W WHERE len(tk) >= 2 * W.sw + 2),
          F AS (SELECT doc_id * 2 AS fid,
                  list_slice(tk, 1, m + (SELECT sw FROM W)) AS ft FROM S
                UNION ALL
                SELECT doc_id * 2 + 1, list_slice(tk, m + 1, n) FROM S),
          HT AS (SELECT fid, list_slice(ft, 1, W.sw) AS head,
                  list_slice(ft, len(ft) - W.sw + 1, len(ft)) AS tail
                 FROM F, W WHERE len(ft) >= W.sw),
          K AS (SELECT 't' AS side, array_to_string(tail, ' ') AS key FROM HT
                UNION ALL
                SELECT 'h', array_to_string(head, ' ') FROM HT),
          DF AS (SELECT side, key, CAST(count(*) AS BIGINT) AS df
                 FROM K GROUP BY 1, 2),
          HG AS (SELECT df, CAST(count(*) AS BIGINT) AS c FROM DF GROUP BY df),
          NKD AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_keys FROM HG),
          CUM AS (SELECT df, sum(c) OVER (ORDER BY df DESC) AS cum FROM HG),
          CAP AS (SELECT greatest(4, coalesce(
                   (SELECT max(df) FROM CUM, NKD
                    WHERE cum >= n_keys * 1000 // 1000000 + 1), 1)) AS cap)
          SELECT a.fid AS id_a, b.fid AS id_b,
            array_to_string(a.tail, ' ') AS overlap,
            nkd.n_keys,
            CAST(nkd.n_keys * 1000 // 1000000 AS BIGINT) AS hot_key_budget,
            CAST(cap.cap AS BIGINT) AS max_key_df,
            v.v AS vocab_size, nd.needed AS needed_key_space,
            CAST(w.sw AS BIGINT) AS seam_w
          FROM HT a JOIN HT b ON a.tail = b.head AND a.fid <> b.fid,
            NKD nkd, CAP cap, V v, ND nd, W w
          WHERE NOT EXISTS (SELECT 1 FROM DF d WHERE d.side = 't'
                  AND d.key = array_to_string(a.tail, ' ') AND d.df > cap.cap)
            AND NOT EXISTS (SELECT 1 FROM DF d WHERE d.side = 'h'
                  AND d.key = array_to_string(b.head, ' ') AND d.df > cap.cap)
          ORDER BY id_a, id_b""",

    // TPC-H Q20 shape: the TEXTBOOK correlated nested-aggregate
    // formulation — the engine runs the single-pass conditional-sum
    // decorrelation, so this oracle hash-gates the rewrite's
    // equivalence (including the NULL semantics of an empty correlated
    // SUM: no 1996 lines → NULL → the comparison is false and the pair
    // drops). partsupp is the derived twin both engines share: the
    // distinct lineitem pair set with a deterministic integer availqty
    "q254_excess_stock" ->
      """WITH partsupp AS (
           SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             ((l_partkey * 7 + l_suppkey * 13) % 50 + 1) * 100
               AS ps_availqty_c
           FROM lineitem)
         SELECT s.s_suppkey, s.s_name
         FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE n.n_name = 'NATION_7'
           AND s.s_suppkey IN (
             SELECT ps_suppkey FROM partsupp
             WHERE ps_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')
               AND 2 * ps_availqty_c > (
                 SELECT CAST(sum(CAST(floor(l.l_quantity * 100) AS BIGINT))
                   AS BIGINT)
                 FROM lineitem l
                 WHERE l.l_partkey = ps_partkey
                   AND l.l_suppkey = ps_suppkey
                   AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l.l_shipdate < TIMESTAMP '1997-01-01'))
         ORDER BY s_name, s_suppkey""",

    // TPC-H Q22 shape: the TEXTBOOK global-scalar-subquery +
    // NOT-EXISTS formulation — the engine broadcasts the one-row
    // positive-balance aggregate and runs a left-anti against the
    // date-pruned orders slice; equivalence hash-gated here. The
    // threshold compares exact integers (bal_c·n_pos > sum_pos_c), no
    // float average on either engine
    "q256_dormant_customers" ->
      """WITH C AS (SELECT c_custkey, c_nationkey,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS bc
           FROM customer)
         SELECT CAST(c_nationkey % 5 AS BIGINT) AS cgrp,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(bc) AS BIGINT) AS bal_c
         FROM C c
         WHERE c.bc * (SELECT count(*) FROM C WHERE bc > 0)
             > (SELECT sum(bc) FROM C WHERE bc > 0)
           AND NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_orderdate >= TIMESTAMP '2000-09-01')
         GROUP BY 1 ORDER BY 1""",

    // TPC-H Q17 shape: the TEXTBOOK correlated scalar-avg
    // formulation — the engine folds the per-part threshold into one
    // windowed pass over the brand-pruned fact; this oracle re-executes
    // the correlated subquery per line, hash-gating the decorrelation.
    // 5·qty_c·n < sum_qty_c is the exact-integer form of
    // qty < 0.2·avg(qty); the correlated aggregate ranges over the
    // part's brand-filtered lines, identical to all its lines because
    // partkey determines brand
    "q257_small_qty_revenue" ->
      """WITH L AS (SELECT l_partkey,
             CAST(floor(l_quantity * 100) AS BIGINT) AS qc,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_brand = 'Brand#23'))
         SELECT CAST(coalesce(sum(pc), 0) // 7 AS BIGINT) AS avg_yearly_c
         FROM L l
         WHERE 5 * l.qc * (SELECT count(*) FROM L l2
                           WHERE l2.l_partkey = l.l_partkey)
             < (SELECT sum(qc) FROM L l2
                WHERE l2.l_partkey = l.l_partkey)""",

    // TPC-H Q15 shape: the TEXTBOOK revenue-view + scalar-max
    // formulation — the view is referenced twice (once for the rows,
    // once under the max), which the engine expresses as one reused
    // aggregate exchange; equivalence hash-gated here. Floor-cents
    // revenue keeps the max-equality exact on both engines. The
    // l_suppkey NOT NULL mirrors the engine's explicit key filter
    // (its exchange-reuse canonicalization aid) so the oracle states
    // the same NULL rule on nullable key columns (the q251 lesson)
    "q258_top_supplier" ->
      """WITH R AS (SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS total_revenue_c
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
             AND l_suppkey IS NOT NULL
           GROUP BY 1)
         SELECT s.s_suppkey, s.s_name, r.total_revenue_c
         FROM supplier s JOIN R r ON s.s_suppkey = r.l_suppkey
         WHERE r.total_revenue_c = (SELECT max(total_revenue_c) FROM R)
         ORDER BY s_suppkey""",

    // TPC-H Q2 shape: the TEXTBOOK correlated per-part MIN
    // formulation over the shared derived partsupp twin (distinct
    // lineitem pairs + deterministic integer cost) — the engine runs
    // the one-exchange window form, hash-gated here
    "q259_min_cost_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
             l_suppkey AS ps_suppkey,
             (l_partkey * 11 + l_suppkey * 17) % 1000 + 1 AS cost_c
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_size = 15))
         SELECT ps.ps_partkey AS p_partkey, s.s_suppkey, s.s_name,
           n.n_name, ps.cost_c
         FROM ps
         JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         WHERE ps.cost_c = (SELECT min(cost_c) FROM ps ps2
                            WHERE ps2.ps_partkey = ps.ps_partkey)
         ORDER BY p_partkey, s_suppkey""",

    // TPC-H Q11 shape: the TEXTBOOK fraction-of-global-sum HAVING
    // formulation — the scalar subquery re-aggregates the whole
    // nation-filtered partsupp twin; the engine derives groups and
    // total from one reused aggregate subtree, hash-gated here.
    // value = q259's cost × q254's availqty (shared integer twins)
    "q260_important_stock" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
             FROM lineitem),
          pv AS (SELECT pk,
              ((pk * 11 + sk * 17) % 1000 + 1)
                * (((pk * 7 + sk * 13) % 50 + 1) * 100) AS v
            FROM ps
            JOIN supplier s ON s.s_suppkey = sk
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_7'),
          G AS (SELECT pk AS p_partkey, CAST(sum(v) AS BIGINT) AS value_c
                FROM pv GROUP BY 1)
         SELECT p_partkey, value_c FROM G
         WHERE value_c * 1000 > (SELECT sum(value_c) FROM G)
         ORDER BY value_c DESC, p_partkey"""
    )

  /** q240/q241 oracle body — X[j] = n − 2·Σ bit_j(md5Long(key)),
    * generated for the same m the Spark operator uses so the two
    * cannot drift; flag arithmetic in HUGEINT mirroring the engine's
    * DECIMAL(38,0) (ADVICE r12), report columns ±Long.Max-saturated
    * the same way. `lawPpm` appends the suggestAmsM law columns with
    * m re-derived from the target in SQL.
    */
  private def amsJoinSizeSql(m: Int, lawPpm: Option[Long],
      estimateOnly: Boolean = false): String = {
    val xs = (0 until m).map(j =>
      s"""(CAST(count(*) AS BIGINT)
          - 2 * CAST(sum((h >> $j) & 1) AS BIGINT))""")
      .mkString("[", ", ", "]")
    if (estimateOnly)
      return s"""WITH H AS (SELECT ${md5long("CAST(user_id AS VARCHAR)")} AS h
                FROM events),
          SA AS (SELECT CAST(count(*) AS BIGINT) AS n_a, $xs AS xa FROM H),
          SB AS (SELECT CAST(count(*) AS BIGINT) AS n_b, $xs AS xb FROM H),
          E AS (SELECT sa.n_a, sb.n_b,
                 list_sort(list_transform(range($m),
                   i -> sa.xa[i+1]::HUGEINT * sb.xb[i+1]))[${(m + 1) / 2}]
                   AS est_join
                FROM SA sa, SB sb)
          SELECT e.n_a, e.n_b,
            CAST(greatest(least(e.est_join, 9223372036854775807::HUGEINT),
              (-9223372036854775807 - 1)::HUGEINT) AS BIGINT) AS est_join
          FROM E e"""
    val lawCols = lawPpm.map { ppm =>
      s""", CAST($ppm AS BIGINT) AS target_ppm,
         CAST(least(60, greatest(1,
           (2000000000000 + $ppm::BIGINT * $ppm - 1)
             // ($ppm::BIGINT * $ppm))) AS BIGINT) AS m,
         CAST(CASE WHEN (2000000000000 + $ppm::BIGINT * $ppm - 1)
             // ($ppm::BIGINT * $ppm) > 60 THEN 1 ELSE 0 END AS BIGINT)
           AS m_capped"""
    }.getOrElse("")
    s"""WITH H AS (SELECT ${md5long("CAST(user_id AS VARCHAR)")} AS h
              FROM events),
        SA AS (SELECT CAST(count(*) AS BIGINT) AS n_a, $xs AS xa FROM H),
        SB AS (SELECT CAST(count(*) AS BIGINT) AS n_b, $xs AS xb FROM H),
        K AS (SELECT CAST(user_id AS VARCHAR) AS k,
               CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1),
        EX AS (SELECT coalesce(sum(a.c::HUGEINT * b.c), 0::HUGEINT)
                AS exact_join
               FROM K a JOIN K b ON a.k = b.k),
        F2 AS (SELECT coalesce(sum(c::HUGEINT * c), 0::HUGEINT) AS f2 FROM K),
        E AS (SELECT sa.n_a, sb.n_b,
               list_sort(list_transform(range($m),
                 i -> sa.xa[i+1]::HUGEINT * sb.xb[i+1]))[${(m + 1) / 2}]
                 AS est_join,
               ex.exact_join, f2.f2 AS f2_a, f2.f2 AS f2_b
              FROM SA sa, SB sb, EX ex, F2 f2)
        SELECT e.n_a, e.n_b,
          CAST(greatest(least(e.est_join, 9223372036854775807::HUGEINT),
            (-9223372036854775807 - 1)::HUGEINT) AS BIGINT) AS est_join,
          CAST(least(e.exact_join, 9223372036854775807::HUGEINT) AS BIGINT)
            AS exact_join,
          CAST(least(e.f2_a, 9223372036854775807::HUGEINT) AS BIGINT) AS f2_a,
          CAST(least(e.f2_b, 9223372036854775807::HUGEINT) AS BIGINT) AS f2_b,
          CAST(CASE WHEN (e.est_join - e.exact_join)
              * (e.est_join - e.exact_join)
            <= 18::HUGEINT * e.f2_a * e.f2_b THEN 1 ELSE 0 END AS BIGINT)
            AS within_3sig
          $lawCols
        FROM E e"""
  }
}
