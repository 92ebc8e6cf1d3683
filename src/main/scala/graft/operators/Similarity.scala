package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *    set against every vector; one narrow pass + a top-k window.
  *    Correct at any corpus size as long as |queries| is broadcastable;
  *    cost O(|queries| × N × dim) spread across executors.
  *  - [[bucketedTopK]] — the scale path: coarse sign-bit quantization
  *    (IVF-style, deterministic — bucket = sign bits of the first
  *    `signBits` dimensions) restricts each query to its own cell, so
  *    the scan cost drops by ~2^signBits at some recall loss. Swap the
  *    bucket function for trained centroids without changing the plan
  *    shape.
  *
  * Ranking uses the score in fixed-point (floor(cos·10^6) — exact
  * binary-float op, no decimal-string rounding) with the neighbor id
  * as tie-break, which keeps top-k bit-reproducible across engines.
  */
object Similarity {

  /** Deterministic coarse bucket: bit j set iff embedding[j] > 0. */
  def signBucket(emb: Column, signBits: Int): Column =
    (0 until signBits).map { j =>
      when(element_at(emb, j + 1) > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fixed-point score: floor(cos·10^6) as bigint. */
  def scoreFixed(a: Column, b: Column): Column =
    floor(cosine(a, b) * lit(1000000.0)).cast("long")

  private def rank(scored: DataFrame, k: Int,
      scoreCol: String = "score_1e6"): DataFrame =
    // bounded-state top-k aggregate instead of a rank window: the
    // window form shuffles and sorts EVERY candidate; TopKPairs keeps
    // ≤k pairs per query in partial state (map-side combine), so only
    // |queries|·k pairs cross the shuffle — the difference between
    // "candidates" and "answers" moving through the cluster. Tie order
    // (score desc, neighbor asc) matches the former window exactly;
    // ranks emit as BIGINT (DuckDB row_number parity).
    //
    // NULL scores (null embeddings — a zero-norm vector raises ANSI
    // DIVIDE_BY_ZERO instead) are DROPPED, made explicit by the filter
    // below rather than left to TopKPairs' skip-null accumulate: a
    // query with fewer than k non-null candidates returns fewer than
    // k rows. A NULLS-LAST rank window (the DuckDB oracle's default)
    // would pad such queries with null-scored rows — that divergence
    // is only reachable when null embeddings exist.
    scored.filter(col(scoreCol).isNotNull)
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKPairs(col(scoreCol), col("neighbor_id"), k)
        .as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), col("col.v").as(scoreCol))

  /** Exact cosine top-k for each query vector. `queries` and `corpus`
    * need (id, emb) shaped columns. Queries are broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        scoreFixed(col("q.emb"), col("c.emb")).as("score_1e6"))
    rank(scored, k)
  }

  /** Bucketed ANN: compare only within the query's sign bucket. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int, signBits: Int = 6): DataFrame = {
    val cb = corpus.withColumn("bucket", signBucket(col("emb"), signBits))
    val qb = queries.withColumn("bucket", signBucket(col("emb"), signBits))
    val scored = cb.as("c")
      .join(broadcast(qb.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        scoreFixed(col("q.emb"), col("c.emb")).as("score_1e6"))
    rank(scored, k)
  }

  // ------------------------------------------------------------------
  // IVF with TRAINED centroids — the real coarse quantizer the sign-bit
  // bucket stands in for. Deterministic Lloyd's k-means expressed as
  // DataFrame ops, every float reduction in fixed point so training is
  // bit-reproducible across runs, partitionings, AND engines (the q49
  // DuckDB oracle re-derives the same centroids independently).
  // ------------------------------------------------------------------

  /** Per-dimension fixed-point scale for centroid means: integer sums
    * are associative, so the mean is partitioning-independent — a
    * plain avg() would float-drift with the reduction order.
    */
  val MeanScale = 1048576.0 // 2^20

  private def toD(x: Any): Double = x match {
    case f: Float => f.toDouble
    case d: Double => d
    case other => other.toString.toDouble
  }

  /** Nearest-centroid id as a NARROW expression (no join, no shuffle):
    * scores against the broadcast-as-literals centroid table, first
    * max wins (= score desc, cid asc — centroids are cid-ordered).
    * This is the map-side assign of a real IVF index: at 100 TB the
    * quantizer ships to executors and assignment pipelines out of the
    * scan; only the per-cell search joins.
    */
  def assignCell(emb: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val ordered = centroids.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices.toSeq,
      "centroid ids must be 0..k-1")
    // centroid norms are constants: fold them on the driver with the
    // SAME left-to-right double fold DotFold uses, so the quotient is
    // bit-identical to the composed cosine; the row's own norm is
    // let-bound and evaluated once instead of once per centroid —
    // k+1 dot products per row instead of 2k
    let(l2norm(emb), nrm => cellFromNorm(emb, nrm, ordered, ordered.map {
      case (_, v) => normOf(v)
    }))
  }

  /** [[assignCell]] with the row norm staged as a PROJECTED column
    * (`withColumn` before this runs): outside any lambda, every dot is
    * a plain codegen'd DotFold instead of an interpreted HOF eval —
    * the form [[trainCentroids]]/[[ivfTopK]] use on the hot path.
    * CollapseProject keeps the (non-cheap, multi-referenced) norm
    * projection separate, so it is evaluated once per row.
    */
  def assignCellWithNorm(emb: Column, nrm: Column,
      centroids: Seq[(Int, Seq[Double])]): Column = {
    val ordered = centroids.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices.toSeq,
      "centroid ids must be 0..k-1")
    cellFromNorm(emb, nrm, ordered, ordered.map { case (_, v) => normOf(v) })
  }

  private def normOf(v: Seq[Double]): Double =
    math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))

  /** One ADC LUT contribution: fixed-point cosine of a staged slice
    * against a centroid constant, with the same zero-norm guard as
    * [[cellFromNorm]] (zero slices/centroids contribute 0).
    */
  private def lutContrib(slice: Column, nrm: Column, cent: Seq[Double]): Column = {
    val cn = normOf(cent)
    if (cn == 0.0) lit(0L)
    else when(nrm === 0, lit(0L))
      .otherwise(floor(dot(slice, array(cent.map(lit): _*)) / (nrm * lit(cn))
        * lit(1000000.0)).cast("long"))
  }

  private def cellFromNorm(emb: Column, nrm: Column,
      ordered: Seq[(Int, Seq[Double])], norms: Seq[Double]): Column = {
    val scores = ordered.zip(norms).map { case ((_, v), cn) =>
      // zero-norm guard: a zero vector (or zero centroid) has no
      // cosine — score it 0 so assignment falls to the cid tie-break
      // instead of ANSI DIVIDE_BY_ZERO. Residual slices make this
      // REACHABLE (a subspace where every cluster member equals its
      // centroid residualizes to exactly zero); the oracle's assign
      // CTE carries the same CASE, which is a no-op wherever norms
      // are nonzero, so existing hashes are unaffected.
      if (cn == 0.0) lit(0L)
      else when(nrm === 0, lit(0L))
        .otherwise(floor(dot(emb, array(v.map(lit): _*)) / (nrm * lit(cn))
          * lit(1000000.0)).cast("long"))
    }
    val arr = array(scores: _*)
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  /** Centroid-table assignment via the native [[graft.expressions.BestCell]]
    * loop, with the centroid payload bound as a NON-FOLDABLE input:
    * the k·dim table rides in as a broadcast 1-row aggregate (the
    * [[assignSubCells]] idiom) instead of a literal, so the generated
    * whole-stage source is byte-identical across DIFFERENT centroid
    * sets and the codegen cache serves every Lloyd iteration from one
    * compiled unit. The literal form re-entered janino+JIT per
    * iteration because each iteration's new constants produced a new
    * plan — the cost that dominated large-k trainings at bench SF
    * (BASELINE's q93 attribution: compile, not scan; 20.5 s of the
    * 85 s q164 total at gen-sf10 before BestCell). Unrolled literal
    * scoring ([[assignCellWithNorm]]) stays for the small-k PQ
    * subspace codebooks. Scoring is bit-identical: same guarded
    * fixed-point cosine, same left-to-right folds, same first-max
    * (score desc, cid asc) tie-break — re-verified against the
    * oracle battery-wide.
    */
  private def withCell(df: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame =
    withCellAs(df, centroids, col("emb"), "cid")

  /** [[withCell]] generalized to a caller-named slice column and output
    * column, so the merged PQ trainer can assign EVERY subspace in one
    * plan (m BestCell columns, m 1-row broadcast centroid tables, one
    * pass). Scoring identical to [[withCell]] by construction — same
    * BestCell, same broadcast-agg centroid binding.
    */
  private def withCellAs(df: DataFrame, centroids: Seq[(Int, Seq[Double])],
      embCol: org.apache.spark.sql.Column, out: String): DataFrame = {
    val ordered = centroids.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices.toSeq,
      "centroid ids must be 0..k-1")
    val spark = df.sparkSession
    import spark.implicits._
    // internal column name must be collision-proof: a caller frame
    // already carrying `_cents` would make the reference ambiguous (or
    // the drop would eat the caller's column) — suffix until free
    val cents = Iterator.from(0).map(i => if (i == 0) "_cents" else s"_cents$i")
      .find(n => !df.columns.contains(n)).get
    val centArr = ordered.toDF("cid2", "cemb")
      .agg(array_sort(collect_list(struct(col("cid2"), col("cemb")))).as(cents))
    df.crossJoin(broadcast(centArr))
      .withColumn(out, graft.expressions.BestCell(embCol, col(cents)))
      .drop(cents)
  }

  /** Public coarse-cell assignment — (id, emb, cid) with the same
    * (score desc, cid asc) tie-break the IVF index uses. Consumers
    * beyond search: [[Dedup.semanticDedup]] bounds its candidate pairs
    * to cells.
    */
  def assignCells(df: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame =
    withCell(df, centroids)

  /** Deterministic Lloyd's k-means: seeds are the `k` lowest-id
    * vectors (cid 0..k-1 in id order); each round assigns via
    * [[assignCell]] and recomputes means per dimension from fixed-point
    * integer sums; cells that lose all members keep their previous
    * centroid. Train on a hash sample ([[Sampling.hashSample]]) at
    * real scale — the quantizer needs a representative sample, not the
    * corpus.
    */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    require(k >= 1 && iters >= 0, s"need k>=1, iters>=0; got k=$k iters=$iters")
    // materialize the training set once: the seed collect plus every
    // assign+stats iteration is a separate action, and without cutting
    // lineage each one re-runs the corpus scan (and whatever
    // projection/sampling fed it). Materializing the trainer's input
    // is also the honest contract at real scale — `corpus` here is the
    // (sampled) training set, not the 100 TB table.
    val train = corpus.select(col("id"), col("emb")).localCheckpoint()
    var cents: Seq[(Int, Seq[Double])] = train.orderBy(col("id")).limit(k)
      .select(col("emb")).collect()
      .map(_.getSeq[Any](0).map(toD).toSeq)
      .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    for (_ <- 0 until iters) {
      val assigned = withCell(train, cents)
        .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "v")))
      val stats = assigned.groupBy(col("cid"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * MeanScale).cast("long")).as("sf"),
          count(lit(1)).as("n"))
        .collect()
      val means: Map[Int, Seq[Double]] = stats
        .groupBy(_.getAs[Int]("cid"))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getAs[Int]("pos"))
            .map(r => (r.getAs[Long]("sf").toDouble / r.getAs[Long]("n").toDouble) / MeanScale)
            .toSeq
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** [[scoreFixed]] with the zero-norm guard of the cell assigner
    * (zero vectors score 0 instead of raising ANSI DIVIDE_BY_ZERO) —
    * the Spark mirror of the oracle's scoreFixedSafeSql.
    */
  def scoreFixedSafe(a: Column, b: Column): Column =
    when(dot(a, a) === 0.0 || dot(b, b) === 0.0, lit(0L))
      .otherwise(scoreFixed(a, b))

  /** Distributed second-level (within-cell) Lloyd's k-means — the
    * hierarchical half of a two-level coarse quantizer. Given a
    * level-1 assignment (id, emb, cid), train `k2` sub-centroids in
    * EVERY cell simultaneously: seeds are each cell's k2 lowest-id
    * members, and each iteration is ONE partitioned assign (join on
    * cid, rank over the k2 candidates) plus ONE fixed-point mean agg
    * across all cells at once — k1 independent k-means trainings for
    * the price of one pass, with NO per-cell driver loop. The trained
    * quantizer stays a DataFrame (cid, cid2, cemb): driver state is
    * zero, which is what makes subcell counts that GROW WITH n
    * affordable — the architecture change [[Dedup.semanticDedup]]'s
    * scaladoc calls for. Same exact-integer mean discipline as
    * [[trainCentroids]] (floor ×2^20 sums, empty subcells carry their
    * previous centroid), same (score desc, cid2 asc) tie-break, so
    * any engine derives bit-identical sub-centroids.
    */
  def trainSubCentroids(cells: DataFrame, k2: Int, iters: Int): DataFrame = {
    require(k2 >= 1 && iters >= 0, s"need k2>=1, iters>=0; got k2=$k2 iters=$iters")
    val base = cells.select(col("cid"), col("id"), col("emb")).localCheckpoint()
    // seeds = each cell's k2 lowest-id members, found with the bounded
    // TopKPairs aggregate (map-side combine; |cells|·k2 (cid, id)
    // pairs cross the shuffle — a row_number window here would
    // shuffle AND sort the whole corpus), then the tiny seed-id list
    // broadcasts back for its embeddings. TopKPairs ranks (v desc,
    // id asc); v = −id makes that ascending id, so pos = rank = cid2.
    val seedIds = base.groupBy(col("cid"))
      .agg(graft.expressions.TopKPairs(-col("id"), col("id"), k2).as("_top"))
      .select(col("cid"), posexplode(col("_top")))
      .select(col("pos").cast("int").as("cid2"), col("col.id").as("id"))
    var cents = base.join(broadcast(seedIds), Seq("id"))
      .select(col("cid"), col("cid2"),
        col("emb").cast("array<double>").as("cemb"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val stats = assignSubCells(base, cents)
        .select(col("cid"), col("cid2"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("cid2"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * MeanScale).cast("long")).as("sf"),
          count(lit(1)).as("n"))
      val means = stats
        .withColumn("mv",
          col("sf").cast("double") / col("n").cast("double") / lit(MeanScale))
        .groupBy(col("cid"), col("cid2"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          x => x.getField("mv")).as("nemb"))
      cents = cents.join(means, Seq("cid", "cid2"), "left")
        .select(col("cid"), col("cid2"),
          coalesce(col("nemb"), col("cemb")).as("cemb"))
        .localCheckpoint()
    }
    cents
  }

  /** Assign each (id, emb, cid) row to its nearest sub-centroid of its
    * OWN level-1 cell — with NO row explosion: the (cid, cid2, cemb)
    * table folds to one cid2-sorted ARRAY per cell, broadcast-joins
    * on cid (one row in, one row out), and the native
    * [[graft.expressions.BestCell]] expression computes the argmax
    * ((score desc, cid2 asc), zero-norm-guarded fixed-point cosine —
    * the engine's shared assignment contract) in a compiled loop.
    * Earlier formulations (row_number window; join-explode + max_by
    * agg) moved n·k2 candidate rows carrying vector payloads through
    * a shuffle or an aggregate — ~12 GB of row traffic at gen-sf10
    * for ~1 G flops of actual scoring. This keeps level-2 assignment
    * as map-side as level-1's constants assign. Output adds `cid2`.
    * The per-cell centroid array is k2·dim doubles; the whole
    * broadcast is n/targetPop rows — tiny relative to the corpus.
    */
  def assignSubCells(vectors: DataFrame, subCents: DataFrame): DataFrame = {
    val centArr = subCents.groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("cid2"), col("cemb")))).as("_cents"))
    vectors.join(broadcast(centArr), Seq("cid"))
      .withColumn("cid2", graft.expressions.BestCell(col("emb"), col("_cents")))
      .drop("_cents")
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ) — the memory-bound ANN storage path: a
  // d-float vector compresses to m small cell codes (one per contiguous
  // subspace), and search scores candidates from a per-query m×k
  // lookup table without ever touching the original vectors. Same
  // deterministic k-means machinery as IVF, once per subspace.
  // ------------------------------------------------------------------

  /** Per-subspace PQ codebooks: the embedding splits into `m`
    * contiguous subvectors; each subspace trains its own deterministic
    * codebook ([[trainCentroids]] on the slice). Train on a hash
    * sample at real scale, exactly like the coarse quantizer.
    */
  def trainPqCodebooks(corpus: DataFrame, m: Int, k: Int,
      iters: Int): Seq[Seq[(Int, Seq[Double])]] = {
    require(m >= 1, s"need at least one subspace, got $m")
    // the pre-merge per-subspace path inherited these from
    // trainCentroids; the merged trainer must fail as fast
    require(k >= 1, s"need k >= 1 centroids per subspace, got $k")
    require(iters >= 0, s"need iters >= 0, got $iters")
    // one materialization shared by all m subspace trainers
    val train = corpus.select(col("id"), col("emb")).localCheckpoint()
    // ALL m subspace k-means run MERGED: one seed collect (slices of
    // the same k lowest-id vectors every per-subspace trainer would
    // pick) and ONE stats round-trip per Lloyd round — (s, cid, pos)
    // keys one aggregate — instead of m independent trainCentroids
    // each paying its own checkpoint + seed + per-iteration collect.
    // The r15 q167 adjudication found the PQ rows dispatch-bound at
    // battery SF (45 driver round-trips per evaluation); at real
    // scale serialized driver round-trips are the trainer's only
    // non-amortizing term, and this cuts them from O(m·iters) to
    // O(iters). Bit-identical to the per-subspace form: same seeds,
    // same BestCell assignment per slice (the withCell broadcast
    // binding), same floor-×2^20 integer means, empty cells keep
    // their previous centroid — re-verified against the oracle
    // battery (every PQ row's codebooks replay in SQL).
    val seedRows = train.orderBy(col("id")).limit(k).select(col("emb"))
      .collect().map(_.getSeq[Any](0).map(toD).toVector)
    // the dimension comes from the seed rows already collected — the
    // former standalone limit(1) dim probe was one more dispatch
    // round-trip per training (r16)
    if (seedRows.isEmpty) throw new IllegalArgumentException("empty corpus")
    val dim = seedRows.head.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    var books: IndexedSeq[Seq[(Int, Seq[Double])]] = (0 until m).map { s =>
      seedRows.map(v => v.slice(s * sub, (s + 1) * sub): Seq[Double])
        .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    }
    val staged = (0 until m).foldLeft(train) { (d, s) =>
      d.withColumn(s"_s$s", slice(col("emb"), s * sub + 1, sub))
    }
    for (_ <- 0 until iters) {
      val withCids = (0 until m).foldLeft(staged) { (d, s) =>
        withCellAs(d, books(s), col(s"_s$s"), s"_c$s")
      }
      val stats = withCids.select(explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), col(s"_c$s").as("cid"),
            col(s"_s$s").as("se"))): _*)).as("e"))
        .select(col("e.s").as("s"), col("e.cid").as("cid"),
          posexplode(col("e.se")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * MeanScale).cast("long")).as("sf"),
          count(lit(1)).as("n"))
        .collect()
      val means: Map[(Int, Int), Seq[Double]] = stats
        .groupBy(r => (r.getAs[Int]("s"), r.getAs[Int]("cid")))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getAs[Int]("pos"))
            .map(r => (r.getAs[Long]("sf").toDouble / r.getAs[Long]("n").toDouble) / MeanScale)
            .toSeq
        }
      books = (0 until m).map { s =>
        books(s).map { case (cid, old) => (cid, means.getOrElse((s, cid), old)) }
      }
    }
    books
  }

  /** Stage per-subspace slice + norm columns (codegen'd dots, one norm
    * eval per subspace per row — the assignCellWithNorm discipline).
    */
  private def stageSubspaces(df: DataFrame,
      codebooks: Seq[Seq[(Int, Seq[Double])]]): (DataFrame, Seq[Int]) = {
    val subs = codebooks.map(_.head._2.length)
    val offsets = subs.scanLeft(0)(_ + _).init
    val staged = codebooks.indices.foldLeft(df) { (d, s) =>
      d.withColumn(s"_s$s", slice(col("emb"), offsets(s) + 1, subs(s)))
        .withColumn(s"_n$s", l2norm(col(s"_s$s")))
    }
    (staged, subs)
  }

  /** PQ-encode: (id, codes array<int>) — per-subspace nearest-cell
    * codes via the same narrow map-side assign as IVF. No shuffle; at
    * scale this is the write path of a compressed vector index (m
    * bytes per vector instead of d floats).
    */
  def pqEncode(corpus: DataFrame,
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val (staged, _) = stageSubspaces(corpus, codebooks)
    staged.select(col("id"), array(codebooks.indices.map(s =>
      assignCellWithNorm(col(s"_s$s"), col(s"_n$s"), codebooks(s))): _*).as("codes"))
  }

  /** Per-query ADC lookup table: (query_id, s, cid, contrib) — one
    * fixed-point cosine contribution per (subspace, cell). Same
    * floor(dot/(norm·norm)·1e6) arithmetic as scoreFixed, but the
    * query-slice norm is the staged column and the centroid norm a
    * driver constant — k+1 dots per subspace per query instead of 3k.
    */
  private[operators] def adcLut(queries: DataFrame,
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val (stagedQ, _) = stageSubspaces(queries, codebooks)
    val lutEntries = codebooks.indices.flatMap { s =>
      codebooks(s).sortBy(_._1).map { case (cid, cent) =>
        struct(lit(s).as("s"), lit(cid).as("cid"),
          lutContrib(col(s"_s$s"), col(s"_n$s"), cent).as("contrib"))
      }
    }
    stagedQ.select(col("id").as("query_id"),
        explode(array(lutEntries: _*)).as("e"))
      .select(col("query_id"), col("e.s").as("s"), col("e.cid").as("cid"),
        col("e.contrib").as("contrib"))
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes: each
    * query's per-(subspace, cell) cosine contributions — floored to
    * 1e6 fixed point, so the candidate score is an associative integer
    * sum — form an m×k LUT, broadcast against the exploded code
    * stream; candidates never load their original vectors. Scores are
    * sums of per-subspace cosines (monotone proxy for similarity, the
    * standard PQ trade: exactness for m-bytes-per-vector scans).
    * Output: (query_id, rank, neighbor_id, adc_1e6).
    */
  def pqAdcTopK(codes: DataFrame, queries: DataFrame,
      codebooks: Seq[Seq[(Int, Seq[Double])]], k: Int): DataFrame = {
    val exploded = codes.select(col("id"), posexplode(col("codes")).as(Seq("s", "cid")))
    val lutKeyed = exploded.join(broadcast(adcLut(queries, codebooks)), Seq("s", "cid"))
      .filter(col("query_id") =!= col("id"))
    adcRank(lutKeyed, k)
  }

  /** Shared ADC tail: integer-sum the per-(subspace, cell) contributions
    * per (query, neighbor), rank (score desc, id asc), cast rank to long
    * — the single place the ADC arithmetic/tie-break lives so
    * [[pqAdcTopK]] and [[ivfPqTopK]] cannot drift.
    */
  private def adcRank(contribs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_1e6").desc, col("neighbor_id"))
    contribs
      .select(col("query_id"), col("id").as("neighbor_id"), col("contrib"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("contrib")).as("adc_1e6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Cluster-cohesion report for a trained coarse quantizer: per cell,
    * member count plus the mean and worst fixed-point cosine of members
    * to THEIR OWN centroid — the diagnostic that says whether the cells
    * are tight enough for a small nprobe (loose cells → raise nprobe or
    * k, retrain, or fall back to brute force). Scoring reuses the exact
    * guarded fixed cosine the assignment path uses ([[assignCell]]'s
    * branches), selected per row by a cid CASE over the broadcast
    * centroid constants — so the report is consistent with what the
    * index actually did, and the whole pass is one narrow projection +
    * one k-group aggregate. The mean is exact integer floor division:
    * scores can be negative, and Spark `div` truncates toward zero
    * while DuckDB `//` floors, so the quotient is computed on the
    * offset-positive sum `(Σs + n·1e6) div n − 1e6` — identical floor
    * semantics on both engines for any sign.
    *
    * Output: (cid, n, avg_cos_1e6, min_cos_1e6) ordered by cid.
    */
  def clusterCohesion(corpus: DataFrame,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val ordered = centroids.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices.toSeq,
      "centroid ids must be 0..k-1")
    val assigned = corpus.withColumn("_nrm", l2norm(col("emb")))
      .withColumn("cid", assignCellWithNorm(col("emb"), col("_nrm"), ordered))
    val scored = assigned.withColumn("_s",
      ordered.foldRight(lit(0L)) { case ((cid, v), acc) =>
        when(col("cid") === cid, lutContrib(col("emb"), col("_nrm"), v))
          .otherwise(acc)
      })
    scored.groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"), sum(col("_s")).as("_sum"),
        min(col("_s")).as("min_cos_1e6"))
      .withColumn("avg_cos_1e6",
        expr("(_sum + n * 1000000) DIV n - 1000000"))
      .select(col("cid"), col("n"), col("avg_cos_1e6"), col("min_cos_1e6"))
  }

  /** Cluster-purity audit of a trained quantizer against ground-truth
    * labels: per cell, the member count, majority label (ties to the
    * lower label — deterministic), its mass, and purity in fixed
    * point. THE sanity report before trusting cells for semantic
    * dedup or cluster-balanced sampling — low-purity cells mean the
    * quantizer is slicing across semantics, so cell-bounded candidate
    * generation is dropping true pairs.
    *
    * Shape at scale: map-side cell assignment (broadcast centroid
    * literals), then two hash aggs over (cell, label) — output is
    * k·|labels| rows, independent of corpus size.
    */
  def cellPurity(corpus: DataFrame, labels: DataFrame,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val counts = assignCells(corpus, centroids)
      .select(col("id"), col("cid"))
      .join(labels, "id")
      .groupBy(col("cid").cast("long").as("cid"),
        col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("cid"))
      .agg(sum(col("cnt")).as("n"),
        min(struct((-col("cnt")).as("_neg"), col("label"))).as("_m"))
      .select(col("cid"), col("n"), col("_m.label").as("major_label"),
        (-col("_m._neg")).as("n_major"))
      .withColumn("purity_1e6", expr("(n_major * 1000000) DIV n"))
      .orderBy(col("cid"))
  }

  /** Distributed Gram-matrix aggregation — the Σ xᵢ·xⱼ primitive
    * behind normal-equation linear probes (fit a linear head on
    * frozen embeddings: solve (XᵀX)β = Xᵀy with XᵀX accumulated in
    * one distributed pass, solved on the driver — dim² doubles of
    * state no matter how many rows). Entries are exact integers:
    * per-row floor(xᵢ·xⱼ·1e6) summed as BIGINT, so both engines
    * agree to the bit (the floor-before-sum discipline of the
    * battery's cents columns). Upper triangle only (i ≤ j).
    *
    * Shape at scale: one narrow projection → explode to the
    * dim·(dim+1)/2 (i, j) keys → hash agg with map-side partial
    * combine. No shuffle of the vectors themselves; output is
    * dim²-bounded.
    */
  def gramMatrix(corpus: DataFrame, dims: Int): DataFrame = {
    require(dims >= 1, s"need dims >= 1, got $dims")
    // fail loudly on a dims/width mismatch: a row narrower than dims
    // would yield null element_at products that sum() skips while
    // n_rows still counts the row — silently skewed cell sums instead
    // of an error
    val guarded = corpus.withColumn("emb",
      when(size(col("emb")) >= dims, col("emb")).otherwise(raise_error(
        concat(lit(s"gramMatrix: emb has fewer than dims=$dims elements: "),
          size(col("emb")).cast("string")))))
    val pairs = (0 until dims).flatMap(i => (i until dims).map(j => (i, j)))
    val entries = array(pairs.map { case (i, j) =>
      struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"),
        floor(element_at(col("emb"), i + 1).cast("double")
          * element_at(col("emb"), j + 1).cast("double") * 1000000.0)
          .cast("long").as("v"))
    }: _*)
    guarded.select(explode(entries).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.v")).as("sum_1e6"), count(lit(1)).as("n_rows"))
      .orderBy(col("i"), col("j"))
  }

  /** Dominant eigenvector of the corpus gram matrix by `iters` rounds
    * of fixed-point power iteration — the PCA-direction primitive on
    * top of [[gramMatrix]] (XᵀX is PSD, so power iteration converges
    * to the top principal direction of the raw — uncentered — second
    * moment). The dim²-bounded gram result is the ONLY collect
    * (the same bounded-driver-state contract as trainCentroids' k×dim
    * stats); the iteration itself is exact BigInt arithmetic: v₀ =
    * all-ones at 1e6 scale, w = G·v, then renormalize v' = (w·1e6) /
    * max|w| with TRUNCATING division (Scala BigInt `/` ≡ DuckDB `//`
    * ≡ Spark DIV — all round toward zero, measured, so an oracle can
    * replay every round bit-for-bit). A zero matrix degenerates to
    * the all-ones start vector on both engines.
    *
    * Returns the dim components in 1e6 fixed point (max |component|
    * = 1e6 after ≥ 1 round).
    */
  def powerIterationPc1(corpus: DataFrame, dims: Int, iters: Int): Seq[Long] = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val entries = gramMatrix(corpus, dims).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), BigInt(r.getLong(2))))
      .toMap
    // an empty corpus yields an empty gram result: treat missing
    // entries as 0 so the iteration degrades to the documented
    // all-ones start vector instead of a driver-side lookup error
    def g(i: Int, j: Int): BigInt =
      entries.getOrElse((math.min(i, j), math.max(i, j)), BigInt(0))
    val ones = Vector.fill(dims)(BigInt(1000000L))
    var v = ones
    for (_ <- 0 until iters) {
      val w = (0 until dims).map(i =>
        (0 until dims).map(j => g(i, j) * v(j)).sum).toVector
      val m = w.map(_.abs).max
      v = if (m == 0) ones else w.map(x => x * 1000000 / m)
    }
    v.map(_.toLong)
  }

  /** Top-`k` extreme documents by |projection| onto the dominant
    * gram-matrix direction ([[powerIterationPc1]]) — the embedding-
    * space OUTLIER report: rows at either end of the first principal
    * axis are the mislabeled/degenerate/off-distribution vectors a
    * curation pass reviews first. proj_fp = Σᵢ floor(xᵢ·1e6)·vᵢ
    * (1e12 scale, exact associative integer sum — no division, so no
    * sign-semantics trap); ranking is (|proj| desc, id) through a
    * TakeOrderedAndProject cut, with row_number assigned over only
    * the k survivors.
    *
    * Output: (id, proj_fp, rank), rank 1..k.
    */
  def pc1Outliers(corpus: DataFrame, dims: Int, iters: Int, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val v = powerIterationPc1(corpus, dims, iters)
    val proj = (0 until dims).map(i =>
        floor(element_at(col("emb"), i + 1).cast("double") * lit(1000000.0))
          .cast("long") * lit(v(i)))
      .reduce(_ + _)
    corpus.select(col("id"), proj.as("proj_fp"))
      .orderBy(abs(col("proj_fp")).desc, col("id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(abs(col("proj_fp")).desc, col("id"))).cast("long"))
  }

  /** IVF-PQ search with an exact REFINE stage — the standard FAISS
    * accuracy-recovery step (RefineFlat): the compressed index serves
    * a cheap shortlist of `kShort` candidates per query via ADC
    * ([[ivfPqTopK]]), then only those |queries|·kShort rows re-score
    * against their TRUE embeddings and the exact cosine re-ranks the
    * final top `k`. Buys back the quantization error of the m-byte
    * codes at a cost independent of corpus size: the shortlist is
    * broadcast onto the corpus scan (scan-speed semi-join — the
    * corpus never shuffles), queries broadcast, and the rank tail is
    * the bounded-state TopKPairs aggregate.
    *
    * Output: (query_id, rank, neighbor_id, score_1e6) — exact fixed
    * cosines, rank ≤ k.
    */
  def ivfPqRefineTopK(corpus: DataFrame, queries: DataFrame,
      coarse: Seq[(Int, Seq[Double])], codebooks: Seq[Seq[(Int, Seq[Double])]],
      k: Int, kShort: Int, nprobe: Int): DataFrame = {
    require(kShort >= k, s"shortlist must cover the answer: kShort=$kShort < k=$k")
    val shortlist = ivfPqTopK(corpus, queries, coarse, codebooks, kShort, nprobe)
      .select(col("query_id"), col("neighbor_id"))
    val scored = corpus.select(col("id").as("neighbor_id"), col("emb").as("nemb"))
      .join(broadcast(shortlist), "neighbor_id")
      .join(broadcast(queries.select(col("id").as("query_id"), col("emb").as("qemb"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        scoreFixedSafe(col("qemb"), col("nemb")).as("score_1e6"))
    rank(scored, k)
  }

  /** PQ quantization-error report: per-vector cosine between the raw
    * embedding and its PQ RECONSTRUCTION (each subspace's assigned
    * codebook centroid, concatenated), bucketed with cumulative ≥
    * counts — the m/k code-budget calibration table (read it before
    * trusting ADC at scale: q169 measures recall downstream, this
    * measures the error at its source). Encode + reconstruct are one
    * narrow map-side pass (codebooks are plan literals, the when-chain
    * per subspace is the assignCell idiom); the histogram is a bounded
    * aggregate + a ≤(2e6/width)-row cumulative window.
    *
    * Output: (bucket_lo_1e6, n_vectors, n_ge) ordered desc —
    * truncating bucket labels, the q175 convention.
    */
  def pqErrorReport(corpus: DataFrame,
      codebooks: Seq[Seq[(Int, Seq[Double])]],
      bucketWidth1e6: Long = 10000L): DataFrame = {
    require(bucketWidth1e6 >= 1, s"bucket width must be positive: $bucketWidth1e6")
    val (staged, _) = stageSubspaces(corpus, codebooks)
    val recon = concat(codebooks.indices.map { s =>
      val cid = assignCellWithNorm(col(s"_s$s"), col(s"_n$s"), codebooks(s))
      codebooks(s).foldLeft(lit(null).cast("array<double>")) { case (acc, (c, cent)) =>
        when(cid === c, array(cent.map(lit): _*)).otherwise(acc)
      }
    }: _*)
    val w = Window.orderBy(col("bucket_lo_1e6").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    staged
      .select(scoreFixedSafe(col("emb"), recon).as("cos_1e6"))
      .withColumn("bucket_lo_1e6",
        expr(s"(cos_1e6 DIV $bucketWidth1e6) * $bucketWidth1e6"))
      .groupBy(col("bucket_lo_1e6")).agg(count(lit(1)).as("n_vectors"))
      .withColumn("n_ge", sum(col("n_vectors")).over(w).cast("long"))
      .orderBy(col("bucket_lo_1e6").desc)
  }

  /** Greedy k-center coreset selection — the "diverse anchor set"
    * data-selection primitive (Sener & Savarese 2018's core-set
    * approach, greedy 2-approximation): seed = the lowest id (the
    * documented deterministic start), then each round picks the
    * document FARTHEST from every chosen center (minimum best-cosine
    * coverage, ties to lowest id) and folds it into the coverage
    * state. k unrolled DISTRIBUTED rounds, never a per-item driver
    * loop: coverage is a (id, maxsim) frame updated by one broadcast
    * 1-row join per round, the argmin is a bounded min(struct)
    * aggregate — so each round costs one corpus pass regardless of k,
    * and the whole selection is k passes.
    *
    * Output: (pick_no, center_id, cover_sim_1e6) — cover_sim is the
    * selected doc's best cosine to the PREVIOUSLY chosen centers
    * (null for the seed): the coverage-radius curve that says when to
    * stop adding centers. A corpus with fewer than k rows returns one
    * pick per row and stops (the coverage frame empties — later
    * rounds would only synthesize null picks).
    */
  def kCenterSelect(corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val ids = corpus.select(col("id"), col("emb"))
    val seed = ids.agg(min(col("id")).as("id"))
    var centers = ids.join(broadcast(seed), Seq("id"))
      .select(col("id").as("center_id"), col("emb").as("_cemb"),
        lit(1L).as("pick_no"), lit(null).cast("long").as("cover_sim_1e6"))
      .localCheckpoint(true)
    var cov = ids.join(broadcast(centers.select(col("center_id"))),
        col("id") === col("center_id"), "left_anti")
      .crossJoin(broadcast(centers.select(col("_cemb"))))
      .select(col("id"), col("emb"),
        scoreFixedSafe(col("emb"), col("_cemb")).as("maxsim"))
      .localCheckpoint(true)
    var r = 2
    // corpus smaller than k: stop once every row is a center — the
    // argmin over an empty coverage frame would yield a null-id row
    // and each later round would silently add nothing
    while (r <= k && !cov.isEmpty) {
      val far = cov.agg(min(struct(col("maxsim"), col("id"))).as("_f"))
        .select(col("_f.id").as("center_id"),
          col("_f.maxsim").as("cover_sim_1e6"))
      val newC = ids.join(broadcast(far), col("id") === col("center_id"))
        .select(col("center_id"), col("emb").as("_cemb"),
          lit(r.toLong).as("pick_no"), col("cover_sim_1e6"))
        .localCheckpoint(true)
      centers = centers.unionByName(newC).localCheckpoint(true)
      cov = cov.join(broadcast(newC.select(col("center_id").as("_cid"))),
          col("id") === col("_cid"), "left_anti")
        .crossJoin(broadcast(newC.select(col("_cemb"))))
        .select(col("id"), col("emb"),
          greatest(col("maxsim"),
            scoreFixedSafe(col("emb"), col("_cemb"))).as("maxsim"))
        .localCheckpoint(true)
      r += 1
    }
    centers.select(col("pick_no"), col("center_id"), col("cover_sim_1e6"))
      .orderBy(col("pick_no"))
  }

  /** Recall CURVE for the bucketed ANN path: corpus-level recall@k at
    * several k values from ONE pair of rankings — both the exact and
    * the approximate top-max(ks) lists compute once, and each k of
    * the sweep is a filter over the joined |queries|·kmax rank pairs
    * (the recall/latency trade as a table, not a single point —
    * q155's audit widened to the curve an nprobe/k decision actually
    * reads). Denominator per k = total exact neighbors at that k
    * (honest on small corpora, the q155 rule).
    *
    * Output: (k, n_queries, sum_exact, sum_hits, recall_1e6)
    * ascending by k.
    */
  def recallCurve(corpus: DataFrame, queries: DataFrame, ks: Seq[Int],
      signBits: Int = 6): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"positive ks: $ks")
    val kmax = ks.max
    val exact = bruteForceTopK(corpus, queries, kmax)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("er"))
    val approx = bucketedTopK(corpus, queries, kmax, signBits)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("ar"))
    val joined = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("er"), col("ar"),
        explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
      .filter(col("er") <= col("k"))
    joined.groupBy(col("k"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("sum_exact"),
        sum(when(col("ar").isNotNull && col("ar") <= col("k"), 1L)
          .otherwise(0L)).cast("long").as("sum_hits"))
      .withColumn("recall_1e6", expr("(sum_hits * 1000000) DIV sum_exact"))
      .orderBy(col("k"))
  }

  /** MRR-by-label retrieval audit: mean reciprocal rank of the first
    * SAME-LABEL neighbor in each path's top-k — the IR-metric view of
    * an ANN index (recall@k says "are the true neighbors there"; MRR
    * says "does the index surface something RELEVANT early", using
    * ground-truth labels as relevance). Reciprocal ranks are exact
    * integers (1e6 div r); queries with no relevant hit in top-k
    * contribute 0 but stay in the denominator. Both the exact and the
    * sign-bucket path score in one report, so the compression cost is
    * read in metric points.
    *
    * Output: (path, n_queries, n_hit, mrr_1e6) for path ∈
    * {bucketed, exact}, ordered by path.
    */
  def mrrByLabel(corpus: DataFrame, labels: DataFrame, queries: DataFrame,
      k: Int, signBits: Int = 6): DataFrame = {
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    def mrrOf(ranked: DataFrame, path: String): DataFrame = {
      // the BOUNDED side is the ranked frame (|queries|·k rows);
      // labels is corpus-width, so the broadcast hints go on the
      // ranked side — at real corpus scale broadcasting labels would
      // ship an unbounded table to every executor
      val withNl = broadcast(ranked)
        .join(labels.select(col("id").as("neighbor_id"),
          col("label").as("_nl")), "neighbor_id")
      val rr = broadcast(withNl)
        .join(labels.select(col("id").as("query_id"),
          col("label").as("_ql")), "query_id")
        .filter(col("_nl") === col("_ql"))
        .groupBy(col("query_id")).agg(min(col("rank")).as("_r"))
        .select(expr("1000000 DIV _r").as("rr"))
      rr.agg(count(lit(1)).as("n_hit"),
          coalesce(sum(col("rr")), lit(0L)).as("_sum_rr"))
        .crossJoin(broadcast(nq))
        .select(lit(path).as("path"), col("n_queries"), col("n_hit"),
          expr("_sum_rr DIV n_queries").as("mrr_1e6"))
    }
    mrrOf(bruteForceTopK(corpus, queries, k), "exact")
      .unionByName(mrrOf(bucketedTopK(corpus, queries, k, signBits), "bucketed"))
      .orderBy(col("path"))
  }

  /** Recall-lift report for the refine stage: per query, how many of
    * the EXACT top-k ([[bruteForceTopK]] ground truth) survive in (a)
    * the plain IVF-PQ ADC top-k and (b) the refined top-k — the
    * measured answer to "does the compressed index need the refine
    * pass, and does refine buy it back". Per-query denominators (the
    * exact-neighbor count, not the literal k) so recall is honest on
    * small/filtered corpora.
    *
    * All three rankings are their own audited plans; the comparison
    * adds two |queries|·k left joins + one bounded aggregate — cost
    * independent of corpus size.
    *
    * Output: (query_id, n_exact, hits_adc, hits_refine,
    * recall_adc_1e6, recall_refine_1e6).
    */
  def refineRecallReport(corpus: DataFrame, queries: DataFrame,
      coarse: Seq[(Int, Seq[Double])], codebooks: Seq[Seq[(Int, Seq[Double])]],
      k: Int, kShort: Int, nprobe: Int): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"))
    val adc = ivfPqTopK(corpus, queries, coarse, codebooks, k, nprobe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_adc"))
    val ref = ivfPqRefineTopK(corpus, queries, coarse, codebooks, k, kShort, nprobe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_refine"))
    exact.join(adc, Seq("query_id", "neighbor_id"), "left")
      .join(ref, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("in_adc"), lit(0L))).cast("long").as("hits_adc"),
        sum(coalesce(col("in_refine"), lit(0L))).cast("long").as("hits_refine"))
      .withColumn("recall_adc_1e6", expr("(hits_adc * 1000000) DIV n_exact"))
      .withColumn("recall_refine_1e6", expr("(hits_refine * 1000000) DIV n_exact"))
  }

  /** Recall@k report for the bucketed (approximate) path against the
    * brute-force ground truth — THE metric an ANN index is judged by
    * (recall/latency trade; the scan-cost saving is only worth what
    * it keeps of the true neighbors). Per query: how many of the
    * exact top-k survive in the approximate top-k, as a fixed-point
    * recall. Ranking ties break by neighbor id in BOTH paths, so the
    * intersection is well-defined on any engine.
    *
    * Shape at scale: both top-k paths are their own audited plans
    * (broadcast queries, bounded per-query state); the comparison
    * adds one semi-join on (query, neighbor) + a per-query count —
    * cost O(|queries|·k), independent of corpus size.
    */
  def recallAtK(corpus: DataFrame, queries: DataFrame, k: Int,
      signBits: Int = 6): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = bucketedTopK(corpus, queries, k, signBits)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    // denominator is the per-query EXACT neighbor count, not the literal
    // k: a corpus (or filtered corpus) smaller than k+1 has fewer than k
    // true neighbors, and dividing by k would cap recall below 1 even
    // for a perfect approximate path
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_1e6", expr("(n_hits * 1000000) DIV n_exact"))
      .select(col("query_id"), col("n_hits"), col("recall_1e6"))
      .orderBy(col("query_id"))
  }

  /** Each query's `nprobe` nearest cells — (id, emb, cid), one row per
    * probed cell, ranked by the same (score desc, cid asc) order the
    * corpus assign uses.
    */
  private def probeCells(queries: DataFrame,
      centroids: Seq[(Int, Seq[Double])], nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = centroids.sortBy(_._1).toDF("ccid", "cemb")
      .select(col("ccid"), col("cemb").cast("array<double>"))
    val pw = Window.partitionBy(col("id")).orderBy(col("cscore").desc, col("ccid"))
    queries.as("q").join(broadcast(centDf), lit(true))
      .select(col("q.id"), col("q.emb"), col("ccid"),
        scoreFixed(col("q.emb"), col("cemb")).as("cscore"))
      .withColumn("_pr", row_number().over(pw))
      .filter(col("_pr") <= nprobe)
      .select(col("id"), col("emb"), col("ccid").as("cid"))
  }

  /** IVF search: corpus vectors live in their nearest cell (narrow
    * assign), each query probes its `nprobe` nearest cells, candidates
    * meet on a cell-id equi-join, exact cosine ranks the survivors.
    * Scan cost drops to ~nprobe/k of brute force; recall is governed by
    * nprobe exactly like FAISS-style IVF.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Seq[Double])], k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size)
    val cc = withCell(corpus, centroids)
    // queries are small/broadcastable
    val qProbe = probeCells(queries, centroids, nprobe)
    val scored = cc.as("c")
      .join(broadcast(qProbe.as("q")),
        col("q.cid") === col("c.cid") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        scoreFixed(col("q.emb"), col("c.emb")).as("score_1e6"))
    rank(scored, k)
  }

  /** IVF-PQ — the production ANN composition: the coarse quantizer
    * prunes each query's candidates to `nprobe` cells, and ADC scores
    * the survivors from their PQ codes via the broadcast m×k LUT. At
    * scale the search index stores one coarse cell id plus m code
    * bytes per vector; original vectors are never read at query time.
    * Output: (query_id, rank, neighbor_id, adc_1e6).
    */
  /** The IVF-PQ index-build write path as a standalone operator:
    * coarse cell id + m PQ codes per vector, one narrow map-side pass
    * (centroids and codebooks are plan literals) — what a persisted
    * ANN index table stores per row. Shared by [[ivfPqTopK]]'s inline
    * build and [[maintainPqIndex]]'s incremental one, so the two can
    * never encode differently.
    */
  def encodeIvfPq(corpus: DataFrame, coarse: Seq[(Int, Seq[Double])],
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val (stagedC, _) = stageSubspaces(withCell(corpus, coarse), codebooks)
    stagedC.select(col("id"), col("cid"),
      array(codebooks.indices.map(s =>
        assignCellWithNorm(col(s"_s$s"), col(s"_n$s"), codebooks(s))): _*).as("codes"))
  }

  /** Incremental ANN-index maintenance — the PQ index FOLLOWS the
    * versioned corpus (q96's "the index follows the table" discipline
    * applied to vectors): only rows the corpus commits since `sinceTs`
    * inserted or updated re-encode (the narrow [[encodeIvfPq]] pass
    * over JUST the change feed), deletes drop their index rows, and
    * every untouched bucket carries by manifest reference. The coarse
    * quantizer and codebooks are FROZEN between retrains (the
    * realistic cadence: ingest is continuous, retraining is
    * scheduled) — retrain means full rebuild, by design.
    *
    * Contract (oracle-pinned): maintained index ≡ full re-encode of
    * the corpus's final state under the same frozen quantizers.
    */
  def maintainPqIndex(indexVt: VersionedTable, corpusVt: VersionedTable,
      sinceTs: String, coarse: Seq[(Int, Seq[Double])],
      codebooks: Seq[Seq[(Int, Seq[Double])]]): Unit = {
    val head = corpusVt.commits.head
    val d = corpusVt.diff(sinceTs, head).localCheckpoint(true)
    val changed = d.filter(col("change_type").isin("insert", "update"))
      .select(col("id"), col("after_emb").as("emb"), col("after_ver").as("ver"))
    val enc = encodeIvfPq(changed, coarse, codebooks)
      .join(changed.select(col("id"), col("ver")), Seq("id"))
    val dels = d.filter(col("change_type") === "delete").select(col("id"))
    // re-encodes and delete keys pin in ONE tagged checkpoint and
    // apply as ONE fused commit (r16 action discipline — formerly two
    // checkpoints + two isEmpty probes + two commits per maintenance)
    indexVt.applyDeltaPinned(dels, enc)
    ()
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      coarse: Seq[(Int, Seq[Double])], codebooks: Seq[Seq[(Int, Seq[Double])]],
      k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarse.size)
    // index build (write path): coarse cell + PQ codes, all narrow
    val indexed = encodeIvfPq(corpus, coarse, codebooks)
    // search: candidate set from the cell equi-join (no dedup needed —
    // each vector has exactly one coarse cid and a query's probed cids
    // are distinct, so at most one row per (query, doc)), then the same
    // LUT-join integer-sum scoring as pqAdcTopK
    val probed = probeCells(queries, coarse, nprobe)
      .select(col("id").as("query_id"), col("cid"))
    val cand = indexed.join(broadcast(probed), "cid")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"), col("codes"))
    val lutKeyed = cand
      .select(col("query_id"), col("id"), posexplode(col("codes")).as(Seq("s", "cid")))
      .join(broadcast(adcLut(queries, codebooks)), Seq("query_id", "s", "cid"))
    adcRank(lutKeyed, k)
  }

  // ------------------------------------------------------------------
  // Residual PQ — the standard composed-index refinement (FAISS's
  // IVF{n},PQ{m}): codes quantize the RESIDUAL (vector − assigned
  // coarse centroid) instead of the raw vector. Residuals concentrate
  // near the origin with most inter-cluster variance removed, so the
  // same m×k code budget spends its resolution on what the coarse
  // quantizer didn't explain — higher recall at equal nprobe.
  // ------------------------------------------------------------------

  /** Elementwise residual against the assigned coarse centroid. The
    * centroid table ships as an array-of-arrays literal (k·dim
    * doubles — driver-sized); subtraction in double, and float→double
    * casts are exact, so both engines compute identical residuals.
    */
  private def residualExpr(emb: Column, cid: Column,
      coarse: Seq[(Int, Seq[Double])]): Column = {
    val ordered = coarse.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices.toSeq,
      "centroid ids must be 0..k-1")
    val table = array(ordered.map { case (_, v) => array(v.map(lit): _*) }: _*)
    zip_with(emb, element_at(table, cid + 1), (x, c) => x.cast("double") - c)
  }

  /** (id, emb = residual, cid) — narrow assign + subtract, no shuffle. */
  private def withResidual(corpus: DataFrame,
      coarse: Seq[(Int, Seq[Double])]): DataFrame =
    withCell(corpus, coarse).select(col("id"),
      residualExpr(col("emb"), col("cid"), coarse).as("emb"), col("cid"))

  /** Per-subspace codebooks trained on residuals — same deterministic
    * integer k-means as [[trainPqCodebooks]], same hash-sample advice
    * at real scale.
    *
    * The residual training table is localCheckpoint'd once: training
    * fires 1 + m·(1 + iters) small collect jobs, and without the
    * barrier EVERY one re-derives the residuals — re-running the
    * coarse assign AND re-codegen'ing its k·dim-literal centroid
    * expressions per job (plan-compile time dominated the q83 battery
    * cost at small SF: measured ~13 s → ~6 s with the barrier). At
    * real scale the training input is a hash sample anyway
    * ([[Sampling.hashSample]]), so the materialization is sample-sized,
    * not corpus-sized.
    */
  def trainResidualCodebooks(corpus: DataFrame, coarse: Seq[(Int, Seq[Double])],
      m: Int, k: Int, iters: Int): Seq[Seq[(Int, Seq[Double])]] = {
    val res = withResidual(corpus, coarse).select(col("id"), col("emb"))
      .localCheckpoint(true) // blocks reclaimed by the ContextCleaner on GC
    trainPqCodebooks(res, m, k, iters)
  }

  /** IVF + residual-PQ search. Differences from [[ivfPqTopK]]: codes
    * encode residuals, and the ADC lookup table is per (query, PROBED
    * CELL) — the query's residual against each probed cell's centroid
    * scores that cell's candidates — so the broadcast LUT holds
    * |queries|·nprobe·m·k integer entries (still driver-trivial).
    * Candidates still never load their original vectors.
    * Output: (query_id, rank, neighbor_id, adc_1e6).
    *
    * Proxy caveat, stated honestly: contributions are COSINES of
    * residual slices (scale-free), which ranks correctly within one
    * probed cell — where the residual representation demonstrably
    * beats raw-vector codes (spec-pinned) — but compares residuals of
    * different magnitudes across cells at nprobe > 1; an L2/IP ADC
    * (FAISS's metric) would anchor each cell by its distance term.
    * Within this engine's fixed-point-cosine score system, residual
    * PQ is therefore most valuable at small nprobe, which is exactly
    * the regime it exists for.
    */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      coarse: Seq[(Int, Seq[Double])], codebooks: Seq[Seq[(Int, Seq[Double])]],
      k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarse.size)
    // index build (write path): coarse cell + residual codes, all narrow.
    // Materialized once (localCheckpoint): Project collapse would
    // otherwise inline the k·dim-literal residual table into every
    // staged-slice/norm/code reference — a ~10×-duplicated mega
    // expression evaluated per candidate join probe. A production
    // deployment PERSISTS the coded index and serves many query
    // batches from it; the barrier is that same build/serve split
    // (measured: q83 search 8.2 s → ~1 s at sf0.1).
    val (stagedC, _) = stageSubspaces(withResidual(corpus, coarse), codebooks)
    val indexed = stagedC.select(col("id"), col("cid").as("cell"),
      array(codebooks.indices.map(s =>
        assignCellWithNorm(col(s"_s$s"), col(s"_n$s"), codebooks(s))): _*).as("codes"))
      .localCheckpoint(true)
    // per-(query, probed-cell) residual LUT
    val probed = probeCells(queries, coarse, nprobe)
    val qr = probed.select(col("id"), col("cid").as("cell"),
      residualExpr(col("emb"), col("cid"), coarse).as("emb"))
    val (stagedQ, _) = stageSubspaces(qr, codebooks)
    val lutEntries = codebooks.indices.flatMap { s =>
      codebooks(s).sortBy(_._1).map { case (cid, cent) =>
        struct(lit(s).as("s"), lit(cid).as("cid"),
          lutContrib(col(s"_s$s"), col(s"_n$s"), cent).as("contrib"))
      }
    }
    val lut = stagedQ.select(col("id").as("query_id"), col("cell"),
        explode(array(lutEntries: _*)).as("e"))
      .select(col("query_id"), col("cell"), col("e.s").as("s"),
        col("e.cid").as("cid"), col("e.contrib").as("contrib"))
    // candidates from the probed-cell equi-join (at most one row per
    // (query, doc) — one coarse cell per vector, distinct probed cells)
    val cand = indexed
      .join(broadcast(probed.select(col("id").as("query_id"),
        col("cid").as("cell"))), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
    val lutKeyed = cand
      .select(col("query_id"), col("cell"), col("id"),
        posexplode(col("codes")).as(Seq("s", "cid")))
      .join(broadcast(lut), Seq("query_id", "cell", "s", "cid"))
    adcRank(lutKeyed, k)
  }

  // ------------------------------------------------------------------
  // Scalar quantization (SQ8) — the FAISS ScalarQuantizer storage
  // path: each dimension compresses independently to an 8-bit code
  // against per-dimension [lo, hi] bounds, so a d-float vector stores
  // as d bytes with NO codebook training (the usual first step down
  // from float32, before PQ's higher compression is worth its
  // training). All arithmetic is BIGINT over 1e6 fixed-point values,
  // so bounds, codes, and scores are bit-reproducible across engines.
  // ------------------------------------------------------------------

  /** floor(x·1e6) per dimension — the shared fixed-point embedding. */
  private def fixed1e6(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Integral quotient of non-negative BIGINTs via double division:
    * operands stay ≪ 2^53 (≤ ~1e9 here), and a correctly-rounded
    * double quotient of exactly-representable ints only disagrees
    * with true division by < 1 ulp, while the nearest non-integer
    * quotient sits ≥ 1/divisor ≫ ulp from any integer — so floor
    * equals exact integer division (DuckDB `//`) on this domain.
    * (expr("a DIV b") can't reach inside a transform() lambda, hence
    * the double route.)
    */
  private def idiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** Per-dimension [lo, hi] quantization bounds in 1e6 fixed point —
    * one column-pruned posexplode aggregate (dim rows to the driver).
    * At real scale run on a hash sample, like the k-means trainers.
    */
  def sqTrain(corpus: DataFrame): Seq[(Long, Long)] =
    corpus.select(posexplode(fixed1e6(col("emb"))).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("pos")).collect()
      .map(r => (r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toSeq

  /** SQ8-encode: (id, codes array<bigint> in [0, 255]) — narrow
    * map-side pass; the write path of the compressed index (d bytes
    * per vector at real storage). Dimensions with a degenerate range
    * (hi = lo) code to 0. Out-of-bounds values (vectors unseen at
    * train time) clamp to the code range.
    */
  def sqEncode(corpus: DataFrame, bounds: Seq[(Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "empty bounds — train on a non-empty corpus")
    val lo = array(bounds.map(b => lit(b._1)): _*)
    val hi = array(bounds.map(b => lit(b._2)): _*)
    corpus.select(col("id"), transform(fixed1e6(col("emb")), (x, i) => {
      val l = get(lo, i); val h = get(hi, i)
      when(h > l,
        least(lit(255L), greatest(lit(0L), idiv((x - l) * lit(255L), h - l))))
        .otherwise(lit(0L))
    }).as("codes"))
  }

  /** Inner-product top-k over the SQ8 index: candidates reconstruct as
    * lo + code·(hi−lo)/255 per dimension (1e6 fixed point, computed
    * once per stored vector, narrow) and dot the broadcast fixed-point
    * queries — original embeddings are never read at query time. This
    * is MIPS ranking (dot, not cosine): normalize vectors upstream if
    * cosine order is wanted. Output: (query_id, rank, neighbor_id,
    * score_1e12).
    */
  def sqTopK(codes: DataFrame, bounds: Seq[(Long, Long)], queries: DataFrame,
      k: Int): DataFrame = {
    val lo = array(bounds.map(b => lit(b._1)): _*)
    val hi = array(bounds.map(b => lit(b._2)): _*)
    val deq = codes.select(col("id"), transform(col("codes"), (c, i) => {
      val l = get(lo, i); val h = get(hi, i)
      l + idiv(c * (h - l), lit(255L))
    }).as("deq"))
    val qf = queries.select(col("id"), fixed1e6(col("emb")).as("qf"))
    val scored = deq.as("c")
      .join(broadcast(qf.as("q")), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        aggregate(zip_with(col("q.qf"), col("c.deq"), _ * _), lit(0L), _ + _)
          .as("score_1e12"))
    rank(scored, k, "score_1e12")
  }

  /** Source-centroid similarity matrix — per-source mean embedding,
    * then pairwise centroid cosine over the (tiny) centroid set: the
    * SEMANTIC "which feeds overlap" map that complements the lexical
    * KL of Diagnostics.sourceDivergence (two sources can share no
    * vocabulary yet sit on the same topic manifold, and vice versa).
    * Mixture design reads both before collapsing or re-weighting
    * feeds.
    *
    * Centroid components use the trainCentroids discipline —
    * `sum(floor(v·2^20))` BIGINT sums (associative, partition-proof),
    * divided back in exactly-rounded IEEE double — so the matrix is
    * bit-stable across runs and engines (the q144 oracle re-derives
    * it). Scale shape: one id-equi-join docs↔embeddings, one
    * (source, pos) groupBy bounded by |S|·dim, then a broadcast
    * self-join over |S| centroid rows — the corpus never moves twice.
    */
  def sourceCentroidMatrix(docs: DataFrame, idCol: String,
      sourceCol: String, embs: DataFrame): DataFrame = {
    val joined = docs.select(col(idCol).as("id"), col(sourceCol).as("source"))
      .join(embs, Seq("id"))
    val stats = joined
      .select(col("source"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("source"), col("pos"))
      .agg(sum(floor(col("v").cast("double") * MeanScale).cast("long")).as("sf"),
        count(lit(1)).as("n"))
    val cent = stats
      .withColumn("c",
        col("sf").cast("double") / col("n").cast("double") / lit(MeanScale))
      .groupBy(col("source"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cent"))
    cent.as("a")
      .join(broadcast(cent.as("b")), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        scoreFixed(col("a.cent"), col("b.cent")).as("cos_1e6"))
  }

  // ------------------------------------------------------------------
  // Random-projection (Johnson–Lindenstrauss) embedding compression —
  // the dimensionality lever next to the codebook lever (PQ, q58/q179)
  // and the 1-bit lever (sign buckets, q22/q23). A ±1 signed random
  // projection preserves cosine in expectation with error ~1/√d'
  // (Achlioptas 2003, JL lemma), needs NO training pass at all, and
  // compresses dim floats to d' integers — at 100 TB the projected
  // index is the only thing the shortlist scan ever reads.
  // ------------------------------------------------------------------

  /** ±1 projection signs as Scala constants: sign(j)(i) = bit 0 of the
    * 60-bit md5 hash of "rp|j|i" (the Md5Long60 truncation), mapped to
    * ±1. The minhashCoeffs discipline: both the Spark plan and the
    * DuckDB oracle interpolate THIS matrix as literals, so the two
    * sides cannot drift — and no per-row hashing happens anywhere; the
    * projection is a literal add/subtract chain.
    */
  def rpSigns(outDims: Int, dim: Int): IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(outDims, dim) { (j, i) =>
      val hex = md.digest(s"rp|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1 else -1
    }
  }

  /** Fixed-point components floor(x_i·10^6) with the width guard — the
    * staging half of the projection. Callers MUST alias this as its
    * own column (a separate Project) before feeding it to
    * [[rpProjFromComponents]]: the sum expression references the array
    * ~outDims·dim times, and an un-staged subtree would re-run this
    * transform under every term (the minhashSignature staging lesson —
    * measured 21 s → sub-second on the q230 row).
    */
  def rpComponentsExpr(emb: Column, dim: Int): Column = {
    val guarded = when(size(emb) >= dim, emb).otherwise(raise_error(
      concat(lit(s"randomProject: emb has fewer than dim=$dim elements: "),
        size(emb).cast("string"))))
    // slice to EXACTLY dim before the fixed-point transform: the sign
    // rows downstream are dim-wide and DotFoldLong returns null on a
    // length mismatch, so an over-width embedding fed whole would
    // silently yield null projections while the DuckDB oracle (fixed
    // xf[i+1] reads, i < dim) computes real values — the slice makes
    // both engines project the first dim components (ADVICE r12)
    transform(slice(guarded, 1, dim),
      v => floor(v.cast("double") * lit(1000000.0)).cast("long"))
  }

  /** The projection itself: proj_j = Σ_i sign(j,i)·xf_i over a STAGED
    * fixed-point component attribute — pure BIGINT sums of the q161
    * components, so the projected vector is associative-exact
    * (partition- and engine-independent, no float fold at any width).
    *
    * Plan shape: the sign matrix enters as ONE constant-folded literal
    * (array<array<long>>) and the sums run as a transform/zip_with
    * fold over it. An unrolled outDims·dim add/subtract chain computes
    * the same integers but costs seconds of Janino compilation per
    * plan (measured: the q230 row was compile-dominated and FLAT in
    * data size at ~7 s) and risks the generated-method size limit as
    * dims grow; the folded form keeps the tree O(1) in both widths.
    */
  def rpProjFromComponents(outDims: Int, dim: Int, xf: Column): Column = {
    val signs = rpSigns(outDims, dim)
    // each output dim is one compiled DotFoldLong loop against its
    // constant-folded ±1 sign row — same left-to-right integer sum as
    // the composed transform/zip_with/aggregate form (the executable
    // spec pinned in ExpressionsSpec), but per-row cost is outDims
    // compiled loops instead of outDims·dim interpreted tree-walks:
    // the projection dominated the gen-sf10 sweep leg in HOF form
    array((0 until outDims).map { j =>
      graft.expressions.DotFoldLong(
        array(signs(j).map(v => lit(v.toLong)): _*), xf)
    }: _*)
  }

  /** (id, proj) — the compressed index write path. Stages components,
    * then sums (two stacked Projects = one codegen stage, components
    * computed once per row).
    */
  def randomProject(df: DataFrame, outDims: Int, dim: Int): DataFrame =
    df.select(col("id"), rpComponentsExpr(col("emb"), dim).as("_xf"))
      .select(col("id"),
        rpProjFromComponents(outDims, dim, col("_xf")).as("proj"))

  /** Fixed-point cosine over projected BIGINT vectors: dot and both
    * norms are EXACT integer sums (|proj_j| ≤ dim·10^6 ⇒ every product
    * ≤ ~4·10^15 and a ≤64-term sum stays far under Long range); only
    * the final normalization touches DOUBLE, with the scoreFixed
    * operand order both engines replay bit-for-bit. A zero-norm
    * projection (total cancellation — reachable under JL) scores 0,
    * the scoreFixedSafe convention.
    */
  def rpScoreFixed(a: Column, b: Column): Column = {
    // native compiled integer dot; the composed
    // aggregate(zip_with(a,b,(x,y)=>x*y), 0L, _+_) form is its
    // executable spec (ExpressionsSpec parity) — the HOF tree-walk was
    // the q231 shortlist scan's dominant term at gen-sf10
    def idot(x: Column, y: Column) = graft.expressions.DotFoldLong(x, y)
    val d = idot(a, b)
    val na = idot(a, a)
    val nb = idot(b, b)
    when(na === 0L || nb === 0L, lit(0L)).otherwise(
      floor(d.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
        * lit(1000000.0)).cast("long"))
  }

  /** JL cosine-preservation sweep — the "how many projected dims does
    * this corpus need" calibration table, read BEFORE committing an
    * ANN or near-dup pass to compressed vectors (q179 is this table
    * for the PQ lever). Sign rows are independent, so proj[1..d'] IS
    * the d'-dim projection: the whole sweep costs ONE projection pass,
    * and each candidate d' scores a prefix slice. Error is measured on
    * the deterministic adjacent-id pair stream (id, id+1) — n−1 pairs,
    * linear; a calibration needs an unbiased error sample, not all
    * pairs — as |floor(cos_proj·10^6) − floor(cos_exact·10^6)|,
    * bucketed with cumulative ≤ counts per d'.
    *
    * Scale shape: projection + scoring are narrow over an id-shift
    * self-join (equi-join, no fan-out); the histogram is a bounded
    * aggregate; the cumulative window runs over ≤ |outDimsList| ×
    * (2e6/width) rows. Nothing is quadratic anywhere.
    *
    * Output: (out_dims, bucket_lo_1e6, n_pairs, n_le) ordered.
    */
  def rpErrorSweep(corpus: DataFrame, outDimsList: Seq[Int], dim: Int,
      bucketWidth1e6: Long = 50000L): DataFrame = {
    require(outDimsList.nonEmpty && outDimsList.forall(_ >= 1),
      s"need positive out dims, got $outDimsList")
    require(bucketWidth1e6 >= 1, s"bucket width must be positive: $bucketWidth1e6")
    val dMax = outDimsList.max
    val base = corpus
      .select(col("id"), col("emb"), rpComponentsExpr(col("emb"), dim).as("_xf"))
      .select(col("id"), col("emb"),
        rpProjFromComponents(dMax, dim, col("_xf")).as("_proj"))
    val pairs = base.as("a")
      .join(base.as("b"), col("a.id") + 1 === col("b.id"))
      .select(
        scoreFixed(col("a.emb"), col("b.emb")).as("_exact"),
        col("a._proj").as("_pa"), col("b._proj").as("_pb"))
    val errs = explode(array(outDimsList.map { d =>
      struct(lit(d.toLong).as("out_dims"),
        abs(rpScoreFixed(slice(col("_pa"), 1, d), slice(col("_pb"), 1, d))
          - col("_exact")).as("err"))
    }: _*))
    val w = Window.partitionBy(col("out_dims")).orderBy(col("bucket_lo_1e6"))
      .rowsBetween(Window.unboundedPreceding, 0)
    pairs.select(errs.as("e"))
      .select(col("e.out_dims").as("out_dims"),
        expr(s"(e.err DIV $bucketWidth1e6) * $bucketWidth1e6").as("bucket_lo_1e6"))
      .groupBy(col("out_dims"), col("bucket_lo_1e6"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_le", sum(col("n_pairs")).over(w).cast("long"))
      .orderBy(col("out_dims"), col("bucket_lo_1e6"))
  }

  /** RP-compressed shortlist + exact refine — the q167 refine
    * discipline on the dimensionality lever: queries score the corpus
    * on d'-dim projected INTEGER vectors (dim/d' × less arithmetic,
    * and at scale dim/d' × less index IO — the projected index is all
    * the shortlist scan reads), the top-kShort survivors re-rank by
    * TRUE cosine. Shortlist and queries broadcast onto the corpus
    * scan; the corpus never shuffles; both rank tails are the
    * bounded-state TopKPairs aggregate.
    */
  def rpRefineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      kShort: Int, outDims: Int, dim: Int): DataFrame = {
    require(kShort >= k, s"shortlist must cover the answer: kShort=$kShort < k=$k")
    def proj(d: DataFrame) = d
      .select(col("id"), rpComponentsExpr(col("emb"), dim).as("_xf"))
      .select(col("id"), rpProjFromComponents(outDims, dim, col("_xf")).as("_proj"))
    val scored = proj(corpus).as("c")
      .join(broadcast(proj(queries).as("q")), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        rpScoreFixed(col("q._proj"), col("c._proj")).as("rp_1e6"))
    val shortlist = rank(scored, kShort, "rp_1e6")
      .select(col("query_id"), col("neighbor_id"))
    val refined = corpus.select(col("id").as("neighbor_id"), col("emb").as("nemb"))
      .join(broadcast(shortlist), "neighbor_id")
      .join(broadcast(queries.select(col("id").as("query_id"), col("emb").as("qemb"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        scoreFixedSafe(col("qemb"), col("nemb")).as("score_1e6"))
    rank(refined, k)
  }
}
