package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for shuffle avoidance at scale: bucketed
  * co-located joins, salted skew joins, and Z-order clustering for
  * multi-dimensional data skipping.
  */
object Layout {

  /** Persist a frame bucketed by `key` so future equi-joins on `key`
    * between tables bucketed the same way need NO shuffle (bucket
    * pruning + co-located join). This is the lake-side answer to "the
    * same big join runs every day": pay the shuffle once at write time.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both Exchanges (verify with .explain: no "Exchange hashpartitioning"
    * under the SortMergeJoin).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** [[writeBucketed]] with an EXPLICIT storage path (external table):
    * the catalog entry carries the bucket spec, the files live under
    * `path` — the form scratch-dir battery rows need (no writes under
    * the default warehouse). Same co-location/pruning contract.
    */
  def writeBucketedAt(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Morton (Z-order) value over N non-negative integer columns:
    * interleave the low `bits` bits of every column — column j's bit i
    * lands at position `i·d + (d-1-j)` (for two columns that is x→2i+1,
    * y→2i, the classic 2-D Morton order). Rows close in EVERY dimension
    * get close z-values, so a range-partition on z gives each file a
    * tight bounding box in all dimensions and parquet min/max stats
    * prune multi-dimensional predicates — the data-skipping layout
    * single-column sorts can't provide (a sort by x leaves every file
    * spanning all of y). Pure shift/and/add composition: codegen'd,
    * and mirrored term-for-term by the DuckDB oracle.
    *
    * Real layout keys are 3-4 columns (source, date, length bucket,
    * lang id); `bits·d` must fit a signed long, and resolution per
    * dimension falls as dimensions grow — 16 bits × 3 dims or 12 × 4
    * are the practical shapes.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val d = cols.length
    require(d >= 1, "need at least one column")
    require(bits >= 1 && bits * d <= 63,
      s"bits·dims must fit a signed long: bits=$bits dims=$d")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * d + (d - 1 - j))
      }
    }.reduce(_ + _)
  }

  /** Two-column [[zValueN]] (the q69 battery shape). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits <= 31, s"bits must be in [1, 31], got $bits")
    zValueN(Seq(x, y), bits)
  }

  /** Write `df` as `numFiles` parquet files range-partitioned and
    * sorted by [[zValueN]] over `cols` — the clustering pass (Hudi/
    * Delta "Z-ORDER BY") a lake runs so that later selective scans
    * skip files on every layout column. One shuffle at write time,
    * bought back on every subsequent multi-dimensional scan.
    */
  def zorderWriteN(df: DataFrame, path: String, cols: Seq[Column],
      numFiles: Int, bits: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("_zv", zValueN(cols, bits))
      .repartitionByRange(numFiles, col("_zv"))
      .sortWithinPartitions(col("_zv"))
      .drop("_zv")
      .write.mode("overwrite").parquet(path)
  }

  def zorderWrite(df: DataFrame, path: String, x: Column, y: Column,
      numFiles: Int, bits: Int = 16): Unit =
    zorderWriteN(df, path, Seq(x, y), numFiles, bits)

  /** Compact a parquet directory's files into ~`targetBytes` outputs —
    * the small-file maintenance pass every lake needs: streaming
    * ingest and per-commit COW writes accumulate kilobyte files whose
    * open/footer overhead eventually dominates scans. Sizes come from
    * a filesystem listing (works on any Hadoop FS), the rewrite is one
    * `repartition` (round-robin — compaction balances bytes, it does
    * not promise an ordering), and the result lands in `outDir`: the
    * caller swaps it in atomically (rename) or repoints readers —
    * in-place rewrites of a live directory are how lakes lose data.
    * Returns the output file count.
    */
  def compactTo(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(conf)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Deterministic corpus sharding — the "global shuffle + fixed-N
    * shards" step that ends every pretraining data pipeline: the
    * dataloader reads shard files round-robin and needs (a) a
    * reproducible pseudorandom order and (b) shards of near-equal
    * size. Shard id = 60-bit md5 hash mod `numShards` (statistically
    * balanced, scan-speed, no coordination); within-shard position =
    * rank by (hash, key string) — so the concatenation of shards in
    * (shard_id, shard_pos) order realizes a deterministic global
    * permutation that is a pure function of the key SET: the same on
    * any engine, run, or partitioning, and stable under corpus
    * append (existing rows keep their relative order; new keys
    * interleave by hash).
    *
    * Scale shape: the only shuffle is ONE exchange keyed by shard —
    * which a sharded write pays anyway — and each rank window holds
    * n/numShards rows, so there is no global sort and no
    * single-partition window. NULL keys drop (unassignable),
    * matching the samplers.
    *
    * Output: the input columns plus `shard_id`, `shard_pos` (both
    * BIGINT, shard_pos 1-based).
    */
  def shardAssign(df: DataFrame, key: Column, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be positive, got $numShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard_id")).orderBy(col("_sh_h"), col("_sh_key"))
    df.withColumn("_sh_key", key.cast("string"))
      .filter(col("_sh_key").isNotNull)
      .withColumn("_sh_h", graft.functions.md5Long(col("_sh_key")))
      .withColumn("shard_id", pmod(col("_sh_h"), lit(numShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("_sh_key", "_sh_h")
  }

  /** Materialize [[shardAssign]] as `shard_id=K/` parquet directories,
    * each file internally in shard_pos order (`repartition` on the
    * shard column + `sortWithinPartitions` — one exchange total, then
    * the rank window's sort is reused by the write). A training job
    * maps shard K to worker K and streams it in order; re-running the
    * write reproduces byte-identical shard membership and order.
    */
  def shardedWrite(df: DataFrame, path: String, key: Column, numShards: Int): Unit =
    shardAssign(df, key, numShards)
      .repartition(numShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)

  /** Salted join for skewed keys: explode the small side `salt` ways,
    * scatter the big side's hot keys uniformly with a random-ish salt
    * derived from a stable row hash (deterministic — no rand(), so
    * retries/speculative tasks agree), then join on (key, salt).
    *
    * Use when one key holds a disproportionate share of rows and AQE's
    * skew handling isn't enough (e.g. a null-heavy or "unknown" key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    // salt <= 0 would NULL the big side's pmod and silently drop every
    // row from the inner join instead of failing
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salt)))
    val smallSalted = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    bigSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** Hot-key-TARGETED salted join: salt ONLY the keys in `hotKeys`
    * (normally the top of [[graft.operators.Diagnostics]]'
    * keySkewReport — measure, then mitigate). The blanket
    * [[saltedJoin]] replicates the ENTIRE small side `salt` ways —
    * measured at gen scale (ScaleProbe saltprobe) that replication
    * dominates and loses to the plain join when only one key is hot;
    * here the small side replicates only its hot rows (|hotKeys|·salt
    * extra rows total) and every cold key joins exactly as the plain
    * join would, so the overhead is proportional to the skew being
    * cured. Cold rows carry salt 0 on both sides; hot big rows
    * scatter by stable row hash, hot small rows explode to all
    * `salt` values.
    */
  def saltedJoinHot(big: DataFrame, small: DataFrame, key: String,
      salt: Int, hotKeys: Seq[Any]): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(hotKeys.nonEmpty, "empty hot-key list: use a plain join")
    val bigSalted = big.withColumn("_salt",
      when(col(key).isin(hotKeys: _*),
        pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)),
          lit(salt)))
        .otherwise(lit(0L)))
    val smallSalted = small
      .withColumn("_salt", explode(sequence(lit(0),
        when(col(key).isin(hotKeys: _*), lit(salt - 1)).otherwise(lit(0)))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    bigSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucket-balance audit for a key-hash layout: per-bucket row
    * counts, shares, and the one-number imbalance ratio
    * (max/mean in ppm; 1e6 = perfectly even) — the pre-check before
    * committing a bucket count for a table or shuffle (an imbalance
    * far above 1e6 means hot keys, and hot keys mean stragglers at
    * cluster scale). One count shuffle on the bucket id; the summary
    * is a bounded second aggregate broadcast back.
    *
    * Output: (bucket, n_rows, share_ppm, imbalance_ppm) ordered by
    * bucket; imbalance_ppm repeats on every row by design (the
    * one-number verdict travels with the detail).
    */
  def bucketBalanceAudit(df: DataFrame, key: Column,
      numBuckets: Int): DataFrame = {
    require(numBuckets >= 1, s"need numBuckets >= 1, got $numBuckets")
    val b = df.select(pmod(graft.functions.md5Long(key.cast("string")),
        lit(numBuckets.toLong)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val tot = b.agg(sum(col("n_rows")).as("_t"), max(col("n_rows")).as("_mx"),
      count(lit(1)).as("_nb"))
    b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_rows"),
        expr("(n_rows * 1000000) DIV _t").as("share_ppm"),
        expr("(_mx * _nb * 1000000) DIV _t").as("imbalance_ppm"))
      .orderBy(col("bucket"))
  }
}
