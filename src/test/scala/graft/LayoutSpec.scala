package graft

import org.apache.spark.sql.functions._

import graft.operators.{Layout, Provenance}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables sort-merge join without a shuffle exchange") {
    // disable broadcast so the no-shuffle claim is about bucketing, not
    // about a broadcast side-stepping the exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
      val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "rv")
      Layout.writeBucketed(left, "bkt_left", "k", 8)
      Layout.writeBucketed(right, "bkt_right", "k", 8)
      val joined = Layout.colocatedJoin(spark, "bkt_left", "bkt_right", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q276 shape: battery fact tables co-locate (no exchange on " +
    "either join side) and a bucket-key filter prunes to one bucket") {
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val root = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q276spec").toString
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"),
          floor(col("l_quantity") * 100).cast("long").as("_qc"))
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      Layout.writeBucketedAt(l, "graft_q276spec_l", "l_orderkey", 8,
        s"$root/l")
      Layout.writeBucketedAt(o, "graft_q276spec_o", "o_orderkey", 8,
        s"$root/o")
      val j = spark.table("graft_q276spec_l")
        .join(spark.table("graft_q276spec_o"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("_qc")).as("q"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // the ONLY hash exchange allowed is the tiny 5-group aggregate's;
      // neither join INPUT may shuffle — that is the bucketing contract
      assert(p.split("Exchange hashpartitioning\\((l|o)_orderkey")
        .length - 1 == 0,
        s"bucketed join inputs must not re-shuffle on the join key:\n$p")
      // bucket pruning: an equality on the bucket key reads 1 of 8
      // buckets with no index — the layout's second dividend.
      // DisableUnnecessaryBucketedScan turns bucketed reading off for
      // a bare filter-scan (no operator requires the distribution), so
      // pin the pruning with auto-bucketed-scan disabled — the mode a
      // deliberate point-lookup would run in
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val pruned = spark.table("graft_q276spec_l")
          .filter(col("l_orderkey") === 42L)
        val pp = pruned.queryExecution.executedPlan.toString
        assert(pp.contains("SelectedBucketsCount: 1 out of 8"),
          s"bucket-key equality must prune to one bucket:\n$pp")
      } finally spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals plain join results") {
    val big = (1L to 500L).map(i => (if (i % 2 == 0) "hot" else s"k$i", i)).toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("key", "tag")
    val plain = big.join(small, "key").select("key", "v", "tag")
    val salted = Layout.saltedJoin(big, small, "key", salt = 4).select("key", "v", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot-targeted salted join equals plain join; cold keys carry " +
    "salt 0 (no replication)") {
    val big = (1L to 500L).map(i => (if (i % 2 == 0) "hot" else s"k$i", i)).toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("key", "tag")
    val plain = big.join(small, "key").select("key", "v", "tag")
    val salted = Layout.saltedJoinHot(big, small, "key", salt = 4,
      hotKeys = Seq("hot")).select("key", "v", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the overhead contract: only hot small rows replicate — 1 hot key
    // x 4 salts + 2 cold rows x 1
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0),
        when(col("key").isin("hot"), lit(3)).otherwise(lit(0)))))
    assert(smallSalted.count() == 4 + 2)
  }

  test("z-order layout gives tight per-file boxes; both dims prune, unlike a linear sort") {
    // 64x64 grid, one row per cell — every (x, y) equally likely
    val grid = spark.range(0, 64 * 64).selectExpr(
      "id", "id % 64 AS x", "id DIV 64 AS y")
    val nFiles = 16
    val zDir = Fixtures.tmpDir("zord").toString
    val linDir = Fixtures.tmpDir("linr").toString
    Layout.zorderWrite(grid, zDir, col("x"), col("y"), nFiles, bits = 6)
    // the single-column baseline: same file count, sorted by x only
    grid.withColumn("_s", col("x"))
      .repartitionByRange(nFiles, col("_s")).sortWithinPartitions("_s").drop("_s")
      .write.mode("overwrite").parquet(linDir)

    // per-file (min, max) boxes, as parquet row-group stats would see them
    def boxes(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min("x"), max("x"), min("y"), max("y"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def touched(bs: Array[(Long, Long, Long, Long)],
        x0: Long, x1: Long, y0: Long, y1: Long): Int =
      bs.count { case (xl, xh, yl, yh) => xh >= x0 && xl <= x1 && yh >= y0 && yl <= y1 }

    val zb = boxes(zDir); val lb = boxes(linDir)
    assert(zb.length == nFiles && lb.length == nFiles)
    // nothing lost in the rewrite
    assert(spark.read.parquet(zDir).select("id").exceptAll(grid.select("id")).isEmpty)
    // a y-only slice: the x-sorted layout cannot prune AT ALL (every
    // file spans all of y); z-order must skip at least half the files
    val yQueryZ = touched(zb, 0, 63, 0, 7)
    assert(touched(lb, 0, 63, 0, 7) == nFiles, "x-sort spans all of y by construction")
    assert(yQueryZ <= nFiles / 2, s"z-order must prune a y-slice: touched $yQueryZ/$nFiles")
    // a small box in both dims: z-order touches few files
    val boxZ = touched(zb, 8, 15, 8, 15)
    assert(boxZ <= 4, s"8x8 box should touch a corner of the z-curve: $boxZ")
  }

  test("3-column z-order prunes slices of every dimension") {
    // 16x16x16 cube, one row per cell; 5 bits per dim (3·5=15 ≤ 63)
    val cube = spark.range(0, 16 * 16 * 16).selectExpr(
      "id", "id % 16 AS x", "(id DIV 16) % 16 AS y", "id DIV 256 AS z")
    val nFiles = 16
    val dir = Fixtures.tmpDir("zord3").toString
    Layout.zorderWriteN(cube, dir, Seq(col("x"), col("y"), col("z")), nFiles, bits = 5)
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("x"), max("x"), min("y"), max("y"), min("z"), max("z"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(boxes.length == nFiles)
    assert(spark.read.parquet(dir).select("id").exceptAll(cube.select("id")).isEmpty)
    // a quarter-slice of any single dimension must skip files — a
    // linear sort on x would span all of y and z in every file
    def sliceTouched(dim: Int): Int = boxes.count { b =>
      val (lo, hi) = dim match {
        case 0 => (b._1, b._2); case 1 => (b._3, b._4); case _ => (b._5, b._6)
      }
      hi >= 0 && lo <= 3
    }
    for (d <- 0 until 3)
      assert(sliceTouched(d) <= nFiles / 2,
        s"dim $d quarter-slice must prune: touched ${sliceTouched(d)}/$nFiles")
    // 2-col zValue must equal the N-col generalization (q69 stability)
    val two = cube.select(
      Layout.zValue(col("x"), col("y"), 5).as("a"),
      Layout.zValueN(Seq(col("x"), col("y")), 5).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(two == 0, "zValue(x,y) must equal zValueN(Seq(x,y))")
  }

  test("compactTo merges small files to the byte target with content unchanged") {
    val in = Fixtures.tmpDir("cmpin").toString
    val out = Fixtures.tmpDir("cmpout").toString
    val df = spark.range(0, 10000).selectExpr("id", "id * 3 AS v")
    df.repartition(64).write.mode("overwrite").parquet(in) // 64 tiny files
    val inFiles = spark.read.parquet(in).inputFiles.length
    assert(inFiles == 64)
    val target = 1L << 20 // every tiny file fits: expect ONE output file
    val n = Layout.compactTo(spark, in, out, target)
    assert(n == 1, s"10k tiny rows fit one 1 MB target file, got $n")
    assert(spark.read.parquet(out).inputFiles.length == 1)
    // nothing lost, nothing duplicated
    assert(spark.read.parquet(out).exceptAll(df).isEmpty)
    assert(df.exceptAll(spark.read.parquet(out)).isEmpty)
    // a tiny target splits output across more files
    val out2 = Fixtures.tmpDir("cmpout2").toString
    val n2 = Layout.compactTo(spark, in, out2, targetBytes = 8L << 10)
    assert(n2 > 4, s"an 8 KB target must fan out: $n2")
    intercept[IllegalArgumentException](Layout.compactTo(spark, in, out, 0))
  }

  test("shardAssign: deterministic permutation, balanced shards, null keys drop") {
    val df = (1L to 4000L).map(i => (i, s"d$i")).toDF("k", "v")
    val a = Layout.shardAssign(df, col("k"), numShards = 8)
      .select("k", "shard_id", "shard_pos")
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 4000)
    // every shard's positions are exactly 1..size (a permutation)
    rows.groupBy(_._2).foreach { case (sh, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $sh positions must be 1..n")
    }
    // md5-mod balance: no shard more than 35% off the mean at n=4000
    val sizes = rows.groupBy(_._2).map(_._2.length)
    assert(sizes.size == 8 && sizes.forall(s => s > 325 && s < 675),
      s"shard sizes unbalanced: $sizes")
    // pure function of the key set: a repartitioned input agrees
    val b = Layout.shardAssign(df.repartition(13), col("k"), 8)
      .select("k", "shard_id", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(b.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    // null keys are unassignable
    val withNull = df.union(
      Seq("x").toDF("v").select(lit(null).cast("long").as("k"), col("v")))
    assert(Layout.shardAssign(withNull, col("k"), 8).count() == 4000)
    intercept[IllegalArgumentException](Layout.shardAssign(df, col("k"), 0))
  }

  test("shardedWrite: shard dirs land in shard_pos order and round-trip") {
    val dir = Fixtures.tmpDir("shards").toString
    val df = (1L to 1000L).map(i => (i, s"d$i")).toDF("k", "v")
    Layout.shardedWrite(df, dir, col("k"), numShards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.select("shard_id").distinct().count() == 4)
    // within each shard dir, file row order IS shard_pos order (the
    // dataloader streams the file without sorting)
    (0 until 4).foreach { sh =>
      val pos = spark.read.parquet(s"$dir/shard_id=$sh")
        .select("shard_pos").collect().map(_.getLong(0))
      assert(pos.toSeq == pos.sorted.toSeq, s"shard $sh not in pos order")
      assert(pos.toSeq == (1L to pos.length).toSeq, s"shard $sh positions broken")
    }
    // membership agrees with shardAssign
    val direct = Layout.shardAssign(df, col("k"), 4)
      .select("k", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val written = back.select("k", "shard_id")
      .collect().map(r => (r.getLong(0), r.getAs[Number]("shard_id").longValue())).toSet
    assert(written == direct)
  }

  test("provenance compaction preserves state and shrinks file count") {
    val lake = Fixtures.tmpDir("prov").toString
    val p = new Provenance(spark, lake)
    (1 to 5).foreach(i => p.createBatch(s"b$i", "s", s"/f$i", "h"))
    p.updateStatus("b1", "VALIDATED")
    val before = p.batches.collect().map(r => r.getString(0) -> r.getAs[String]("status")).toMap
    val filesBefore = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$lake/_control/provenance_batch_events")).count()
    p.compact()
    val filesAfter = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$lake/_control/provenance_batch_events")).count()
    val after = p.batches.collect().map(r => r.getString(0) -> r.getAs[String]("status")).toMap
    assert(after == before)
    assert(filesAfter < filesBefore)
    // still appendable after compaction
    p.updateStatus("b2", "VALIDATED")
    assert(p.batches.filter(col("status") === "VALIDATED").count() == 2)
  }
}
