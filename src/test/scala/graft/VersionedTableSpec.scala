package graft

import graft.operators.{AsOf, VersionedTable}

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("upsert merges by recordkey with precombine max; time travel works") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "patient_id", "visit_date")

    val c1 = vt.upsert(Seq(
      ("P1", "2025-01-01", "flu"), ("P2", "2025-01-02", "cold"))
      .toDF("patient_id", "visit_date", "diagnosis"))
    val c2 = vt.upsert(Seq(
      ("P1", "2025-02-01", "checkup"), // newer visit wins
      ("P2", "2024-12-01", "old"),     // older visit loses to existing
      ("P3", "2025-02-03", "new"))
      .toDF("patient_id", "visit_date", "diagnosis"))

    val snap = vt.snapshot.collect()
      .map(r => r.getAs[String]("patient_id") -> r.getAs[String]("diagnosis")).toMap
    assert(snap == Map("P1" -> "checkup", "P2" -> "cold", "P3" -> "new"))

    // time travel to the first commit
    val old = vt.asOf(c1).collect()
      .map(r => r.getAs[String]("patient_id") -> r.getAs[String]("diagnosis")).toMap
    assert(old == Map("P1" -> "flu", "P2" -> "cold"))

    // commit history: two commits desc
    assert(vt.commits == Seq(c2, c1))
    assert(vt.commitHistory.collect().map(_.getString(0)).toSeq == Seq(c2, c1))
  }

  test("releaseDelta: per-dimension insert/update/delete counts; delete keeps before-image dim") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "id", "pre")
    val c1 = vt.upsert(Seq(
      (1L, "web", "aa", 1L), (2L, "web", "bb", 1L), (3L, "books", "cc", 1L))
      .toDF("id", "src", "txt", "pre"))
    vt.upsert(Seq((1L, "web", "aa2", 2L), (9L, "wiki", "new", 1L))
      .toDF("id", "src", "txt", "pre"))
    val head = vt.delete(Seq(Tuple1(3L)).toDF("id"))
    val out = vt.releaseDelta(c1, head, "src").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("change_type")) ->
        r.getAs[Long]("n")).toMap
    assert(out == Map(
      ("web", "update") -> 1L, ("wiki", "insert") -> 1L, ("books", "delete") -> 1L))
  }

  test("precombine tie: incoming update wins (Hudi latest-write-wins)") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "v")
    vt.upsert(Seq(("a", "1", "old")).toDF("k", "v", "payload"))
    vt.upsert(Seq(("a", "1", "new")).toDF("k", "v", "payload"))
    assert(vt.snapshot.collect()(0).getAs[String]("payload") == "new")
  }

  test("upsert rewrites only touched buckets; untouched files are reused as-is") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Fixtures.tmpDir("vtp").toString
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 8)
    val c1 = vt.upsert((1 to 100).map(i => (s"K$i", "1", s"p$i"))
      .toDF("k", "v", "payload"))
    def filesUnder(dir: String): Map[String, Long] =
      Files.walk(Paths.get(dir)).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.size(p)).toMap
    val c1Files = filesUnder(s"$root/$c1/data")
    val c1Mtimes = c1Files.keys.map(f =>
      f -> Files.getLastModifiedTime(Paths.get(f)).toMillis).toMap
    // file-group layout: the pre-write bucket repartition keeps each
    // bucket to one file, not (shuffle tasks × buckets) fragments
    val perBucket = c1Files.keys.groupBy(f => f.split("/").takeRight(2).head)
    perBucket.foreach { case (b, fs) =>
      assert(fs.size == 1, s"bucket $b has ${fs.size} files, expected 1")
    }

    // second commit touches exactly one key → exactly one bucket dir
    val c2 = vt.upsert(Seq(("K1", "2", "p1b")).toDF("k", "v", "payload"))
    val c2Buckets = Files.list(Paths.get(s"$root/$c2/data")).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      .filter(_.startsWith("_bucket=")).toSeq
    assert(c2Buckets.size == 1, s"expected 1 touched bucket dir, got $c2Buckets")

    // untouched buckets' files under c1 are untouched on disk (same
    // paths, sizes, mtimes) and still referenced by the c2 manifest
    val c1FilesAfter = filesUnder(s"$root/$c1/data")
    assert(c1FilesAfter == c1Files)
    c1Mtimes.foreach { case (f, t) =>
      assert(Files.getLastModifiedTime(Paths.get(f)).toMillis == t, s"$f was rewritten")
    }
    val manifest = Files.readAllLines(Paths.get(s"$root/$c2/manifest.tsv")).asScala
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\t")).map(a => a(0).toInt -> a(1)).toMap
    assert(manifest.values.toSet.contains(c1), "c2 manifest must reference c1 buckets")
    assert(manifest.count(_._2 == c2) == 1)

    // snapshot is still the merged view
    val snap = vt.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(snap.size == 100 && snap("K1") == "p1b" && snap("K2") == "p2")
    // time travel still sees the pre-update row
    val old = vt.asOf(c1).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(old("K1") == "p1")
  }

  test("delete removes keys as a COW commit; time travel resurrects; re-insert works") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "pre", numBuckets = 4)
    vt.upsert((1 to 20).map(i => (s"K$i", 1L, s"v$i")).toDF("k", "pre", "payload"))
    val c2 = vt.upsert(Seq(("K1", 2L, "v1b")).toDF("k", "pre", "payload"))
    val manifestBefore = vt.commits.size

    val cDel = vt.delete(Seq("K1", "K3", "KNOPE").toDF("k"))
    val snap = vt.snapshot.collect().map(_.getAs[String]("k")).toSet
    assert(!snap.contains("K1") && !snap.contains("K3"), s"deleted keys present: $snap")
    assert(snap.size == 18, s"only the two live deleted keys drop: $snap")
    // time travel to before the delete resurrects the rows
    val asOf = vt.asOf(c2).collect().map(_.getAs[String]("k")).toSet
    assert(asOf.contains("K1") && asOf.contains("K3"))
    assert(vt.commits.size == manifestBefore + 1 && vt.commits.head == cDel)
    // carried rows keep their commit time: a delete is invisible to
    // incremental consumers (non-CDC Hudi semantics)
    assert(vt.incremental(cDel).count() == 0)

    // re-insert after delete: no resurrection of the old payload
    vt.upsert(Seq(("K1", 1L, "reborn")).toDF("k", "pre", "payload"))
    val m = vt.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(m("K1") == "reborn" && !m.contains("K3") && m("K2") == "v2")
  }

  test("applyDelta ≡ delete-then-upsert: one fused commit, same snapshot (r16)") {
    import org.apache.spark.sql.functions.col
    def seed(vt: VersionedTable): Unit = {
      vt.upsert((1 to 20).map(i => (s"K$i", 1L, s"v$i")).toDF("k", "pre", "payload"))
      vt.upsert(Seq(("K1", 2L, "v1b")).toDF("k", "pre", "payload"))
    }
    // reference: sequential delete + upsert (two commits)
    val ref = new VersionedTable(spark, Fixtures.tmpDir("vt").toString, "k", "pre", numBuckets = 4)
    seed(ref)
    val dels = Seq("K2", "K3", "K5", "KNOPE").toDF("k")
    // K5 in BOTH sets: delete-then-upsert leaves the incoming row even
    // at a LOWER precombine than the deleted stored one
    val ups = Seq(("K5", 0L, "k5new"), ("K1", 1L, "ignored_low_pre"),
      ("K21", 1L, "fresh")).toDF("k", "pre", "payload")
    ref.delete(dels); ref.upsert(ups)
    // fused: one commit
    val fused = new VersionedTable(spark, Fixtures.tmpDir("vt").toString, "k", "pre", numBuckets = 4)
    seed(fused)
    val commitsBefore = fused.commits.size
    fused.applyDelta(dels, ups)
    assert(fused.commits.size == commitsBefore + 1, "applyDelta is ONE commit")
    def m(vt: VersionedTable) = vt.snapshot.collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("pre"), r.getAs[String]("payload")))
      .toSet
    assert(m(fused) == m(ref), s"fused=${m(fused)} ref=${m(ref)}")
    assert(m(fused).exists(r => r._1 == "K5" && r._3 == "k5new"),
      "key in both sets takes the incoming row")
    assert(m(fused).exists(r => r._1 == "K1" && r._3 == "v1b"),
      "low-precombine update loses to the surviving stored row")
    // emptied-bucket parity: delete EVERY row via the fused op, schema survives
    val vt3 = new VersionedTable(spark, Fixtures.tmpDir("vt").toString, "k", "pre", numBuckets = 4)
    vt3.upsert(Seq(("A", 1L, "x")).toDF("k", "pre", "payload"))
    vt3.applyDelta(Seq("A").toDF("k"), Seq.empty[(String, Long, String)].toDF("k", "pre", "payload"))
    assert(vt3.snapshot.count() == 0 && vt3.snapshot.columns.contains("payload"))
    // partitioned-table move parity: relabel crosses buckets, old bucket emptied
    val pRef = new VersionedTable(spark, Fixtures.tmpDir("vt").toString, "ek", "pre",
      numBuckets = 8, partitionColOpt = Some("cid"))
    val pFus = new VersionedTable(spark, Fixtures.tmpDir("vt").toString, "ek", "pre",
      numBuckets = 8, partitionColOpt = Some("cid"))
    val base = Seq(("e1", 10L, 1L), ("e2", 10L, 1L), ("e3", 20L, 1L))
      .toDF("ek", "cid", "pre")
    pRef.upsert(base); pFus.upsert(base)
    val pDel = Seq(("e3", 20L)).toDF("ek", "cid")
    val pUps = Seq(("e1", 30L, 2L), ("e2", 30L, 2L)).toDF("ek", "cid", "pre")
    val pOld = Seq(("e1", 10L), ("e2", 10L)).toDF("ek", "cid")
    pRef.delete(pDel); pRef.upsertMoved(pUps, pOld)
    pFus.applyDelta(pDel, pUps, Some(pOld))
    def pm(vt: VersionedTable) = vt.snapshot.select(col("ek"), col("cid"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(pm(pFus) == pm(pRef) && pm(pFus) == Set("e1" -> 30L, "e2" -> 30L),
      s"partitioned move parity: fused=${pm(pFus)} ref=${pm(pRef)}")
  }

  test("delete drops fully-emptied buckets from the manifest; untouched buckets carry by reference") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "pre", numBuckets = 4)
    val keys = (1 to 40).map(i => s"K$i")
    val c1 = vt.upsert(keys.map(k => (k, 1L, s"p$k")).toDF("k", "pre", "payload"))
    // empty one whole bucket: delete every key the bucket holds
    val byBucket = keys.groupBy(k =>
      Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(k),
          org.apache.spark.sql.types.StringType, 42L), 4L).toInt)
    val (victimBucket, victims) = byBucket.maxBy(_._2.size)
    vt.delete(victims.toDF("k"))
    val snap = vt.snapshot.collect().map(_.getAs[String]("k")).toSet
    assert(snap == keys.toSet -- victims, "exactly the victim bucket's keys drop")
    // untouched buckets still reference the ORIGINAL commit's files
    val manifest = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$root/${vt.commits.head}/manifest.tsv"))
    val entries = manifest.toArray.map(_.toString).filter(l => !l.startsWith("#"))
      .map { l => val Array(b, c) = l.split("\t"); b.toInt -> c }.toMap
    assert(!entries.contains(victimBucket), s"emptied bucket must leave the manifest: $entries")
    assert(entries.values.forall(_ == c1), s"survivor buckets carry by reference: $entries")
  }

  test("delete of every row keeps the schema readable; delete matches null keys") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "pre", numBuckets = 2)
    vt.upsert(Seq(("a", 1L, "x"), (null: String, 1L, "nullrow")).toDF("k", "pre", "payload"))
    // null-safe equality: a null key in the delete set removes null-key rows
    vt.delete(Seq[String](null).toDF("k"))
    assert(vt.snapshot.collect().map(_.getAs[String]("payload")).toSeq == Seq("x"))
    vt.delete(Seq("a").toDF("k"))
    val empty = vt.snapshot
    assert(empty.count() == 0 && empty.columns.toSet == Set("k", "pre", "payload", "_commit_time"))
    // the table remains usable after a full wipe
    vt.upsert(Seq(("b", 1L, "back")).toDF("k", "pre", "payload"))
    assert(vt.snapshot.collect().map(_.getAs[String]("k")).toSeq == Seq("b"))
  }

  test("diff classifies insert/delete/update; identical rewrites and null keys handled") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "pre", numBuckets = 4)
    val c1 = vt.upsert(Seq(
      ("A", 1L, "a1"), ("B", 1L, "b1"), ("C", 1L, "c1"),
      (null: String, 1L, "n1")).toDF("k", "pre", "payload"))
    vt.upsert(Seq(
      ("A", 2L, "a2"),                  // payload update
      ("B", 1L, "b1"),                  // tie-rewrite, payload IDENTICAL → not a change
      ("D", 1L, "d1"),                  // insert
      (null: String, 2L, "n2")          // null-key update
    ).toDF("k", "pre", "payload"))
    val head = vt.delete(Seq("C").toDF("k"))
    val out = vt.diff(c1, head).collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") ->
        r.getAs[String]("change_type")).toMap
    assert(out == Map("A" -> "update", "C" -> "delete", "D" -> "insert",
      "<null>" -> "update"), s"B's identical rewrite must not surface: $out")
    // before/after payloads ride along, null on the absent side
    val rows = vt.diff(c1, head).collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") ->
        (Option(r.getAs[String]("before_payload")),
          Option(r.getAs[String]("after_payload")))).toMap
    assert(rows("A") == ((Some("a1"), Some("a2"))))
    assert(rows("C") == ((Some("c1"), None)) && rows("D") == ((None, Some("d1"))))
    // a diff of a commit against itself is empty
    assert(vt.diff(head, head).count() == 0)
  }

  test("diff prunes unchanged buckets via manifest references") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "pre", numBuckets = 4)
    val c1 = vt.upsert((1 to 40).map(i => (s"K$i", 1L, s"p$i"))
      .toDF("k", "pre", "payload"))
    // base spreads keys over all 4 buckets; this commit rewrites ONE
    val c2 = vt.upsert(Seq(("K7", 2L, "p7b")).toDF("k", "pre", "payload"))
    val d = vt.diff(c1, c2)
    val rows = d.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("change_type") == "update")
    // the scan pin: only the touched bucket's file group is read on
    // either side — unchanged buckets' identical references pruned
    val buckets = d.inputFiles
      .flatMap("_bucket=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(buckets.size == 1,
      s"diff of a 1-bucket-touch commit must read 1 bucket, read: $buckets")
    val allBuckets = vt.snapshot.inputFiles
      .flatMap("_bucket=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(allBuckets.size == 4, s"base must populate all buckets: $allBuckets")
  }

  test("maintainRollup recomputes touched groups (incl. moved-from), carries the rest") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import graft.operators.RollupMaintenance
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "pre", numBuckets = 4)
    val aggs = Seq("n" -> count(lit(1)), "s" -> sum(col("v")))
    val c1 = vt.upsert(Seq(
      ("K1", "a", 10L, 1L), ("K2", "a", 20L, 1L),
      ("K3", "b", 30L, 1L), ("K4", "c", 40L, 1L),
      ("K6", "e", 60L, 1L)).toDF("k", "grp", "v", "pre"))
    val s1 = RollupMaintenance.fullRollup(vt, "grp", aggs).localCheckpoint()
    // K3 MOVES b → a (b empties!), K4 updates in place, K5 is new in d
    vt.upsert(Seq(("K3", "a", 31L, 2L), ("K4", "c", 41L, 2L),
      ("K5", "d", 50L, 1L)).toDF("k", "grp", "v", "pre"))
    val got = RollupMaintenance.maintainRollup(vt, c1, s1, "grp", aggs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = RollupMaintenance.fullRollup(vt, "grp", aggs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == full, s"maintained must equal full recompute: $got vs $full")
    assert(got == Map("a" -> ((3L, 61L)), "c" -> ((1L, 41L)),
      "d" -> ((1L, 50L)), "e" -> ((1L, 60L))),
      s"moved-from group b must disappear: $got")
    // documented caveat, pinned: deleting a pre-sinceTs key in an
    // otherwise-untouched group is invisible to incremental — the
    // carried summary row goes STALE under the non-CDC refresh...
    val headDel = vt.delete(Seq("K6").toDF("k"))
    val afterDel = RollupMaintenance.maintainRollup(vt, c1, s1, "grp", aggs)
      .collect().map(r => r.getString(0)).toSet
    assert(afterDel.contains("e"), "delete staleness is the documented contract")
    assert(!RollupMaintenance.fullRollup(vt, "grp", aggs)
      .collect().map(_.getString(0)).toSet.contains("e"))
    // ...and the CDC refresh closes exactly that hole: group e's last
    // row was deleted, so its carried row disappears and the result
    // equals the full recompute
    val cdc = RollupMaintenance.maintainRollupCdc(vt, c1, headDel, s1, "grp", aggs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fullDel = RollupMaintenance.fullRollup(vt, "grp", aggs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cdc == fullDel, s"CDC-maintained must equal full recompute: $cdc vs $fullDel")
    assert(!cdc.contains("e"), "emptied group must disappear under CDC refresh")
  }

  test("upsert folds a legacy manifest-less snapshot instead of dropping it") {
    import org.apache.spark.sql.functions.lit
    val root = Fixtures.tmpDir("vtl").toString
    // legacy (pre-bucketing) layout: parquet directly under <root>/<ts>/
    val legacyTs = "20200101000000"
    Seq(("A", "1", "a1"), ("B", "1", "b1")).toDF("k", "v", "payload")
      .withColumn("_commit_time", lit(legacyTs))
      .write.parquet(s"$root/$legacyTs")
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 4)
    assert(vt.snapshot.count() == 2) // legacy fallback read works
    vt.upsert(Seq(("B", "2", "b2")).toDF("k", "v", "payload"))
    val snap = vt.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(snap == Map("A" -> "a1", "B" -> "b2"),
      "legacy rows must be carried into the bucketed commit")
  }

  test("a crashed commit (data/ but no manifest) is skipped, not read as legacy") {
    import java.nio.file.{Files, Paths}
    val root = Fixtures.tmpDir("vtc").toString
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 4)
    val c1 = vt.upsert((1 to 20).map(i => (s"K$i", "1", s"p$i")).toDF("k", "v", "payload"))
    // simulate an upsert that wrote one bucket's data but died before
    // its manifest: the partial data/ dir must not shadow c1
    val crashed = (c1.toLong + 7).toString
    Seq(("K1", "9", "SHOULD_NOT_WIN")).toDF("k", "v", "payload")
      .write.parquet(s"$root/$crashed/data/_bucket=0")
    assert(vt.commits == Seq(c1), "crashed commit must not be listed")
    assert(vt.snapshot.count() == 20)
    // the next upsert merges against c1, not the partial write
    vt.upsert(Seq(("K2", "2", "p2b")).toDF("k", "v", "payload"))
    val snap = vt.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(snap.size == 20 && snap("K1") == "p1" && snap("K2") == "p2b")
    assert(Files.exists(Paths.get(s"$root/$crashed")), "crashed dir left for inspection")
  }

  test("opening a table with a different bucket count fails fast") {
    val root = Fixtures.tmpDir("vtb").toString
    new VersionedTable(spark, root, "k", "v", numBuckets = 8)
      .upsert(Seq(("A", "1", "p")).toDF("k", "v", "payload"))
    val wrong = new VersionedTable(spark, root, "k", "v", numBuckets = 16)
    val e = intercept[IllegalArgumentException] {
      wrong.upsert(Seq(("B", "1", "q")).toDF("k", "v", "payload"))
    }
    assert(e.getMessage.contains("numBuckets=8"))
    // reads are unaffected (bucket paths come from the manifest)
    assert(wrong.snapshot.count() == 1)
  }

  test("incremental works on a legacy manifest-less snapshot") {
    import org.apache.spark.sql.functions.lit
    val root = Fixtures.tmpDir("vtli").toString
    val legacyTs = "20200101000000"
    Seq(("A", "1", "a1")).toDF("k", "v", "payload")
      .withColumn("_commit_time", lit(legacyTs))
      .write.parquet(s"$root/$legacyTs")
    val vt = new VersionedTable(spark, root, "k", "v")
    assert(vt.incremental("00000000000000").count() == 1)
    assert(vt.incremental(legacyTs).count() == 0)
  }

  test("upsert merges rows with null record keys") {
    val root = Fixtures.tmpDir("vtn").toString
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 4)
    vt.upsert(Seq((null.asInstanceOf[String], "1", "n1"), ("A", "1", "a1"))
      .toDF("k", "v", "payload"))
    assert(vt.snapshot.count() == 2)
    vt.upsert(Seq((null.asInstanceOf[String], "2", "n2")).toDF("k", "v", "payload"))
    val snap = vt.snapshot.collect()
      .map(r => Option(r.getAs[String]("k")) -> r.getAs[String]("payload")).toMap
    assert(snap == Map(None -> "n2", Some("A") -> "a1"))
  }

  test("incremental pull returns only records last written after the given commit") {
    val root = Fixtures.tmpDir("vti").toString
    // one bucket: the second commit rewrites the bucket containing ALL
    // keys, so carried rows prove per-record commit preservation
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 1)
    val c1 = vt.upsert(Seq(("A", "1", "a1"), ("B", "1", "b1"), ("C", "1", "c1"))
      .toDF("k", "v", "payload"))
    val c2 = vt.upsert(Seq(("B", "2", "b2")).toDF("k", "v", "payload"))

    // carried rows keep their original commit even through the rewrite
    val commits = vt.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String](vt.CommitCol)).toMap
    assert(commits("A") == c1 && commits("C") == c1 && commits("B") == c2)

    // incremental since c1 → exactly the c2-written record
    val inc = vt.incremental(c1).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(inc == Map("B" -> "b2"))
    // since the epoch → everything; since c2 → nothing
    assert(vt.incremental("00000000000000").count() == 3)
    assert(vt.incremental(c2).count() == 0)
  }

  test("clean retains commits whose buckets the live manifest references") {
    import java.nio.file.{Files, Paths}
    val root = Fixtures.tmpDir("vtr").toString
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 8)
    val c1 = vt.upsert((1 to 50).map(i => (s"K$i", "1", s"p$i")).toDF("k", "v", "payload"))
    val c2 = vt.upsert(Seq(("K1", "2", "p1b")).toDF("k", "v", "payload"))
    val c3 = vt.upsert(Seq(("K1", "3", "p1c")).toDF("k", "v", "payload"))
    // a crashed dir older than the horizon must be swept too
    Seq(("X", "9", "junk")).toDF("k", "v", "payload")
      .write.parquet(s"$root/${(c1.toLong - 5).toString}/data/_bucket=0")
    val crashedOld = (c1.toLong - 5).toString
    // keep only the latest commit: c1 must SURVIVE (c3's manifest still
    // references c1's untouched buckets); c2's bucket was superseded
    val deleted = vt.clean(keepLast = 1)
    assert(deleted.toSet == Set(c2, crashedOld), s"got $deleted")
    assert(Files.exists(Paths.get(s"$root/$c1")) && !Files.exists(Paths.get(s"$root/$c2")))
    // snapshot is fully intact after cleaning
    val snap = vt.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(snap.size == 50 && snap("K1") == "p1c" && snap("K2") == "p2")
    assert(vt.commits == Seq(c3, c1))
  }

  test("clean retention is transitive: a kept-by-reference commit stays readable") {
    import org.apache.spark.sql.functions.{coalesce, col, lit, pmod, xxhash64}
    // With numBuckets=2, pick one key per bucket (probed with the SAME
    // hash the table uses). c0 writes both buckets; c1 rewrites bucket
    // of kA; c2 rewrites bucket of kB. Then c2's manifest = {A→c1,
    // B→c2} — it does NOT reference c0 directly; only c1's manifest
    // does ({A→c1, B→c0}). clean(1) keeps c2; c1 survives by direct
    // reference; c0 must survive via the TRANSITIVE closure through
    // c1 — a one-level implementation would delete it.
    val root = Fixtures.tmpDir("vtt").toString
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 2)
    val candidates = (1 to 20).map(i => s"K$i")
    val byBucket = candidates.toDF("k")
      .select(col("k"), pmod(xxhash64(coalesce(col("k").cast("string"),
        lit("__graft_null_key__"))), lit(2L)).as("b"))
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(byBucket.size == 2, "need keys in both buckets")
    val (kA, kB) = (byBucket(0L), byBucket(1L))
    val c0 = vt.upsert(Seq((kA, "1", "a1"), (kB, "1", "b1")).toDF("k", "v", "payload"))
    val c1 = vt.upsert(Seq((kA, "2", "a2")).toDF("k", "v", "payload"))
    val c2 = vt.upsert(Seq((kB, "2", "b2")).toDF("k", "v", "payload"))
    val deleted = vt.clean(keepLast = 1)
    assert(deleted.isEmpty, s"nothing is deletable in this chain, got $deleted")
    // c1 is still listed (so asOf really reads IT, not a fallback) and
    // every commit in the chain resolves all its bucket paths
    assert(vt.commits.contains(c1))
    val atC1 = vt.asOf(c1).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(atC1 == Map(kA -> "a2", kB -> "b1"))
    assert(vt.asOf(c0).count() == 2 && vt.asOf(c2).count() == 2)
  }

  test("rebucket migrates 4→16 buckets with content unchanged and history intact") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Fixtures.tmpDir("vtm").toString
    val vt4 = new VersionedTable(spark, root, "k", "v", numBuckets = 4)
    val c1 = vt4.upsert((1 to 80).map(i => (s"K$i", "1", s"p$i")).toDF("k", "v", "payload"))
    val c2 = vt4.upsert(Seq(("K1", "2", "p1b")).toDF("k", "v", "payload"))
    val before = vt4.snapshot.collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("payload"))).toSet

    val vt16 = vt4.rebucket(16)
    val mig = vt16.commits.head

    // snapshot content is byte-for-byte the same set of records
    val after = vt16.snapshot.collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("payload"))).toSet
    assert(after == before)
    // the migration commit's manifest carries the new bucket count and
    // references ONLY itself (full rewrite)
    val lines = Files.readAllLines(Paths.get(s"$root/$mig/manifest.tsv")).asScala
    assert(lines.head == "#buckets=16")
    val entries = lines.filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\t")).map(a => a(0).toInt -> a(1))
    assert(entries.forall(_._2 == mig))
    assert(entries.map(_._1).toSet.subsetOf((0 until 16).toSet))
    assert(entries.map(_._1).exists(_ >= 4), "keys must spread beyond the old 4 buckets")

    // old commits stay time-travel readable after the migration
    assert(vt16.asOf(c1).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap.apply("K1") == "p1")
    assert(vt16.asOf(c2).count() == 80)

    // the upsert guard accepts the post-migration table at 16...
    vt16.upsert(Seq(("K2", "3", "p2c")).toDF("k", "v", "payload"))
    assert(vt16.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap.apply("K2") == "p2c")
    // ...and rejects the stale 4-bucket handle
    val e = intercept[IllegalArgumentException] {
      vt4.upsert(Seq(("K3", "3", "x")).toDF("k", "v", "payload"))
    }
    assert(e.getMessage.contains("numBuckets=16"))
  }

  test("suggestBucketCount sizes by ~1 GB per bucket in powers of two") {
    val G = 1L << 30
    assert(VersionedTable.suggestBucketCount(0L) == 1)
    assert(VersionedTable.suggestBucketCount(G) == 1)
    assert(VersionedTable.suggestBucketCount(G + 1) == 2)
    assert(VersionedTable.suggestBucketCount(100L * G) == 128)
    assert(VersionedTable.suggestBucketCount(100L * 1024 * G) == 131072, "100 TB")
    assert(VersionedTable.suggestBucketCount(Long.MaxValue / 2) == (1 << 20), "capped")
    assert(VersionedTable.suggestBucketCount(Long.MaxValue) == (1 << 20),
      "near-max sizes must hit the cap, not overflow to 1")
    intercept[IllegalArgumentException](VersionedTable.suggestBucketCount(-1))
  }

  test("rebucket preserves per-record commit times (incremental sees no phantoms)") {
    val root = Fixtures.tmpDir("vtmi").toString
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 2)
    val c1 = vt.upsert(Seq(("A", "1", "a1"), ("B", "1", "b1")).toDF("k", "v", "payload"))
    val c2 = vt.upsert(Seq(("B", "2", "b2")).toDF("k", "v", "payload"))
    val vt8 = vt.rebucket(8)
    // a rebucket moves bytes, not records: incremental since c1 is
    // still exactly the c2-written record, not the whole table
    val inc = vt8.incremental(c1).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(inc == Map("B" -> "b2"))
    assert(vt8.incremental(c2).count() == 0)
    val commits = vt8.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String](vt8.CommitCol)).toMap
    assert(commits("A") == c1 && commits("B") == c2)
  }

  test("rebucket folds a legacy manifest-less snapshot into the bucketed layout") {
    val root = Fixtures.tmpDir("vtml").toString
    val legacyTs = "20200101000000"
    Seq(("A", "1", "a1"), ("B", "1", "b1")).toDF("k", "v", "payload")
      .write.parquet(s"$root/$legacyTs") // no per-row _commit_time at all
    val vt = new VersionedTable(spark, root, "k", "v", numBuckets = 4)
    val vt2 = vt.rebucket(4)
    val snap = vt2.snapshot.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[String]("payload")).toMap
    assert(snap == Map("A" -> "a1", "B" -> "b1"))
    // legacy rows got stamped with the migration commit
    assert(vt2.incremental(legacyTs).count() == 2)
    vt2.upsert(Seq(("B", "2", "b2")).toDF("k", "v", "payload"))
    assert(vt2.snapshot.count() == 2)
  }

  test("joinWithin equals the naive range-join result") {
    import org.apache.spark.sql.functions.{abs, col}
    val rnd = new scala.util.Random(3)
    val left = (1 to 200).map(i => (i.toLong % 5, rnd.nextInt(10000).toLong, s"L$i")).toDF("k", "lt", "ln")
    val right = (1 to 200).map(i => (i.toLong % 5, rnd.nextInt(10000).toLong, s"R$i")).toDF("k", "rt", "rn")
    val tol = 500L
    val fast = AsOf.joinWithin(left, right, "k", col("lt"), col("rt"), tol)
      .select("ln", "rn").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val naive = left.join(right, "k")
      .filter(abs(col("lt") - col("rt")) <= tol)
      .select("ln", "rn").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == naive, s"missing=${naive.diff(fast).take(3)} extra=${fast.diff(naive).take(3)}")
  }

  test("hl7Component splits composite fields on caret") {
    import org.apache.spark.sql.functions.col
    val df = Seq("DOE^JOHN^A").toDF("f")
    val r = df.select(
      graft.sources.Readers.hl7Component(col("f"), 1).as("family"),
      graft.sources.Readers.hl7Component(col("f"), 2).as("given"),
      graft.sources.Readers.hl7Component(col("f"), 5).as("missing")).collect()(0)
    assert(r.getString(0) == "DOE" && r.getString(1) == "JOHN" && r.isNullAt(2))
  }

  test("as-of join picks the latest prior right row per key") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 6L, 300L))
      .toDF("k", "ts", "v")
    val out = AsOf.joinPrior(left, right, "k", "ts", "v", "prior_v")
      .orderBy("name").collect()
      .map(r => r.getAs[String]("name") -> Option(r.getAs[java.lang.Long]("prior_v")).map(_.toLong)).toMap
    assert(out("e1").contains(100L)) // same-instant right included
    assert(out("e2").contains(200L))
    assert(out("e3").isEmpty)        // right ts=6 is after left ts=5
  }

  test("schema evolution: added column surfaces with nulls; untouched buckets keep old files") {
    val root = Fixtures.tmpDir("vt_evo").toString
    val vt = new VersionedTable(spark, root, "id", "pre", numBuckets = 4)
    val c1 = vt.upsert((1L to 8L).map(i => (i, 1L, s"v$i")).toDF("id", "pre", "val"))
    // commit 2 adds `extra`, touching only a subset of keys/buckets
    vt.upsert(Seq((4L, 2L, "v4b", 44L), (8L, 2L, "v8b", 88L))
      .toDF("id", "pre", "val", "extra"))
    val snap = vt.snapshot.orderBy("id").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("val"), Option(r.getAs[java.lang.Long]("extra"))))).toMap
    assert(snap(4L) == (("v4b", Some(44L))) && snap(8L) == (("v8b", Some(88L))))
    assert((1L to 8L).filterNot(Set(4L, 8L)).forall(i =>
      snap(i) == ((s"v$i", None))), s"pre-evolution rows carry NULL extra: $snap")
    // time travel to commit 1 shows the pre-evolution schema
    assert(!vt.asOf(c1).columns.contains("extra"),
      "the old commit must not grow the new column")
    // the evolution is metadata-cheap: commit 2 rewrote only the
    // touched buckets — the live snapshot still reads some commit-1
    // bucket files (layout: <root>/<commit>/data/_bucket=<b>)
    val c1Buckets = new java.io.File(s"$root/$c1/data").listFiles()
      .count(_.getName.startsWith("_bucket="))
    assert(c1Buckets >= 1, "commit 1 bucket dirs survive (shared via manifest)")
    val c2 = vt.commits.head // commits is newest-first; head = the evolution commit
    val c2Buckets = new java.io.File(s"$root/$c2/data").listFiles()
      .count(_.getName.startsWith("_bucket="))
    assert(c2Buckets < 4,
      s"commit 2 must rewrite only its touched buckets, saw $c2Buckets of 4")
  }

  test("implicit widening: later long commit reads table-wide as long; old commit keeps int") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val root = Fixtures.tmpDir("vt_widen_i").toString
    val vt = new VersionedTable(spark, root, "id", "pre", numBuckets = 4)
    val c1 = vt.upsert((1L to 8L).map(i => (i, 1L, i.toInt * 10)).toDF("id", "pre", "n")
      .select(col("id"), col("pre"), col("n").cast("int").as("n")))
    // commit 2 writes n as BIGINT with values beyond Int.MaxValue —
    // mergeSchema would refuse the mixed int/long files outright
    vt.upsert(Seq((4L, 2L, 3000000004L), (8L, 2L, 3000000008L)).toDF("id", "pre", "n"))
    val snap = vt.snapshot
    assert(snap.schema("n").dataType == LongType, "snapshot reads wide")
    val m = snap.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n")).toMap
    assert(m(4L) == 3000000004L && m(8L) == 3000000008L && m(1L) == 10L, s"$m")
    assert(vt.asOf(c1).schema("n").dataType == IntegerType,
      "time travel: the old commit keeps its narrow schema")
  }

  test("dropColumn/renameColumn migrate the live schema only; history and commit times survive") {
    import org.apache.spark.sql.functions.col
    val root = Fixtures.tmpDir("vt_mig").toString
    val vt = new VersionedTable(spark, root, "id", "pre", numBuckets = 4)
    val c1 = vt.upsert((1L to 8L).map(i => (i, 1L, s"a$i", s"b$i")).toDF("id", "pre", "a", "b"))
    val cDrop = vt.dropColumn("a")
    assert(!vt.snapshot.columns.contains("a") && vt.asOf(c1).columns.contains("a"),
      "drop is live-only; time travel resurrects the column")
    val cRen = vt.renameColumn("b", "bb")
    val cols = vt.snapshot.columns.toSet
    assert(cols.contains("bb") && !cols.contains("b"), s"$cols")
    assert(vt.asOf(cDrop).columns.contains("b"), "pre-rename commit keeps the old name")
    assert(vt.snapshot.orderBy("id").collect().map(_.getAs[String]("bb")).toSeq ==
      (1L to 8L).map(i => s"b$i"), "values carry through both migrations")
    // migrations move bytes, not records: per-row commit times are
    // preserved, so an incremental consumer sees no phantom changes
    assert(vt.incremental(c1).count() == 0L,
      "migration commits must be invisible to incremental reads")
    intercept[IllegalArgumentException](vt.dropColumn("id"))
    intercept[IllegalArgumentException](vt.renameColumn("bb", "pre"))
  }

  test("widenColumn: explicit widen rewrites on disk; narrowing refused") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.LongType
    val root = Fixtures.tmpDir("vt_widen_x").toString
    val vt = new VersionedTable(spark, root, "id", "pre", numBuckets = 4)
    vt.upsert((1L to 6L).map(i => (i, 1L, i.toInt)).toDF("id", "pre", "n")
      .select(col("id"), col("pre"), col("n").cast("int").as("n")))
    vt.widenColumn("n", "bigint")
    assert(vt.snapshot.schema("n").dataType == LongType)
    assert(vt.snapshot.orderBy("id").collect().map(_.getAs[Long]("n")).toSeq ==
      (1L to 6L), "values are preserved by the widen")
    intercept[IllegalArgumentException](vt.widenColumn("n", "int"))
  }

  test("maintainPostings follows upsert+delete; untouched postings carry verbatim") {
    import org.apache.spark.sql.functions.col
    val root = Fixtures.tmpDir("idxmaint").toString
    val vt = new VersionedTable(spark, root, "doc_id", "pre", numBuckets = 4)
    val c1 = vt.upsert(Seq((1L, "a b a", 1L), (2L, "c d", 1L), (3L, "e f", 1L))
      .toDF("doc_id", "text", "pre"))
    val p1 = graft.operators.TextSearch.postingRows(vt.snapshot, "doc_id", "text")
      .localCheckpoint()
    vt.upsert(Seq((2L, "c x", 2L)).toDF("doc_id", "text", "pre")) // update
    val c3 = vt.delete(Seq(3L).toDF("doc_id"))                    // delete
    val maintained = graft.operators.TextSearch
      .maintainPostings(vt, c1, c3, p1, "text")
    val full = graft.operators.TextSearch.postingRows(vt.snapshot, "doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(key(maintained) == key(full), "maintained must equal full recompute")
    assert(!key(maintained).exists(_._2 == 3L), "deleted doc's postings drop")
    assert(key(maintained).contains(("a", 1L, 3L, 2L)), "untouched postings carry")
    assert(key(maintained).contains(("x", 2L, 2L, 1L)), "updated doc re-tokenized")
  }

  test("incremental dedup admits only history-novel content; re-ingest is a no-op") {
    import org.apache.spark.sql.functions.col
    val root = Fixtures.tmpDir("incdedup").toString
    val index = new VersionedTable(spark, root, "h", "batch_no", numBuckets = 4)
    val b1 = Seq((10L, "alpha"), (11L, "beta"), (12L, "alpha")).toDF("doc_id", "text")
    val a1 = graft.operators.IncrementalDedup.appendNovel(index, b1, "doc_id", "text", 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a1.values.toSet == Set(10L, 11L), s"within-batch dup keeps min id: $a1")
    // batch 2: one repeat of history, one novel
    val b2 = Seq((20L, "beta"), (21L, "gamma")).toDF("doc_id", "text")
    val a2 = graft.operators.IncrementalDedup.appendNovel(index, b2, "doc_id", "text", 2L)
      .collect().map(r => r.getLong(1)).toSet
    assert(a2 == Set(21L), s"history repeat must not re-admit: $a2")
    // index state: 3 distinct contents, first-seen ids and batches
    val snap = index.snapshot.select(col("doc_id"), col("batch_no")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == Map(10L -> 1L, 11L -> 1L, 21L -> 2L), s"index: $snap")
    // idempotence: replaying batch 2 admits nothing and commits nothing
    val commits = index.commits.length
    val a3 = graft.operators.IncrementalDedup.appendNovel(index, b2, "doc_id", "text", 3L)
    assert(a3.isEmpty, "re-ingest admits nothing")
    assert(index.commits.length == commits, "empty admission must not commit")
  }

  test("appendNovelNearDup: exact + near-dup rejection against the signature index") {
    val root = Fixtures.tmpDir("vtnd").toString
    val index = new graft.operators.VersionedTable(spark, root, "doc_id", "batch_no",
      numBuckets = 4)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val b1 = Seq((10L, base), (11L, "hi")).toDF("doc_id", "text") // 11: no grams → null sig
    val a1 = graft.operators.IncrementalDedup
      .appendNovelNearDup(index, b1, "doc_id", "text", 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a1 == Set(10L, 11L), s"empty history admits everything: $a1")
    val b2 = Seq(
      (20L, base),                     // exact repeat of history → rejected
      (21L, base + " extra"),          // near dup of 10 → rejected by agreement
      (22L, "completely different words entirely unrelated content here now"),
      (23L, "hi")                      // exact repeat of the no-sig doc → rejected
    ).toDF("doc_id", "text")
    val a2 = graft.operators.IncrementalDedup
      .appendNovelNearDup(index, b2, "doc_id", "text", 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a2 == Set(22L), s"exact + near dups must be turned away: $a2")
    // the index carries the admitted signatures, null for the sig-less doc
    val snap = index.snapshot.collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Seq[Long]]("sig") == null)).toMap
    assert(snap.keySet == Set(10L, 11L, 22L), s"index keys: $snap")
    assert(snap(11L) && !snap(10L), s"no-gram doc indexes with null sig: $snap")
    // idempotence: replay admits nothing, commits nothing
    val commits = index.commits.length
    val a3 = graft.operators.IncrementalDedup
      .appendNovelNearDup(index, b2, "doc_id", "text", 3L)
    assert(a3.isEmpty, "re-ingest admits nothing")
    assert(index.commits.length == commits, "empty admission must not commit")
  }

  test("appendNovelSemantic: in-bucket cosine rejection against the vector index") {
    import org.apache.spark.sql.functions.col
    val root = Fixtures.tmpDir("vtsem").toString
    val index = new graft.operators.VersionedTable(spark, root, "id", "batch_no",
      numBuckets = 4)
    val b1 = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(0.0, 1.0))).toDF("id", "emb")
    val a1 = graft.operators.IncrementalDedup
      .appendNovelSemantic(index, b1, "id", "emb", 1L,
        simThreshold1e6 = 950000L, signBits = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a1 == Set(10L, 11L), s"empty history admits everything: $a1")
    val b2 = Seq(
      (20L, Seq(1.0, 0.0)),    // identical to 10 (same bucket, cos 1e6) → rejected
      (21L, Seq(0.99, 0.1)),   // near dup of 10 (same bucket, cos ≈ 0.995) → rejected
      (22L, Seq(-1.0, 0.5))    // bucket 0 with 11, but cos < 0.95 → admitted
    ).toDF("id", "emb")
    val a2 = graft.operators.IncrementalDedup
      .appendNovelSemantic(index, b2, "id", "emb", 2L,
        simThreshold1e6 = 950000L, signBits = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a2 == Set(22L), s"in-bucket near dups must be turned away: $a2")
    val snap = index.snapshot.select(col("id"), col("batch_no")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == Map(10L -> 1L, 11L -> 1L, 22L -> 2L), s"index: $snap")
    // idempotence: replayed vectors find THEMSELVES at cosine 10^6
    val commits = index.commits.length
    val a3 = graft.operators.IncrementalDedup
      .appendNovelSemantic(index, b2, "id", "emb", 3L,
        simThreshold1e6 = 950000L, signBits = 1)
    assert(a3.isEmpty, "re-ingest admits nothing")
    assert(index.commits.length == commits, "empty admission must not commit")
  }

  test("detectStitches: two-batch replay finds the batch operator's pairs, each once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val frags = Seq(
      (1L, "alpha beta gamma delta"),    // tail2 "gamma delta"
      (2L, "gamma delta epsilon zeta"),  // head2 matches 1 (cross-batch)
      (3L, "one two three four"),        // tail2 "three four"
      (5L, "three four five six"),       // head2 matches 3 (in-batch 1)
      (4L, "epsilon zeta eta theta")     // head2 "epsilon zeta" matches 2's
                                         // tail (batch2-precedes-hist dir? no:
                                         // 2 is batch 2... both in batch 2)
    ).toDF("fid", "text")
    val index = new graft.operators.VersionedTable(spark,
      Fixtures.tmpDir("sti").toString, "fid", "batch_no", numBuckets = 4)
    val b1 = frags.filter(col("fid") % 2 === 1) // fids 1, 3, 5
    val b2 = frags.filter(col("fid") % 2 === 0) // fids 2, 4
    val p1 = graft.operators.IncrementalDedup
      .detectStitches(index, b1, "fid", "text", 2, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = graft.operators.IncrementalDedup
      .detectStitches(index, b2, "fid", "text", 2, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((3L, 5L)), s"in-batch-1 pair only: $p1")
    // ingest 2 finds: 1→2 (hist tail → batch head) and 2→4 (in-batch)
    assert(p2 == Set((1L, 2L), (2L, 4L)), s"cross + in-batch-2 pairs: $p2")
    // the union equals the batch operator on the whole corpus
    val whole = graft.operators.Dedup
      .boundaryOverlapPairs(frags, "fid", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((p1 ++ p2) == whole, s"${p1 ++ p2} vs $whole")
    // the index holds every fragment's boundary exactly once
    assert(index.snapshot.count() == 5)
  }

  test("detectStitches maxKeyDf: hot seams spanning batch AND history " +
    "are dropped per side; organic seams survive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // history: 3 fragments ending in the boilerplate footer + 1 organic
    val hist = Seq(
      (1L, "unique1 words copyright footer"),
      (2L, "unique2 words copyright footer"),
      (3L, "unique3 words copyright footer"),
      (4L, "alpha beta gamma delta")).toDF("fid", "text")
    // batch: a 4th footer fragment, the footer continuation (head =
    // the hot seam), and the organic continuation of fid 4
    val batch = Seq(
      (10L, "unique4 words copyright footer"),
      (11L, "copyright footer continues onward"),
      (12L, "gamma delta epsilon zeta")).toDF("fid", "text")
    def run(cap: Option[Int]) = {
      val index = new graft.operators.VersionedTable(spark,
        Fixtures.tmpDir("sti_cap").toString, "fid", "batch_no",
        numBuckets = 4)
      graft.operators.IncrementalDedup
        .detectStitches(index, hist, "fid", "text", 2, 1L, cap).count()
      graft.operators.IncrementalDedup
        .detectStitches(index, batch, "fid", "text", 2, 2L, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // uncapped: every footer tail (df 4 across batch ∪ history)
    // stitches to fid 11's head, plus the organic 4→12 pair
    assert(run(None) ==
      Set((1L, 11L), (2L, 11L), (3L, 11L), (10L, 11L), (4L, 12L)))
    // capped at 3: the footer seam (df 4 > 3) drops from BOTH its tail
    // and head sides; the organic df-1 seam is untouched
    assert(run(Some(3)) == Set((4L, 12L)),
      "hot boilerplate seam must drop, organic continuation must survive")
    intercept[IllegalArgumentException](run(Some(0)))
  }
}
