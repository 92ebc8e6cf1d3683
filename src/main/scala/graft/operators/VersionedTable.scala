package graft.operators

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hudi-semantics versioned table on plain parquet (the image ships no
  * Hudi jars, so this reimplements the reference's surface —
  * hudi/register_hudi.py:44-96 — as copy-on-write snapshots):
  *
  *  - `upsert`: key-equality merge on `recordKey`, ties resolved by
  *    max(`precombine`) (Hudi precombine semantics, register_hudi.py:65);
  *    writes only the key-hash buckets the update touches (COW at
  *    bucket granularity).
  *  - `delete`: key-set removal as a COW commit (Hudi delete
  *    operation) — touched buckets rewritten without the keys, older
  *    commits untouched for time travel.
  *  - `diff`: key-level change feed (insert/delete/update) between
  *    any two commits via snapshot comparison — sees deletes, unlike
  *    `incremental`.
  *  - `snapshot`: latest commit read (S8's latest-version autodiscovery
  *    — lexicographic max dir, register_hudi.py:22-41).
  *  - `asOf`: time travel — newest commit ≤ the given ts
  *    (README.md:196-199 `as.of.instant`).
  *  - `commits`: distinct commit times desc (A4/O6).
  *
  * Layout and scale: rows are hash-partitioned on `recordKey` into
  * `numBuckets` buckets. Each commit dir holds `data/_bucket=<b>/`
  * parquet for ONLY the buckets its updates touched, plus a manifest
  * mapping every live bucket to the commit that last wrote it. A
  * snapshot read unions the manifest's bucket paths; untouched buckets'
  * files are shared between commits without being copied or rewritten —
  * so a 1-row upsert into a 100 TB table rewrites one bucket, not the
  * table. This is the same file-group/commit-timeline idea Hudi uses.
  * The merge itself is one shuffle on recordKey (row_number window)
  * over just the touched buckets' rows.
  */
object VersionedTable {
  /** Executable form of the bucket-sizing guidance: enough buckets to
    * keep each at or under `targetBucketBytes` (default 1 GB — the
    * size where a touched-bucket rewrite stays a single comfortable
    * task), rounded UP to a power of two so successive [[VersionedTable.rebucket]]
    * migrations double cleanly as the table grows.
    */
  def suggestBucketCount(tableBytes: Long, targetBucketBytes: Long = 1L << 30): Int = {
    require(tableBytes >= 0 && targetBucketBytes > 0)
    // div-then-round-up: the add-before-divide ceiling would overflow
    // Long for near-Long.MaxValue sizes and answer 1
    val needed = math.max(1L, tableBytes / targetBucketBytes +
      (if (tableBytes % targetBucketBytes == 0) 0L else 1L))
    val capped = math.min(needed, 1L << 20) // 2^20 buckets ≈ 1 PB at 1 GB each
    var p = 1L
    while (p < capped) p <<= 1
    p.toInt
  }
}

/** @param partitionColOpt bucket the table's FILES by this payload
  *   column instead of the record key (VERDICT r15 item 2 — e.g. a
  *   dedup edge store bucketed by `cluster_id` so a takedown's
  *   induced-subgraph read is file-pruned via [[VersionedTable.snapshotPrunedBy]]).
  *   The record key stays the merge identity. This is Hudi's
  *   PARTITION-SCOPED (non-global) index contract, stated not hidden:
  *   the upsert merge only sees the buckets the incoming rows' partition
  *   values hash to, so an update that CHANGES a row's partition value
  *   must go through [[VersionedTable.upsertMoved]] with the old values — a plain
  *   [[VersionedTable.upsert]] would leave the stale copy alive in its old bucket
  *   (exactly the duplicate Hudi documents for non-global indexes when a
  *   record's partition path changes). Same rule for [[VersionedTable.delete]]:
  *   the keys frame must carry the partition column with the rows'
  *   CURRENT values. The partition column is part of the persisted
  *   layout (manifest header) — reopening with a different one fails.
  */
final class VersionedTable(spark: SparkSession, root: String,
    val recordKey: String, val precombine: String, numBuckets: Int = 16,
    val partitionColOpt: Option[String] = None) {

  val CommitCol = "_commit_time"
  private val BucketCol = "_bucket"

  /** The column whose hash places a row's FILE: the payload partition
    * column when configured, else the record key.
    */
  private val bucketCol: String = partitionColOpt.getOrElse(recordKey)

  /** Deterministic value→bucket hash. Values are hashed via their
    * string form so the assignment is stable across physical column
    * types; nulls coalesce to a sentinel so they land in a real bucket
    * (xxhash64 of a null column would be null → rows lost to an
    * unreferenced default partition). COMPAT: the sentinel is part of
    * the persisted layout — changing it re-buckets null keys, so
    * existing tables with null-key rows would stop merging them.
    */
  private def bucketExpr = bucketExprOf(col(bucketCol))

  private def bucketExprOf(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(coalesce(c.cast("string"), lit("__graft_null_key__"))),
      lit(numBuckets.toLong))

  private def commitDirsAll: Seq[String] =
    graft.util.Fs.list(Paths.get(root))
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      .filter(_.matches("\\d{14}")).sorted

  /** A commit is COMPLETE when its manifest exists, or when it is a
    * legacy pre-bucketing snapshot (parquet directly in the dir, no
    * `data/`). A dir with `data/` but no manifest is a crashed upsert —
    * it must be ignored, NOT read as a legacy snapshot: its data/ holds
    * only the touched buckets, and treating that partial write as the
    * whole table would silently drop every other bucket.
    */
  private def isComplete(ts: String): Boolean =
    Files.exists(manifestPath(ts)) || !Files.isDirectory(Paths.get(s"$root/$ts/data"))

  private def commitDirs: Seq[String] = commitDirsAll.filter(isComplete)

  def commits: Seq[String] = commitDirs.reverse

  private def newCommitTs(): String = {
    val base = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    // strictly increasing even within one second; crashed (incomplete)
    // commit dirs still reserve their name
    commitDirsAll.lastOption.filter(_ >= base)
      .map(last => (last.toLong + 1).toString).getOrElse(base)
  }

  // ---- manifest: bucket -> commit that last wrote it ----

  private def manifestPath(ts: String) = Paths.get(s"$root/$ts/manifest.tsv")

  private def readManifest(ts: String): Map[Int, String] =
    if (!Files.exists(manifestPath(ts))) Map.empty
    else Files.readAllLines(manifestPath(ts)).asScala
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(b, c) = line.split("\t")
        b.toInt -> c
      }.toMap

  /** Bucket count recorded in a commit's manifest header (None for
    * pre-header or unparsable manifests — the guard then simply
    * doesn't fire rather than crashing on a mangled header).
    */
  private def readBucketCount(ts: String): Option[Int] =
    if (!Files.exists(manifestPath(ts))) None
    else Files.readAllLines(manifestPath(ts)).asScala
      .find(_.startsWith("#buckets="))
      .flatMap(l => scala.util.Try(l.stripPrefix("#buckets=").trim.toInt).toOption)

  /** Partition column recorded in a commit's manifest header — None
    * for record-key-bucketed tables (the header is simply absent, so
    * pre-r16 manifests read correctly as key-bucketed).
    */
  private def readPartCol(ts: String): Option[String] =
    if (!Files.exists(manifestPath(ts))) None
    else Files.readAllLines(manifestPath(ts)).asScala
      .find(_.startsWith("#partcol="))
      .map(_.stripPrefix("#partcol=").trim)

  /** Shared open-guard for every mutating path: bucket count AND
    * partition column are persisted layout — opening with either
    * different from what the table was written with would hash rows
    * into buckets the old manifest doesn't cover and silently unmerge
    * them.
    */
  private def requireLayoutMatches(prev: String): Unit = {
    readBucketCount(prev).foreach { stored =>
      require(stored == numBuckets,
        s"table at $root was written with numBuckets=$stored, opened with $numBuckets")
    }
    if (Files.exists(manifestPath(prev))) {
      val stored = readPartCol(prev)
      require(stored == partitionColOpt,
        s"table at $root was written with partitionCol=$stored, " +
          s"opened with $partitionColOpt")
    }
  }

  private def writeManifest(ts: String, m: Map[Int, String]): Unit = {
    Files.createDirectories(manifestPath(ts).getParent)
    val headers = s"#buckets=$numBuckets" +:
      partitionColOpt.map(c => s"#partcol=$c").toSeq
    Files.writeString(manifestPath(ts),
      (headers ++
        m.toSeq.sortBy(_._1).map { case (b, c) => s"$b\t$c" }).mkString("", "\n", "\n"))
  }

  private def bucketPath(b: Int, commit: String) = s"$root/$commit/data/$BucketCol=$b"

  /** Bucket ids a commit actually wrote, listed from its data/ dir —
    * the single parser of the `_bucket=N` partition-dir layout (used
    * by both [[upsert]] and [[rebucket]] to build manifests).
    */
  private def writtenBuckets(ts: String): Seq[Int] =
    graft.util.Fs.list(Paths.get(s"$root/$ts/data"))
      .map(_.getFileName.toString).filter(_.startsWith(s"$BucketCol="))
      .map(_.stripPrefix(s"$BucketCol=").toInt)

  /** Read the table as of a commit via its manifest (legacy fallback:
    * a manifest-less commit dir is read as a plain parquet snapshot).
    */
  private def readCommit(ts: String): DataFrame = {
    val m = readManifest(ts)
    if (m.isEmpty) spark.read.parquet(s"$root/$ts")
    else readGrouped(m)
  }

  /** Manifest-driven read with SCHEMA EVOLUTION across commits: bucket
    * files are grouped by their writing commit (files inside one commit
    * share a schema) and the groups are unioned by name with implicit
    * up-cast coercion — a column a later commit ADDED null-fills on
    * pre-evolution rows, and a column a later commit WIDENED (int→long,
    * the union's wider common type) reads as the wide type table-wide.
    * Plain parquet `mergeSchema` refuses mixed int/long files outright,
    * so the union-of-groups IS the widening read path. Groups are
    * unioned oldest-writer-first so the oldest schema anchors column
    * order and evolved columns append. Scans stay manifest-pruned and
    * filters/pruning push into every branch; the branch count is
    * bounded by the distinct writer commits a manifest references,
    * which [[clean]] keeps small.
    */
  private def readGrouped(m: Map[Int, String]): DataFrame =
    m.toSeq.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (c, kvs) =>
        spark.read.parquet(kvs.map(kv => bucketPath(kv._1, c)).sorted: _*) }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** COW upsert: touched buckets' latest rows ⟕ updates, keep
    * max-precombine row per key; on precombine ties the incoming
    * (update) row wins, matching Hudi's "latest write wins" for equal
    * precombine values. Buckets the update doesn't touch are carried
    * forward by manifest reference — zero data movement.
    */
  def upsert(updates0: DataFrame): String = upsertInternal(updates0, None)

  /** [[upsert]] for updates that MOVE rows across partitions — the
    * partition-scoped-index escape hatch (see the class doc): `oldValues`
    * is any frame carrying the partition column with the moved rows'
    * OLD values, so the merge also reads (and rewrites) the buckets the
    * stale copies live in. Within the merge the record-key window keeps
    * the incoming row (higher precombine / update-wins tie), the stale
    * copy is dropped, and a source bucket left empty falls out of the
    * manifest. On a record-key-bucketed table this degenerates to a
    * plain [[upsert]] (keys never move), so callers can use it
    * unconditionally when old values are at hand.
    */
  def upsertMoved(updates0: DataFrame, oldValues: DataFrame): String =
    upsertInternal(updates0, Some(oldValues))

  private def upsertInternal(updates0: DataFrame,
      extraProbe: Option[DataFrame]): String = {
    val ts = newCommitTs()
    val prev = commitDirs.lastOption
    prev.foreach(requireLayoutMatches)
    val prevManifest = prev.map(readManifest).getOrElse(Map.empty[Int, String])
    // a manifest-less previous commit is a legacy (pre-bucketing)
    // snapshot: fold the WHOLE snapshot into this commit — treating it
    // as empty would silently drop every pre-existing row
    val legacyPrev = prev.filterNot(_ => prevManifest.nonEmpty)
    // incoming rows are stamped with this commit; carried rows keep the
    // commit that last wrote them (Hudi per-record _hoodie_commit_time
    // semantics — rewritten-but-unchanged rows don't advance), which is
    // what makes [[incremental]] reads record-accurate.
    val tagged = updates0.withColumn("_is_update", lit(1)).withColumn(CommitCol, lit(ts))
    // The updates plan is evaluated twice: a cheap column-pruned probe
    // for the touched buckets, then the merged write. For a
    // NON-deterministic plan the two could diverge — writing a bucket
    // the probe never read would silently shadow its history — so the
    // written set is verified against the probe below and the commit
    // aborted on divergence (explicit error instead of data loss;
    // callers with non-deterministic sources should checkpoint first).
    var touchedProbe: Option[Set[Int]] = None
    val prevData: Option[DataFrame] = legacyPrev match {
      case Some(legacy) => Some(spark.read.parquet(s"$root/$legacy"))
      case None =>
        // the probe is the DISTINCT bucket ids of the incoming rows'
        // bucket-column values (≤ numBuckets longs — bounded collect),
        // plus, for a move-aware upsert, the buckets of the old values
        val touched = (updates0.select(bucketExpr.as("b")) +:
            extraProbe.map(_.select(bucketExpr.as("b"))).toSeq)
          .reduce(_.unionAll(_)).distinct()
          .collect().map(_.getLong(0).toInt).toSet
        touchedProbe = Some(touched)
        val touchedM = prevManifest.filter { case (b, _) => touched(b) }
        if (touchedM.isEmpty) None else Some(readGrouped(touchedM))
    }
    val merged = prevData match {
      case None => tagged
      case Some(p) => p.withColumn("_is_update", lit(0))
        .unionByName(tagged, allowMissingColumns = true)
    }
    val w = Window.partitionBy(col(recordKey))
      .orderBy(col(precombine).desc, col("_is_update").desc)
    val deduped = merged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "_is_update")
      .withColumn(BucketCol, bucketExpr)
    // cluster rows by bucket before the partitioned write: the merge
    // window shuffles on recordKey, which spreads every bucket across
    // every task — writing from that layout fans out to (tasks ×
    // touched buckets) small files per commit. One extra shuffle of
    // just the touched rows gives ~one file per bucket, the Hudi
    // file-group layout the ≤1 GB/bucket sizing guidance assumes.
    // Width = the TOUCHED bucket count, not the table's (r16): a
    // 10-bucket maintenance commit on a 2048-bucket table otherwise
    // launches 2048 near-empty write tasks — measured dominating
    // small-commit latency 3x in the takedownlake2 probe.
    val writeWidth = touchedProbe.map(t => math.min(numBuckets,
      math.max(1, t.size))).getOrElse(numBuckets)
    deduped.repartition(writeWidth, col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$ts/data")
    // manifest = buckets this commit actually wrote (listed from disk,
    // so legacy fold-ins and normal touched-bucket commits take the
    // same path) over the carried-forward previous entries
    val written = writtenBuckets(ts)
    touchedProbe.foreach { touched =>
      val unexpected = written.toSet -- touched
      if (unexpected.nonEmpty) {
        graft.util.Fs.deleteRecursively(Paths.get(s"$root/$ts"))
        sys.error(s"upsert aborted: updates wrote buckets $unexpected the probe " +
          "never read — the updates plan is non-deterministic; checkpoint it first")
      }
    }
    // a probed bucket the merge did NOT write back has no surviving
    // rows (possible only under payload partitioning, when every row
    // MOVED out) — keeping its old manifest entry would resurrect the
    // moved rows from the stale file, so it falls out like delete's
    // emptied buckets
    val emptied = touchedProbe.getOrElse(Set.empty)
      .filter(prevManifest.contains) -- written.toSet
    writeManifest(ts, (prevManifest -- emptied) ++ written.map(_ -> ts))
    ts
  }

  /** COW delete (Hudi `delete` operation): remove every row whose
    * `recordKey` appears in `keys0` (any frame with that column; extra
    * columns ignored; null keys match null-key rows via null-safe
    * equality). Touched buckets are rewritten without the deleted keys;
    * untouched buckets carry forward by manifest reference, and a
    * bucket left with no rows is dropped from the manifest entirely.
    * Carried rows keep their per-record `_commit_time` — so, matching
    * Hudi's non-CDC incremental reads, a pure delete is invisible to
    * [[incremental]] consumers (the snapshot is authoritative); older
    * commits still hold the rows, so [[asOf]] before the delete
    * resurrects them, exactly like Hudi COW time travel.
    *
    * Like [[upsert]], the keys plan is evaluated twice (bucket probe,
    * then the anti-join); non-deterministic key sets should be
    * checkpointed first — a key the probe missed would survive in an
    * unrewritten bucket. Crash-safe: data before manifest.
    */
  def delete(keys0: DataFrame): String = {
    val ts = newCommitTs()
    val prev = commitDirs.lastOption.getOrElse(
      sys.error(s"delete on $root: table has no commits"))
    requireLayoutMatches(prev)
    val prevManifest = readManifest(prev)
    // under payload partitioning the keys frame must also carry the
    // partition column (the rows' CURRENT values) — the probe hashes
    // it to find the buckets the doomed rows live in
    partitionColOpt.foreach { pc =>
      require(keys0.columns.contains(pc),
        s"delete on a $pc-partitioned table needs the keys frame to " +
          s"carry $pc (the rows' current values) for bucket pruning")
    }
    val keys = keys0.select(col(recordKey)).distinct()
    // legacy (pre-bucketing) snapshot: fold the whole table, like upsert
    val (prevData, probed): (Option[DataFrame], Set[Int]) =
      if (prevManifest.isEmpty) (Some(spark.read.parquet(s"$root/$prev")), Set.empty)
      else {
        val touched = keys0.select(bucketExpr.as("b")).distinct()
          .collect().map(_.getLong(0).toInt).toSet
        val live = touched.filter(prevManifest.contains)
        val liveM = prevManifest.filter { case (b, _) => live(b) }
        (if (liveM.isEmpty) None else Some(readGrouped(liveM)), live)
      }
    var survOpt: Option[DataFrame] = None
    val written: Seq[Int] = prevData match {
      case None => Seq.empty
      case Some(pd) =>
        val surv = pd.join(keys.toDF("_del_key"),
            pd(recordKey) <=> col("_del_key"), "left_anti")
          .withColumn(BucketCol, bucketExpr)
        survOpt = Some(surv)
        // width = touched buckets (see upsert): a key-set delete only
        // rewrites the probed buckets
        val writeWidth =
          if (probed.isEmpty) numBuckets // legacy fold-in
          else math.min(numBuckets, math.max(1, probed.size))
        surv.repartition(writeWidth, col(BucketCol))
          .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$ts/data")
        writtenBuckets(ts)
    }
    val emptied = probed -- written.toSet
    val newManifest = (prevManifest -- emptied) ++ written.map(_ -> ts)
    if (newManifest.isEmpty) {
      // every row deleted: a manifest that references nothing would make
      // the snapshot schema unrecoverable — keep one empty bucket file
      survOpt.get.limit(0).drop(BucketCol)
        .write.mode("overwrite").parquet(bucketPath(0, ts))
      writeManifest(ts, Map(0 -> ts))
    } else writeManifest(ts, newManifest)
    ts
  }

  /** Fused COW mutation (r16 optimization): apply a key-set DELETE and
    * an UPSERT as ONE commit — byte-for-byte the snapshot `delete(keys)`
    * followed by `upsert(updates)` would produce, at half the commit
    * cost. The maintenance gates (takedown, sample repair, cluster
    * relabel) always carry both a remove set and a rewrite set; paying
    * two commits meant two bucket probes, two touched-bucket reads,
    * two writes and two manifests per gate call — measured as pure
    * dispatch overhead in the r16 TakedownProf census. Equivalence
    * argument: a key in both sets sees its stored row anti-joined away
    * before the precombine window, exactly as a delete-then-upsert
    * leaves only the incoming row for the merge; keys in one set only
    * take the corresponding single-op path unchanged. Probe/rewrite
    * discipline, crash-safety (data before manifest), emptied-bucket
    * manifest drops, and the non-determinism abort are [[upsert]]'s.
    * `oldValues` plays [[upsertMoved]]'s role for partition-crossing
    * updates; under payload partitioning `deleteKeys0` must carry the
    * partition column (current values), like [[delete]].
    */
  def applyDelta(deleteKeys0: DataFrame, updates0: DataFrame,
      oldValues: Option[DataFrame] = None): String = {
    val ts = newCommitTs()
    val prev = commitDirs.lastOption
    prev.foreach(requireLayoutMatches)
    val prevManifest = prev.map(readManifest).getOrElse(Map.empty[Int, String])
    val legacyPrev = prev.filterNot(_ => prevManifest.nonEmpty)
    partitionColOpt.foreach { pc =>
      require(deleteKeys0.columns.contains(pc),
        s"applyDelta on a $pc-partitioned table needs the delete-keys " +
          s"frame to carry $pc (the rows' current values) for bucket pruning")
    }
    val delKeys = deleteKeys0.select(col(recordKey)).distinct()
    val tagged = updates0.withColumn("_is_update", lit(1))
      .withColumn(CommitCol, lit(ts))
    var touchedProbe: Option[Set[Int]] = None
    val prevData: Option[DataFrame] = legacyPrev match {
      case Some(legacy) => Some(spark.read.parquet(s"$root/$legacy"))
      case None =>
        // ONE probe over every frame that names a bucket: update rows,
        // doomed keys, and (for moves) the old partition values
        val touched = (updates0.select(bucketExpr.as("b")) +:
            deleteKeys0.select(bucketExpr.as("b")) +:
            oldValues.map(_.select(bucketExpr.as("b"))).toSeq)
          .reduce(_.unionAll(_)).distinct()
          .collect().map(_.getLong(0).toInt).toSet
        touchedProbe = Some(touched)
        val touchedM = prevManifest.filter { case (b, _) => touched(b) }
        if (touchedM.isEmpty) None else Some(readGrouped(touchedM))
    }
    val merged = prevData match {
      case None => tagged
      case Some(p) =>
        // delete BEFORE the merge window — the stored copy of a doomed
        // key must not survive via precombine
        p.join(delKeys.toDF("_del_key"),
            p(recordKey) <=> col("_del_key"), "left_anti")
          .withColumn("_is_update", lit(0))
          .unionByName(tagged, allowMissingColumns = true)
    }
    val w = Window.partitionBy(col(recordKey))
      .orderBy(col(precombine).desc, col("_is_update").desc)
    val deduped = merged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "_is_update")
      .withColumn(BucketCol, bucketExpr)
    val writeWidth = touchedProbe.map(t => math.min(numBuckets,
      math.max(1, t.size))).getOrElse(numBuckets)
    deduped.repartition(writeWidth, col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$ts/data")
    val written = writtenBuckets(ts)
    touchedProbe.foreach { touched =>
      val unexpected = written.toSet -- touched
      if (unexpected.nonEmpty) {
        graft.util.Fs.deleteRecursively(Paths.get(s"$root/$ts"))
        sys.error(s"applyDelta aborted: inputs wrote buckets $unexpected the " +
          "probe never read — a plan is non-deterministic; checkpoint it first")
      }
    }
    val emptied = touchedProbe.getOrElse(Set.empty)
      .filter(prevManifest.contains) -- written.toSet
    val newManifest = (prevManifest -- emptied) ++ written.map(_ -> ts)
    if (newManifest.isEmpty) {
      // every row deleted and nothing upserted: keep one empty bucket
      // file so the snapshot schema stays recoverable (delete's guard)
      deduped.limit(0).drop(BucketCol)
        .write.mode("overwrite").parquet(bucketPath(0, ts))
      writeManifest(ts, Map(0 -> ts))
    } else writeManifest(ts, newManifest)
    ts
  }

  /** [[applyDelta]] with the write sets PINNED here (r16): upserts and
    * delete keys union into ONE tagged checkpoint whose per-op counts
    * ride the checkpoint job as observed metrics, then apply as ONE
    * fused commit; empty sides degrade to the single op, an empty
    * delta commits nothing (the maintenance gates' idempotency
    * contract). Record-key-bucketed tables only — payload-partitioned
    * tables need explicit old values ([[applyDelta]]'s `oldValues`).
    * Returns the pinned upsert write set (the gates' shared contract).
    */
  def applyDeltaPinned(deleteKeys: DataFrame, upserts: DataFrame): DataFrame = {
    require(partitionColOpt.isEmpty,
      "applyDeltaPinned is for record-key-bucketed tables; under payload " +
        "partitioning use applyDelta with explicit old values")
    val upSchema = upserts.schema
    val delT = deleteKeys.select(
      (col(recordKey) +: upSchema.filter(_.name != recordKey).toSeq.map(f =>
        lit(null).cast(f.dataType).as(f.name))) :+ lit("_del").as("_op"): _*)
    val (ws, m) = graft.util.Actions.checkpointObserved(
      upserts.withColumn("_op", lit("_up")).unionByName(delT),
      "nUp" -> count(when(col("_op") === "_up", 1)),
      "nDel" -> count(when(col("_op") === "_del", 1)))
    val nUp = graft.util.Actions.longOr(m, "nUp", 0L)
    val nDel = graft.util.Actions.longOr(m, "nDel", 0L)
    val up = ws.filter(col("_op") === "_up").drop("_op")
    val del = ws.filter(col("_op") === "_del").select(col(recordKey))
    if (nDel > 0L && nUp > 0L) applyDelta(del, up)
    else if (nDel > 0L) delete(del)
    else if (nUp > 0L) upsert(up)
    up
  }

  /** Change feed between two commits — the snapshot-diff CDC a
    * non-CDC lake can still offer: a key-level FULL OUTER join of the
    * two as-of states, classifying every key as insert / delete /
    * update (payload columns compared null-safely, `_commit_time`
    * excluded — a rewrite that changes no payload is not a change) and
    * dropping unchanged keys. Unlike [[incremental]] this SEES deletes
    * (they surface as missing keys on the newer side) at the cost of
    * reading both snapshots rather than only changed buckets — the
    * classic completeness/cost trade; at scale, run it per bucket or
    * over manifest-diff-pruned buckets.
    *
    * Output: recordKey, change_type, then `before_<c>` / `after_<c>`
    * for every shared payload column (null on the absent side).
    */
  def diff(tsA: String, tsB: String): DataFrame = {
    val dirA = resolveCommit(tsA); val dirB = resolveCommit(tsB)
    val mA = readManifest(dirA); val mB = readManifest(dirB)
    // manifest pruning: a bucket whose manifests reference the SAME
    // writing commit holds byte-identical files on both sides — it
    // cannot contribute a change row, so only buckets whose references
    // differ (or exist on one side only) enter the snapshot compare.
    // Prunable only when both manifests exist and agree on the bucket
    // count (a rebucket migration renumbers keys, making bucket ids
    // incomparable); otherwise fall back to the full compare. At
    // 100 TB this turns "diff two snapshots" into "diff the touched
    // file groups" — the same bucket-granularity COW argument as
    // upsert.
    val prunable = mA.nonEmpty && mB.nonEmpty && {
      val (ba, bb) = (readBucketCount(dirA), readBucketCount(dirB))
      ba.isDefined && ba == bb
    }
    val (a, b) =
      if (!prunable) (readCommit(dirA), readCommit(dirB))
      else {
        val changed = (mA.keySet ++ mB.keySet)
          .filter(bk => mA.get(bk) != mB.get(bk))
        def side(m: Map[Int, String]): DataFrame = {
          val cm = m.filter(kv => changed(kv._1))
          if (cm.isEmpty) readCommit(dirA).filter(lit(false)) // schema-only
          else readGrouped(cm)
        }
        (side(mA), side(mB))
      }
    val payload = a.columns.toSeq.filter(c => c != recordKey && c != CommitCol)
      .filter(b.columns.contains)
    val ap = a.select(col(recordKey).as("_ka") +: lit(true).as("_pa") +:
      payload.map(c => col(c).as(s"before_$c")): _*)
    val bp = b.select(col(recordKey).as("_kb") +: lit(true).as("_pb") +:
      payload.map(c => col(c).as(s"after_$c")): _*)
    val joined = ap.join(bp, col("_ka") <=> col("_kb"), "full_outer")
    val sameLoad = struct(payload.map(c => col(s"before_$c")): _*) <=>
      struct(payload.map(c => col(s"after_$c")): _*)
    joined
      .withColumn(recordKey, coalesce(col("_ka"), col("_kb")))
      .withColumn("change_type",
        when(col("_pa").isNull, lit("insert"))
          .when(col("_pb").isNull, lit("delete"))
          .when(!sameLoad, lit("update")))
      .filter(col("change_type").isNotNull)
      .drop("_ka", "_kb", "_pa", "_pb")
      .select(col(recordKey) +: col("change_type") +:
        payload.flatMap(c => Seq(col(s"before_$c"), col(s"after_$c"))): _*)
  }

  /** Release-delta report: [[diff]] between two commits aggregated by a
    * dimension column — the per-feed "what changed in this corpus
    * release" note (inserts/updates/deletes per source) published with
    * every versioned dataset drop. The dimension of a delete comes from
    * the before-image, of an insert from the after-image. Costs the
    * manifest-pruned diff plus one bounded (dim × 3) aggregate.
    */
  def releaseDelta(tsA: String, tsB: String, dim: String): DataFrame =
    diff(tsA, tsB)
      .select(coalesce(col(s"after_$dim"), col(s"before_$dim")).as(dim),
        col("change_type"))
      .groupBy(col(dim), col("change_type"))
      .agg(count(lit(1)).as("n"))

  /** Bucket-count migration — the growth path for a table whose data
    * outlives its creation-time layout (Hudi solves the same problem
    * with sized file groups, register_hudi.py:56-69 at real scale).
    * Rewrites the FULL current snapshot into `newBuckets` key-hash
    * buckets as one migration commit and stamps the new `#buckets=`
    * manifest header; returns the handle for the migrated table (same
    * root, new bucket count) — subsequent upserts must open with
    * `numBuckets = newBuckets`, which the [[upsert]] guard enforces.
    *
    * Older commits stay time-travel readable: every read is driven by
    * its own commit's manifest, so per-commit bucket counts never leak
    * across commits. Per-row `_commit_time`s are preserved — a rebucket
    * moves bytes, not records, so [[incremental]] consumers see no
    * phantom changes — though incremental FILE pruning degrades to a
    * full read until newer commits shrink the changed-bucket set again
    * (every bucket's last writer is now the migration commit).
    *
    * Sizing guidance: target ≤ ~1 GB per bucket (numBuckets ≈
    * ceil(tableBytes / 1 GB), rounded up to a power of two) and migrate
    * as the table grows — a table created with 16 buckets that reaches
    * 100 TB would otherwise rewrite ~6 TB per touched bucket on every
    * upsert. The migration itself is one full-table shuffle-free
    * rewrite (read manifest paths → re-hash → partitioned write), the
    * same cost as Hudi clustering.
    *
    * Crash-safe like [[upsert]]: data is written before the manifest,
    * so a dir with `data/` but no manifest is ignored as a crashed
    * commit.
    */
  def rebucket(newBuckets: Int): VersionedTable = {
    require(newBuckets >= 1, s"newBuckets must be >= 1, got $newBuckets")
    val migrated = new VersionedTable(spark, root, recordKey, precombine,
      newBuckets, partitionColOpt)
    migrationCommit(identity, migrated, newBuckets)
    migrated
  }

  /** Full-snapshot rewrite commit — the shared engine of [[rebucket]]
    * and the schema migrations below. Reads the current snapshot,
    * applies `transform`, rewrites every bucket under `target`'s
    * layout, and stamps a complete manifest (all buckets → this
    * commit). Per-row `_commit_time`s are preserved — a migration
    * moves bytes, not records, so [[incremental]] consumers see no
    * phantom changes. Older commits keep their own schema and layout:
    * every read is driven by its commit's manifest, so [[asOf]] before
    * the migration returns the pre-migration schema (the time-travel
    * contract a long-lived table depends on). Crash-safe like
    * [[upsert]]: data before manifest.
    */
  private def migrationCommit(transform: DataFrame => DataFrame,
      target: VersionedTable, targetBuckets: Int): String = {
    val prev = commitDirs.lastOption.getOrElse(sys.error(s"no commits under $root"))
    // same open-guard as upsert: refuse to migrate a table opened with
    // the wrong current layout (the caller's mental model of the
    // layout is stale — make them re-open correctly first)
    requireLayoutMatches(prev)
    val ts = newCommitTs()
    val snap = readCommit(prev)
    // legacy (pre-bucketing) snapshots carry no per-row commit time;
    // stamp them with the migration commit so incremental stays defined
    val stamped =
      if (snap.columns.contains(CommitCol)) snap
      else snap.withColumn(CommitCol, lit(ts))
    val out = transform(stamped)
    require(out.columns.contains(CommitCol),
      "migration transform must preserve the per-row commit-time column")
    out.withColumn(BucketCol, target.bucketExpr)
      .repartition(targetBuckets, col(BucketCol)) // ~one file per bucket (see upsert)
      .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$ts/data")
    target.writeManifest(ts, writtenBuckets(ts).map(_ -> ts).toMap)
    ts
  }

  private def requireMigratable(name: String): Unit =
    require(name != recordKey && name != precombine && name != CommitCol,
      s"column $name is structural (recordKey/precombine/$CommitCol) and cannot be migrated")

  /** Schema migration: DROP a payload column from the live schema as a
    * full-rewrite commit. Older commits keep the column ([[asOf]]
    * before the drop still reads it); [[upsert]]s after the drop must
    * not reintroduce it unless the evolution is intended — an upsert
    * carrying the column simply ADDS it back (null on other rows), the
    * same add-column path as any new column.
    */
  def dropColumn(name: String): String = {
    requireMigratable(name)
    require(snapshot.columns.contains(name), s"no column $name to drop")
    migrationCommit(_.drop(name), this, numBuckets)
  }

  /** Schema migration: RENAME a payload column in the live schema as a
    * full-rewrite commit; older commits keep the old name.
    */
  def renameColumn(from: String, to: String): String = {
    requireMigratable(from); requireMigratable(to)
    val cols = snapshot.columns
    require(cols.contains(from), s"no column $from to rename")
    require(!cols.contains(to), s"column $to already exists")
    migrationCommit(_.withColumnRenamed(from, to), this, numBuckets)
  }

  /** Schema migration: WIDEN a column's type (int→long, float→double,
    * …) as a full-rewrite commit. Only lossless up-casts are allowed
    * (Catalyst's `Cast.canUpCast` — the same rule ANSI store
    * assignment uses), so a widen can never corrupt data. Note the
    * read path already widens IMPLICITLY when a later commit writes a
    * wider type into some buckets (see [[readGrouped]]); the explicit
    * form rewrites the files so every bucket carries the wide type —
    * the difference between "reads as long" and "is long on disk".
    * Widening the precombine or recordKey column is allowed: key
    * hashing goes through the string form (bucket-stable) and
    * precombine ordering is preserved by any up-cast.
    */
  def widenColumn(name: String, toType: String): String = {
    val schema = snapshot.schema
    require(schema.fieldNames.contains(name), s"no column $name to widen")
    val from = schema(name).dataType
    val to = org.apache.spark.sql.types.DataType.fromDDL(toType)
    require(org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to),
      s"cast ${from.simpleString} -> ${to.simpleString} is not a lossless widening")
    migrationCommit(_.withColumn(name, col(name).cast(to)), this, numBuckets)
  }

  /** Incremental pull (Hudi incremental-query semantics): records whose
    * last write is AFTER `sinceTs` (exclusive), as of the latest
    * commit. File-pruned via the manifest — only buckets written by a
    * commit newer than `sinceTs` are read at all — then record-filtered
    * on the per-row commit time, so carried-forward rows inside a
    * rewritten bucket are correctly excluded. At 100 TB an incremental
    * consumer reads only the changed file groups, never the table.
    */
  def incremental(sinceTs: String): DataFrame = commitDirs.lastOption match {
    case None => sys.error(s"no commits under $root")
    case Some(latest) =>
      val m = readManifest(latest)
      if (m.isEmpty) {
        // legacy pre-bucketing snapshot: record-filter when it carries
        // per-row commits; else the whole commit is newer-or-not
        val df = readCommit(latest)
        if (df.columns.contains(CommitCol)) df.filter(col(CommitCol) > sinceTs)
        else if (latest > sinceTs) df
        else df.filter(lit(false))
      } else {
        val touched = m.filter { case (_, c) => c > sinceTs }
        if (touched.isEmpty) snapshot.filter(lit(false))
        else readGrouped(touched).filter(col(CommitCol) > sinceTs)
      }
  }

  /** Metadata-only existence check: whether the table has any complete
    * commit — unlike [[snapshotOpt]].isDefined this constructs NO read
    * plan, so it never pays the manifest-wide directory listing (a
    * 2048-bucket table's listing costs seconds; measured in the
    * takedownlake2 probe).
    */
  def hasCommits: Boolean = commitDirs.nonEmpty

  def snapshotOpt: Option[DataFrame] = commitDirs.lastOption.map(readCommit)

  def snapshot: DataFrame =
    snapshotOpt.getOrElse(sys.error(s"no commits under $root"))

  /** Bucket-PRUNED snapshot read (VERDICT r15 item 2): only the
    * buckets `values`' bucket-column values hash to are read AT ALL —
    * file-level pruning by construction, since every bucket is its own
    * manifest-addressed directory. `values` is any frame carrying the
    * table's bucket column (the payload partition column when
    * configured, else the record key); it may be arbitrarily large —
    * what's collected is the DISTINCT bucket ids, ≤ numBuckets longs,
    * bounded regardless of input size. Returns the touched buckets'
    * FULL rows (a bucket holds other values too — the caller's
    * semi-join/filter restores exactness, e.g. repairParts' affected-
    * cluster semi). Legacy manifest-less snapshots fall back to the
    * full read (nothing to prune). Verify the pruning with
    * `df.inputFiles` — every path carries its `_bucket=N`.
    */
  def snapshotPrunedBy(values: DataFrame): DataFrame = {
    require(values.columns.contains(bucketCol),
      s"snapshotPrunedBy needs a frame carrying the bucket column " +
        s"'$bucketCol', got [${values.columns.mkString(", ")}]")
    val prev = commitDirs.lastOption.getOrElse(
      sys.error(s"no commits under $root"))
    val m = readManifest(prev)
    if (m.isEmpty) return readCommit(prev) // legacy: no pruning possible
    val wanted = values.select(bucketExprOf(col(bucketCol)).as("b"))
      .distinct().collect().map(_.getLong(0).toInt).toSet
    val pruned = m.filter { case (b, _) => wanted(b) }
    // schema-stable empty WITHOUT a full-manifest listing: one bucket
    // dir carries the schema (a 2048-bucket table's full listing
    // costs seconds — measured in the takedownlake2 probe's no-op leg)
    if (pruned.isEmpty) readGrouped(Map(m.head)).limit(0)
    else readGrouped(pruned)
  }

  /** Time travel: newest commit with commitTs <= asOfTs. */
  def asOf(asOfTs: String): DataFrame = readCommit(resolveCommit(asOfTs))

  private def resolveCommit(asOfTs: String): String =
    commitDirs.filter(_ <= asOfTs).lastOption
      .getOrElse(sys.error(s"no commit at or before $asOfTs"))

  /** Distinct commit times desc — the reference's commit-history query
    * (`select distinct _hoodie_commit_time ... order by desc`).
    */
  def commitHistory: DataFrame = {
    import spark.implicits._
    commits.toDF(CommitCol)
  }

  /** Retention cleaner (Hudi's cleaner service): keep the newest
    * `keepLast` commits as time-travel points and delete older commit
    * dirs — EXCEPT any whose bucket files a retained manifest still
    * references (buckets are shared across commits, so an old commit's
    * data can be live in the current snapshot). Also removes crashed
    * (incomplete) dirs older than the retention horizon. Returns the
    * deleted commit ids. Without this, a frequently-upserted table's
    * storage grows with every commit forever.
    */
  def clean(keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must keep at least the latest commit")
    val all = commitDirsAll
    val retained = all.filter(isComplete).takeRight(keepLast)
    val horizon = retained.headOption.getOrElse(return Nil)
    // TRANSITIVE closure over manifests: a commit kept by reference is
    // itself a readable time-travel point, so the commits ITS manifest
    // references must survive too — one-level retention would leave a
    // surviving manifest pointing at deleted bucket dirs
    var keep = retained.toSet
    var frontier = retained.toSet
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(ts => readManifest(ts).values) -- keep
      keep ++= next
      frontier = next
    }
    val deletable = all
      .filter(_ < horizon) // in-flight (crashed) dirs ≥ horizon survive
      .filterNot(keep)
    deletable.foreach(ts => graft.util.Fs.deleteRecursively(Paths.get(s"$root/$ts")))
    deletable
  }
}
