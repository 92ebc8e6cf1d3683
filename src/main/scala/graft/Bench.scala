package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** The bench session config, shared with graft.tools.ScaleProbe so
    * probe timings are comparable with BENCH numbers.
    */
  def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // respect the advisory partition size when AQE coalesces instead
      // of maximizing parallelism — fewer tiny post-shuffle tasks
      // (the setting Spark's AQE docs recommend)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Between-query hygiene, shared with [[Verify]]: release dropped
    * localCheckpoint blocks (the ContextCleaner only reclaims them
    * after a driver GC notices the dead RDD references; without the
    * nudge the block store fills across the battery and later queries
    * pay the GC pressure). Runs outside any timed section.
    */
  def interQueryHygiene(): Unit = System.gc()

  /** Schema-contract gate shared by Bench and [[Verify]]: the drift
    * COUNT is surfaced in one prominent summary line (not just the
    * per-column stderr detail), and `SPARK_GRAFT_STRICT=1` turns a
    * drifted input into an immediate abort instead of N downstream
    * per-query failures.
    */
  def contractGate(spark: SparkSession, sfDir: String): Unit = {
    val drifts = graft.util.SchemaContract.check(spark, sfDir)
    if (drifts > 0) {
      val strict = sys.env.get("SPARK_GRAFT_STRICT").contains("1")
      System.err.println(s"[schema-contract] SUMMARY: $drifts drifted " +
        s"column(s) at $sfDir — " + (if (strict)
          "aborting (SPARK_GRAFT_STRICT=1)"
        else "queries over drifted tables will fail downstream; " +
          "set SPARK_GRAFT_STRICT=1 to abort here instead"))
      if (strict) sys.exit(2)
    }
  }

  /** Fixed-work environment canary (VERDICT r11 item 1): a
    * constant-seed, in-memory, CPU-bound aggregate that never touches
    * SF data — 64M xxhash64+sum over a `range` split across the
    * session's cores, the same parallel whole-stage-codegen shape as
    * the battery's hot rows. Its min-of-3 time moves with the HOST
    * (cpu contention, frequency scaling, co-tenant load) and with
    * nothing in this repo, so `scripts/bench_regress.py` can divide
    * per-query ratios by the canary ratio and distinguish a
    * battery-wide environment shift (round 11's uniform 1.24×, then
    * adjudicated by hand-rebuilding the r10 snapshot) from a plan
    * regression automatically. Recorded in every bench line as
    * top-level `"canary"`, never inside `queries`.
    */
  def canarySec(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val parts = spark.sparkContext.defaultParallelism
    var best = Double.MaxValue
    var i = 0
    while (i < 3) {
      val t0 = System.nanoTime()
      spark.range(0L, 64L * 1000 * 1000, 1L, parts)
        .agg(sum(xxhash64(col("id") + lit(42L)))).count()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      i += 1
    }
    best
  }

  /** Per-job DISPATCH latency canary — the host axis [[canarySec]]
    * cannot see (r15 q167 adjudication: a 45-job training row drifted
    * 1.6× while the compute canary read flat; scheduler/dispatch
    * latency moves many-tiny-job rows without moving an in-memory
    * aggregate). Median wall of 20 one-row single-partition count
    * jobs, seconds/job — pure job-dispatch round-trip, no data, no
    * shuffle. Recorded as `"dispatch"` in every bench line so future
    * regress passes can classify dispatch-bound drift.
    */
  def dispatchSec(spark: SparkSession): Double = {
    val times = (0 until 20).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 1L, 1L, 1).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(times.length / 2)
  }

  /** Min-of-`runs` timing of one query execution: the per-run floor is
    * the intrinsic cost estimate that round-over-round comparisons
    * should use (the measured run-to-run variance band for join-tail
    * queries is ~2.3× — single-shot deltas chase that variance). A
    * failure in ANY run records −1: a query that sometimes fails must
    * never report its fastest success.
    */
  private def timeMin(runs: Int, body: () => Boolean): Double = {
    var best = Double.MaxValue
    var allOk = true
    var i = 0
    while (i < runs && allOk) {
      val t0 = System.nanoTime()
      allOk = body()
      val sec = (System.nanoTime() - t0) / 1e9
      if (allOk) best = math.min(best, sec)
      interQueryHygiene()
      i += 1
    }
    if (allOk && best != Double.MaxValue) best else -1.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_RUNS=N: time each query N times and report the
    // per-query MIN. Default 3 (VERDICT r13 item 1): the measured
    // run-to-run variance band for join-tail queries is ~2.3×, so the
    // driver's former single-shot battery read ~2× the archived
    // min-of-6 numbers; min-of-3 lands within the archive's noise.
    val runs = math.max(1,
      sys.env.get("SPARK_GRAFT_RUNS").flatMap(_.toIntOption).getOrElse(3))
    // SPARK_GRAFT_ISOLATE=1: run every query in a FRESH SparkSession
    // (own codegen cache, block store, and /tmp scratch) with its own
    // per-query warmup — the mode that separates a query's intrinsic
    // cost from battery-accumulated JVM pressure. The BASELINE.md
    // battery-inflation table compares the two modes.
    val isolate = sys.env.get("SPARK_GRAFT_ISOLATE").contains("1")
    // SPARK_GRAFT_ONLY=q1,q2: probe a subset (scale-slope runs);
    // the driver never sets it, so BENCH_r{N} stays the full battery
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var canary = -1.0
    var dispatch = -1.0
    val results: Map[String, Double] =
      if (isolate) {
        // input drift yields one named line per drifted column up
        // front, not N opaque per-query failures (the round-7 lesson);
        // isolate mode needs its own throwaway session for the check
        locally {
          val s = buildSession()
          try {
            contractGate(s, sfDir); canary = canarySec(s)
            dispatch = dispatchSec(s)
          } finally s.stop()
          org.apache.spark.sql.SparkSession.clearActiveSession()
          org.apache.spark.sql.SparkSession.clearDefaultSession()
        }
        ordered.map { case (name, fn) =>
          val spark = buildSession()
          try fn(spark, "/root/testdata/sf0.001").count()
          catch { case _: Throwable => () }
          val sec = timeMin(runs, () =>
            try { fn(spark, sfDir).count(); true } catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
                false
            })
          spark.stop()
          org.apache.spark.sql.SparkSession.clearActiveSession()
          org.apache.spark.sql.SparkSession.clearDefaultSession()
          interQueryHygiene()
          name -> sec
        }.toMap
      } else {
        val spark = buildSession()
        // drift check reuses the battery session (no extra JVM-wide
        // session start/stop just for the gate)
        contractGate(spark, sfDir)
        // environment canary BEFORE the battery: same session, fixed
        // work, so the recorded host-speed sample brackets the run
        canary = canarySec(spark)
        dispatch = dispatchSec(spark)
        // JIT/codegen warmup on the smallest SF so the timed runs below
        // measure steady-state execution, not first-call janino compiles.
        ordered.foreach { case (_, fn) =>
          try fn(spark, "/root/testdata/sf0.001").count()
          catch { case _: Throwable => () }
        }
        val out = ordered.map { case (name, fn) =>
          // a failed query must NOT masquerade as a fast one: record
          // -1 and log, so battery totals/ratios can't silently absorb
          // an error (a swallowed failure here once read as a 0.2 s
          // "result" for a 15 s query)
          val sec = timeMin(runs, () =>
            try { fn(spark, sfDir).count(); true } catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
                false
            })
          name -> sec
        }.toMap
        spark.stop()
        out
      }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // ---- output contract (VERDICT r13 item 1) -----------------------
    // The driver keeps only the LAST ~2000 chars of stdout; a 252-query
    // JSON line is ~10 KB, so every prior round's BENCH_rN.json landed
    // `parsed: null` with a truncated tail. Emit THREE artifacts:
    //  (a) the FULL per-query line, printed first (lands in full logs,
    //      scrolls out of the driver's tail window — by design),
    //  (b) the same full JSON written to bench_archive/ for the
    //      round's regression tooling,
    //  (c) a COMPACT final line (≲1 KB: full-precision total + canary
    //      + the failures and top-20 slowest queries, 3-decimal) that
    //      fits the tail window even after sbt's own success banner.
    val fullQs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfDir","canary":$canary,"dispatch":$dispatch,"runs":$runs}"""
    println(fullLine)
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_FULL_OUT",
      "bench_archive/bench_full_latest.json")
    try {
      val p = java.nio.file.Paths.get(fullOut)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, fullLine + "\n")
    } catch { case e: java.io.IOException =>
      System.err.println(s"[bench] full-line write to $fullOut failed: ${e.getMessage}")
    }
    // end-of-run scratch sweep (VERDICT r13 item 4) — before the final
    // line so a sweep hiccup can never push it out of the tail window
    val swept = graft.util.Fs.sweepTmpArtifacts()
    if (swept > 0) System.err.println(s"[tmp-sweep] removed $swept graft_* scratch roots")
    def r3(v: Double): String =
      if (v < 0) "-1" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val failed = results.filter(_._2 < 0).keys.toSeq.sorted
    val headline = (failed ++ results.toSeq.filter(_._2 >= 0)
        .sortBy(-_._2).take(20).map(_._1)).distinct
    val compactQs = headline.map(k => s"\"$k\":${r3(results(k))}")
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$compactQs,"sf":"$sfDir","canary":$canary,"dispatch":$dispatch,"runs":$runs,"nq":${results.size},"nfail":${failed.size},"full":"$fullOut"}""")
  }
}
