package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for fast
    // local iteration (the driver always runs the full battery)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // older testdata generations carried events.ts as
      // TIMESTAMP(NANOS), which Spark only reads as long under this
      // flag; SparkEntry's schema-adaptive reader handles both that
      // ns-long encoding and the current TIMESTAMP(MICROS) one.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // input drift yields one named line per drifted column up front,
    // not N opaque per-query failures (the round-7 lesson);
    // SPARK_GRAFT_STRICT=1 aborts on any drift
    Bench.contractGate(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same between-query hygiene as the bench battery (BASELINE.md's
      // probe-hygiene finding) so large-SF verify runs don't go bimodal
      Bench.interQueryHygiene()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // end-of-run scratch sweep (VERDICT r13 item 4): the ~20 battery
    // queries that stage VersionedTable roots under java.io.tmpdir
    // delete-before, never after — collect them here (and anything a
    // previously killed JVM stranded)
    val swept = graft.util.Fs.sweepTmpArtifacts()
    if (swept > 0)
      System.err.println(s"[tmp-sweep] removed $swept graft_* scratch roots")
  }
}
