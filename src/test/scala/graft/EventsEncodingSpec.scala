package graft

import org.apache.spark.sql.functions._

/** Regression for the events.ts encoding drift that cost round 7: the
  * driver's events.parquet has shipped `ts` both as TIMESTAMP(NANOS)
  * (arriving as BIGINT ns under spark.sql.legacy.parquet.nanosAsLong)
  * and as TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ). SparkEntry's
  * schema-adaptive readers must serve identical downstream values for
  * every encoding — this spec pins that by running real battery
  * queries (one `t()`-based, one `tRaw()`-based) against the same
  * instants written three ways.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(dir: java.nio.file.Path, enc: String): String = {
    val base = (1L to 60L).map { i =>
      (i, 1700000000000000L + i * 137000000L, i % 7,
        if (i % 3 == 0) "purchase" else "click", i * 1.5, s"""{"k":$i}""")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = enc match {
      case "ns_long" => base.withColumn("ts", col("us") * 1000L)
      case "ts_ntz" =>
        base.withColumn("ts", expr("cast(timestamp_micros(us) as timestamp_ntz)"))
      case "ts_ltz" => base.withColumn("ts", timestamp_micros(col("us")))
    }
    val out = dir.resolve(enc).toString
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  test("events reader serves identical results for ns-long, µs-NTZ, µs-LTZ encodings") {
    val tmp = java.nio.file.Files.createTempDirectory("events-enc")
    val dirs = Seq("ns_long", "ts_ntz", "ts_ltz").map(fixture(tmp, _))
    for (q <- Seq("q29_windowed_events", "q37_sessionize")) {
      val Seq(nsRows, ntzRows, ltzRows) =
        dirs.map(d => SparkEntry.queries(q)(spark, d).collect().map(_.toString).toSeq)
      assert(nsRows.nonEmpty, s"$q: empty result on fixture")
      assert(nsRows == ntzRows, s"$q: ns-long vs µs-NTZ results differ")
      assert(nsRows == ltzRows, s"$q: ns-long vs µs-LTZ results differ")
    }
  }
}
