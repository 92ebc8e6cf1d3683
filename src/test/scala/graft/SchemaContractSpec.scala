package graft

import org.apache.spark.sql.functions._

/** The drift guard itself must be trustworthy: a clean generated dir
  * reports zero drifts, and each drift class (type outside the
  * accepted set, missing column, unreadable table) yields exactly the
  * named report lines — no silent passes, no false alarms.
  */
class SchemaContractSpec extends SparkSpec {
  import spark.implicits._

  test("clean driver testdata reports zero drifts") {
    assert(graft.util.SchemaContract.check(spark, "/root/testdata/sf0.001") == 0)
  }

  test("type drift, missing column, and unreadable table each count") {
    val dir = java.nio.file.Files.createTempDirectory("contract")
    // region with r_name as LONG (type drift) and nation missing
    // n_regionkey (missing column); everything else absent (unreadable)
    Seq((0L, 1L)).toDF("r_regionkey", "r_name")
      .write.parquet(s"$dir/region.parquet")
    Seq((0L, "x")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    val drifts = graft.util.SchemaContract.check(spark, dir.toString)
    // 1 type drift + 1 missing column + 8 unreadable tables
    assert(drifts == 10, s"expected 10 named drift lines, got $drifts")
  }

  test("events.ts accepts all three historical encodings") {
    val base = Seq((1L, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    val encodings = Seq(
      ("ns_long", base.withColumn("ts", lit(1700000000000000000L))),
      ("ntz", base.withColumn("ts",
        expr("cast(timestamp_micros(1700000000000000) as timestamp_ntz)"))),
      ("ltz", base.withColumn("ts", timestamp_micros(lit(1700000000000000L)))))
    for ((name, df) <- encodings) {
      val dir = java.nio.file.Files.createTempDirectory(s"contract_$name")
      df.write.parquet(s"$dir/events.parquet")
      val drifts = graft.util.SchemaContract.check(spark, dir.toString)
      // 9 other tables unreadable; events itself must NOT drift
      assert(drifts == 9, s"$name: events.ts should be accepted, got $drifts drifts")
    }
  }
}
