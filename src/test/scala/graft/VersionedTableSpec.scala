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

  test("precombine tie: incoming update wins (Hudi latest-write-wins)") {
    val root = Fixtures.tmpDir("vt").toString
    val vt = new VersionedTable(spark, root, "k", "v")
    vt.upsert(Seq(("a", "1", "old")).toDF("k", "v", "payload"))
    vt.upsert(Seq(("a", "1", "new")).toDF("k", "v", "payload"))
    assert(vt.snapshot.collect()(0).getAs[String]("payload") == "new")
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
}
