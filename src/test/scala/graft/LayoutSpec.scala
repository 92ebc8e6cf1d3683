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

  test("salted join equals plain join results") {
    val big = (1L to 500L).map(i => (if (i % 2 == 0) "hot" else s"k$i", i)).toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("key", "tag")
    val plain = big.join(small, "key").select("key", "v", "tag")
    val salted = Layout.saltedJoin(big, small, "key", salt = 4).select("key", "v", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
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
