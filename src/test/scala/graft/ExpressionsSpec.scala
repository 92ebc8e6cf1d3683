package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expressions.{DotFold, Md5Long60, MinhashSig}
import graft.operators.Dedup

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("Md5Long60 equals the conv(substr(md5)) formula on varied inputs") {
    val inputs = Seq("", "a", "abc", "the quick brown fox", "ünïcödé ✓",
      "0" * 1000, "line\nbreak\ttab")
    val df = inputs.toDF("s")
    val out = df.select(
      Md5Long60($"s").as("fast"),
      conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("slow")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("Md5Long60 is null-intolerant and non-negative") {
    val out = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(Md5Long60($"s")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getLong(0) >= 0L && out(1).getLong(0) < (1L << 60))
  }

  test("native expressions are SQL-callable once registered") {
    // register explicitly (order-independent; getOrCreate in a shared
    // JVM returns the suite session, so withExtensions can't be
    // exercised here). register() and GraftExtensions share the SAME
    // companion `builder` lambdas, so this covers both paths.
    Md5Long60.register(spark)
    MinhashSig.register(spark)
    graft.expressions.DotFold.register(spark)
    val v = spark.sql("SELECT md5_long60('abc')").collect()(0).getLong(0)
    val expected = spark.sql(
      "SELECT cast(conv(substring(md5('abc'), 1, 15), 16, 10) as long)").collect()(0).getLong(0)
    assert(v == expected)
    val sig = spark.sql("SELECT minhash_sig('one two three four', 3, 16)")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 16)
    val d = spark.sql("SELECT dot_fold(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
  }

  test("MinhashSig equals the composed gramHashes∘minhashSignature form") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "  Mixed   CASE   And\tTabs newline\ncontent here ",
      "ünïcödé tökens ✓ mixed with ascii words too",
      "one two three", // exactly n tokens → single gram
      "too short",     // under n tokens → null signature
      "",              // no tokens → null
      "x " * 500)      // long repetitive doc
    val df = docs.toDF("text")
    val out = df.select(
      MinhashSig($"text", 3, 16).as("fast"),
      when(size(Dedup.gramHashes($"text", 3)) > 0,
        Dedup.minhashSignature(Dedup.gramHashes($"text", 3), 16)).as("slow")).collect()
    out.zip(docs).foreach { case (r, d) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch for '$d'")
      if (!r.isNullAt(0))
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"signature mismatch for '$d'")
    }
    assert(out(5).isNullAt(0) && out(6).isNullAt(0))
  }

  test("SimhashText equals the composed bit-vote fold") {
    import graft.expressions.SimhashText
    val docs = Seq("the quick brown fox", "the quick brown cat",
      "  spaced\tout\ncontent ", "ünïcödé ✓", "", "single")
    val df = docs.toDF("text") // includes empty → fingerprint 0
    Seq(16, 32, 60).foreach { bits =>
      val out = df.select(
        SimhashText($"text", bits).as("fast"),
        Dedup.simhashComposed($"text", bits).as("slow"), $"text").collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"bits=$bits text='${r.getString(2)}'"))
    }
    val nullRow = Seq[Option[String]](None).toDF("text")
      .select(SimhashText($"text", 16)).collect()(0)
    assert(nullRow.getLong(0) == 0L, "null text fingerprints to 0 like the composed form")
  }

  test("DotFold equals the composed zip_with/aggregate fold bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val pairs: Seq[(Array[Float], Array[Float])] =
      (1 to 50).map { _ =>
        val n = 1 + rnd.nextInt(64)
        (Array.fill(n)(rnd.nextFloat() * 2 - 1), Array.fill(n)(rnd.nextFloat() * 2 - 1))
      } :+ ((Array.empty[Float], Array.empty[Float])) :+
        ((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f))) // length mismatch → null
    val df = pairs.toDF("a", "b")
    val out = df.select(
      DotFold($"a", $"b").as("fast"),
      graft.functions.dotComposed($"a", $"b").as("slow")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
    assert(out.last.isNullAt(0), "mismatched lengths must fold to null")
  }

  test("DotFoldLong equals the composed integer zip_with/aggregate fold") {
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
    val rnd = new scala.util.Random(11)
    val pairs: Seq[(Array[Long], Array[Long])] =
      (1 to 50).map { _ =>
        val n = 1 + rnd.nextInt(32)
        (Array.fill(n)(rnd.nextLong() % 1000000L),
          Array.fill(n)(rnd.nextLong() % 1000000L))
      } :+ ((Array.empty[Long], Array.empty[Long])) :+
        ((Array(1L, 2L, 3L), Array(4L, 5L))) // length mismatch → null
    val df = pairs.toDF("a", "b")
    val out = df.select(
      graft.expressions.DotFoldLong($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("slow")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
    assert(out.last.isNullAt(0), "mismatched lengths must fold to null")
  }

  test("BloomTestLong equals the composed element_at/shift probe chain " +
    "on fuzzed keys and words; null key stays null") {
    import graft.operators.Sketches
    val rnd = new scala.util.Random(13)
    // a real filter over fuzzed dim keys, probed by hits and misses
    val dimKeys = (1 to 200).map(_ => rnd.nextLong().abs % 1000000L).distinct
    val dim = dimKeys.toDF("k")
    val m = Sketches.suggestBloomBits(dimKeys.size.toLong, 5)
    val words = Sketches.bloomWords(dim, col("k"), m, 5)
    val probes = (dimKeys.take(50) ++
      (1 to 200).map(_ => 1000000L + rnd.nextLong().abs % 1000000L))
      .map(Option(_)) :+ (None: Option[Long])
    val df = probes.toDF("fk")
    val out = df.select(
      Sketches.bloomTest(col("fk"), words, m, 5).as("fast"),
      Sketches.bloomTestComposed(col("fk"), words, m, 5).as("slow")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getBoolean(0) == r.getBoolean(1), r.toString)
    }
    assert(out.last.isNullAt(0), "null key must probe to null")
    // every true member passes through the native path
    val kept = df.na.drop().filter(Sketches.bloomTest(col("fk"), words, m, 5))
      .collect().map(_.getLong(0)).toSet
    assert(dimKeys.take(50).toSet.subsetOf(kept))
  }

  test("RewriteDotFold optimizer rule turns composed dots into DotFold") {
    import graft.expressions.{DotFold => DotFoldExpr}
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.plans.RewriteDotFold
    try {
      val rnd = new scala.util.Random(11)
      // parquet-backed (a LocalRelation would be constant-folded before
      // user-provided optimizer rules run)
      val dir = Fixtures.tmpDir("dotfold").toString
      (1 to 20).map { _ =>
        (Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat()))
      }.toDF("a", "b").write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
      val composed = df.select(graft.functions.dotComposed($"a", $"b").as("d"))
      val rewritten = composed.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.expressions.DotFold]))
      assert(rewritten, "optimized plan must contain DotFold:\n" +
        composed.queryExecution.optimizedPlan.treeString)
      val a = composed.collect().map(_.getDouble(0))
      val b = df.select(DotFoldExpr($"a", $"b")).collect().map(_.getDouble(0))
      assert(a.zip(b).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y) })
    } finally spark.experimental.extraOptimizations = prev
  }

  test("Md5Long60 codegen path works inside whole-stage codegen") {
    // outside HOF lambdas the expression must compile via doGenCode
    val n = spark.range(1000)
      .select(Md5Long60(concat(lit("k"), $"id".cast("string"))).as("h"))
      .filter($"h" % 2 === 0).count()
    assert(n > 400 && n < 600) // roughly half, sanity of distribution
  }

  test("TopKPairs equals the window top-k across many partitions; bounded partial state") {
    import graft.expressions.TopKPairs
    import org.apache.spark.sql.expressions.Window
    // 64 partitions force partial buffers + serialize/merge; planted
    // ties (same v, different id) pin the (v desc, id asc) order
    val df = spark.range(0, 20000).repartition(64)
      .selectExpr("id % 37 AS grp", "(id * 7919) % 1000 AS v", "id")
    val agg = df.groupBy($"grp")
      .agg(TopKPairs($"v", $"id", 5).as("top"))
      .select($"grp", posexplode($"top"))
      .select($"grp", ($"pos" + 1).as("rank"), $"col.v".as("v"), $"col.id".as("id"))
    val w = Window.partitionBy($"grp").orderBy($"v".desc, $"id")
    val win = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5).select($"grp", $"rank", $"v", $"id")
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "aggregate top-k must equal the window formulation")
    // groups smaller than k return all their rows, still sorted
    val tiny = Seq((1L, 10L, 100L), (1L, 10L, 99L)).toDF("grp", "v", "id")
      .groupBy($"grp").agg(TopKPairs($"v", $"id", 5).as("top"))
      .select(posexplode($"top")).select($"col.id").as[Long].collect().toSeq
    assert(tiny == Seq(99L, 100L), s"tie breaks id-asc: $tiny")
    // partial (map-side) aggregation is in the plan — the whole point
    val plan = df.groupBy($"grp").agg(TopKPairs($"v", $"id", 5)).queryExecution
      .executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_graft_topk"),
      s"expected map-side partial topk:\n$plan")
    // SQL registration path
    TopKPairs.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_topk(CAST(10 AS BIGINT), CAST(1 AS BIGINT), 3)").collect()
    assert(viaSql.length == 1)
  }
}
