package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.expressions.{DotFold, MinhashSig}
import graft.operators.Dedup

/** Property-based parity: the native codegen'd expressions must equal
  * their composed higher-order forms on scalacheck-generated inputs
  * (deterministic seed → reproducible). One Spark job per property:
  * generate the corpus driver-side, compare both columns row-wise.
  */
class PropertyParitySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: MinhashSig ≡ composed fold on generated text") {
    val tokenGen = Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(8)),
      2 -> Gen.oneOf("the", "QUICK", "fox", "über", "naïve", "東京", "✓", "a-b.c"),
      1 -> Gen.const(""))
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val docGen = for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, tokenGen)
      seps <- Gen.listOfN(n, sepGen)
      lead <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString
    val docs = sample(Gen.listOfN(400, docGen), seed = 20260812L)
    val out = docs.toDF("text").select(
      MinhashSig($"text", 3, 16).as("fast"),
      when(size(Dedup.gramHashes($"text", 3)) > 0,
        Dedup.minhashSignature(Dedup.gramHashes($"text", 3), 16)).as("slow"),
      $"text").collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: '${r.getString(2)}'")
      if (!r.isNullAt(0))
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"sig mismatch: '${r.getString(2)}'")
    }
  }

  test("property: chunker windows reconstruct the token stream exactly") {
    val tokenGen = Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty),
      1 -> Gen.oneOf("über", "東京", "a-b.c", "x"))
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n")
    val docGen = for {
      n <- Gen.choose(0, 200)
      toks <- Gen.listOfN(n, tokenGen)
      seps <- Gen.listOfN(n, sepGen)
    } yield toks.zip(seps).map { case (t, s) => t + s }.mkString
    val paramGen = for {
      size <- Gen.choose(1, 12)
      overlap <- Gen.choose(0, size - 1)
    } yield (size, overlap)
    val docs = sample(Gen.listOfN(120, docGen), seed = 4920260812L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val (cSize, cOver) = sample(paramGen.map(List(_)), seed = 77L).head
    val stride = cSize - cOver
    val out = graft.operators.Chunker
      .chunkByTokens(docs.toDF("doc_id", "text"), "text", cSize, cOver)
      .select($"doc_id", $"chunk_no", $"chunk", $"chunk_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val chunks = out.getOrElse(id, Array.empty).sortBy(_._2)
      if (toks.isEmpty) assert(chunks.isEmpty, s"doc $id: empty doc must chunk to nothing")
      else {
        // chunk i covers tokens [i*stride, i*stride + size)
        chunks.foreach { case (_, no, chunk, ntok) =>
          val expect = toks.slice((no * stride).toInt, (no * stride).toInt + cSize)
          assert(chunk == expect.mkString(" "), s"doc $id chunk $no")
          assert(ntok == expect.length && ntok > 0, s"doc $id chunk $no token count")
        }
        // chunk count matches the ceil formula and the windows cover
        // every token (last window reaches the end)
        val expectN = if (toks.size <= cSize) 1
          else ((toks.size - cSize + stride - 1) / stride) + 1
        assert(chunks.length == expectN, s"doc $id: ${chunks.length} != $expectN")
        assert((expectN - 1) * stride + cSize >= toks.size, s"doc $id: coverage gap")
      }
    }
  }

  test("property: DotFold ≡ composed fold on generated vectors incl. extremes") {
    val valGen = Gen.frequency(
      8 -> Gen.chooseNum(-1e6f, 1e6f),
      2 -> Gen.chooseNum(-1e30f, 1e30f),
      1 -> Gen.oneOf(0.0f, -0.0f, Float.MinPositiveValue, Float.MaxValue))
    val pairGen = for {
      n <- Gen.choose(0, 64)
      a <- Gen.listOfN(n, valGen)
      b <- Gen.listOfN(n, valGen)
    } yield (a.toArray, b.toArray)
    val pairs = sample(Gen.listOfN(300, pairGen), seed = 4202608L)
    val out = pairs.toDF("a", "b").select(
      DotFold($"a", $"b").as("fast"),
      graft.functions.dotComposed($"a", $"b").as("slow")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("property: DotFoldLong ≡ composed integer fold within the RP contract range") {
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
    // the caller contract bounds components at dim·1e6 (projected
    // fixed-point vectors) — inside it both forms add raw longs; at
    // overflow they intentionally diverge (ANSI throw vs wrap), which
    // is why the contract is documented on the expression
    val valGen = Gen.chooseNum(-64000000L, 64000000L)
    val pairGen = for {
      n <- Gen.choose(0, 64)
      a <- Gen.listOfN(n, valGen)
      b <- Gen.listOfN(n, valGen)
    } yield (a.toArray, b.toArray)
    val pairs = sample(Gen.listOfN(300, pairGen), seed = 4202612L)
    val out = pairs.toDF("a", "b").select(
      graft.expressions.DotFoldLong($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("slow")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
  }

  test("property: multi-batch maintainComponentsDelta overlay ≡ one-shot CC " +
    "on generated graphs") {
    val edgeGen = for {
      a <- Gen.choose(0L, 60L)
      b <- Gen.choose(0L, 60L)
    } yield (a, b) // self-loops allowed — a node citing itself must label itself
    for (trial <- 0 until 5) {
      val edges = sample(Gen.listOfN(36, edgeGen), seed = 20260816L + trial)
      val nBatches = 1 + trial % 4
      val batches = edges.zipWithIndex.groupBy(_._2 % nBatches)
        .toSeq.sortBy(_._1).map(_._2.map(_._1))
      var lbl = Map.empty[Long, Long]
      batches.foreach { b =>
        val ws = Dedup.maintainComponentsDelta(
          lbl.toSeq.toDF("id", "cluster_id"), b.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // the write set never re-states an unchanged label
        assert(ws.forall { case (id, c) => lbl.get(id) != Some(c) },
          s"trial $trial: write set restated unchanged labels: $ws")
        lbl = lbl ++ ws
      }
      val full = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lbl == full,
        s"trial $trial ($nBatches batches): overlay $lbl vs recompute $full")
    }
  }

  test("property: dailyAnomalies ≡ a driver-side reference z-test on generated series") {
    // random (type, day, count) series with gaps and spikes; the
    // operator's windowed integer arithmetic must match a plain Scala
    // fold over the same observed-day series
    val seriesGen = for {
      nDays <- Gen.choose(1, 20)
      days <- Gen.pick(nDays, 0L to 29L)
      counts <- Gen.listOfN(nDays, Gen.frequency(
        8 -> Gen.choose(1L, 40L), 1 -> Gen.choose(200L, 400L)))
    } yield days.sorted.zip(counts)
    val series = sample(Gen.listOfN(6, seriesGen), seed = 8202613L)
      .zipWithIndex.map { case (s, i) => (s"t$i", s) }
    val DayUs = 86400000000L
    val events = series.flatMap { case (tpe, s) =>
      s.flatMap { case (d, c) => (1L to c).map(i => (tpe, d * DayUs + i)) } }
    val out = graft.operators.EventAnalytics.dailyAnomalies(
        events.toDF("event_type", "us")
          .withColumn("ts", timestamp_micros($"us")),
        "event_type", "ts", lookback = 7, minPrev = 4, sigma = 2)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("n_prev"), r.getAs[Long]("dev_sq"),
          r.getAs[Long]("bound_sq"), r.getAs[Boolean]("is_anomaly")))).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    var checked = 0
    series.foreach { case (tpe, s) =>
      val seq = s.toIndexedSeq
      seq.indices.foreach { i =>
        val (d, x) = seq(i)
        val prev = seq.slice(math.max(0, i - 7), i).map(_._2)
        val n = prev.length.toLong
        val sum = prev.sum; val q = prev.map(c => c * c).sum
        val dev = (n * x - sum) * (n * x - sum) * (n - 1)
        val bound = 4L * n * (n * q - sum * sum)
        val key = (tpe, fmt.format(new java.util.Date(d * 86400000L)))
        assert(out(key) == ((n, dev, bound, n >= 4 && dev > bound)),
          s"$key: operator ${out(key)} vs reference ${(n, dev, bound)}")
        checked += 1
      }
    }
    assert(checked >= 30, s"generator degenerate: only $checked rows")
  }

  test("property: sourceGini ≡ a driver-side rank-sum Gini on generated masses") {
    val massGen = for {
      n <- Gen.choose(1, 15)
      toks <- Gen.listOfN(n, Gen.choose(0L, 500L))
    } yield toks
    sample(Gen.listOfN(8, massGen), seed = 9202613L).zipWithIndex.foreach {
      case (masses, trial) =>
        // one doc per source, text = k space-separated tokens
        val docs = masses.zipWithIndex.map { case (k, i) =>
          (f"s$i%02d", Seq.fill(k.toInt)("w").mkString(" ")) }
        val out = graft.operators.TextAnalysis.sourceGini(
            docs.toDF("source", "text"), "source", "text")
          .collect().map(r => (r.getAs[String]("source"),
            r.getAs[Long]("n_tokens"), r.getAs[Long]("rank"),
            r.getAs[Long]("gini_1e6")))
        val ranked = masses.zipWithIndex
          .map { case (k, i) => (f"s$i%02d", k) }
          .sortBy { case (s, k) => (k, s) }.zipWithIndex
          .map { case ((s, k), i) => (s, k, i + 1L) }
        val n = ranked.length.toLong
        val sTot = ranked.map(_._2).sum
        val srt = ranked.map { case (_, k, r) => r * k }.sum
        val expGini = if (sTot == 0) None
          else Some(Math.floorDiv(2 * srt * 1000000L - (n + 1) * sTot * 1000000L,
            n * sTot))
        expGini match {
          case None => // all-zero corpus: DIV by zero → null gini; rows still rank
            assert(out.length == ranked.length, s"trial $trial: $out")
          case Some(g) =>
            assert(out.toSeq == ranked.map { case (s, k, r) => (s, k, r, g) },
              s"trial $trial: operator ${out.toSeq} vs reference ${ranked.map { case (s, k, r) => (s, k, r, g) }}")
        }
    }
  }
}
