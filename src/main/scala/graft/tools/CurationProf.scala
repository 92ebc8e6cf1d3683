package graft.tools

import org.apache.spark.sql.functions._

/** r16 optimization probe #3: phase walls for q118_curation_v3 (6.1 s
  * at round start — #4 battery row) and its shared stages.
  */
object CurationProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def timed[A](name: String)(body: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      println(f"PROF $name%-28s sec=${(System.nanoTime() - t0) / 1e9}%7.3f jobs=${jobs.get() - j0}%3d")
      r
    }
    import graft.operators._
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    // warmup
    graft.SparkEntry.queries("q118_curation_v3")(spark, "/root/testdata/sf0.001").count()

    val docs = t("documents")
    val bench = docs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000)
    println("=== q118 curateV3 phases (sf0.1) ===")
    val keepExact = timed("exact_dedup_plan")(Dedup.exact(docs, col("doc_id"), col("text")).select(col("keep_id")))
    val kept = timed("kept_checkpoint") {
      docs.join(keepExact, docs("doc_id") === keepExact("keep_id"), "left_semi")
        .localCheckpoint(true)
    }
    val pairs = timed("lsh_pairs_plan")(Dedup.minhashLshPairs(kept, "doc_id", "text"))
    val clusters = timed("connected_components")(Dedup.connectedComponents(pairs))
    val gated = timed("gates_checkpoint") {
      kept.select(col("doc_id"), col("text"),
        TextAnalysis.curationGates(col("text")).as("_g")).localCheckpoint(true)
    }
    val best = timed("keep_best_plan") {
      Dedup.keepBestOfCluster(
        gated.select(col("doc_id").as("id"), col("_g.quality_1e6").as("score")), clusters)
        .filter(col("kept") === 1L).select(col("id"))
    }
    val survivors = gated
      .join(best, gated("doc_id") === best("id"), "left_semi")
      .filter(col("_g.quality_1e6") >= 600000L &&
        col("_g.predicted_lang") === "en" &&
        floor(TextAnalysis.repetitionRatio(col("text"), 3) * lit(1000000.0))
          .cast("long") < 500000L)
    val flagged = timed("decontaminate_plan") {
      Decontaminate.sharedNgrams(survivors, "doc_id", "text", bench, "text", 3, 1L)
        .select(col("doc_id").as("_contaminated_id"))
    }
    val clean = survivors
      .join(flagged, col("doc_id") === col("_contaminated_id"), "left_anti")
      .select(col("doc_id"), col("_g.quality_1e6").as("quality_1e6"),
        col("_g.predicted_lang").as("predicted_lang"),
        graft.functions.tokenCount(col("text")).as("ntok"))
    val cut = timed("token_budget_plan") {
      Sampling.tokenBudgetSelect(clean, col("doc_id"), col("quality_1e6"),
        col("ntok"), 2L, 5L).filter(col("selected") === 1L).select(col("id"))
    }
    timed("final_count") {
      clean.join(cut, clean("doc_id") === cut("id"), "left_semi").count()
    }
    println("=== full query 3 runs ===")
    for (i <- 1 to 3) timed(s"q118_full_$i") {
      graft.SparkEntry.queries("q118_curation_v3")(spark, dir).count()
    }
    for (i <- 1 to 3) timed(s"q127_full_$i") {
      graft.SparkEntry.queries("q127_gate_attrition")(spark, dir).count()
    }
    for (i <- 1 to 3) timed(s"q57_full_$i") {
      graft.SparkEntry.queries("q57_curation_v2")(spark, dir).count()
    }
    spark.stop()
  }
}
