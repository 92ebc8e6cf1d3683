package graft.tools

import org.apache.spark.sql.functions._

/** r16 optimization probe: phase walls + job census for the takedown
  * lake gates (q263/q280/q281) — the three most expensive battery rows
  * at round start (16.9 / 8.5 / 7.7 s min-of-3). Prints one PROF line
  * per phase so the wall can be attributed to LSH pairing, the
  * cluster-maintenance ingest, each takedown, and (for q281) each
  * maintained structure.
  */
object TakedownProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def timed[A](name: String)(body: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROF $name%-28s sec=$sec%7.3f jobs=${jobs.get() - j0}%3d")
      r
    }
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

    // warmup at sf0.001 (codegen)
    graft.SparkEntry.queries("q263_takedown_gate")(spark, "/root/testdata/sf0.001").count()

    println("=== q263 phases (sf0.1) ===")
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_prof_td_" + ProcessHandle.current().pid()).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val labels = new graft.operators.VersionedTable(spark, root + "/labels",
      "id", "batch_no", numBuckets = 8)
    val edges = new graft.operators.VersionedTable(spark, root + "/edges",
      "edge_key", "batch_no", numBuckets = 8)
    val docs = t("documents")
    val pairs = timed("lsh_pairs+checkpoint") {
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text").localCheckpoint(true)
    }
    timed("maintainClustersWithEdges") {
      graft.operators.IncrementalDedup.maintainClustersWithEdges(labels, edges, pairs, 1L)
    }
    val deleted = timed("deleted+checkpoint") {
      docs.filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))
        .localCheckpoint(true)
    }
    timed("takedown_1") {
      graft.operators.IncrementalDedup.takedown(labels, edges, deleted, 2L)
    }
    timed("takedown_2_redeliver") {
      graft.operators.IncrementalDedup.takedown(labels, edges, deleted, 3L)
    }
    timed("final_read") {
      labels.snapshotOpt.get.select(col("id"), col("cluster_id"), col("batch_no"))
        .orderBy(col("id")).count()
    }

    println("=== q281 phases (sf0.1) ===")
    val root2 = root + "2"
    def vt(sub: String, key: String, pre: String, part: Option[String] = None) =
      new graft.operators.VersionedTable(spark, s"$root2/$sub", key, pre,
        numBuckets = 8, partitionColOpt = part)
    val deletedDocs = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id")).localCheckpoint(true)
    val labels2 = vt("labels", "id", "batch_no")
    val edges2 = vt("edges", "edge_key", "batch_no", Some("cluster_id"))
    val pairs2 = timed("q281_lsh_pairs") {
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text").localCheckpoint(true)
    }
    timed("q281_maintainClusters") {
      graft.operators.IncrementalDedup.maintainClustersWithEdges(labels2, edges2, pairs2, 1L)
    }
    timed("q281_takedown") {
      graft.operators.IncrementalDedup.takedown(labels2, edges2, deletedDocs, 2L)
    }
    val cvt = vt("corpus", "doc_id", "ver")
    val c1 = timed("q281_corpus_upsert") {
      cvt.upsert(docs.select(col("doc_id"), col("text"), col("lang"),
        col("n_chars"), lit(1L).as("ver")))
    }
    val postings1 = timed("q281_postings_full") {
      graft.operators.TextSearch.postingRows(cvt.snapshot, "doc_id", "text")
        .localCheckpoint(true)
    }
    val aggs = Seq("n_docs" -> count(lit(1)), "sum_chars" -> sum(col("n_chars")))
    val rollup1 = timed("q281_rollup_full") {
      graft.operators.RollupMaintenance.fullRollup(cvt, "lang", aggs).localCheckpoint(true)
    }
    timed("q281_corpus_delete") {
      cvt.delete(deletedDocs.select(col("id").as("doc_id")))
    }
    val head = cvt.commits.head
    val postings = timed("q281_maintainPostings") {
      graft.operators.TextSearch.maintainPostings(cvt, c1, head, postings1, "text")
    }
    val rollup = timed("q281_maintainRollup") {
      graft.operators.RollupMaintenance.maintainRollupCdc(cvt, c1, head, rollup1, "lang", aggs)
    }
    val svt = vt("sample", "id", "batch_no")
    timed("q281_sample_maintain") {
      graft.operators.IncrementalDedup.maintainSampleBuffered(svt, docs,
        col("doc_id"), col("n_chars"), k = 48, m = 16, batchNo = 1L)
    }
    timed("q281_sample_takedown") {
      graft.operators.IncrementalDedup.takedownSampleBuffered(svt,
        deletedDocs, k = 48, m = 16, batchNo = 2L, corpus = () => docs,
        key = col("doc_id"), weight = col("n_chars"))
    }
    val evt = vt("emb", "id", "ver")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val e1 = timed("q281_emb_upsert") {
      evt.upsert(emb.withColumn("ver", lit(1L)))
    }
    val frozen = evt.snapshot.select(col("id"), col("emb"))
    val coarse = timed("q281_trainCentroids") {
      graft.operators.Similarity.trainCentroids(frozen, k = 8, iters = 2)
    }
    val books = timed("q281_trainPqCodebooks") {
      graft.operators.Similarity.trainPqCodebooks(frozen, m = 2, k = 4, iters = 2)
    }
    val ivt = vt("pqidx", "id", "ver")
    timed("q281_pqidx_upsert") {
      ivt.upsert(graft.operators.Similarity.encodeIvfPq(frozen, coarse, books)
        .join(evt.snapshot.select(col("id"), col("ver")), Seq("id")))
    }
    timed("q281_emb_delete") {
      evt.delete(emb.filter(col("id") % 5 === 0).select(col("id")))
    }
    timed("q281_maintainPqIndex") {
      graft.operators.Similarity.maintainPqIndex(ivt, evt, e1, coarse, books)
    }
    timed("q281_final_union_read") {
      val sLab = labels2.snapshot.select(lit("labels").as("structure"),
        col("id").cast("string").as("k"), col("cluster_id").as("v"))
      sLab.count()
    }
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root2))
    println(s"PROF total_jobs=${jobs.get()}")
    spark.stop()
  }
}
