package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._

/** r16 optimization probe #2: per-job census of ONE takedown —
  * callsite + wall per Spark job, so the 75-job count can be
  * attributed line by line.
  */
object TakedownJobs {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val cs = js.stageInfos.map(si => si.name.take(50)).mkString(" | ")
        starts.put(js.jobId, (System.nanoTime(), cs)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, cs) =>
          lines.add(f"JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f  $cs%-120s")
        }; ()
      }
    })
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    // warmup
    graft.SparkEntry.queries("q263_takedown_gate")(spark, "/root/testdata/sf0.001").count()
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_profjobs_" + ProcessHandle.current().pid()).toString
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    val labels = new graft.operators.VersionedTable(spark, root + "/labels",
      "id", "batch_no", numBuckets = 8)
    val edges = new graft.operators.VersionedTable(spark, root + "/edges",
      "edge_key", "batch_no", numBuckets = 8)
    val docs = t("documents")
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text")
      .localCheckpoint(true)
    graft.operators.IncrementalDedup.maintainClustersWithEdges(labels, edges, pairs, 1L)
    val deleted = docs.filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))
      .localCheckpoint(true)
    Thread.sleep(500)
    lines.clear()
    println("=== takedown_1 jobs ===")
    val t0 = System.nanoTime()
    graft.operators.IncrementalDedup.takedown(labels, edges, deleted, 2L)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    lines.forEach(l => println(l))
    println(f"TAKEDOWN wall=$wall%.3f njobs=${lines.size}")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
