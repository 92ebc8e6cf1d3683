package graft.tools

import org.apache.spark.sql.functions._

/** One-off q167 adjudication profile (r15): stage walls + the IVF
  * probe-candidate mass that drives the refine cost (cell balance is
  * a property of the DATA generation, not the code — the r13 archive
  * predates the 07:31 testdata regeneration).
  */
object Q167Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.operators.Similarity
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    def timed(name: String)(body: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        body
        println(f"PROF $name run$i sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    timed("trainCentroids")(Similarity.trainCentroids(corpus, k = 8, iters = 2))
    val coarse = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    timed("trainPqCodebooks")(Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2))
    val books = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    timed("ivfPqRefineTopK")(Similarity.ivfPqRefineTopK(corpus,
      corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
      coarse, books, k = 3, kShort = 10, nprobe = 2).count())
    // job census: how many Spark jobs does one full q167 evaluation
    // dispatch (dispatch-latency sensitivity the canary cannot see)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val c2 = Similarity.trainCentroids(corpus, k = 8, iters = 2)
    val b2 = Similarity.trainPqCodebooks(corpus, m = 2, k = 4, iters = 2)
    Similarity.ivfPqRefineTopK(corpus,
      corpus.filter(col("id") % 200 === 0 && col("id") < 2000),
      c2, b2, k = 3, kShort = 10, nprobe = 2).count()
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(l)
    println(s"PROF q167_jobs n=${jobs.get()}")
    // IVF cell census: how unbalanced are the 8 coarse cells on this
    // data generation (a hot cell multiplies every probing query's
    // candidate mass)
    val assigned = Similarity.assignCells(corpus, coarse)
    assigned.groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).collect()
      .foreach(r => println(s"PROF cell=${r.get(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
