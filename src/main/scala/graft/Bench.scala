package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** The bench session config, shared with graft.tools.ScaleProbe so
    * probe timings are comparable with BENCH numbers.
    */
  def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // respect the advisory partition size when AQE coalesces instead
      // of maximizing parallelism — fewer tiny post-shuffle tasks
      // (the setting Spark's AQE docs recommend)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = buildSession()
    // JIT/codegen warmup on the smallest SF so the timed runs below
    // measure steady-state execution, not first-call janino compiles.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // release dropped localCheckpoint blocks between queries (the
      // ContextCleaner only reclaims them after a driver GC notices the
      // dead RDD references; without the nudge the block store fills
      // across the battery and later queries pay the GC pressure) —
      // outside the timed section, so it's hygiene, not overhead
      System.gc()
      name -> sec
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
