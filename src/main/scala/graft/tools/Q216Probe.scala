package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the q216 bipartite-CC formulations: times the
  * bucket-CC pipeline at a given SF dir (cheap md5 fingerprints, same
  * banding shape as the battery row).
  */
object Q216Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.Bench.buildSession()
    import graft.operators.Dedup
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (bits, bands) = Dedup.suggestSimhashParams(docs.count(), bands = 4)
    val fp = docs.select(col("doc_id"),
      graft.functions.md5Long(col("text")).as("ahash"))
    val banded = timed("bands")(
      Dedup.fingerprintBands(fp, "doc_id", "ahash", 4, 16, bits / bands)
        .localCheckpoint(true))
    val cc = timed("bucketCC")(
      Dedup.bucketConnectedComponents(banded).localCheckpoint(true))
    timed("hist")(
      Dedup.clusterSizeHistogram(cc).orderBy(col("cluster_size"))
        .collect().foreach(println))
    spark.stop()
  }
}
