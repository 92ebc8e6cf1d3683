package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Stage-level timing for q83 (residual IVF-PQ) — which phase owns the
  * battery cost: coarse training, residual codebook training, or the
  * search (index encode + LUT join + rank)?
  */
object Q83Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    corpus.count()
    val coarse = timed("coarse_train") {
      Similarity.trainCentroids(corpus, k = 8, iters = 2)
    }
    val books = timed("residual_books") {
      Similarity.trainResidualCodebooks(corpus, coarse, m = 2, k = 4, iters = 2)
    }
    val q = corpus.filter(col("id") % 200 === 0 && col("id") < 2000)
    timed("search") {
      Similarity.ivfPqResidualTopK(corpus, q, coarse, books, k = 3, nprobe = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_1e6"))
        .orderBy(col("query_id"), col("rank")).count()
    }
    // second search on a warm JVM separates codegen/analysis cost from
    // execution cost
    timed("search_warm") {
      Similarity.ivfPqResidualTopK(corpus, q, coarse, books, k = 3, nprobe = 2)
        .count()
    }
    spark.stop()
  }
}
