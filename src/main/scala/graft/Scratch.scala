package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Dedup

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }

    time("warmup count")(docs.count())
    val ts = tokens(lower(col("text")))
    time("tokens sum")(docs.select(sum(size(ts))).collect()(0).getLong(0))
    time("tokens sum again")(docs.select(sum(size(ts))).collect()(0).getLong(0))
    val grams = transform(sequence(lit(0), size(ts) - 3), i => array_join(slice(ts, i + 1, lit(3)), " "))
    time("grams no-let")(docs.select(sum(size(grams))).collect()(0).getLong(0))
    val gramsLet = let(ts, t => transform(sequence(lit(0), size(t) - 3), i => array_join(slice(t, i + 1, lit(3)), " ")))
    time("grams let")(docs.select(sum(size(gramsLet))).collect()(0).getLong(0))
    time("grams let again")(docs.select(sum(size(gramsLet))).collect()(0).getLong(0))
    time("shingles full")(docs.select(sum(size(shingles(col("text"), 3)))).collect()(0).getLong(0))
    val sortdist = let(gramsLet, g => array_sort(array_distinct(g)))
    time("shingles via let-sortdist")(docs.select(sum(size(sortdist))).collect()(0).getLong(0))
    time("md5 x16 over tokens")(docs.select(sum(size(
      transform(ts, t => md5Long(t))))).collect()(0).getLong(0))
    spark.stop()
  }
}
