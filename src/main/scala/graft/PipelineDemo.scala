package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Runnable demo of the four-stage clinical pipeline over a source
  * tree: `runMain graft.PipelineDemo <sourceBase> <lakeRoot>`.
  * Prints the status rollup and lineage of every batch.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(sourceBase, lakeRoot) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val p = new Pipeline(spark, lakeRoot)
    val ingested = p.ingest(sourceBase)
    println(s"[demo] ingested ${ingested.size} batches")
    val validated = p.validatePending()
    println(s"[demo] validated: ${validated.count(_._2)} ok, ${validated.count(!_._2)} quarantined")
    val scrubbed = p.scrubPending()
    println(s"[demo] scrubbed ${scrubbed.size} batches")
    val transformed = p.transformPending()
    println(s"[demo] transformed ${transformed.size} batches")

    println("[demo] status rollup:")
    p.provenance.statusRollup.collect().foreach(r => println(s"[demo]   $r"))
    println("[demo] canonical sample:")
    transformed.headOption.foreach { case (_, path) =>
      spark.read.parquet(path).show(5, truncate = false)
    }
    println("[demo] lake tree:")
    val tree = Files.walk(Paths.get(lakeRoot))
    try tree.iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString.stripPrefix(lakeRoot))
      .toSeq.sorted.take(40).foreach(f => println(s"[demo]   $f"))
    finally tree.close()
    spark.stop()
  }
}
