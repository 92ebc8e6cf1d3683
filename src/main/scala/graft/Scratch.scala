package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Control

/** Scratch: drive the control-plan scheduler end-to-end. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lake = java.nio.file.Files.createTempDirectory("ctl-lake").toString
    val p = new Pipeline(spark, lake)
    val ctl = new Control(spark, lake)
    ctl.schedule("nightly", Seq("INGEST", "VALIDATE", "SCRUB_PHI", "TRANSFORM"))
    println(s"[ctl] pending before: ${ctl.pendingSteps("nightly")}")
    val done = ctl.run("nightly", p, "/tmp/demo_src")
    println(s"[ctl] executed: $done")
    println(s"[ctl] pending after: ${ctl.pendingSteps("nightly")}")
    println("[ctl] rollup:")
    p.provenance.statusRollup.collect().foreach(r => println(s"[ctl]   $r"))
    println("[ctl] audit tail:")
    p.provenance.auditTail(3).collect().foreach(r => println(s"[ctl]   $r"))
    spark.stop()
  }
}
