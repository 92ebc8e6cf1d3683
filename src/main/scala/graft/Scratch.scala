package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Layout

/** Scratch: observe the bucketed-join plan and salted-join behavior. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("wh").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val l = (1L to 100000L).map(i => (i % 1000, i)).toDF("k", "lv")
    val r = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "rv")
    Layout.writeBucketed(l, "big_l", "k", 16)
    Layout.writeBucketed(r, "big_r", "k", 16)
    val j = Layout.colocatedJoin(spark, "big_l", "big_r", "k")
    println(s"[layout] colocated join rows: ${j.count()}")
    val plan = j.queryExecution.executedPlan.toString
    println(s"[layout] shuffle exchanges in plan: ${"Exchange hashpartitioning".r.findAllIn(plan).length}")
    println(s"[layout] SortMergeJoin present: ${plan.contains("SortMergeJoin")}")
    val skewBig = (1L to 50000L).map(i => (if (i % 10 != 0) "hot" else s"k$i", i)).toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k10", "T")).toDF("key", "tag")
    val salted = Layout.saltedJoin(skewBig, dim, "key", salt = 8)
    val plain = skewBig.join(dim, "key")
    println(s"[layout] salted=${salted.count()} plain=${plain.count()} (must match)")
    spark.stop()
  }
}
