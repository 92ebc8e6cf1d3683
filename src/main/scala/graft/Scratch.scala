package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q01_pricing_summary", "q02_status_topk", "q04_scrub_documents",
      "q07_window_latest", "q08_join_revenue", "q18_minhash_lsh_pairs",
      "q21_ann_brute_force", "q31_semi_anti", "q32_asof_prev_click")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      import org.apache.spark.sql.execution.ExplainMode
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length +
        "Exchange rangepartitioning".r.findAllIn(plan).length
      val bcast = "BroadcastExchange".r.findAllIn(plan).length
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val bnlj = "BroadcastNestedLoop".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      val pushed = plan.linesIterator.filter(l => l.contains("PushedFilters") && !l.contains("PushedFilters: []"))
        .map(_.trim.take(130)).toSeq
      val topk = if (plan.contains("TakeOrderedAndProject")) "topk" else ""
      println(s"=== $name: shuffles=$shuffles bcast=$bcast bhj=$bhj bnlj=$bnlj smj=$smj wsc=$wsc $topk")
      pushed.take(3).foreach(p => println(s"    $p"))
    }
    spark.stop()
  }
}
