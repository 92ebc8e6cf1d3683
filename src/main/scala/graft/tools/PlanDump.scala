package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev driver: dump the formatted physical plan of battery queries —
  * the `.explain("formatted")` loop the plan-pin tests are iterated
  * against. Usage:
  *   sbt "runMain graft.tools.PlanDump <sfDir> <query> [query...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession()
    // EXEC=1: run the query first and dump the FINAL adaptive plan
    // (AQE exchange reuse and runtime join demotions only show there)
    val exec = sys.env.get("PLANDUMP_EXEC").contains("1")
    for (q <- args.tail) {
      val df = graft.SparkEntry.queries(q)(spark, args.head)
      // collect(), not count(): count() plans a DIFFERENT query, so
      // this df's own AdaptiveSparkPlan would never finalize
      if (exec) df.collect()
      println(s"===== $q =====\n" +
        df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      if (exec)
        println(s"===== $q executedPlan =====\n" +
          df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
