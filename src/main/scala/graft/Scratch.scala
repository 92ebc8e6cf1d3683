package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** Scratch: drive the tolerance join at scale vs the naive range join. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 50000).map(i => (i.toLong % 100, rnd.nextInt(1000000).toLong, i.toLong)).toDF("k", "lt", "lid")
    val right = (1 to 50000).map(i => (i.toLong % 100, rnd.nextInt(1000000).toLong, i.toLong)).toDF("k", "rt", "rid")
    val fast = AsOf.joinWithin(left, right, "k", col("lt"), col("rt"), 1000L)
    val t0 = System.nanoTime()
    val nFast = fast.count()
    val tFast = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nNaive = left.join(right, "k").filter(abs(col("lt") - col("rt")) <= 1000L).count()
    val tNaive = (System.nanoTime() - t1) / 1e9
    println(f"[within] bucketed=$nFast rows in $tFast%.2f s; naive=$nNaive rows in $tNaive%.2f s; equal=${nFast == nNaive}")
    val plan = fast.queryExecution.executedPlan.toString
    println(s"[within] cartesian/BNLJ in bucketed plan: ${plan.contains("Cartesian") || plan.contains("BroadcastNestedLoop")}")
    spark.stop()
  }
}
