package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator the reference lacks but a
  * versioned/temporal lake needs constantly ("state of X when Y
  * happened").
  *
  * Implemented by composition (preference (a) from the build rules):
  * tag both sides, union, then `last_value(..., ignoreNulls) over
  * (partition by key order by ts, side rows unbounded preceding)`.
  * This is the scalable formulation — ONE shuffle on the key, no range
  * self-join, no per-row subquery, and it survives arbitrarily skewed
  * time distributions because state per key is a single running value.
  * A custom SparkPlan could only remove the final filter.
  */
object AsOf {

  /** For each left row, attach the newest `valueCol` from `right`
    * whose ts <= the left ts (per key). Right rows sort before left
    * rows on ts ties, so "at or before" includes same-instant rights.
    */
  def joinPrior(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, outCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1)).withColumn("_val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(key), col(ts), col(valueCol).as("_val"))
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol, last(col("_val"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_val")
  }

  /** Range-bucketed variant for joins with a tolerance window: bucket
    * both sides by floor(ts / step) and equi-join the bucket (+1
    * neighbor), turning a range join into two hash joins. Use when the
    * right side is too wide to carry as running state (multi-column
    * payloads) — same single-shuffle scaling story.
    */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: Column, rightTs: Column, toleranceMs: Long): DataFrame = {
    val lb = left.withColumn("_b", floor(leftTs.cast("long") * 1000 / toleranceMs))
    val rb = right.withColumn("_b", floor(rightTs.cast("long") * 1000 / toleranceMs))
    val shifted = rb.withColumn("_b", col("_b") + 1)
    lb.join(rb.unionByName(shifted).distinct(), Seq(key, "_b"))
      .drop("_b")
  }
}
