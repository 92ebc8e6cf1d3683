package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for shuffle avoidance at scale: bucketed
  * co-located joins and salted skew joins.
  */
object Layout {

  /** Persist a frame bucketed by `key` so future equi-joins on `key`
    * between tables bucketed the same way need NO shuffle (bucket
    * pruning + co-located join). This is the lake-side answer to "the
    * same big join runs every day": pay the shuffle once at write time.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both Exchanges (verify with .explain: no "Exchange hashpartitioning"
    * under the SortMergeJoin).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Salted join for skewed keys: explode the small side `salt` ways,
    * scatter the big side's hot keys uniformly with a random-ish salt
    * derived from a stable row hash (deterministic — no rand(), so
    * retries/speculative tasks agree), then join on (key, salt).
    *
    * Use when one key holds a disproportionate share of rows and AQE's
    * skew handling isn't enough (e.g. a null-heavy or "unknown" key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salt)))
    val smallSalted = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    bigSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }
}
