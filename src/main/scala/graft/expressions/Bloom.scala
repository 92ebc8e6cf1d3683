package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.functions.{call_function, lit, xxhash64}

/** Column access to Spark's runtime-filter bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the codegen'd
  * expressions Catalyst itself injects for runtime row-group pruning),
  * registered through the same functionRegistry + call_function path as
  * the graft native expressions.
  *
  * Spark only wires these up automatically between the two sides of an
  * equi-join it can see; exposing them as columns lets an operator
  * build a bloom over any bounded key set in ONE distributed aggregate
  * (partial filters OR-merge — the driver receives just the final
  * bitset, never the keys) and prune an arbitrarily large stream with a
  * plan-literal filter BEFORE its first shuffle. Both sides hash with
  * `xxhash64`, the same hash the runtime-filter rule uses.
  */
object Bloom {

  val AggFnName = "graft_bloom_agg"
  val McFnName = "graft_bloom_mc"

  /** Builders shared with any future extensions registration. */
  val aggBuilder: Seq[Expression] => Expression =
    exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
  val mcBuilder: Seq[Expression] => Expression =
    exprs => BloomFilterMightContain(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(AggFnName)))
      reg.createOrReplaceTempFunction(AggFnName, aggBuilder, "built-in")
    if (!reg.functionExists(FunctionIdentifier(McFnName)))
      reg.createOrReplaceTempFunction(McFnName, mcBuilder, "built-in")
  }

  /** Aggregate a serialized bloom filter (binary) over `key`'s xxhash64.
    * TWO confs bound the build and both must be raised together for
    * large eval sets: `numBits` must stay within
    * spark.sql.optimizer.runtime.bloomFilter.maxNumBits (64M bits =
    * 8 MB default), and `expectedItems` within
    * spark.sql.optimizer.runtime.bloomFilter.maxNumItems (4M default —
    * a 100M-gram eval suite fails analysis at the default cap).
    */
  def agg(key: Column, expectedItems: Long, numBits: Long): Column = {
    register(SparkSession.active)
    call_function(AggFnName, xxhash64(key), lit(expectedItems), lit(numBits))
  }

  /** Membership probe against a driver-held serialized filter. The
    * bytes ride the plan as a literal (shipped once per task binary,
    * exactly like a broadcast), so the predicate stays codegen'd and
    * pushes below shuffles.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column = {
    register(SparkSession.active)
    call_function(McFnName, lit(bloomBytes), xxhash64(key))
  }

  /** Standard optimal sizing: m = -n ln(p) / (ln 2)^2, capped at the
    * default runtime-filter ceiling.
    */
  def optimalNumBits(expectedItems: Long, fpp: Double,
      maxBits: Long = 1L << 26): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(expectedItems, 1L)
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(m, 64L), maxBits)
  }
}
