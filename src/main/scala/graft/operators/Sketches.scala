package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy hitters (frequent items) over an unbounded key stream — the
  * vocabulary/URL/domain frequency probe of corpus analysis, done the
  * way it has to be done at 100 TB: a count-min sketch, which is a
  * fixed-size (depth × width counters) mergeable summary. Spark's
  * `count_min_sketch` aggregate builds one sketch PER PARTITION and
  * merges them (no shuffle of the stream, constant memory), so the
  * cost is one scan regardless of cardinality.
  *
  * The returned frame pairs the exact top-N (TakeOrderedAndProject —
  * never a global sort) with the sketch's error contract per item,
  * emitted as 0/1 flags the way the battery's other sketch query (q35)
  * does: `cms_lower_ok` = estimate ≥ exact (CMS never undercounts —
  * a hard guarantee), `cms_upper_ok` = estimate ≤ exact + eps·total
  * (holds with probability ≥ confidence per item). The estimates
  * themselves are engine-specific and stay out of the compared output.
  */
object Sketches {

  /** Top-`topN` values of `key` by exact count, each checked against a
    * count-min estimate. Output: (token, rank, cnt, cms_lower_ok,
    * cms_upper_ok), rank 1-based by (cnt desc, token asc).
    *
    * Driver state is bounded: the sketch binary (depth·width counters)
    * and the `topN` exact rows — never the key stream.
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(topN >= 1, s"need topN>=1, got $topN")
    require(eps > 0 && eps < 1 && confidence > 0 && confidence < 1,
      s"need eps, confidence in (0,1); got eps=$eps confidence=$confidence")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("token")).filter(col("token").isNotNull)
    val top = keyed.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN).collect()
    val bin = keyed
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)").as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bin))
    val bound = math.ceil(eps * cms.totalCount()).toLong
    val rows = top.zipWithIndex.map { case (r, i) =>
      val token = r.getString(0)
      val cnt = r.getLong(1)
      val est = cms.estimateCount(token)
      (token, (i + 1).toLong, cnt,
        if (est >= cnt) 1L else 0L,
        if (est <= cnt + bound) 1L else 0L)
    }.toSeq
    rows.toDF("token", "rank", "cnt", "cms_lower_ok", "cms_upper_ok")
  }
}
