package graft

import org.apache.spark.sql.SparkSession

/** Standalone check that [[GraftExtensions]] wires everything into a
  * session built with `withExtensions` — the path a fresh JVM's
  * `spark.sql.extensions=graft.GraftExtensions` takes. Runs in its own
  * forked JVM (`sbt "runMain graft.ExtensionsCheck"`) because a shared
  * test JVM already has a default session, which getOrCreate would
  * return without applying extensions. Exits non-zero on any failure.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // all three native functions resolve through SQL
      val v = spark.sql("SELECT md5_long60('abc')").collect()(0).getLong(0)
      val expect = spark.sql(
        "SELECT cast(conv(substring(md5('abc'), 1, 15), 16, 10) as long)").collect()(0).getLong(0)
      assert(v == expect, "md5_long60 mismatch")
      assert(spark.sql("SELECT minhash_sig('one two three four five', 3, 16)")
        .collect()(0).getSeq[Long](0).length == 16, "minhash_sig arity")
      assert(spark.sql("SELECT dot_fold(array(1.0D,2.0D), array(3.0D,4.0D))")
        .collect()(0).getDouble(0) == 11.0, "dot_fold value")
      assert(spark.sql(
        "SELECT dot_fold_long(array(1L,2L), array(3L,4L))")
        .collect()(0).getLong(0) == 11L, "dot_fold_long value")
      assert(spark.sql("SELECT simhash_text('one two three', 16)")
        .collect()(0).getLong(0) >= 0L, "simhash_text callable")
      assert(spark.sql(
        """SELECT graft_topk(v, id, 2) FROM VALUES
           (CAST(3 AS BIGINT), CAST(30 AS BIGINT)),
           (CAST(9 AS BIGINT), CAST(90 AS BIGINT)),
           (CAST(5 AS BIGINT), CAST(50 AS BIGINT)) AS t(v, id)""")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getLong(1)) == Seq(90L, 50L), "graft_topk ranking")
      assert(spark.sql(
        // key hash 0b…01 → h1=1, h2=1: positions i stay tiny; word 0
        // = ...0110 covers positions 1 and 2 → both probes hit
        "SELECT bloom_test_long(1L, array(6L), 64L, 2)")
        .collect()(0).getBoolean(0), "bloom_test_long probes")
      assert(spark.sql(
        """SELECT best_cell(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
             array(named_struct('cell', 7, 'c', array(0.0D, 1.0D)),
                   named_struct('cell', 3, 'c', array(1.0D, 0.0D))))""")
        .collect()(0).getInt(0) == 3, "best_cell nearest centroid")
      // the injected optimizer rule rewrites composed dots (parquet
      // input — LocalRelations constant-fold before user rules run)
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("extcheck")
      try {
        Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
          .write.mode("overwrite").parquet(dir.toString)
        val composed = spark.read.parquet(dir.toString)
          .select(graft.functions.dotComposed($"a", $"b").as("d"))
        assert(composed.queryExecution.optimizedPlan.expressions
          .exists(_.exists(_.isInstanceOf[graft.expressions.DotFold])),
          "RewriteDotFold did not fire via extensions")
        assert(composed.collect()(0).getDouble(0) == 11.0, "rewritten result")
      } finally graft.util.Fs.deleteRecursively(dir)
      println("[extensions-check] OK: 8 functions + optimizer rule active")
    } finally spark.stop()
  }
}
