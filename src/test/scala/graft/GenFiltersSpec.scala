package graft

import graft.util.GenFilters

/** The generator-detection contract the shape rows' verbatim gen legs
  * ride on: driver testdata resolves to EXACTLY the constants the
  * oracles pin, and a mixed name family (a half-regenerated dir, the
  * failure mode the all-or-nothing assert exists for) is rejected
  * loudly instead of silently selecting the wrong constants.
  */
class GenFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("driver testdata resolves to the oracle-pinned constants") {
    val f = GenFilters.forDir(spark, "/root/testdata/sf0.001")
    assert(f.nationName == "NATION_7")
    assert(f.smallPartPrefix == "small")
    assert(f.nation2Name == "NATION_8")
    assert(f.regionName == "ASIA")
  }

  test("driver nation/region membership backs the Q8 constants: " +
    "NATION_7 sits in ASIA") {
    val n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .filter($"n_name" === "NATION_7").select("n_regionkey")
      .collect().map(_.getInt(0)).toSeq
    val r = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .filter($"r_name" === "ASIA").select("r_regionkey")
      .collect().map(_.getInt(0)).toSeq
    assert(n == r, s"nation regionkey $n vs ASIA regionkey $r")
  }

  test("a mixed name family is rejected, not misclassified") {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_genfilters_mixed")
    graft.util.Fs.deleteRecursively(root)
    Seq((0, "NATION_0", 0), (1, "GERMANY", 3))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$root/nation.parquet")
    val e = intercept[IllegalArgumentException](
      GenFilters.forDir(spark, root.toString))
    assert(e.getMessage.contains("mixed generator name families"))
    graft.util.Fs.deleteRecursively(root)
  }
}
