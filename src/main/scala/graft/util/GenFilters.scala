package graft.util

import org.apache.spark.sql.SparkSession

/** Generator-aware filter constants (VERDICT r14 item 6): the battery
  * runs on TWO data generators with disjoint NAME domains — the
  * driver's synthetic testdata (`NATION_0..24`, two-word part names
  * like "small ring") and `scripts/gen_sf.py`'s TPC-H-faithful data
  * (ALGERIA..VIETNAM, five-color part names like "forest brown coral
  * puff cream"). A shape row filtering on a literal from one family
  * selects NOTHING on the other (the r14 q260 lesson: NATION_7 has no
  * suppliers on gen data), so its gen-sf slope legs historically
  * needed hand-substituted predicates. This lookup keys the constants
  * on which generator wrote the dir — detected from `nation.n_name`,
  * the cheapest fully-diagnostic column (25 rows; the name family is
  * total: all-synthetic or all-TPC-H, asserted here as a contract the
  * same way SchemaContract asserts column shapes) — so a query
  * function written against it runs VERBATIM on both generators and
  * ScaleProbe slope legs need no substitute filters.
  *
  * Selectivity twins, not translations: `NATION_7` ↔ `GERMANY` (one
  * of 25 nations either way), `small%` ↔ `forest%` (a leading-word
  * part-name cut — 13% of driver parts, 1.1% of gen parts; both sit
  * in the selective-dim-filter regime the Q20/Q11 shapes exercise).
  * Battery hashes are untouched: on driver testdata the lookup
  * returns exactly the constants the oracles pin.
  */
object GenFilters {
  /** `nation2Name` is the bilateral-trade partner (Q7 shape): one other
    * nation of the 25, NATION_8 ↔ FRANCE (the textbook FRANCE–GERMANY
    * pair on gen data). `regionName` is the region CONTAINING
    * `nationName` in each generator (Q8's market-share scope): driver
    * NATION_7 sits in ASIA (n_regionkey 2), GERMANY in EUROPE — region
    * names are the real TPC-H five in both generators, so only the
    * membership differs.
    */
  final case class Filters(nationName: String, smallPartPrefix: String,
      nation2Name: String, regionName: String)

  private val synthetic = Filters("NATION_7", "small", "NATION_8", "ASIA")
  private val tpch = Filters("GERMANY", "forest", "FRANCE", "EUROPE")

  // the detection is a pure function of the dir; without this cache
  // every evaluation of each GenFilters-using battery row pays one
  // nation-read+collect job INSIDE the timed window (6 extra driver
  // round-trips per row under min-of-6 — the dispatch-bound regime
  // the bench's dispatch canary exists to catch.
  // STALENESS ASSUMPTION (ADVICE r15): the cache is keyed by dir for
  // the life of the JVM, so a dir REGENERATED with the other generator
  // family in-process would be served stale Filters silently. Bench
  // and battery dirs are immutable for a run; tests that rewrite a
  // tmp dir with the other family must call [[clearCache]] first.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Filters]()

  /** Test hook for the staleness assumption above — drops every cached
    * detection so a rewritten dir re-detects.
    */
  def clearCache(): Unit = cache.clear()

  def forDir(spark: SparkSession, dir: String): Filters =
    cache.computeIfAbsent(dir, { d =>
      val names = spark.read.parquet(s"$d/nation.parquet")
        .select("n_name").collect().map(_.getString(0))
      require(names.nonEmpty, s"empty nation table under $d")
      val synth = names.count(_.startsWith("NATION_"))
      require(synth == 0 || synth == names.length,
        s"mixed generator name families in $d/nation.parquet — " +
          s"$synth of ${names.length} synthetic")
      if (synth > 0) synthetic else tpch
    })
}
