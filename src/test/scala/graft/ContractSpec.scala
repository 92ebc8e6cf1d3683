package graft

/** Driver-contract invariants: every oracle key has a query, every
  * query runs, the flagship entry returns rows.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every query has an oracle (no rows-only holes in the battery)") {
    val unchecked = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unchecked.isEmpty,
      s"queries without a DuckDB oracle (driver would record a weaker rows-only check): $unchecked")
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes on sf0.001 without error") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no battery query plans a shuffled CartesianProduct") {
    // Global plan-hygiene invariant: every intentional cross join in
    // the battery is crossJoin(broadcast(<tiny agg>)), which plans as
    // BroadcastNestedLoopJoin. A CartesianProductExec means a shuffled
    // all-pairs product slipped into some composition — the one plan
    // shape that can never survive a 100× scale-up.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
      } catch { case _: Throwable => None } // execution errors caught above
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct: ${offenders.mkString(", ")}")
  }

  test("connected components cluster transitively") {
    import spark.implicits._
    // 1-2, 2-3 chain plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
