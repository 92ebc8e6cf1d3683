package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized rollup over a
  * [[VersionedTable]] — the lakehouse ETL pattern where a summary
  * table follows a 100 TB fact table without ever re-aggregating the
  * whole thing: each refresh recomputes ONLY the groups the latest
  * commits touched and carries every other summary row forward
  * verbatim.
  *
  * Correctness subtlety: an upsert can MOVE a row between groups
  * (e.g. a language re-classification), and the incremental read
  * yields only the NEW row version — so touched groups must include
  * the OLD group of every changed key too. Those pre-images come from
  * a key-semi-join against the as-of snapshot at `sinceTs`; changed
  * keys are few (they are the incremental delta), so this is a small
  * read, and the group recompute reads only the touched groups'
  * slice of the current snapshot.
  *
  * Limits, stated honestly: [[VersionedTable.delete]] commits are
  * INVISIBLE to `incremental` (non-CDC semantics), so a delete-only
  * commit leaves a stale summary — run a full refresh after deletes,
  * or treat deletes as tombstone upserts upstream. This mirrors the
  * restriction on Hudi incremental-ETL pipelines without CDC enabled.
  */
object RollupMaintenance {

  /** Full rollup (the bootstrap, and the oracle for every refresh):
    * group the whole snapshot by `groupCol` and apply `aggs`
    * (alias → aggregate expression over the snapshot's columns).
    */
  def fullRollup(vt: VersionedTable, groupCol: String,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    vt.snapshot.groupBy(col(groupCol))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Refresh `prevSummary` (a [[fullRollup]] as of `sinceTs`) to the
    * table's current state: recompute touched groups, carry the rest.
    */
  def maintainRollup(vt: VersionedTable, sinceTs: String,
      prevSummary: DataFrame, groupCol: String,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val delta = vt.incremental(sinceTs)
    val changedKeys = delta.select(col(vt.recordKey)).distinct()
    // pre-images: the old version of every changed key — their groups
    // must also be recomputed or a group-moving update leaves the old
    // group's row stale
    val oldRows = vt.asOf(sinceTs)
      .join(changedKeys, Seq(vt.recordKey), "left_semi")
    val touched = delta.select(col(groupCol))
      .unionByName(oldRows.select(col(groupCol))).distinct()
    val recomputed = vt.snapshot
      .join(broadcast(touched.withColumnRenamed(groupCol, "_touched_g")),
        col(groupCol) <=> col("_touched_g"))
      .drop("_touched_g")
      .groupBy(col(groupCol))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    prevSummary
      .join(broadcast(touched.withColumnRenamed(groupCol, "_touched_g")),
        col(groupCol) <=> col("_touched_g"), "left_anti")
      .unionByName(recomputed)
  }
}
