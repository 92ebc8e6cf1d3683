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
  * INVISIBLE to `incremental` (non-CDC semantics), so
  * [[maintainRollup]] after a delete-only commit leaves a stale
  * summary — mirroring the restriction on Hudi incremental-ETL
  * pipelines without CDC enabled. [[maintainRollupCdc]] closes the
  * hole: it takes touched groups from the key-level change feed
  * ([[VersionedTable.diff]]), which sees deletes, at the cost of a
  * snapshot-compare instead of a delta-only read.
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
    recomputeAndCarry(vt, prevSummary, groupCol, aggs, touched)
  }

  /** CDC refresh — the delete-aware variant: touched groups come from
    * [[VersionedTable.diff]] (`sinceTs` → `headTs`), which classifies
    * every key-level change including DELETES, so the delete-staleness
    * caveat of [[maintainRollup]] does not apply. Inserts contribute
    * their after-group, deletes their before-group, updates both sides
    * (group moves recompute source and destination). A group whose
    * last row was deleted recomputes to no row and its carried summary
    * row is anti-joined away — it disappears, matching the full
    * recompute.
    *
    * Cost: one change-feed diff (two manifest-resolved snapshot reads,
    * full-outer joined on the record key — bucket-pruned to commits'
    * touched buckets) instead of `incremental`'s delta-only read; the
    * group recompute still reads only the touched groups' slice.
    */
  def maintainRollupCdc(vt: VersionedTable, sinceTs: String, headTs: String,
      prevSummary: DataFrame, groupCol: String,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val d = vt.diff(sinceTs, headTs)
    // change_type (not null-ness of before/after) picks the sides: a
    // legitimately-null group value must still mark its group touched
    val touched = d.filter(col("change_type") =!= "delete")
      .select(col(s"after_$groupCol").as(groupCol))
      .unionByName(d.filter(col("change_type") =!= "insert")
        .select(col(s"before_$groupCol").as(groupCol)))
      .distinct()
    recomputeAndCarry(vt, prevSummary, groupCol, aggs, touched)
  }

  /** Shared refresh tail: recompute the touched groups from the
    * current snapshot, carry every untouched summary row verbatim.
    * `touched` is small by construction (bounded by the delta), so
    * both joins broadcast.
    */
  private def recomputeAndCarry(vt: VersionedTable, prevSummary: DataFrame,
      groupCol: String, aggs: Seq[(String, Column)],
      touched: DataFrame): DataFrame = {
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
