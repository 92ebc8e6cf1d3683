package graft.util

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Action-count discipline helpers (r16 optimization round).
  *
  * The maintenance/lake operator family is built from many SMALL
  * sequential Spark actions (eager localCheckpoint pins, isEmpty
  * commit guards, floor/stamp aggregates, bucket probes). Each action
  * is a full job dispatch — measured 25-80 ms of scheduler+planning
  * round-trip on the battery host, and a full cluster scheduling
  * barrier at real scale — so a takedown that pays 75 actions is
  * dispatch-bound long before it is data-bound (the r16 TakedownProf
  * census: 75 jobs, 4.0 s wall, 1.9 s of it inside jobs).
  *
  * The cure: ride every per-frame scalar the control flow needs
  * (row counts for commit guards, max/min stamps for precombine
  * floors) on the checkpoint job itself as OBSERVED metrics
  * (`Dataset.observe` fires on the eager localCheckpoint action), so
  * the checkpoint is the ONLY action a pinned frame pays.
  */
object Actions {

  /** Eager localCheckpoint + row count in ONE job: the count rides the
    * checkpoint action as an observed metric instead of paying its own
    * isEmpty/count round-trip.
    */
  def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
    val obs = Observation()
    val cp = df.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
    (cp, obs.get("n").asInstanceOf[Long])
  }

  /** [[checkpointCounted]] with caller-chosen extra aggregates (floor
    * stamps, per-tag counts …), all riding the single checkpoint job.
    * The row count is always present under `"n"`.
    */
  def checkpointObserved(df: DataFrame, aggs: (String, Column)*)
      : (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val named = count(lit(1)).as("n") +: aggs.map { case (nm, c) => c.as(nm) }
    val cp = df.observe(obs, named.head, named.tail: _*).localCheckpoint(true)
    (cp, obs.get)
  }

  /** Null-safe Long extraction from an observed metric map (a max/min
    * over an empty frame observes null).
    */
  def longOr(m: Map[String, Any], key: String, dflt: Long): Long =
    m.get(key) match {
      case Some(v: Long) => v
      case Some(v: java.lang.Long) => v.longValue()
      case Some(v: Int) => v.toLong
      case _ => dflt
    }
}
