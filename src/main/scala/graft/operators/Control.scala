package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control-plane job scheduling (reference: etl/control.py:6-63 +
  * control_header/control_detail, db/init.sql:47-65). The reference
  * defines these tables and readers but never wires them to a runner
  * (SURVEY.md §3.4); here they drive the pipeline: one header row per
  * scheduled job, ordered detail steps naming the stage to run.
  */
final class Control(spark: SparkSession, root: String) {
  import spark.implicits._

  private def tbl = s"$root/_control/control_plan"

  /** Register a job plan: ordered stage names under one job id. */
  def schedule(jobId: String, steps: Seq[String]): Unit =
    steps.zipWithIndex.map { case (s, i) => (jobId, i, s, "PENDING") }
      .toDF("job_id", "step_order", "stage", "status")
      .write.mode("append").parquet(tbl)

  def plan: DataFrame =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(tbl)))
      spark.read.parquet(tbl)
    else Seq.empty[(String, Int, String, String)].toDF("job_id", "step_order", "stage", "status")

  /** Pending jobs with their ordered steps (the reference's
    * fetch_pending_control + per-header detail read). A step is done
    * once any DONE row exists for it (append-only status flips).
    */
  def pendingSteps(jobId: String): Seq[String] =
    plan.filter($"job_id" === jobId)
      .groupBy($"step_order", $"stage")
      .agg(max(when($"status" === "DONE", 1).otherwise(0)).as("done"))
      .filter($"done" === 0)
      .orderBy($"step_order")
      .select($"stage").collect().map(_.getString(0)).toSeq

  /** Execute a job's steps in order against a pipeline. */
  def run(jobId: String, pipeline: graft.Pipeline, sourceBase: String): Seq[String] = {
    val executed = pendingSteps(jobId).map { stage =>
      stage match {
        case "INGEST"    => pipeline.ingest(sourceBase)
        case "VALIDATE"  => pipeline.validatePending()
        case "SCRUB_PHI" => pipeline.scrubPending()
        case "TRANSFORM" => pipeline.transformPending()
        case other       => sys.error(s"unknown stage: $other")
      }
      stage
    }
    // mark done (append-style status flip, last-event-wins like Provenance)
    executed.zipWithIndex.map { case (s, i) => (jobId, i, s, "DONE") }
      .toDF("job_id", "step_order", "stage", "status")
      .write.mode("append").parquet(tbl)
    executed
  }
}
