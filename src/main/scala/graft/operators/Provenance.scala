package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Provenance + batch state machine (reference: etl/provenance_recorder.py,
  * etl/audit.py, db/init.sql:3-36,90-98).
  *
  * The reference keeps all control-flow state in Postgres; here the
  * control plane is an append-only event log per table behind a
  * [[ControlBackend]] (parquet by default, JDBC-shaped contract), with
  * "current batch state" derived by a last-event-wins aggregation — the
  * idempotent Spark analogue of the reference's single-threaded
  * UPDATEs. Appends are tiny driver-side writes; reads are normal
  * DataFrame scans, so lineage queries distribute like any other.
  */
final class Provenance(spark: SparkSession, backend: ControlBackend) {
  import Provenance._
  import spark.implicits._

  def this(spark: SparkSession, root: String) =
    this(spark, new ParquetControlBackend(spark, root))

  private def append(name: String, df: DataFrame): Unit = backend.append(name, df)

  private def readOrEmpty(name: String, empty: => DataFrame): DataFrame =
    backend.read(name)(empty)

  def nowTs: String =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(ZoneOffset.UTC).format(Instant.now())

  /** create_batch, status=INGESTED (provenance_recorder.py:10-17);
    * duplicate batch_ids are collapsed by the last-event-wins view,
    * mirroring ON CONFLICT DO NOTHING idempotence.
    */
  def createBatch(batchId: String, source: String, filePath: String, rawSha: String): Unit =
    append("provenance_batch_events",
      Seq((batchId, source, filePath, rawSha, "INGESTED", nowTs, null: String, 0L, null: String, null: String, null: String, null: String))
        .toDF(batchCols: _*))

  def updateStatus(batchId: String, status: String, errorDetails: String = null): Unit =
    append("provenance_batch_events",
      Seq((batchId, null: String, null: String, null: String, status, nowTs, errorDetails, 0L, null: String, null: String, null: String, null: String))
        .toDF(batchCols: _*))

  def updateCuratedHash(batchId: String, sha: String, curatedPath: String): Unit =
    append("provenance_batch_events",
      Seq((batchId, null: String, null: String, null: String, "SCRUBBED", nowTs, null: String, 0L, sha, curatedPath, null: String, null: String))
        .toDF(batchCols: _*))

  def updateFinalHash(batchId: String, sha: String, versionPath: String): Unit =
    append("provenance_batch_events",
      Seq((batchId, null: String, null: String, null: String, "COMPLETED", nowTs, null: String, 0L, null: String, null: String, sha, versionPath))
        .toDF(batchCols: _*))

  def setRowCount(batchId: String, status: String, n: Long): Unit =
    append("provenance_batch_events",
      Seq((batchId, null: String, null: String, null: String, status, nowTs, null: String, n, null: String, null: String, null: String, null: String))
        .toDF(batchCols: _*))

  def recordStep(batchId: String, stepName: String, details: Map[String, String]): Unit = {
    val json = detailsJson(details)
    append("provenance_steps", Seq((batchId, stepName, nowTs, json)).toDF("batch_id", "step_name", "step_time", "details_json"))
  }

  def recordRule(batchId: String, ruleId: String, action: String): Unit =
    append("provenance_rules_applied", Seq((batchId, ruleId, action, nowTs)).toDF("batch_id", "rule_id", "action", "created_at"))

  def writeAudit(actor: String, action: String, details: String): Unit =
    append("audit_log", Seq((actor, action, details, nowTs)).toDF("actor", "action", "details", "created_at"))

  /** Current batch state: per batch, last non-null value per field in
    * event order (the UPDATE-semantics view). row_number + first-value
    * aggregation keeps this a single shuffle by batch_id.
    */
  def batches: DataFrame = {
    val ev = readOrEmpty("provenance_batch_events", spark.emptyDataset[BatchEvent].toDF())
    ev.groupBy($"batch_id").agg(
      max_by($"source_name", when($"source_name".isNotNull, $"event_time")).as("source_name"),
      max_by($"raw_file_path", when($"raw_file_path".isNotNull, $"event_time")).as("raw_file_path"),
      max_by($"raw_sha256", when($"raw_sha256".isNotNull, $"event_time")).as("raw_sha256"),
      max_by($"status", when($"status".isNotNull, $"event_time")).as("status"),
      min($"event_time").as("ingest_time"),
      max_by($"error_details", when($"error_details".isNotNull, $"event_time")).as("error_details"),
      max($"total_rows").as("total_rows"),
      max_by($"curated_sha256", when($"curated_sha256".isNotNull, $"event_time")).as("curated_sha256"),
      max_by($"curated_path", when($"curated_path".isNotNull, $"event_time")).as("curated_path"),
      max_by($"final_sha256", when($"final_sha256".isNotNull, $"event_time")).as("final_sha256"),
      max_by($"version_path", when($"version_path".isNotNull, $"event_time")).as("version_path"))
  }

  def steps: DataFrame =
    readOrEmpty("provenance_steps", Seq.empty[(String, String, String, String)].toDF("batch_id", "step_name", "step_time", "details_json"))

  def rulesApplied: DataFrame =
    readOrEmpty("provenance_rules_applied", Seq.empty[(String, String, String, String)].toDF("batch_id", "rule_id", "action", "created_at"))

  def auditLog: DataFrame =
    readOrEmpty("audit_log", Seq.empty[(String, String, String, String)].toDF("actor", "action", "details", "created_at"))

  /** Pending-batch queue for a stage (S10): status filter + FIFO order. */
  def pending(status: String): DataFrame =
    batches.filter($"status" === status).orderBy($"ingest_time")

  /** Cheap ingest-idempotence probe: has any event registered this raw
    * path with this content hash? Scans the raw event log with a
    * pushed-down filter — deliberately NOT the [[batches]] view, whose
    * last-event-wins aggregation costs a groupBy over the whole log per
    * call (too heavy for a per-file check in a streaming watch).
    */
  def hasIngested(rawFilePath: String, rawSha256: String): Boolean = {
    val ev = readOrEmpty("provenance_batch_events", spark.emptyDataset[BatchEvent].toDF())
    !ev.filter($"raw_file_path" === rawFilePath && $"raw_sha256" === rawSha256).isEmpty
  }

  // ---- lineage queries (api/app.py:63-152) ----

  def batchById(batchId: String): DataFrame = batches.filter($"batch_id" === batchId)

  def batchTimeline(batchId: String): DataFrame =
    steps.filter($"batch_id" === batchId).orderBy($"step_time")

  def batchRules(batchId: String): DataFrame =
    rulesApplied.filter($"batch_id" === batchId).orderBy($"created_at")

  def latestBatches(source: Option[String], n: Int = 20): DataFrame =
    source.fold(batches)(s => batches.filter($"source_name" === s))
      .orderBy($"ingest_time".desc).limit(n)

  def search(status: Option[String], source: Option[String]): DataFrame = {
    var df = batches
    status.foreach(s => df = df.filter($"status" === s))
    source.foreach(s => df = df.filter($"source_name" === s))
    df.orderBy($"ingest_time".desc)
  }

  /** Audit tail (O4, README.md:223-226): latest n audit entries. */
  def auditTail(n: Int = 50): DataFrame =
    auditLog.orderBy($"created_at".desc).limit(n)

  def statusRollup: DataFrame =
    batches.groupBy($"source_name", $"status").count().orderBy($"source_name", $"status")

  /** Compact every control table (delegates to the backend's storage
    * maintenance; the parquet backend also self-compacts on append past
    * its file threshold, see [[ParquetControlBackend]]).
    */
  def compact(): Unit = Provenance.controlTables.foreach(backend.compact)
}

object Provenance {
  final case class BatchEvent(
      batch_id: String, source_name: String, raw_file_path: String,
      raw_sha256: String, status: String, event_time: String,
      error_details: String, total_rows: Long, curated_sha256: String,
      curated_path: String, final_sha256: String, version_path: String)

  val batchCols: Seq[String] = Seq(
    "batch_id", "source_name", "raw_file_path", "raw_sha256", "status",
    "event_time", "error_details", "total_rows", "curated_sha256",
    "curated_path", "final_sha256", "version_path")

  /** The control tables (db/init.sql:3-98 table-per-concern layout). */
  val controlTables: Seq[String] = Seq(
    "provenance_batch_events", "provenance_steps",
    "provenance_rules_applied", "audit_log")

  /** F6: streaming SHA-256 of a local file (8 KiB chunks like
    * etl/ingest.py:18-25); used for the artifact hash chain.
    */
  def sha256File(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(Paths.get(path))
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** F7: batch id `<source>_<filename dots→underscores>_<utc ts>`
    * (etl/ingest.py:45-50).
    */
  def batchId(source: String, fileName: String): String = {
    val ts = DateTimeFormatter.ofPattern("yyyyMMddHHmmss").withZone(ZoneOffset.UTC).format(Instant.now())
    s"${source}_${fileName.replace(".", "_")}_$ts"
  }

  /** RFC 8259-safe string escape (control chars included — an error
    * sample carrying a tab/newline must not yield unparseable JSON).
    */
  def jsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def detailsJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      jsonEscape(k) + ":" + jsonEscape(Option(v).getOrElse(""))
    }.mkString("{", ",", "}")

  def copyFile(src: String, dst: String): Unit = {
    val d = Paths.get(dst)
    Files.createDirectories(d.getParent)
    Files.copy(Paths.get(src), d, StandardCopyOption.REPLACE_EXISTING)
  }
}
