package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators._
import graft.sources.Readers

/** The four-stage clinical ETL flow (reference: README.md:88-106,
  * INGEST → VALIDATE → SCRUB_PHI → TRANSFORM) over a local/HDFS lake
  * root with zones raw/ quarantine/ curated/ qlm_ready/ and a
  * parquet-backed control plane ([[operators.Provenance]]).
  *
  * Control flow (batch discovery, status transitions, file moves) is
  * driver-side and idempotent; all record-level work is DataFrame
  * plans, so each batch scales with executors. Batches are per-file to
  * mirror the reference's unit of work (etl/ingest.py:71-77); at
  * 100 TB the same stages run unchanged with globs instead of single
  * files since every operator is a plain DataFrame transform.
  *
  * Deliberate behavioral fix vs the reference: TRANSFORM reads the
  * *curated* (scrubbed) file, not the raw one — the reference
  * transforms raw_file_path (etl/transform.py:222-227) contradicting
  * its own documented flow (see SURVEY.md §3.3 / §7.4-5).
  */
final class Pipeline(
    spark: SparkSession,
    lakeRoot: String,
    registry: Seq[SourceSpec] = Seeds.registry,
    rules: Seq[PhiRule] = Seeds.phiRulesV1,
    controlBackend: Option[ControlBackend] = None) {

  /** Control plane: lake-native parquet by default, or any injected
    * [[operators.ControlBackend]] — e.g. [[operators.JdbcControlBackend]]
    * for the reference's RDBMS-as-system-of-record architecture.
    */
  val provenance = controlBackend match {
    case Some(be) => new Provenance(spark, be)
    case None => new Provenance(spark, lakeRoot)
  }

  private def zone(z: String, parts: String*): Path =
    Paths.get((s"$lakeRoot/$z" +: parts).mkString("/"))

  private def ts(): String = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd'T'HHmmss").withZone(java.time.ZoneOffset.UTC)
    .format(java.time.Instant.now())

  // ------------------------------------------------------------------
  // Stage 1: INGEST (etl/ingest.py:52-114)
  // ------------------------------------------------------------------

  /** Copy every file of every active source into the raw zone, hash it,
    * and register the batch as INGESTED. With `skipIfSeen` this is an
    * idempotent sweep (only unseen path+content registers) — the
    * compensating pass a streaming watch pairs with, since Spark file
    * sources never surface zero-byte files.
    */
  def ingest(sourceBase: String, skipIfSeen: Boolean = false): Seq[String] = {
    registry.filter(_.active).flatMap { spec =>
      val srcDir = Paths.get(s"$sourceBase/${spec.name}")
      if (!Files.isDirectory(srcDir)) Nil
      else graft.util.Fs.list(srcDir).filter(Files.isRegularFile(_)).sortBy(_.toString)
        .flatMap(f => ingestFile(spec.name, f, skipIfSeen))
    }
  }

  /** Ingest one file for `sourceName` — the per-file unit shared by
    * [[ingest]] and the streaming twin
    * ([[graft.streaming.StreamingIngest]]). With `skipIfSeen`, a file
    * whose raw path + content sha is already registered is skipped, so
    * replays (e.g. a streaming restart after checkpoint loss) never
    * double-register a batch; re-delivery of the same path with NEW
    * content still registers, like the reference's re-ingest.
    */
  def ingestFile(sourceName: String, f: Path, skipIfSeen: Boolean = false): Option[String] =
    registry.find(s => s.name == sourceName && s.active).flatMap { spec =>
      val sha = Provenance.sha256File(f.toString)
      val rawPath = zone("raw", spec.name, f.getFileName.toString)
      if (skipIfSeen && provenance.hasIngested(rawPath.toString, sha)) None
      else {
        val batchId = Provenance.batchId(spec.name, f.getFileName.toString)
        Provenance.copyFile(f.toString, rawPath.toString)
        provenance.createBatch(batchId, spec.name, rawPath.toString, sha)
        provenance.recordStep(batchId, "INGEST",
          Map("raw_path" -> rawPath.toString, "sha256" -> sha))
        provenance.writeAudit("pipeline", "INGEST", batchId)
        Some(batchId)
      }
    }

  // ------------------------------------------------------------------
  // Stage 2: VALIDATE (etl/validate.py:225-306)
  // ------------------------------------------------------------------

  def validatePending(): Seq[(String, Boolean)] =
    pendingBatches("INGESTED").map { case (batchId, source, rawPath) =>
      val spec = registry.find(_.name == source)
      val result =
        if (!Files.exists(Paths.get(rawPath))) ValidationResult(valid = false, 0, Nil, Seq("missing_file"))
        else spec match {
          case None => ValidationResult(valid = true, 0, Nil, Nil) // VALIDATION_SKIPPED
          case Some(sp) => sp.format match {
            case SourceFormat.Csv   => Validator.validate(Readers.csv(spark, sp, rawPath), sp)
            case SourceFormat.Jsonl => Validator.validate(Readers.jsonl(spark, sp, rawPath), sp)
            case SourceFormat.Hl7   => Validator.validateHl7(Readers.hl7Messages(spark, rawPath), sp)
          }
        }
      if (result.valid) {
        provenance.recordStep(batchId, "VALIDATION_PASSED",
          Map("rows" -> result.rowCount.toString))
        provenance.setRowCount(batchId, "VALIDATED", result.rowCount)
      } else {
        // quarantine move (K2, etl/validate.py:216-223)
        val qPath = zone("quarantine", source, Paths.get(rawPath).getFileName.toString)
        if (Files.exists(Paths.get(rawPath))) {
          Files.createDirectories(qPath.getParent)
          Files.move(Paths.get(rawPath), qPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        provenance.recordStep(batchId, "VALIDATION_FAILED",
          Map("errors" -> result.errors.mkString(";"),
            "missing_columns" -> result.missingColumns.mkString(",")))
        provenance.updateStatus(batchId, "FAILED_VALIDATION",
          result.errors.take(Validator.MaxErrorSamples).mkString(";"))
      }
      batchId -> result.valid
    }

  // ------------------------------------------------------------------
  // Stage 3: SCRUB_PHI (etl/scrub_phi.py:280-318)
  // ------------------------------------------------------------------

  def scrubPending(): Seq[String] =
    pendingBatches("VALIDATED").map { case (batchId, source, rawPath) =>
      val spec = registry.find(_.name == source).getOrElse(sys.error(s"unknown source $source"))
      val fileName = Paths.get(rawPath).getFileName.toString
      val outPath = zone("curated", source, fileName)
      Files.createDirectories(outPath.getParent)

      // HL7 dispatch keys off the source-name suffix like the reference
      // (etl/scrub_phi.py:303) — preserved quirk.
      val (rowCount, replacements, fired) =
        if (source.endsWith("hl7")) scrubHl7File(spec, rawPath, outPath)
        else spec.format match {
          case SourceFormat.Csv   => scrubCsvFile(spec, rawPath, outPath)
          case SourceFormat.Jsonl => scrubJsonlFile(spec, rawPath, outPath)
          case SourceFormat.Hl7   => scrubHl7File(spec, rawPath, outPath)
        }

      val sha = Provenance.sha256File(outPath.toString)
      provenance.updateCuratedHash(batchId, sha, outPath.toString)
      provenance.recordStep(batchId, "SCRUB_PHI",
        Map("curated_path" -> outPath.toString, "rows" -> rowCount.toString,
          "replacements" -> replacements.toString))
      fired.toSeq.sorted.foreach(r => provenance.recordRule(batchId, r, "applied"))
      batchId
    }

  /** Collect (rowCount, totalReplacements, firedRules) from a scrubbed
    * frame carrying the Scrubber bookkeeping columns (A1/A2/A3).
    */
  private def scrubStats(scrubbed: DataFrame): (Long, Long, Set[String]) = {
    val row = scrubbed.agg(
      count(lit(1)),
      coalesce(sum(col("_redactions")), lit(0L)),
      coalesce(array_distinct(flatten(collect_list(col("_fired_rules")))), array())).collect()(0)
    (row.getLong(0), row.getLong(1), row.getSeq[String](2).toSet)
  }

  private def scrubCsvFile(spec: SourceSpec, in: String, out: Path): (Long, Long, Set[String]) = {
    // preserve the file's own header set (K3): read with inferred header
    val df = Readers.csvInferHeader(spark, in)
    val scrubbed = Scrubber.scrubTabular(df, spec, rules)
    val stats = scrubStats(scrubbed)
    writeSingleFile(scrubbed.drop("_redactions", "_fired_rules"), out, "csv")
    stats
  }

  private def scrubJsonlFile(spec: SourceSpec, in: String, out: Path): (Long, Long, Set[String]) = {
    // cache: Spark disallows projecting only _corrupt_record from a raw
    // JSON scan; per-batch files are small so this is a driver-cheap fix
    val df = Readers.jsonl(spark, spec, in).cache()
    val scrubbed = Scrubber.scrubTabular(df.drop("_corrupt_record"), spec, rules, byName = true)
    val stats = scrubStats(scrubbed)
    // invalid JSON lines pass through verbatim (etl/scrub_phi.py:155-160)
    val corrupt = df.select(col("_corrupt_record").as("line")).filter(col("line").isNotNull)
    val valid = scrubbed.drop("_redactions", "_fired_rules")
    val lines = valid.select(to_json(struct(valid.columns.toIndexedSeq.map(col): _*)).as("line"))
      .unionByName(corrupt)
    writeSingleFile(lines, out, "text")
    stats
  }

  private def scrubHl7File(spec: SourceSpec, in: String, out: Path): (Long, Long, Set[String]) = {
    val messages = Readers.hl7Messages(spark, in)
    val scrubbed = Scrubber.scrubHl7(messages, spec, rules)
    val n = scrubbed.count()
    // message framing round-trip: each message followed by a blank line
    // (etl/scrub_phi.py:270 writes "\n".join(lines) + "\n\n")
    writeSingleFile(scrubbed.select(concat(col("message"), lit("\n")).as("value")), out, "text")
    (n, 0L, Set("PHI_HL7_POSITIONAL"))
  }

  /** Write a small per-batch artifact as ONE file at `out` (reference
    * writes one output file per input file). coalesce(1) is correct
    * here: batches are file-granular; large-corpus flows use the
    * DataFrame writers directly without this helper.
    */
  private def writeSingleFile(df: DataFrame, out: Path, format: String): Unit = {
    val tmp = out.getParent.resolve(s".tmp_${out.getFileName}_${System.nanoTime()}")
    val w = df.coalesce(1).write.mode("overwrite")
    format match {
      case "csv"  => w.option("header", "true").option("emptyValue", "").csv(tmp.toString)
      case "text" => w.text(tmp.toString)
    }
    val part = graft.util.Fs.list(tmp)
      .find(p => p.getFileName.toString.startsWith("part-")).get
    Files.move(part, out, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.util.Fs.deleteRecursively(tmp)
  }

  // ------------------------------------------------------------------
  // Stage 4: TRANSFORM (etl/transform.py:159-241)
  // ------------------------------------------------------------------

  def transformPending(): Seq[(String, String)] =
    pendingBatches("SCRUBBED").map { case (batchId, source, _) =>
      val curatedPath = latestCuratedPath(batchId)
      val spec = registry.find(_.name == source)
      val df = spec.map(_.format) match {
        case Some(SourceFormat.Csv)   => Readers.csvInferHeader(spark, curatedPath)
        case Some(SourceFormat.Jsonl) => spark.read.json(curatedPath)
        case Some(SourceFormat.Hl7)   => Readers.hl7Messages(spark, curatedPath)
        case None                     => Readers.csvInferHeader(spark, curatedPath) // P8 best effort
      }
      val canonical = Canonicalizer.canonicalize(source, df)
      val outDir = zone("qlm_ready", source, ts(), batchId)
      canonical.write.mode("overwrite").parquet(outDir.toString)
      val partFile = graft.util.Fs.list(outDir)
        .find(_.getFileName.toString.endsWith(".parquet")).map(_.toString).getOrElse(outDir.toString)
      val sha = Provenance.sha256File(partFile)
      provenance.updateFinalHash(batchId, sha, outDir.toString)
      provenance.recordStep(batchId, "TRANSFORM",
        Map("version_path" -> outDir.toString))
      batchId -> outDir.toString
    }

  // ------------------------------------------------------------------

  private def pendingBatches(status: String): Seq[(String, String, String)] =
    provenance.pending(status)
      .select("batch_id", "source_name", "raw_file_path")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))

  private def latestCuratedPath(batchId: String): String = {
    val r = provenance.batches.filter(col("batch_id") === batchId)
      .select("curated_path", "raw_file_path", "source_name").collect()(0)
    Option(r.getString(0)).getOrElse {
      val raw = Paths.get(r.getString(1))
      zone("curated", r.getString(2), raw.getFileName.toString).toString
    }
  }

  /** Full run over a source directory tree. */
  def runAll(sourceBase: String): Unit = {
    ingest(sourceBase)
    validatePending()
    scrubPending()
    transformPending()
  }
}
