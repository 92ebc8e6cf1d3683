package graft.model

import org.apache.spark.sql.types._

/** Declared column metadata for one source column.
  *
  * Mirror of the reference's `schema_metadata` rows
  * (reference: db/init.sql:68-78, seeds db/init.sql:108-139). The
  * reference keeps types as free strings and validates lazily; we keep
  * the declared type for validation casts but read everything as string
  * first (reference: etl/transform.py:171 `dtype=str`).
  */
final case class FieldSpec(
    name: String,
    dataType: String, // "string" | "int" | "float" | "date" | "bool" ...
    nullable: Boolean,
    isPhi: Boolean) {

  /** Spark type for the *validated* view of this column. Raw reads stay
    * all-string (schema-on-read, reference semantics).
    */
  def sparkType: DataType = dataType.toLowerCase match {
    case "int" | "integer"                  => LongType
    case "float" | "double" | "numeric"     => DoubleType
    case "date"                             => DateType
    case "datetime" | "timestamp"           => TimestampType
    case "bool" | "boolean"                 => BooleanType
    case _                                  => StringType
  }

  def toStructField: StructField =
    StructField(
      name,
      StringType, // raw ingest is all-string; cast happens post-validation
      nullable,
      new MetadataBuilder()
        .putBoolean("is_phi", isPhi)
        .putString("declared_type", dataType)
        .build())
}

/** One registered ingest source (reference: source_registry,
  * db/init.sql:38-44; seeds db/init.sql:100-105).
  */
final case class SourceSpec(
    name: String,
    format: SourceFormat,
    path: String,
    fields: Seq[FieldSpec],
    active: Boolean = true) {

  /** All-string raw schema — mirrors csv.DictReader / dtype=str. */
  def rawSchema: StructType = StructType(fields.map(_.toStructField))
  def phiColumns: Set[String] = fields.filter(_.isPhi).map(_.name).toSet
  def field(n: String): Option[FieldSpec] = fields.find(_.name == n)
}

sealed trait SourceFormat
object SourceFormat {
  case object Csv extends SourceFormat
  case object Jsonl extends SourceFormat
  case object Hl7 extends SourceFormat
  def parse(s: String): SourceFormat = s.toLowerCase match {
    case "csv"   => Csv
    case "jsonl" => Jsonl
    case "hl7"   => Hl7
    case other   => sys.error(s"unknown source format: $other")
  }
}

/** One PHI redaction rule (reference: phi_rules db/init.sql:80-87; rule
  * set v1 seeded at db/init.sql:163-171). Patterns are applied
  * case-insensitively in `rule_id` order, sequentially — rule k's output
  * feeds rule k+1 (reference: etl/scrub_phi.py:26,41,119-124).
  */
final case class PhiRule(ruleId: String, pattern: String, replacement: String, description: String)

object Seeds {

  /** PHI rule set v1, in rule_id sort order as the reference loads them
    * (`ORDER BY rule_id`, etl/scrub_phi.py:41). Source: db/init.sql:163-171.
    */
  val phiRulesV1: Seq[PhiRule] = Seq(
    PhiRule("PHI_ADDRESS_SIMPLE", """\b\d+\s+[A-Za-z0-9\.\- ]+\b""", "[REDACTED_ADDRESS]", "Simple street address (approx)"),
    PhiRule("PHI_DATE_ISO", """\b\d{4}-\d{2}-\d{2}\b""", "[REDACTED_DATE]", "Date like 2025-02-15"),
    PhiRule("PHI_DATE_YYYYMMDD", """\b\d{8}\b""", "[REDACTED_DATE]", "Date like 20250215"),
    PhiRule("PHI_EMAIL", """\b[\w.+-]+@[\w-]+\.[\w.-]+\b""", "[REDACTED_EMAIL]", "Email addresses"),
    PhiRule("PHI_PHONE", """\b\d{3}-\d{3}-\d{4}\b""", "[REDACTED_PHONE]", "Phone like 555-123-4567"),
    PhiRule("PHI_SSN", """\b\d{3}-\d{2}-\d{4}\b""", "[REDACTED_SSN]", "US SSN pattern xxx-xx-xxxx"),
    PhiRule("PHI_SSN_DIGITS", """\b\d{9}\b""", "[REDACTED_SSN]", "9-digit SSN")
  ).sortBy(_.ruleId)

  /** Seeded source registry + schema metadata (db/init.sql:100-139). */
  val hospitalA: SourceSpec = SourceSpec(
    "hospital_a", SourceFormat.Csv, "data_source/hospital_a",
    Seq(
      FieldSpec("patient_id", "string", nullable = false, isPhi = false),
      FieldSpec("patient_name", "string", nullable = false, isPhi = true),
      FieldSpec("ssn", "string", nullable = false, isPhi = true),
      FieldSpec("dob", "date", nullable = true, isPhi = true),
      FieldSpec("visit_date", "date", nullable = true, isPhi = false),
      FieldSpec("diagnosis", "string", nullable = true, isPhi = false),
      FieldSpec("notes", "string", nullable = true, isPhi = false)))

  val clinicB: SourceSpec = SourceSpec(
    "clinic_b", SourceFormat.Jsonl, "data_source/clinic_b",
    Seq(
      FieldSpec("id", "string", nullable = false, isPhi = false),
      FieldSpec("name", "string", nullable = false, isPhi = true),
      FieldSpec("date_of_birth", "date", nullable = true, isPhi = true),
      FieldSpec("encounter", "date", nullable = true, isPhi = false),
      FieldSpec("icd", "string", nullable = true, isPhi = false),
      FieldSpec("free_text", "string", nullable = true, isPhi = true)))

  val hospitalCHl7: SourceSpec = SourceSpec(
    "hospital_c_hl7", SourceFormat.Hl7, "data_source/hospital_c_hl7",
    Seq(
      FieldSpec("PID-3", "string", nullable = false, isPhi = false),
      FieldSpec("PID-5", "string", nullable = false, isPhi = true),
      FieldSpec("PID-7", "date", nullable = false, isPhi = true),
      FieldSpec("PID-11", "string", nullable = true, isPhi = true),
      FieldSpec("PID-17", "string", nullable = true, isPhi = true)))

  val registry: Seq[SourceSpec] = Seq(hospitalA, clinicB, hospitalCHl7)
}

/** Canonical QLM output schema that every source converges to
  * (reference: etl/transform.py:46-140). All-string per reference
  * semantics (F11 NaN→None keeps object dtype).
  */
object Canonical {
  val columns: Seq[String] =
    Seq("patient_id", "patient_name", "dob", "visit_date", "diagnosis",
      "note_text", "address", "ssn", "source")
  val schema: StructType =
    StructType(columns.map(c => StructField(c, StringType, nullable = true)))
}
