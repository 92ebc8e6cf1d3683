package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{SourceFormat, SourceSpec}

/** Format readers for the three clinical source formats.
  *
  * All raw reads are schema-on-read with every column string-typed,
  * mirroring the reference's csv.DictReader / json.loads /
  * pd.read_csv(dtype=str) semantics (reference: etl/validate.py:98-99,
  * etl/transform.py:171). Typed casts happen only after validation.
  *
  * Scale note: all of these are plain DataFrame sources — Spark splits
  * CSV/JSON by HDFS block and parallelizes across executors for free.
  * The HL7 reader keeps one row per message (multi-char lineSep split
  * done by Hadoop's record reader), so a 100 TB HL7 corpus still scans
  * in parallel without whole-file reads.
  */
object Readers {

  def read(spark: SparkSession, spec: SourceSpec, path: String): DataFrame =
    spec.format match {
      case SourceFormat.Csv   => csv(spark, spec, path)
      case SourceFormat.Jsonl => jsonl(spark, spec, path)
      case SourceFormat.Hl7   => hl7Messages(spark, path)
    }

  /** CSV with header, all columns read as string (S4). PERMISSIVE mode
    * retains malformed rows for quarantine accounting.
    */
  def csv(spark: SparkSession, spec: SourceSpec, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(spec.rawSchema)
      .csv(path)

  /** CSV where we must keep *whatever* header the file has (used by the
    * scrub stage, which preserves input fieldnames — K3).
    */
  def csvInferHeader(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "true").csv(path)
    // force all-string view regardless of what inference guessed
    df.select(df.columns.toIndexedSeq.map(c => col(c).cast(StringType).as(c)): _*)
  }

  /** JSONL: one JSON object per line, blank lines skipped by the JSON
    * source; invalid lines land in `_corrupt_record` (S5).
    */
  def jsonl(spark: SparkSession, spec: SourceSpec, path: String): DataFrame = {
    val schema = spec.rawSchema.add(StructField("_corrupt_record", StringType, nullable = true))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .json(path)
  }

  /** HL7 v2 scan (S6): messages are text blocks separated by blank
    * lines (reference: etl/validate.py:179-184 splits on "\n\n").
    * `lineSep` gives one DataFrame row per message; trailing whitespace
    * trimmed and empty chunks dropped like the reference's
    * `[m.strip() for m in text.split("\n\n") if m.strip()]`.
    */
  def hl7Messages(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("lineSep", "\n\n")
      .text(path)
      .select(trim(col("value")).as("message"))
      .filter(length(col("message")) > 0)

  /** HL7 PID/OBX field extraction (S7) as pure column expressions over
    * the `message` column — no UDF, fully codegen'd.
    *
    * Positional semantics per reference etl/transform.py:81-117:
    * parts[0] == "PID", field n at split index n; OBX_TEXT is the
    * space-join of all OBX| lines.
    */
  def hl7Parse(messages: DataFrame): DataFrame = {
    val lines = split(col("message"), "\n")
    // first PID line (reference takes the first match and breaks);
    // try_element_at: ANSI-safe null when a message has no PID segment
    val pidLine = try_element_at(filter(lines, l => l.startsWith("PID|")), lit(1))
    val parts = split(pidLine, "\\|")
    // `get` is 0-based and ANSI-safe (null when out of range) — field n
    // lives at split index n because parts(0) == "PID".
    def fld(n: Int) = trim(get(parts, lit(n)))
    val obx = filter(lines, l => l.startsWith("OBX|"))
    messages.select(
      col("message"),
      fld(3).as("PID-3"),
      fld(5).as("PID-5"),
      fld(7).as("PID-7"),
      fld(11).as("PID-11"),
      fld(16).as("PID-16"),
      fld(17).as("PID-17"),
      fld(19).as("PID-19"),
      when(size(obx) > 0, array_join(obx, " ")).otherwise(lit(null).cast(StringType)).as("OBX_TEXT"))
  }

  /** HL7 component access: component `c` (1-based) of a composite field
    * value, split on the `^` separator — e.g. family name =
    * hl7Component(pid5, 1). ANSI-safe null when absent.
    */
  def hl7Component(field: Column, c: Int): Column =
    get(split(field, "\\^"), lit(c - 1))
}
