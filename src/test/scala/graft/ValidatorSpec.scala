package graft

import graft.model.Seeds
import graft.operators.Validator
import graft.sources.Readers

class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  test("valid CSV frame passes with exact row count") {
    val dir = Fixtures.tmpDir("val")
    Fixtures.write(dir.resolve("good.csv"), Fixtures.csvGood)
    val df = Readers.csv(spark, Seeds.hospitalA, dir.resolve("good.csv").toString)
    val r = Validator.validate(df, Seeds.hospitalA)
    assert(r.valid && r.rowCount == 3 && r.missingColumns.isEmpty)
  }

  test("missing column + null violation + type error all reported") {
    // csvBad has no ssn column; read with inferred header so the frame
    // really lacks it (schema-on-read like the reference DictReader)
    val dir = Fixtures.tmpDir("val")
    Fixtures.write(dir.resolve("bad.csv"), Fixtures.csvBad)
    val df = Readers.csvInferHeader(spark, dir.resolve("bad.csv").toString)
    val r = Validator.validate(df, Seeds.hospitalA)
    assert(!r.valid)
    assert(r.missingColumns == Seq("ssn"))
    assert(r.errors.exists(_.startsWith("null_violation:patient_name")))
    assert(r.errors.exists(_.startsWith("type_error:dob:not-a-date")))
  }

  test("type probes only sample the first 200 rows but count is exact") {
    val rows = (1 to 300).map(i => (s"P$i", s"name$i", "123-45-6789",
      if (i > 250) "BADDATE" else "1990-01-01", "2025-01-01", "Flu", "n"))
    val df = rows.toDF("patient_id", "patient_name", "ssn", "dob", "visit_date", "diagnosis", "notes")
    val r = Validator.validate(df, Seeds.hospitalA)
    assert(r.rowCount == 300)
    assert(r.valid, s"bad rows beyond the 200-row sample must not fail validation: ${r.errors}")
  }

  test("error samples capped at 20") {
    val rows = (1 to 50).map(i => (s"P$i", "", "x", "1990-01-01", "2025-01-01", "Flu", "n"))
    val df = rows.toDF("patient_id", "patient_name", "ssn", "dob", "visit_date", "diagnosis", "notes")
    val r = Validator.validate(df, Seeds.hospitalA)
    assert(!r.valid && r.errors.size == 20)
  }

  test("lenient date parsing accepts multiple formats") {
    val rows = Seq(("P1", "n", "s", "19900115", "2025-01-01", "F", "x"),
      ("P2", "n", "s", "01/15/1990", "2025-01-01 10:00:00", "F", "x"))
    val df = rows.toDF("patient_id", "patient_name", "ssn", "dob", "visit_date", "diagnosis", "notes")
    val r = Validator.validate(df, Seeds.hospitalA)
    assert(r.valid, r.errors.mkString(";"))
  }

  test("lenientTimestamp matches a dateutil-generated accept/reject table") {
    import org.apache.spark.sql.functions.col
    // ground truth generated with python dateutil.parser.parse on
    // 2026-08-12 (the reference's validator, validate.py:19-37)
    val accepted = Seq(
      "2025-02-15", "20250215", "02/15/2025", "15-02-2025", "2025/02/15",
      "2025-02-15 10:30:00", "2025-02-15T10:30:00", "2025-02-15T10:30:00Z",
      "2025-02-15T10:30:00+05:30", "2025-02-15T10:30:00.123456",
      "20250215103000", "Feb 15 2025", "feb 15 2025", "15 Feb 2025",
      "February 15, 2025", "february 15 2025", "15 February 2025",
      "FEB 15 2025", "Feb 15, 2025", "10:30:00", "10:30",
      "02/15/2025 10:30", "2025", "15.02.2025", "Sat Feb 15 10:30:00 2025",
      // year-less month-day forms: dateutil fills today's defaults
      "Feb 15", "feb 15", "15 Feb", "February 15", "15 February",
      "15 feb")
    val rejected = Seq(
      "not a date", "2025-13-45", "99/99/9999", "hello 123",
      "13/13/2025", "0", "2025-02-30",
      // calendar-invalid year-less forms (2026 is not a leap year)
      "Feb 30", "Feb 29", "31 Apr")
    val df = (accepted.map((_, true)) ++ rejected.map((_, false))).toDF("s", "expect")
    val got = df.select(col("s"), col("expect"),
        Validator.lenientTimestamp(col("s")).isNotNull.as("parsed")).collect()
    val wrong = got.filter(r => r.getBoolean(1) != r.getBoolean(2))
      .map(r => s"${r.getString(0)} expected=${r.getBoolean(1)}")
    assert(wrong.isEmpty, s"dateutil-parity mismatches: ${wrong.mkString(", ")}")
  }

  test("HL7: message missing PID fails, good messages pass") {
    val dir = Fixtures.tmpDir("val")
    Fixtures.write(dir.resolve("good.hl7"), Fixtures.hl7Good)
    Fixtures.write(dir.resolve("bad.hl7"), Fixtures.hl7MissingPid)
    val good = Validator.validateHl7(
      Readers.hl7Messages(spark, dir.resolve("good.hl7").toString), Seeds.hospitalCHl7)
    assert(good.valid && good.rowCount == 2)
    val bad = Validator.validateHl7(
      Readers.hl7Messages(spark, dir.resolve("bad.hl7").toString), Seeds.hospitalCHl7)
    assert(!bad.valid && bad.errors.contains("missing_PID_segment"))
  }
}
