package graft

import graft.model.Canonical
import graft.operators.Canonicalizer
import graft.sources.Readers

class CanonicalizerSpec extends SparkSpec {
  import spark.implicits._

  test("hospital_a projection renames notes→note_text and adds source") {
    val df = Seq(("P1", "John", "1971-04-12", "2025-02-01", "Flu", "hello"))
      .toDF("patient_id", "patient_name", "dob", "visit_date", "diagnosis", "notes")
    val out = Canonicalizer.hospitalA(df)
    assert(out.columns.toSeq == Canonical.columns)
    val r = out.collect()(0)
    assert(r.getAs[String]("note_text") == "hello")
    assert(r.getAs[String]("source") == "hospital_a")
    assert(r.getAs[String]("address") == null) // padded column
  }

  test("clinic_b projection maps id/name/date_of_birth/encounter/icd/free_text") {
    val df = Seq(("C1", "Maria", "1985-06-03", "2025-02-01", "J10", "txt"))
      .toDF("id", "name", "date_of_birth", "encounter", "icd", "free_text")
    val r = Canonicalizer.clinicB(df).collect()(0)
    assert(r.getAs[String]("patient_id") == "C1")
    assert(r.getAs[String]("dob") == "1985-06-03")
    assert(r.getAs[String]("visit_date") == "2025-02-01")
    assert(r.getAs[String]("diagnosis") == "J10")
    assert(r.getAs[String]("note_text") == "txt")
  }

  test("missing source columns become nulls (pandas df.get semantics)") {
    val df = Seq(("P1")).toDF("patient_id")
    val r = Canonicalizer.hospitalA(df).collect()(0)
    assert(r.getAs[String]("patient_name") == null)
    assert(r.getAs[String]("note_text") == null)
  }

  test("HL7 parse + canonical: quoted name, OBX concat, SSN coalesce 16→17→19") {
    val dir = Fixtures.tmpDir("canon")
    Fixtures.write(dir.resolve("m.hl7"), Fixtures.hl7Good)
    val parsed = Readers.hl7Parse(Readers.hl7Messages(spark, dir.resolve("m.hl7").toString))
    val rows = parsed.orderBy("PID-3").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("PID-3") == "H30000")
    assert(rows(0).getAs[String]("PID-5") == "\"Gary Host\"") // quotes preserved like reference
    assert(rows(1).getAs[String]("OBX_TEXT").contains("OBX|1|ST|RESULT||77"))
    assert(rows(1).getAs[String]("OBX_TEXT").contains("OBX|2|ST|RESULT||78"))

    val canon = Canonicalizer.hospitalCHl7(parsed).orderBy("patient_id").collect()
    assert(canon(0).getAs[String]("ssn") == "234-56-7890") // from PID-16
    assert(canon(1).getAs[String]("ssn") == null) // all empty → null
    assert(canon(0).getAs[String]("address") == "44 Elm Street")
    assert(canon(0).getAs[String]("visit_date") == null) // absent for HL7
  }

  test("unknown source passes through unchanged (P8 best-effort)") {
    val df = Seq(("x", "y")).toDF("a", "b")
    val out = Canonicalizer.canonicalize("mystery_source", df)
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.collect()(0).toSeq == Seq("x", "y"))
  }

  test("unionAll conforms all sources to one schema") {
    val a = Seq(("P1", "n", "d", "v", "dg", "t")).toDF(
      "patient_id", "patient_name", "dob", "visit_date", "diagnosis", "notes")
    val b = Seq(("C1", "m", "d2", "e", "i", "f")).toDF(
      "id", "name", "date_of_birth", "encounter", "icd", "free_text")
    val u = Canonicalizer.unionAll(Seq(
      Canonicalizer.hospitalA(a), Canonicalizer.clinicB(b)))
    assert(u.count() == 2)
    assert(u.columns.toSeq == Canonical.columns)
  }
}
