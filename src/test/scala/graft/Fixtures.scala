package graft

import java.nio.file.{Files, Path, Paths}

/** Clinical test fixtures matching FIXTURES.md (shapes of the
  * reference's synthetic generator, independently implemented).
  */
object Fixtures {

  def tmpDir(prefix: String): Path = Files.createTempDirectory(prefix)

  def write(path: Path, content: String): Path = {
    Files.createDirectories(path.getParent)
    Files.writeString(path, content)
    path
  }

  /** hospital_a CSV: header patient_id,patient_name,ssn,dob,visit_date,diagnosis,notes */
  val csvGood: String =
    """patient_id,patient_name,ssn,dob,visit_date,diagnosis,notes
      |P10000,John Doe,123-45-6789,1971-04-12,2025-02-01,Hypertension,Patient John Doe attended for Flu. Contact: 555-123-4567
      |P10001,Jane Roe,987-65-4321,1985-06-03,2025-02-02,Flu,Email: jane.roe@example.com lives at 12 Main Street
      |P10002,Alice Poe,111-22-3333,1990-01-15,2025-02-03,Migraine,SSN 123456789 visited on 20250215
      |""".stripMargin

  /** Bad CSV: missing the `ssn` column entirely + empty non-nullable patient_name. */
  val csvBad: String =
    """patient_id,patient_name,dob,visit_date,diagnosis,notes
      |P20000,,1971-04-12,2025-02-01,Hypertension,note one
      |P20001,Named Person,not-a-date,2025-02-02,Flu,note two
      |""".stripMargin

  /** clinic_b JSONL incl. one invalid JSON line. */
  val jsonlGood: String =
    """{"id":"C20000","name":"Maria Williams","date_of_birth":"1985-06-03","encounter":"2025-02-01","icd":"J10","free_text":"Complained of cough. Email: maria.williams@example.com"}
      |{"id":"C20001","name":"Pat Smith","date_of_birth":"1990-12-12","encounter":"2025-02-02","icd":"E11","free_text":"Phone 555-987-6543 and ssn 321-54-9876"}
      |""".stripMargin

  val jsonlWithInvalid: String = jsonlGood + "this is { not json\n"

  /** hospital_c_hl7: 2 messages separated by a blank line; name quoted
    * at PID-5, ssn at PID-16 of the split (FIXTURES.md §3).
    */
  val hl7Good: String =
    """MSH|^~\&|HOSPITAL_C|LAB|QLM_SYS|DEST|20250201120000||ORU^R01|MSG1|P|2.3
      |PID|1||H30000||"Gary Host"||19710412|M|||44 Elm Street|||||234-56-7890
      |OBR|1||ORD1|TEST^TESTNAME
      |OBX|1|ST|RESULT||42|units||N
      |
      |MSH|^~\&|HOSPITAL_C|LAB|QLM_SYS|DEST|20250201130000||ORU^R01|MSG2|P|2.3
      |PID|1||H30001||"Lee Host"||19850603|F|||9 Oak Avenue|||||
      |OBR|1||ORD2|TEST^TESTNAME
      |OBX|1|ST|RESULT||77|units||N
      |OBX|2|ST|RESULT||78|units||N
      |""".stripMargin

  /** HL7 with a message missing its PID segment. */
  val hl7MissingPid: String =
    """MSH|^~\&|HOSPITAL_C|LAB|QLM_SYS|DEST|20250201140000||ORU^R01|MSG3|P|2.3
      |OBR|1||ORD3|TEST^TESTNAME
      |OBX|1|ST|RESULT||13|units||N
      |""".stripMargin

  /** Lay out a full source tree for Pipeline.ingest. The invalid-JSON
    * file fails validation (reference validates every JSONL row,
    * etl/validate.py:140-146) and lands in quarantine.
    */
  def sourceTree(base: Path): Path = {
    write(base.resolve("hospital_a/2025-02-01_clinical.csv"), csvGood)
    write(base.resolve("hospital_a/2025-02-02_clinical.csv"), csvBad)
    write(base.resolve("clinic_b/clinical_2025-02-01.jsonl"), jsonlGood)
    write(base.resolve("clinic_b/clinical_2025-02-02.jsonl"), jsonlWithInvalid)
    write(base.resolve("hospital_c_hl7/msgs_001.hl7"), hl7Good)
    write(base.resolve("hospital_c_hl7/msgs_002.hl7"), hl7MissingPid)
    base
  }
}
