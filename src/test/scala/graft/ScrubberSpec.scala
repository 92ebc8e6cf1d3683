package graft

import org.apache.spark.sql.functions._

import graft.model.Seeds
import graft.operators.Scrubber

class ScrubberSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(Scrubber.applyRules($"t", Seeds.phiRulesV1)).as[String].collect()(0)

  test("SSN dashed form is redacted (address rule blocked by punctuation)") {
    // NB: with a space after the digits the ADDRESS rule (first in
    // rule_id order, greedy) would eat "6789 end" — reference-true.
    assert(scrub("ssn 123-45-6789.") == "ssn [REDACTED_SSN].")
    assert(scrub("ssn 123-45-6789 end") == "ssn 123-45-[REDACTED_ADDRESS]")
  }

  test("phone is redacted by the phone rule, not the ssn rule") {
    assert(scrub("call 555-123-4567!") == "call [REDACTED_PHONE]!")
  }

  test("email is redacted") {
    assert(scrub("mail john.doe+x@example.com please") == "mail [REDACTED_EMAIL] please")
  }

  test("8-digit date beats 9-digit ssn rule by rule order") {
    // PHI_DATE_YYYYMMDD sorts before PHI_SSN_DIGITS (rule_id order) and
    // \b\d{8}\b matches inside nothing-else; a 9-digit run is left for
    // the SSN rule.
    assert(scrub("on 20250215.") == "on [REDACTED_DATE].")
    assert(scrub("id 123456789.") == "id [REDACTED_SSN].")
  }

  test("ISO date redacted; sequential fold feeds later rules") {
    assert(scrub("dob 1971-04-12.") == "dob [REDACTED_DATE].")
  }

  test("street address redacted (greedy approximate rule)") {
    assert(scrub("lives at 12 Main Street") startsWith "lives at [REDACTED_ADDRESS]")
  }

  test("case-insensitive matching mirrors reference IGNORECASE") {
    // patterns here are digit-based; exercise (?i) via an email with caps
    assert(scrub("MAIL John.DOE@EXAMPLE.COM!") == "MAIL [REDACTED_EMAIL]!")
  }

  test("null and empty pass through") {
    val out = Seq[Option[String]](None, Some("")).toDF("t")
      .select(Scrubber.applyRules($"t", Seeds.phiRulesV1)).as[Option[String]].collect()
    assert(out.toSeq == Seq(None, Some("")))
  }

  test("firedRules reports exactly the rules that changed the value") {
    val fired = Seq("ssn 123-45-6789, mail a@b.co").toDF("t")
      .select(Scrubber.firedRules($"t", Seeds.phiRulesV1)).as[Seq[String]].collect()(0)
    assert(fired.contains("PHI_SSN") && fired.contains("PHI_EMAIL"))
    assert(!fired.contains("PHI_PHONE"))
  }

  test("property: no SSN/phone/email pattern survives scrubbing (fuzz)") {
    val words = Vector("visit", "note", "checkup", "ok", "stable",
      "111-22-3333", "555-867-5309", "a.b@c.org", "19990101", "2024-12-31")
    val patterns = Seq("""\d{3}-\d{2}-\d{4}""", """\d{3}-\d{3}-\d{4}""", """[\w.+-]+@[\w-]+\.[\w.-]+""").map(_.r)
    val rnd = new scala.util.Random(42)
    val texts = (1 to 60).map(_ => (1 to 6).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val outs = texts.toDF("t").select(Scrubber.applyRules($"t", Seeds.phiRulesV1)).as[String].collect()
    texts.zip(outs).foreach { case (in, out) =>
      patterns.foreach(p => assert(p.findFirstIn(out).isEmpty, s"'$in' -> '$out'"))
    }
  }

  test("scrub is idempotent on fuzzed corpora (second pass is a no-op)") {
    val words = Vector("visit", "note", "stable", "111-22-3333", "555-867-5309",
      "a.b@c.org", "19990101", "2024-12-31", "12 Main Street", "123-45-6789 end")
    val rnd = new scala.util.Random(7)
    val texts = (1 to 80).map(_ => (1 to 5).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val out = texts.toDF("t")
      .select(Scrubber.applyRules($"t", Seeds.phiRulesV1).as("once"))
      .select($"once", Scrubber.applyRules($"once", Seeds.phiRulesV1).as("twice"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: '${r.getString(0)}' -> '${r.getString(1)}'"))
  }

  test("column-level redaction: PHI columns get contextual tokens, others regex") {
    val df = Seq(("P1", "John Doe", "123-45-6789", "1971-04-12", "see 555-123-4567"))
      .toDF("patient_id", "patient_name", "ssn", "dob", "notes")
    val out = Scrubber.scrubTabular(df, Seeds.hospitalA, Seeds.phiRulesV1)
    val r = out.collect()(0)
    assert(r.getAs[String]("patient_id") == "P1") // non-PHI, no pattern
    assert(r.getAs[String]("patient_name") == "[REDACTED_NAME]")
    assert(r.getAs[String]("ssn") == "[REDACTED]") // generic: no name/dob in col, type=string
    assert(r.getAs[String]("dob") == "[REDACTED_DATE]")
    assert(r.getAs[String]("notes") == "see [REDACTED_PHONE]")
    assert(r.getAs[Long]("_redactions") == 4L)
  }

  test("HL7 scrub mirrors reference positional semantics exactly") {
    val msg = Fixtures.hl7Good.split("\n\n")(0).trim
    val out = Scrubber.scrubHl7(Seq(msg).toDF("message"), Seeds.hospitalCHl7, Seeds.phiRulesV1)
      .as[String].collect()(0)
    val pid = out.split("\n").find(_.startsWith("PID|")).get.split("\\|", -1)
    assert(pid(3) == "[REDACTED]")           // PID-3 in metadata, no rule fires → hard redact
    assert(pid(5) == "[REDACTED_NAME]")      // PID-5 name
    assert(pid(7) == "[REDACTED_DATE]")      // PID-7 dob
    assert(pid(11) == "[REDACTED_ADDRESS]")  // PID-11: "other" → address regex fires
    // PID-16 is NOT in metadata (metadata says PID-17): the SSN there
    // survives, exactly like the reference on its generator quirk.
    assert(pid(16) == "234-56-7890")
    assert(out.split("\n").length == msg.split("\n").length) // line structure preserved
  }
}
