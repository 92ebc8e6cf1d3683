package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.model.Canonical
import graft.sources.Readers

/** Canonicalization to the QLM schema (reference: etl/transform.py).
  *
  * Each source is a select/alias projection (P1/P2/P3) onto the fixed
  * canonical column set; columns a source lacks become typed nulls
  * (mirrors pandas df.get returning None-columns). `conform` pads any
  * frame to the full canonical schema so cross-source unionByName is a
  * no-shuffle concat.
  */
object Canonicalizer {

  private def getOr(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name).cast(StringType)
    else lit(null).cast(StringType)

  /** hospital_a (etl/transform.py:46-60): rename notes→note_text, add
    * literal source.
    */
  def hospitalA(df: DataFrame): DataFrame = conform(
    df.select(
      getOr(df, "patient_id").as("patient_id"),
      getOr(df, "patient_name").as("patient_name"),
      getOr(df, "dob").as("dob"),
      getOr(df, "visit_date").as("visit_date"),
      getOr(df, "diagnosis").as("diagnosis"),
      getOr(df, "notes").as("note_text"),
      lit("hospital_a").as("source")))

  /** clinic_b (etl/transform.py:63-78). */
  def clinicB(df: DataFrame): DataFrame = conform(
    df.select(
      getOr(df, "id").as("patient_id"),
      getOr(df, "name").as("patient_name"),
      getOr(df, "date_of_birth").as("dob"),
      getOr(df, "encounter").as("visit_date"),
      getOr(df, "icd").as("diagnosis"),
      getOr(df, "free_text").as("note_text"),
      lit("clinic_b").as("source")))

  /** hospital_c_hl7 (etl/transform.py:120-140): takes the *parsed* HL7
    * frame (Readers.hl7Parse). SSN = first non-empty of PID-16/17/19 —
    * the reference's fillna chain is exactly coalesce over
    * empty-as-null values (etl/transform.py:132-137).
    */
  def hospitalCHl7(parsed: DataFrame): DataFrame = {
    def ne(c: String): Column =
      if (parsed.columns.contains(c)) nullif(col(c), lit("")) else lit(null).cast(StringType)
    conform(
      parsed.select(
        getOr(parsed, "PID-3").as("patient_id"),
        getOr(parsed, "PID-5").as("patient_name"),
        getOr(parsed, "PID-7").as("dob"),
        getOr(parsed, "PID-11").as("address"),
        coalesce(ne("PID-16"), ne("PID-17"), ne("PID-19")).as("ssn"),
        getOr(parsed, "OBX_TEXT").as("note_text"),
        lit("hospital_c_hl7").as("source")))
  }

  /** Pad/order to the full canonical schema. */
  def conform(df: DataFrame): DataFrame =
    df.select(Canonical.columns.map(c => getOr(df, c).as(c)): _*)

  /** Cross-source canonical view (§2.8): the reference writes one
    * artifact per batch; we additionally expose the union since all
    * sources share the canonical schema.
    */
  def unionAll(frames: Seq[DataFrame]): DataFrame =
    frames.map(conform).reduce(_.unionByName(_))

  /** Dispatch by source name (etl/transform.py:170-199), including the
    * HL7 parse step.
    */
  def canonicalize(source: String, df: DataFrame): DataFrame = source match {
    case "hospital_a"     => hospitalA(df)
    case "clinic_b"       => clinicB(df)
    case "hospital_c_hl7" => hospitalCHl7(Readers.hl7Parse(df))
    case _                => df // best-effort passthrough (P8)
  }
}
