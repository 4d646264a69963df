package graft.fhir

/** FHIR R4 primitive value-format rules (reference README.md:84-86 defers to
  * hl7.org/fhir/datatypes.html — these are that page's published regex
  * patterns, kept to the RE2-compatible subset so the identical text runs in
  * Spark `rlike` and DuckDB `regexp_matches`).
  */
object FhirConformance {

  /** (golden table, field path, FHIR primitive type) — every string-typed
    * primitive with a format rule present in the three golden tables.
    */
  val checks: Seq[(String, String, String)] = Seq(
    ("Patient", "birthDate", "date"),
    ("Patient", "deceasedDateTime", "dateTime"),
    ("Patient", "id", "id"),
    ("Observation", "effectiveDateTime", "dateTime"),
    ("Observation", "issued", "instant"),
    ("Observation", "valueQuantity.value", "decimal"),
    ("Observation", "id", "id"),
    ("ExplanationOfBenefit", "created", "dateTime"),
    ("ExplanationOfBenefit", "billablePeriod.start", "dateTime"),
    ("ExplanationOfBenefit", "id", "id"))

  private val year = "([0-9]([0-9]([0-9][1-9]|[1-9]0)|[1-9]00)|[1-9]000)"
  private val tz = "(Z|(\\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))"
  private val hms = "([01][0-9]|2[0-3]):[0-5][0-9]:([0-5][0-9]|60)(\\.[0-9]+)?"

  def regex(fhirType: String): String = fhirType match {
    case "date" =>
      s"$year(-(0[1-9]|1[0-2])(-(0[1-9]|[1-2][0-9]|3[0-1]))?)?"
    case "dateTime" =>
      s"$year(-(0[1-9]|1[0-2])(-(0[1-9]|[1-2][0-9]|3[0-1])(T$hms$tz)?)?)?"
    case "instant" =>
      s"$year-(0[1-9]|1[0-2])-(0[1-9]|[1-2][0-9]|3[0-1])T$hms$tz"
    case "time" =>
      hms
    case "decimal" =>
      "-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?"
    case "id" =>
      "[A-Za-z0-9\\-\\.]{1,64}"
    case other =>
      throw new IllegalArgumentException(s"no format rule for FHIR type $other")
  }
}
