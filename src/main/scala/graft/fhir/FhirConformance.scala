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
    ("Patient", "gender", "code"),
    ("Observation", "effectiveDateTime", "dateTime"),
    ("Observation", "issued", "instant"),
    ("Observation", "valueQuantity.value", "decimal"),
    ("Observation", "valueQuantity.system", "uri"),
    ("Observation", "id", "id"),
    ("Observation", "status", "code"),
    ("ExplanationOfBenefit", "created", "dateTime"),
    ("ExplanationOfBenefit", "billablePeriod.start", "dateTime"),
    ("ExplanationOfBenefit", "id", "id"),
    ("ExplanationOfBenefit", "status", "code"))

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
    case "oid" =>
      "urn:oid:[0-2](\\.(0|[1-9][0-9]*))+"
    case "uuid" =>
      "urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    // R4's published base64Binary pattern omits '/', an acknowledged erratum
    // (R5 includes it); kept here so real base64 payloads validate.
    case "base64Binary" =>
      "(\\s*[0-9a-zA-Z\\+/=]{4}\\s*)+"
    case "code" =>
      "[^\\s]+(\\s[^\\s]+)*"
    case "uri" | "url" | "canonical" =>
      "\\S*"
    case "integer" =>
      "[0]|[-+]?[1-9][0-9]*"
    case "positiveInt" =>
      "[1-9][0-9]*"
    case "unsignedInt" =>
      "0|[1-9][0-9]*"
    case other =>
      throw new IllegalArgumentException(s"no format rule for FHIR type $other")
  }
}
