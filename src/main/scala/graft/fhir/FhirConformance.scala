package graft.fhir

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, StructType, TimestampType}

/** FHIR R4 primitive value-format rules (reference README.md:84-86 defers to
  * hl7.org/fhir/datatypes.html — these are that page's published regex
  * patterns, kept to the RE2-compatible subset so the identical text runs in
  * Spark `rlike` and DuckDB `regexp_matches`), plus the resource-types
  * ValueSet membership rule (README.md:29-32) and the annotation-collision
  * rule (README.md:311-312).
  */
object FhirConformance {

  /** The FHIR R4 resource-types CodeSystem (hl7.org/fhir/R4/valueset-
    * resource-types.html) — the ValueSet README.md:29-32 requires
    * `resourceType` values to be drawn from. Abstract types (Resource,
    * DomainResource) included: the ValueSet enumerates the full code system.
    */
  val resourceTypes: Set[String] = Set(
    "Account", "ActivityDefinition", "AdverseEvent", "AllergyIntolerance",
    "Appointment", "AppointmentResponse", "AuditEvent", "Basic", "Binary",
    "BiologicallyDerivedProduct", "BodyStructure", "Bundle",
    "CapabilityStatement", "CarePlan", "CareTeam", "CatalogEntry",
    "ChargeItem", "ChargeItemDefinition", "Claim", "ClaimResponse",
    "ClinicalImpression", "CodeSystem", "Communication",
    "CommunicationRequest", "CompartmentDefinition", "Composition",
    "ConceptMap", "Condition", "Consent", "Contract", "Coverage",
    "CoverageEligibilityRequest", "CoverageEligibilityResponse",
    "DetectedIssue", "Device", "DeviceDefinition", "DeviceMetric",
    "DeviceRequest", "DeviceUseStatement", "DiagnosticReport",
    "DocumentManifest", "DocumentReference", "DomainResource",
    "EffectEvidenceSynthesis", "Encounter", "Endpoint", "EnrollmentRequest",
    "EnrollmentResponse", "EpisodeOfCare", "EventDefinition", "Evidence",
    "EvidenceVariable", "ExampleScenario", "ExplanationOfBenefit",
    "FamilyMemberHistory", "Flag", "Goal", "GraphDefinition", "Group",
    "GuidanceResponse", "HealthcareService", "ImagingStudy", "Immunization",
    "ImmunizationEvaluation", "ImmunizationRecommendation",
    "ImplementationGuide", "InsurancePlan", "Invoice", "Library", "Linkage",
    "List", "Location", "Measure", "MeasureReport", "Media", "Medication",
    "MedicationAdministration", "MedicationDispense", "MedicationKnowledge",
    "MedicationRequest", "MedicationStatement", "MedicinalProduct",
    "MedicinalProductAuthorization", "MedicinalProductContraindication",
    "MedicinalProductIndication", "MedicinalProductIngredient",
    "MedicinalProductInteraction", "MedicinalProductManufactured",
    "MedicinalProductPackaged", "MedicinalProductPharmaceutical",
    "MedicinalProductUndesirableEffect", "MessageDefinition",
    "MessageHeader", "MolecularSequence", "NamingSystem", "NutritionOrder",
    "Observation", "ObservationDefinition", "OperationDefinition",
    "OperationOutcome", "Organization", "OrganizationAffiliation",
    "Parameters", "Patient", "PaymentNotice", "PaymentReconciliation",
    "Person", "PlanDefinition", "Practitioner", "PractitionerRole",
    "Procedure", "Provenance", "Questionnaire", "QuestionnaireResponse",
    "RelatedPerson", "RequestGroup", "ResearchDefinition",
    "ResearchElementDefinition", "ResearchStudy", "ResearchSubject",
    "Resource", "RiskAssessment", "RiskEvidenceSynthesis", "Schedule",
    "SearchParameter", "ServiceRequest", "Slot", "Specimen",
    "SpecimenDefinition", "StructureDefinition", "StructureMap",
    "Subscription", "Substance", "SubstanceNucleicAcid", "SubstancePolymer",
    "SubstanceProtein", "SubstanceReferenceInformation",
    "SubstanceSourceMaterial", "SubstanceSpecification", "SupplyDelivery",
    "SupplyRequest", "Task", "TerminologyCapabilities", "TestReport",
    "TestScript", "ValueSet", "VerificationResult", "VisionPrescription")

  /** Annotation names this specification defines (README.md:316-381):
    * `start`/`end` (date ranges, timestamp-typed), `numeric` (decimal), and
    * `canonical` (Quantity canonicalization, a group). A NON-standard
    * annotation "can be included … provided [its name does] not collide
    * with the annotations defined in this specification" (README.md:311-
    * 312) — so a `__field_start` column that is not actually a range-start
    * timestamp is a conformance violation, as is any annotation column
    * whose base element is missing (an annotation is "a derived form of an
    * element value", README.md:302-303).
    */
  private val standardAnnotations: Map[String, DataType => Boolean] = Map(
    "start" -> (_.isInstanceOf[TimestampType]),
    "end" -> (_.isInstanceOf[TimestampType]),
    "numeric" -> (_.isInstanceOf[DecimalType]),
    "canonical" -> (_.isInstanceOf[StructType]))

  /** Walk a schema and return the dotted paths of annotation columns that
    * collide with the spec's annotation namespace: a `__<base>_<name>`
    * column where `name` is a standard annotation but the column's type is
    * not that annotation's type, or where the `<base>` element it claims to
    * derive from is absent from the same group. The element-name grammar
    * has no underscores, so the LAST `_` splits base from annotation name.
    */
  def annotationCollisions(schema: StructType): Seq[String] = {
    def walk(st: StructType, prefix: String): Seq[String] =
      st.fields.toSeq.flatMap { f =>
        val here = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val own: Seq[String] =
          if (f.name.startsWith("__") && f.name.drop(2).contains('_')) {
            val body = f.name.drop(2)
            val cut = body.lastIndexOf('_')
            val (base, ann) = (body.take(cut), body.drop(cut + 1))
            standardAnnotations.get(ann) match {
              case Some(typeOk) =>
                if (!typeOk(f.dataType)) Seq(s"$here: standard annotation '$ann' with non-conforming type ${f.dataType.simpleString}")
                else if (!st.fieldNames.contains(base)) Seq(s"$here: annotation '$ann' has no base element '$base'")
                else Nil
              case None =>
                if (!st.fieldNames.contains(base)) Seq(s"$here: annotation '$ann' has no base element '$base'")
                else Nil
            }
          } else Nil
        val children = f.dataType match {
          case s: StructType => walk(s, here)
          case ArrayType(s: StructType, _) => walk(s, s"$here[]")
          case _ => Nil
        }
        own ++ children
      }
    walk(schema, "")
  }

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
