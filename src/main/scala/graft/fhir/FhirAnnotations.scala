package graft.fhir

import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2 A6/A7/A8 — the spec's query-acceleration annotations
  * (reference README.md:301-381).
  */
object FhirAnnotations {

  // ---------------------------------------------------------------- A6
  // Date-range annotation: earliest/latest instant included in a (possibly
  // partial-precision, possibly offset-bearing) FHIR date/dateTime, UTC
  // (README.md:316-330; worked vector :325-327:
  // 2014-06-01T12:05Z → [12:05:00.000Z, 12:05:59.999Z]). Partial values
  // (year..second) bound at ms precision; fractional-second values carry
  // full µs precision (see the frac branch below).
  // Timezone-less values are interpreted as UTC (spec is silent; documented
  // policy, SURVEY §7.4 trap 7).

  private val FhirDateTime =
    """^(\d{4})(?:-(\d{2})(?:-(\d{2})(?:T(\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?(Z|[+-]\d{2}:\d{2})?)?)?)?$""".r

  /** (startEpochMicros, endEpochMicros) or null for unparseable input. */
  private[fhir] def bounds(s: String): Option[(Long, Long)] = s match {
    case FhirDateTime(y, mo, dd, hh, mi, ss, frac, off) =>
      val zone = off match {
        case null | "Z" => ZoneOffset.UTC
        case o => ZoneOffset.of(o)
      }
      val year = y.toInt
      def micros(ldt: LocalDateTime): Long = {
        val ins = ldt.atOffset(zone).toInstant
        ins.getEpochSecond * 1000000L + ins.getNano / 1000L
      }
      val (lo, hi): (LocalDateTime, LocalDateTime) =
        if (mo == null) {
          val a = LocalDate.of(year, 1, 1).atStartOfDay
          (a, a.plusYears(1))
        } else if (dd == null) {
          val a = LocalDate.of(year, mo.toInt, 1).atStartOfDay
          (a, a.plusMonths(1))
        } else if (hh == null) {
          val a = LocalDate.of(year, mo.toInt, dd.toInt).atStartOfDay
          (a, a.plusDays(1))
        } else if (ss == null) {
          val a = LocalDate.of(year, mo.toInt, dd.toInt).atTime(hh.toInt, mi.toInt)
          (a, a.plusMinutes(1))
        } else if (frac == null) {
          val a = LocalDate.of(year, mo.toInt, dd.toInt).atTime(hh.toInt, mi.toInt, ss.toInt)
          (a, a.plusSeconds(1))
        } else {
          // Fractional seconds carry full µs precision: the earliest
          // included instant of "…00.0005" IS 500µs (an ms-truncated start
          // would lie BEFORE the denoted period, and would break the
          // AnnotationRewrite equivalence cast(x) == __x_start for
          // sub-ms literals). A d-digit fraction spans 10^(6-d) µs.
          val digits = math.min(frac.length, 6)
          val us = (frac + "00000").take(6).toInt
          val a = LocalDate.of(year, mo.toInt, dd.toInt)
            .atTime(hh.toInt, mi.toInt, ss.toInt, us * 1000)
          var span = 1L
          var k = digits
          while (k < 6) { span *= 10L; k += 1 }
          return Some((micros(a), micros(a) + span - 1L))
        }
      // end bound is inclusive at ms precision: hi - 1ms
      Some((micros(lo), micros(hi) - 1000L))
    case _ => None
  }

  /** Add `__<leaf>_start` / `__<leaf>_end` beside the date/dateTime element
    * at `path`, INSIDE its owning group (README.md:304-306: an annotation is
    * a sibling of the annotated element). Dotted paths descend structs and
    * LIST-of-struct elements alike — `item.servicedPeriod.start` annotates
    * every array element's nested group via `transform` (README.md:337-342,
    * 702-703). Uses the native codegen expressions (FhirDateTimeStart/End),
    * so the whole rebuild stays inside WholeStageCodegen.
    */
  def annotateRange(df: DataFrame, path: String): DataFrame = {
    FhirDateTimeExpr.register(df.sparkSession)
    def start(c: Column) = call_function("fhir_dt_start", c)
    def end(c: Column) = call_function("fhir_dt_end", c)
    annotatePath(df, path)(
      leaf =>
        df.withColumn(s"__${leaf}_start", start(col(leaf)))
          .withColumn(s"__${leaf}_end", end(col(leaf))),
      (owner, leaf) =>
        owner
          .withField(s"__${leaf}_start", start(owner.getField(leaf)))
          .withField(s"__${leaf}_end", end(owner.getField(leaf))))
  }

  /** Shared nested-path rebuild for annotation writers: applies `top` for a
    * single-segment path (annotation lands beside a top-level column) or
    * `group(owner, leaf)` at the owning struct for dotted paths, descending
    * structs directly and LIST elements via `transform`.
    */
  private def annotatePath(df: DataFrame, path: String)(
      top: String => DataFrame,
      group: (Column, String) => Column): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
    def rebuild(owner: Column, dt: DataType, rest: List[String]): Column = (dt, rest) match {
      case (_: StructType, leaf :: Nil) => group(owner, leaf)
      case (st: StructType, head :: tail) =>
        st(head).dataType match {
          case at: ArrayType =>
            owner.withField(head,
              transform(owner.getField(head), e => rebuild(e, at.elementType, tail)))
          case sdt => owner.withField(head, rebuild(owner.getField(head), sdt, tail))
        }
      case _ =>
        throw new IllegalArgumentException(s"path $path does not descend structs at $rest")
    }
    path.split('.').toList match {
      case leaf :: Nil => top(leaf)
      case head :: tail =>
        df.schema(head).dataType match {
          case at: ArrayType =>
            df.withColumn(head, transform(col(head), e => rebuild(e, at.elementType, tail)))
          case sdt => df.withColumn(head, rebuild(col(head), sdt, tail))
        }
      case Nil => df
    }
  }

  // ---------------------------------------------------------------- A7
  // DECIMAL(38,6) twin of a decimal string, half-up (README.md:347-353;
  // golden behavior: "42.38090848315092" → 42.380908).

  def numeric(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Add `__<leaf>_numeric` beside the decimal element at `path`, inside
    * its owning group — same placement rule and path semantics as
    * annotateRange (structs and LIST elements both descend).
    */
  def annotateNumeric(df: DataFrame, path: String): DataFrame =
    annotatePath(df, path)(
      leaf => df.withColumn(s"__${leaf}_numeric", numeric(col(leaf))),
      (owner, leaf) =>
        owner.withField(s"__${leaf}_numeric", numeric(owner.getField(leaf))))

  // ---------------------------------------------------------------- A8
  // UCUM canonicalization (README.md:367-381): a broadcast conversion table
  // code → (factor, offset, canonical code); canonical value =
  // value * factor + offset in exact decimal arithmetic.
  // Non-terminating factors (°F) are fixed at 6 dp — documented approximation.

  /** (code, factor, offset, canonicalCode). Beyond the spec's worked
    * examples (mass/length/temperature/time), the common clinical units a
    * real deployment hits: pressure (mm[Hg]/kPa → Pa), concentration
    * (mg/dL, g/dL → g/L), rates (/min, /h → /s), percent (→ unity),
    * volume (mL → L), micro-mass, day/week. Factors non-terminating in
    * decimal are fixed at 6 dp — documented approximation.
    */
  val ucumTable: Seq[(String, String, String, String)] = Seq(
    ("kg", "1000", "0", "g"),
    ("g", "1", "0", "g"),
    ("mg", "0.001", "0", "g"),
    ("ug", "0.000001", "0", "g"),
    ("cm", "0.01", "0", "m"),
    ("mm", "0.001", "0", "m"),
    ("m", "1", "0", "m"),
    ("mm[Hg]", "133.322387", "0", "Pa"),
    ("kPa", "1000", "0", "Pa"),
    ("Pa", "1", "0", "Pa"),
    ("Cel", "1", "273.15", "K"),
    ("[degF]", "0.555556", "255.372222", "K"),
    ("min", "60", "0", "s"),
    ("h", "3600", "0", "s"),
    ("d", "86400", "0", "s"),
    ("wk", "604800", "0", "s"),
    ("mg/dL", "0.01", "0", "g/L"),
    ("g/dL", "10", "0", "g/L"),
    ("g/L", "1", "0", "g/L"),
    ("/min", "0.016667", "0", "/s"),
    ("/h", "0.000278", "0", "/s"),
    ("%", "0.01", "0", "1"),
    ("mL", "0.001", "0", "L"),
    ("L", "1", "0", "L"))

  /** DuckDB VALUES literal mirroring ucumTable, for oracle SQL. */
  def ucumValuesSql: String =
    ucumTable.map { case (c, f, o, k) =>
      s"('$c', CAST($f AS DECIMAL(12,6)), CAST($o AS DECIMAL(18,6)), '$k')"
    }.mkString("(VALUES ", ", ", ") AS ucum(code, factor, off, canon)")

  def ucumDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    ucumTable.toDF("code", "factor_s", "off_s", "canon")
      .select(col("code"),
        col("factor_s").cast(DecimalType(12, 6)).as("factor"),
        col("off_s").cast(DecimalType(18, 6)).as("off"),
        col("canon"))
  }

  /** canonical value = CAST(v18 * factor + off AS DECIMAL(38,6)). */
  def canonicalValue(valueStr: Column, factor: Column, off: Column): Column =
    (valueStr.cast(DecimalType(18, 6)) * factor + off).cast(DecimalType(38, 6))

  /** Materialize the spec's `__<q>_canonical` sibling group for the Quantity
    * struct at top-level `path` (README.md:367-381; worked schema :711-717:
    * the group mirrors the Quantity's own shape — code/system/unit/value
    * string + `__value_numeric` DECIMAL(38,6) — holding the canonical unit
    * and converted value). The UCUM conversion table is a broadcast
    * dimension; rows without a mapping (or without a value) get a null
    * group, mirroring a left join. `value` is the plain decimal text of the
    * converted number at scale 6 — a derived annotation, not a round-trip
    * of the source text.
    */
  def canonicalize(df: DataFrame, path: String): DataFrame = {
    val u = ucumDf(df.sparkSession).select(
      col("code").as("__ucum_code"), col("factor").as("__ucum_factor"),
      col("off").as("__ucum_off"), col("canon").as("__ucum_canon"))
    val cv = canonicalValue(col(s"$path.value"), col("__ucum_factor"), col("__ucum_off"))
    df.join(broadcast(u), col(s"$path.code") === col("__ucum_code"), "left")
      .withColumn(s"__${path}_canonical",
        when(col("__ucum_canon").isNotNull && col(s"$path.value").isNotNull,
          struct(
            col("__ucum_canon").as("code"),
            col(s"$path.system").as("system"),
            col("__ucum_canon").as("unit"),
            cv.cast("string").as("value"),
            cv.as("__value_numeric"))))
      .drop("__ucum_code", "__ucum_factor", "__ucum_off", "__ucum_canon")
  }
}
