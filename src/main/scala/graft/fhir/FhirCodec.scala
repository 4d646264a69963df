package graft.fhir

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 A2/A3 — lossless FHIR JSON ↔ spec DataFrame codec
  * (reference README.md:11-13).
  *
  * Encode parses NDJSON with `from_json` against a derived schema whose
  * decimal fields are StringType — the parser copies the raw number token,
  * so "36.5" vs "36.50" distinctions survive (README.md:347-348; SURVEY
  * §7.4 trap 5). Decode strips `__*` annotation columns (README.md:304-306)
  * and recursively prunes null leaves, all-null structs, and empty arrays so
  * absent elements do not re-materialize as empty JSON objects (SURVEY §7.4
  * trap 6 — golden files mark several structs required, so an absent complex
  * element is a struct-of-nulls on disk).
  */
object FhirCodec {

  /** FHIR NDJSON → spec DataFrame. A Jackson-based per-partition parser
    * rather than `from_json`: Spark's JSON reader normalizes number tokens
    * ("36.50" → "36.5"), which breaks the spec's lossless mandate for
    * decimals stored as text (README.md:347-348). Jackson's `getText` on a
    * number token returns the original characters, so the raw form survives.
    * Runs distributed — one parser per partition, no driver involvement.
    */
  def encode(spark: SparkSession, ndjson: Dataset[String], schema: StructType): DataFrame = {
    val rows = ndjson.mapPartitions { it =>
      val factory = new JsonFactory()
      it.map { line =>
        val p = factory.createParser(line)
        try { p.nextToken(); parseValue(p, schema).asInstanceOf[Row] }
        finally p.close()
      }
    }(Encoders.row(schema))
    // Encoders.row drops nested field metadata (fhirType=decimal); re-apply
    // the full schema so decode can re-emit decimals as raw JSON numbers.
    rows.toDF().to(schema)
  }

  def encode(ndjson: DataFrame, schema: StructType): DataFrame =
    encode(ndjson.sparkSession,
      ndjson.select(col(ndjson.columns.head).cast(StringType)).as(Encoders.STRING), schema)

  private def parseValue(p: JsonParser, dt: DataType): Any = {
    val tok = p.currentToken()
    if (tok == JsonToken.VALUE_NULL) return null
    dt match {
      case st: StructType =>
        if (tok != JsonToken.START_OBJECT) { p.skipChildren(); return null }
        val values = new Array[Any](st.length)
        val idx = st.fieldNames.zipWithIndex.toMap
        var t = p.nextToken()
        while (t != JsonToken.END_OBJECT) {
          val name = p.currentName()
          p.nextToken()
          idx.get(name) match {
            case Some(i) => values(i) = parseValue(p, st(i).dataType)
            case None => p.skipChildren() // field absent from schema: ignore
          }
          t = p.nextToken()
        }
        Row.fromSeq(values.toIndexedSeq)
      case at: ArrayType =>
        if (tok != JsonToken.START_ARRAY) { p.skipChildren(); return null }
        val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
        while (p.nextToken() != JsonToken.END_ARRAY) buf += parseValue(p, at.elementType)
        buf.toSeq
      case StringType => p.getText // raw token text — preserves "36.50"
      case IntegerType => p.getIntValue
      case LongType => p.getLongValue
      case BooleanType => p.getBooleanValue
      case DoubleType => p.getDoubleValue
      case d: DecimalType =>
        p.getDecimalValue.setScale(d.scale, java.math.RoundingMode.HALF_UP)
      case other =>
        throw new IllegalArgumentException(s"unsupported FHIR parse type: ${other.simpleString}")
    }
  }

  /** Spec DataFrame → FHIR NDJSON via a per-partition Jackson writer:
    * `__*` annotation fields are skipped, null leaves / all-null structs /
    * empty arrays are pruned (so required-struct encodings don't grow empty
    * objects), and string fields carrying `fhirType=decimal` metadata (set
    * by FhirSchema.deriveSchema) are re-emitted as raw JSON numbers —
    * restoring the original FHIR number tokens exactly. Tables read from
    * plain parquet have no such metadata and decode decimals as strings
    * (the distinction is not recoverable from the parquet schema alone).
    */
  def decode(df: DataFrame): Dataset[String] = {
    val schema = df.schema
    df.map(row => writeDoc(row, schema))(Encoders.STRING)
  }

  private val RawNumber = """-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?""".r

  private def writeDoc(row: Row, st: StructType): String = {
    val sw = new java.io.StringWriter()
    val gen = new JsonFactory().createGenerator(sw)
    writeStruct(gen, row, st)
    gen.close()
    sw.toString
  }

  /** Anything here worth emitting? (drives null/empty pruning) */
  private def nonEmpty(v: Any, dt: DataType): Boolean = (v, dt) match {
    case (null, _) => false
    case (r: Row, st: StructType) =>
      st.fields.zipWithIndex.exists { case (f, i) =>
        !f.name.startsWith("__") && nonEmpty(r.get(i), f.dataType)
      }
    case (s: scala.collection.Seq[_], at: ArrayType) =>
      s.exists(e => nonEmpty(e, at.elementType))
    case _ => true
  }

  private def writeStruct(gen: com.fasterxml.jackson.core.JsonGenerator, r: Row, st: StructType): Unit = {
    gen.writeStartObject()
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val v = r.get(i)
      if (!f.name.startsWith("__") && nonEmpty(v, f.dataType)) {
        gen.writeFieldName(f.name)
        writeValue(gen, v, f.dataType, FhirSchema.isDecimalField(f))
      }
    }
    gen.writeEndObject()
  }

  private def writeValue(gen: com.fasterxml.jackson.core.JsonGenerator, v: Any,
      dt: DataType, rawDecimal: Boolean): Unit = (v, dt) match {
    case (r: Row, st: StructType) => writeStruct(gen, r, st)
    case (s: scala.collection.Seq[_], at: ArrayType) =>
      gen.writeStartArray()
      // explicit JSON nulls preserve element-index alignment for FHIR
      // parallel arrays (given/_given, README.md:252-297) — silently
      // dropping null elements would shift siblings. Only trailing
      // emptiness is pruned (whole-array emptiness never reaches here:
      // writeStruct's nonEmpty check skips the field).
      val lastKeep = s.lastIndexWhere(e => nonEmpty(e, at.elementType))
      var i = 0
      while (i <= lastKeep) {
        if (nonEmpty(s(i), at.elementType)) writeValue(gen, s(i), at.elementType, rawDecimal)
        else gen.writeNull()
        i += 1
      }
      gen.writeEndArray()
    case (s: String, StringType) if rawDecimal && RawNumber.matches(s) => gen.writeRawValue(s)
    case (s: String, _) => gen.writeString(s)
    case (b: Boolean, _) => gen.writeBoolean(b)
    case (i: Int, _) => gen.writeNumber(i)
    case (l: Long, _) => gen.writeNumber(l)
    case (d: Double, _) => gen.writeNumber(d)
    case (d: java.math.BigDecimal, _) => gen.writeNumber(d)
    case (other, t) =>
      throw new IllegalArgumentException(s"unsupported decode value $other: ${t.simpleString}")
  }

}
