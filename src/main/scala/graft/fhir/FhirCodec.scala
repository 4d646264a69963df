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
    rows.toDF()
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

  /** Spec DataFrame → FHIR NDJSON. */
  def decode(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val st = df.schema
    val kept = st.fields.filterNot(_.name.startsWith("__"))
    val cols = kept.map(f => prune(col(f.name), f.dataType).as(f.name))
    df.select(to_json(struct(cols.toIndexedSeq: _*)).as("value")).as[String]
  }

  /** Schema with `__*` annotation fields removed, recursively. */
  def strippedType(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.filterNot(_.name.startsWith("__"))
        .map(f => StructField(f.name, strippedType(f.dataType), nullable = true)))
    case at: ArrayType => ArrayType(strippedType(at.elementType), containsNull = true)
    case other => other
  }

  /** Null-prune a column: annotation fields dropped, structs whose pruned
    * children are all null become null, arrays drop null elements and empty
    * arrays become null. Pure Column expressions — codegen-friendly, no UDFs.
    */
  private def prune(c: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      val kept = st.fields.filterNot(_.name.startsWith("__"))
      val children = kept.map(f => prune(c.getField(f.name), f.dataType).as(f.name))
      if (children.isEmpty) lit(null).cast(strippedType(st))
      else {
        val rebuilt = struct(children.toIndexedSeq: _*)
        val anyNonNull = children.map(_.isNotNull).reduce(_ || _)
        when(c.isNotNull && anyNonNull, rebuilt).otherwise(lit(null).cast(strippedType(st)))
      }
    case at: ArrayType =>
      val cleaned = filter(transform(c, x => prune(x, at.elementType)), _.isNotNull)
      when(c.isNotNull && size(cleaned) > 0, cleaned)
        .otherwise(lit(null).cast(strippedType(at)))
    case _ => c
  }
}
