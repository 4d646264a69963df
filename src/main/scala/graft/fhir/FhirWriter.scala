package graft.fhir

import org.apache.spark.sql.DataFrame

/** Spec-conformant parquet writer (SURVEY §7.5).
  *
  * `strictParquetTypes = true` emits timestamp annotation columns as the
  * spec's `int96` physical type (reference README.md:329-330) via Spark's
  * `spark.sql.parquet.outputTimestampType=INT96`; the default mode keeps
  * Spark-native TIMESTAMP_MICROS (INT64), which every modern reader
  * prefers.
  *
  * Documented deviations that the flag cannot close (README.md:76,79):
  * Spark has no writer path for unsigned INT(32,false) logical types, so
  * FHIR positiveInt/unsignedInt stay INT(32,true) — value-identical for
  * the legal FHIR ranges (0..2^31-1), type-annotation different; and the
  * spec's ms-precision TIMESTAMP logical annotation is carried at µs
  * granularity inside INT96 (INT96 has no logical annotation at all, which
  * is also how the spec's own int96 examples read back).
  */
object FhirWriter {

  def write(df: DataFrame, path: String, strictParquetTypes: Boolean = false): Unit = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = conf.get(key)
    try {
      conf.set(key, if (strictParquetTypes) "INT96" else "TIMESTAMP_MICROS")
      df.write.mode("overwrite").parquet(path)
    } finally conf.set(key, prev)
  }
}
