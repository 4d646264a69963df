package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 is one QueryDef registered here;
  * oracle-capable ones also publish equivalent DuckDB SQL. Keys are stable —
  * the driver's correctness gate (CORRECTNESS_r{N}.json) is keyed on them.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    rel.Scans.defs ++
      rel.Joins.defs ++
      rel.Aggs.defs ++
      rel.Windows.defs ++
      rel.Funcs.defs ++
      rel.Scale.defs ++
      rel.Formats.defs ++
      rel.Behavior.defs ++
      rel.Advanced.defs ++
      rel.Analytics.defs ++
      udx.Udx.defs ++
      udx.TypedOps.defs ++
      llm.Llm.defs ++
      llm.Ivf.defs ++
      llm.Pca.defs ++
      llm.Pipeline.defs ++
      llm.Corpus.defs ++
      llm.Multimodal.defs ++
      fhir.FhirQueries.defs ++
      stream.Streams.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style scan + hash aggregate (SURVEY §2 E1 / §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.key == "agg_hash_group").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.key -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.key -> sql)).toMap
}
