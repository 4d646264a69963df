package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `runMain graft.PlanDump <key> [<key>…]` prints
  * each key's EXECUTED physical plan (post-AQE, after one collect) at
  * sf0.01 — the fast loop for checking a new operator's plan shape before
  * pinning it in PlanSpec / PLANS.md (which cover the curated headline set).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- args) {
      println(s"======== $k ========")
      val df = SparkEntry.queries(k)(spark, "/root/testdata/sf0.01")
      df.collect() // materialize so AQE finalizes every stage
      println(df.queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
