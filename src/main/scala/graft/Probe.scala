package graft
import org.apache.spark.sql.SparkSession

/** Scratch timing probe (not part of the driver contract): runs the named
  * query keys N times each in ONE JVM and prints every iteration, so
  * cold-page effects (snapshot-restored VM) can be separated from steady
  * state. Usage: runMain graft.Probe <sfDir> <n> <key...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val keys = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Same scratch posture as Bench so probe numbers are comparable, but
    // PID-suffixed: Probe launched while a Bench run is in flight must not
    // delete the live spark.local.dir out from under it.
    val scratch = s"/dev/shm/graft_probe_scratch_${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    new java.io.File(scratch).mkdirs()
    sys.props("java.io.tmpdir") = scratch
    val spark = SparkSession.builder()
      .config("spark.local.dir", scratch)
      .withExtensions(graft.opt.AnnotationRewrite.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(k)(spark, sfDir).count()
        println(f"[probe] $k#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
    }
    spark.stop()
    // PID-suffixed dirs would otherwise accumulate in /dev/shm across runs.
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
  }
}
