ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetonfhirspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the full bench holds 150+ queries' codegen classes,
  // broadcasts and stream-checkpoint residue in one JVM — at 8g the tail
  // of the run was GC-bound, inflating timings unrelated to plan quality.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON. sbt's default forked-run output strategy prefixes every program
// line with "[info] " and appends its own "[success] Total time" line —
// both of which defeat a plain json.loads on the tail (BENCH_r01–r14 all
// landed parsed:null). StdoutOutput inherits the parent stdout (no prefix);
// showSuccess=false drops the trailing sbt line, so the bench's one-line
// total JSON is the genuine last line of the process output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys += showSuccess
ThisBuild / showSuccess := false
