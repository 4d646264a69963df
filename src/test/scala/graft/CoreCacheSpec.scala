package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the round-15 read-cache eviction discipline (round-14 advisor
  * finding): fingerprint-keyed entries for a (session, dir, table) — and
  * staged-artifact entries for a (session, dataDir) — must be SUPERSEDED on
  * regeneration, not accumulated, while still serving fresh data.
  */
class CoreCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def entriesFor(pred: String => Boolean): Int = {
    import scala.jdk.CollectionConverters._
    Tables.readCache.keySet.asScala.count(k => pred(k._2))
  }

  test("Tables.t: in-place regeneration serves fresh data and evicts the stale entry") {
    val sp2 = spark
    import sp2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_spec").toString
    def regen(rows: Seq[Long]): Unit = {
      rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(s"$dir/tbl.parquet")
      // fingerprint uses (name, size, mtime); force a distinct mtime so a
      // same-millisecond rewrite cannot alias the previous generation
      val f = new java.io.File(s"$dir/tbl.parquet")
      f.listFiles().foreach(p => p.setLastModified(p.lastModified() + 2000))
    }
    regen(Seq(1L, 2L, 3L))
    assert(Tables.t(spark, dir, "tbl").count() == 3)
    val after1 = entriesFor(k => k.startsWith(dir + "|") && k.endsWith("#tbl"))
    regen(Seq(1L, 2L, 3L, 4L, 5L))
    assert(Tables.t(spark, dir, "tbl").count() == 5, "stale listing served after in-place regen")
    val after2 = entriesFor(k => k.startsWith(dir + "|") && k.endsWith("#tbl"))
    assert(after1 == 1 && after2 == 1,
      s"superseded fingerprint entry must be evicted, not accumulated: $after1 -> $after2")
  }

  test("Tables.staged: marker-fingerprint change evicts the superseded reader") {
    val sp2 = spark
    import sp2.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("graft_staged_spec").toString + "/data"
    Seq(10L).toDF("v").write.mode("overwrite").parquet(dataDir)
    assert(Tables.staged(spark, dataDir, "fpA").count() == 1)
    Seq(10L, 11L).toDF("v").write.mode("overwrite").parquet(dataDir)
    assert(Tables.staged(spark, dataDir, "fpB").count() == 2, "stale staged reader served")
    val n = entriesFor(k => k.startsWith(dataDir + "@"))
    assert(n == 1, s"superseded staged entry must be evicted: $n entries for $dataDir")
    // same fingerprint hits the cache (no re-read): the SAME DataFrame object
    assert(Tables.staged(spark, dataDir, "fpB") eq Tables.staged(spark, dataDir, "fpB"))
  }
}
