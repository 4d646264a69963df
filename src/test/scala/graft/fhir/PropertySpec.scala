package graft.fhir

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3 — property-based tests over random FHIR-ish resources:
  * lossless round-trip (README.md:11-13), merge soundness (README.md:20-22),
  * range containment (README.md:316-330), MinHash Jaccard error bounds.
  * (scalatestplus is not in the offline cache, so generators are driven by
  * seeded sampling rather than the forAll trait — fully deterministic.)
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // strict mapper: floats as BigDecimal so 36.50 ≠ 36.5 in tree compare
  private val mapper = new ObjectMapper()
    .enable(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS)

  // --- generators for FHIR-ish JSON ---

  private val genName: Gen[String] = Gen.oneOf(
    "status", "valueString", "code", "display", "note", "category", "unit")
  private val genDecimalText: Gen[String] = for {
    i <- Gen.choose(0, 9999)
    scale <- Gen.choose(1, 6)
    frac <- Gen.listOfN(scale, Gen.numChar).map(_.mkString)
  } yield s"$i.$frac"
  private val genDate: Gen[String] = for {
    y <- Gen.choose(1950, 2025); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
  } yield f"$y%04d-$m%02d-$d%02d"

  private def quote(s: String) = "\"" + s.replaceAll("[\\\\\"]", "") + "\""

  /** One random resource as a JSON string (flat + one nested struct + one
    * array, decimals as raw number tokens).
    */
  private val genResource: Gen[String] = for {
    id <- Gen.identifier.map(_.take(12))
    dec <- genDecimalText
    date <- genDate
    n <- Gen.choose(-1000, 1000)
    b <- Gen.oneOf(true, false)
    tag1 <- genName; tag2 <- genName
    extra <- genName
  } yield s"""{"resourceType":"Observation","id":${quote(id)},""" +
    s""""valueQuantity":{"value":$dec,"unit":"mg"},""" +
    s""""effectiveDateTime":${quote(date)},"sequence":$n,"active":$b,""" +
    s""""category":[${quote(tag1)},${quote(tag2)}],"note":${quote(extra)}}"""

  test("property: decode(encode(x)) reproduces the JSON tree, decimals exact") {
    import spark.implicits._
    val docs = samples(genResource, 40).toList
    val ds = spark.createDataset(docs)
    val schema = FhirSchema.deriveSchema(spark, ds)
    val back = FhirCodec.decode(FhirCodec.encode(spark, ds, schema)).collect()
    assert(back.length == docs.length)
    val wanted = docs.map(mapper.readTree).map(t => t.get("id").asText() -> t).toMap
    back.foreach { j =>
      val tree = mapper.readTree(j)
      val orig = wanted(tree.get("id").asText())
      assert(tree == orig, s"round-trip drift:\n  in:  $orig\n  out: $tree")
    }
  }

  test("property: derive(a ++ b) == merge(derive(a), derive(b))") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val a = samples(genResource, 5).toList
      val b = (1 to 5).flatMap(i =>
        genResource.apply(Gen.Parameters.default, Seed(trial * 100L + i))).toList
      val da = FhirSchema.deriveSchema(spark, spark.createDataset(a))
      val db = FhirSchema.deriveSchema(spark, spark.createDataset(b))
      val direct = FhirSchema.deriveSchema(spark, spark.createDataset(a ++ b))
      // compare field names/types (nullability of resourceType identical)
      assert(FhirSchema.mergeSchemas(Seq(da, db)).sql == direct.sql)
    }
  }

  test("property: range annotation contains every instant the value denotes") {
    val genPartial: Gen[String] = Gen.oneOf(
      Gen.choose(1950, 2025).map(_.toString),
      for { y <- Gen.choose(1950, 2025); m <- Gen.choose(1, 12) } yield f"$y%04d-$m%02d",
      genDate,
      for { d <- genDate; h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59) }
        yield f"${d}T$h%02d:$mi%02d:30+10:00")
    samples(genPartial, 200).foreach { s =>
      val Some((lo, hi)) = FhirAnnotations.bounds(s)
      assert(lo <= hi)
      // the start instant itself must round-trip: a fully-specified instant
      // inside the value's range stays within [lo, hi]
      val mid = lo + (hi - lo) / 2
      assert(lo <= mid && mid <= hi)
      // bounds are ms-aligned (spec: millisecond precision): start on a
      // whole second, end on .999 (floorMod: pre-1970 micros are negative)
      assert(Math.floorMod(lo, 1000000L) == 0, s"$s start not second-aligned: $lo")
      assert(Math.floorMod(hi, 1000000L) == 999000, s"$s end not .999-aligned: $hi")
    }
  }

  test("property: MinHash Jaccard estimate within statistical error bound") {
    import graft.udx.Udx
    val rnd = new scala.util.Random(7)
    var totalErr = 0.0
    val trials = 30
    for (_ <- 1 to trials) {
      val base = (1 to 200).map(_ => rnd.nextLong()).toArray
      val keep = rnd.nextDouble() * 0.8 + 0.1
      val a = base.filter(_ => rnd.nextDouble() < 0.9)
      val b = base.filter(_ => rnd.nextDouble() < keep)
      val trueJ = (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
      val sa = a.foldLeft(Udx.MinHashSig.zero)(Udx.MinHashSig.reduce)
      val sb = b.foldLeft(Udx.MinHashSig.zero)(Udx.MinHashSig.reduce)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
      totalErr += math.abs(est - trueJ)
    }
    val meanErr = totalErr / trials
    // 64 permutations → σ ≈ sqrt(j(1-j)/64) ≤ 0.0625; mean |err| must sit
    // well inside a few sigma
    assert(meanErr < 0.08, f"mean MinHash estimate error $meanErr%.3f")
  }
}
