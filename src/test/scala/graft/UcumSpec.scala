package graft

import graft.fhir.{FhirAnnotations, UcumGrammar}
import org.scalatest.funsuite.AnyFunSuite

/** UCUM grammar parser: worked examples over the full expression grammar,
  * consistency with the curated conversion table it generalizes, and
  * coverage of every quantity code in the golden Observation data.
  */
class UcumSpec extends AnyFunSuite {

  private def canon(code: String): (String, Double, Double) =
    UcumGrammar.canonical(code).getOrElse(fail(s"'$code' did not parse"))

  test("grammar: prefixes, exponents, quotients, powers, annotations") {
    assert(canon("fL") == ("L", 1e-15, 0.0))
    assert(canon("pg") == ("g", 1e-12, 0.0))
    assert(canon("kg") == ("g", 1000.0, 0.0))
    assert(canon("10*3/uL") == ("/L", 1e9, 0.0))
    assert(canon("10*6/uL") == ("/L", 1e12, 0.0))
    assert(canon("kg/m2") == ("g.m-2", 1000.0, 0.0))
    assert(canon("{score}") == ("1", 1.0, 0.0))
    assert(canon("%") == ("1", 0.01, 0.0))
    // derived-unit recomposition: kg·m/s² IS the newton
    assert(canon("kg.m/s2") == ("N", 1.0, 0.0))
    // parenthesized quotient ≡ flat quotient
    assert(canon("kg/(m.s2)") == canon("kg/m/s2"))
    // dimensionless mass ratio
    assert(canon("mg/kg") == ("1", 1e-6, 0.0))
    // systematic fallback rendering for an alias-less dimension
    val (kmh, f, _) = canon("km/h")
    assert(kmh == "m.s-1" && math.abs(f - 1000.0 / 3600.0) < 1e-12)
    // annotation suffixed to a unit is dimensionless glue
    assert(canon("mg{total}") == ("g", 0.001, 0.0))
    // unknown atom and dangling operator must NOT parse
    assert(UcumGrammar.canonical("furlong").isEmpty)
    assert(UcumGrammar.canonical("mg/").isEmpty)
  }

  test("grammar: temperature offsets only on the lone units") {
    val (cc, cf, co) = canon("Cel")
    assert(cc == "K" && cf == 1.0 && co == 273.15)
    val (fc, ff, fo) = canon("[degF]")
    assert(fc == "K" && math.abs(ff - 5.0 / 9.0) < 1e-12 &&
      math.abs(fo - 459.67 * 5.0 / 9.0) < 1e-9)
    // inside a compound the offset is meaningless and must be dropped
    val (_, _, off) = canon("Cel/min")
    assert(off == 0.0)
  }

  test("grammar reproduces the curated clinical table (6 dp approximations)") {
    FhirAnnotations.ucumTable.foreach { case (code, fS, oS, curCanon) =>
      val (cc, cf, co) = canon(code)
      assert(cc == curCanon, s"$code: canon $cc != curated $curCanon")
      val (curF, curO) = (fS.toDouble, oS.toDouble)
      val tolF = math.max(5e-7, 5e-7 * math.abs(curF))
      assert(math.abs(cf - curF) <= tolF,
        s"$code: factor $cf vs curated $curF (6 dp)")
      assert(math.abs(co - curO) <= 5e-7, s"$code: offset $co vs curated $curO")
    }
  }

  test("every golden Observation quantity code is in the parsed vocabulary") {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.functions.col
    val codes = Tables.golden(spark, "Observation")
      .where(col("valueQuantity.value").isNotNull)
      .select(col("valueQuantity.code")).distinct()
      .collect().map(_.getString(0)).toSet
    val vocab = UcumGrammar.vocabTable.map(_._1).toSet
    assert(codes.subsetOf(vocab),
      s"golden codes missing from vocabulary: ${codes -- vocab}")
    // and the whole vocabulary parses (vocabTable drops failures silently)
    assert(UcumGrammar.vocabTable.size == UcumGrammar.vocabulary.size,
      s"unparsed vocabulary entries: ${
        UcumGrammar.vocabulary.toSet -- UcumGrammar.vocabTable.map(_._1).toSet}")
  }

  test("fhir_ucum_grammar_canonical: vocabulary broadcasts; golden rows all convert") {
    val spark = SparkTestBase.spark
    val df = SparkEntry.queries("fhir_ucum_grammar_canonical")(spark, SparkTestBase.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // every value-bearing golden row joins a vocabulary code — the grammar
    // covers codes the curated table leaves unconverted
    import org.apache.spark.sql.functions.col
    val total = Tables.golden(spark, "Observation")
      .where(col("valueQuantity.value").isNotNull).count()
    assert(df.count() == total, "grammar canonicalization dropped golden rows")
  }
}
