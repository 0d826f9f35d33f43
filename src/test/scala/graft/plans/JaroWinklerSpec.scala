package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values (the published worked examples)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    // transposed pair below the window: no matches at all
    assert(jw("ab", "ba") === 0.0)
  }

  test("empty strings score 0, identical strings score 1") {
    assert(jw("", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
  }

  test("winkler boost: strict 0.7 threshold and prefix cap 4") {
    // common prefix 2 but jaro 0.5 — below threshold, no boost applied
    assert(jw("abcdefgh", "abzzzzzz") === 0.5)
    // common prefix 9 capped at 4: jaro 14/15, jw = jaro + 0.4·(1−jaro)
    val jaro = (9.0 / 10 + 9.0 / 10 + 9.0 / 9) / 3.0
    assert(jw("aaaaaaaaaa", "aaaaaaaaab") === jaro + (4 * 0.1) * (1.0 - jaro))
  }

  test("prefix-3 association order: (p·0.1) first, matching the oracle engine") {
    // 3·0.1 ≠ 0.3 exactly — the two association orders differ in the last
    // ulp; DuckDB (and therefore the q310 oracle) computes (p·0.1)·(1−sim)
    val sim = jw("pqrxy", "pqryx")
    val jaro = (5.0 / 5 + 5.0 / 5 + 4.0 / 5) / 3.0
    assert(sim === jaro + (3 * 0.1) * (1.0 - jaro))
  }

  test("symmetry over a corpus sample (codegen path via DataFrame)") {
    val pairs = Seq(("small ring", "smal ring"), ("red widget", "red widgte"),
      ("blue bolt", "blue blot"), ("cold gizmo", "old gizmo"))
    val df = pairs.toDF("a", "b")
    val fwd = df.select(JaroWinkler(col("a"), col("b"))).as[Double].collect()
    val rev = df.select(JaroWinkler(col("b"), col("a"))).as[Double].collect()
    assert(fwd.toSeq === rev.toSeq)
    assert(fwd.forall(v => v > 0.8 && v < 1.0))
  }

  test("interpreted eval equals codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val e = JaroWinkler(
      Literal(UTF8String.fromString("MARTHA"), StringType),
      Literal(UTF8String.fromString("MARHTA"), StringType))
    val viaDf = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).as[Double].collect()(0)
    assert(e.eval(null) === viaDf)
  }

  test("SQL registration via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS s")
      .as[Double].collect()(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-15)
  }

  test("null input yields null") {
    val got = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).collect()(0)
    assert(got.isNullAt(0))
  }
}
