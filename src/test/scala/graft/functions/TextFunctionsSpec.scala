package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("polyFingerprint matches the closed-form fold") {
    val got = Seq("ab").toDF("t")
      .select(TextFunctions.polyFingerprint(col("t"))).as[Long].collect()(0)
    assert(got === (97L * 31 + 98) % 1000000007L)
  }

  test("countMarker counts non-overlapping word hits") {
    val got = Seq(" the cat and the dog ").toDF("t")
      .select(TextFunctions.countMarker(col("t"), " the ")).as[Long].collect()(0)
    assert(got === 2L)
  }

  test("wordCount and bpeEstimate") {
    val r = Seq("one two three").toDF("t")
      .select(
        TextFunctions.wordCount(col("t")),
        TextFunctions.bpeEstimate(col("t")))
      .as[(Long, Long)].collect()(0)
    assert(r === ((3L, 4L))) // 13 bytes / 4 → ceil 4
  }

  test("predictedLang prefers en on full tie") {
    val scores = TextFunctions.langScores(col("t"))
    val named  = scores.map { case (l, c) => c.as(s"s_$l") }
    val got = Seq("nothing matches here").toDF("t")
      .select(named: _*)
      .withColumn("p", TextFunctions.predictedLang(col("s_en"), col("s_fr"), col("s_de"), col("s_es")))
      .select("p").as[String].collect()(0)
    assert(got === "en")
  }

  test("qualityScore stays in (0, 1]") {
    val s = Seq(("w " * 300).trim, "a", "one. two, three.").toDF("t")
      .select(TextFunctions.qualityScore(
        TextFunctions.wordCount(col("t")),
        TextFunctions.countMarker(col("t"), " the "),
        TextFunctions.punctCount(col("t")))).as[Double].collect()
    assert(s.forall(x => x > 0.0 && x <= 1.0))
  }
}
