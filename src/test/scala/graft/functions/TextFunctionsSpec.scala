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

  test("gopherFlags: each rule trips on its own pathology") {
    val good = "the quick brown fox jumps over a lazy dog of the meadow every day"
    val docs = Seq(
      ("good", good),                                      // passes all six
      ("short", "the a of"),                               // r_wordcount (3 words)
      ("longwords", ("the a of " + Array.fill(12)("pneumonoultramicroscopics").mkString(" ")) + " xx"), // r_meanlen (mean > 10)
      ("symbols", "the a of " + Array.fill(40)("### $$$ %%%").mkString(" ")),   // r_alpha
      ("nostop", "quick brown fox jumps over lazy dog near green meadow"),     // r_stopwords (0 hits)
      ("repeat", "the a of " + Array.fill(40)("buy").mkString(" ")),            // r_repetition + r_distinct
    ).toDF("tag", "text")
    val flags = TextFunctions.gopherFlags(docs, "text")
      .select("tag", "r_wordcount", "r_meanlen", "r_alpha", "r_stopwords", "r_repetition", "r_distinct")
      .as[(String, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7)).toMap
    assert(flags("good") === ((true, true, true, true, true, true)))
    assert(!flags("short")._1)
    assert(flags("longwords") match { case (_, m, _, _, _, _) => !m })
    assert(!flags("symbols")._3)
    assert(!flags("nostop")._4)
    assert(!flags("repeat")._5 && !flags("repeat")._6)
  }

  test("gopherFlags: null text yields null flags, not false") {
    val docs = Seq((1, null: String)).toDF("id", "text")
    val r = TextFunctions.gopherFlags(docs, "text")
      .select(col("r_wordcount").isNull, col("r_repetition").isNull)
      .as[(Boolean, Boolean)].collect()(0)
    assert(r === ((true, true)))
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
