package graft.plans

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{GenSampling, TestSpark}
import graft.operators.Dedup

/** Property: the native one-pass signature expressions equal their
  * SQL-formulation references on ARBITRARY text — including unicode
  * (multi-byte UTF-8 words, so the byte-level space split and md5 inputs
  * are exercised beyond ASCII), empty tokens from consecutive/leading/
  * trailing spaces, single words, and the empty string.
  */
class SignatureEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("é", "über", "中文词", "ελληνικά", "🦊", "naïve", "word", ""))
  private val text: Gen[String] = for {
    n  <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
    pre  <- Gen.oneOf("", " ")
    post <- Gen.oneOf("", " ")
  } yield pre + ws.mkString(" ") + post

  private def sampleDf(n: Int) = {
    val rows = {
      val it = Iterator.continually(text.sample).flatten.take(n).toVector
      // pin the hard edges in every run
      it ++ Vector("", " ", "  ", "one", "a b", "é 中文词 é 中文词 🦊")
    }
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("MinHashExpr equals the conv(md5)-based min-aggregation on arbitrary unicode text") {
    val df = sampleDf(60).cache()
    val h = df
      .select(col("doc_id"), explode(Dedup.shingles3(col("text"))).as("s"))
      .select(
        col("doc_id"),
        conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("s")), 13, 12), 16, 10).cast("long").as("h2"))
    val minAggs = (0 until 8).map(k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % lit(Dedup.MinhashMod)).as(s"m$k"))
    val reference = h.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), array((0 until 8).map(k => col(s"m$k")): _*).as("m"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = df.select(col("doc_id"), MinHashExpr(col("text"), 8).as("m"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native === reference)
  }

  test("SimHashExpr equals the conv(md5)-based bit-majority on arbitrary unicode text") {
    val df = sampleDf(60).cache()
    val bitSums = (0 until 32).map(j =>
      sum(when(shiftrightunsigned(col("h"), j) % 2 === 1, lit(1L)).otherwise(lit(-1L))).as(s"s$j"))
    val reference = df
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
      .withColumn("h", Dedup.md5Long(col("word"), 8))
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val native = df.select(col("doc_id"), SimHashExpr(col("text")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(native === reference)
  }

  test("WordShingles equals split-based shingling on arbitrary unicode text") {
    GenSampling.forAllSampled(text, n = 25) { t =>
      val expected = {
        val ws = t.split(" ", -1)
        if (ws.length < 3) Seq(t) else ws.sliding(3).map(_.mkString(" ")).toSeq
      }
      val got = Seq(Tuple1(t)).toDF("t")
        .select(WordShingles($"t", 3).as("s")).as[Seq[String]].collect()(0)
      assert(got === expected, s"text=<$t>")
    }
  }
}
