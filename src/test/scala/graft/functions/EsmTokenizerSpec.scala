package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.GenSampling.forAllSampled

/** F2 invariants (SURVEY.md §5.3): fixed length, cls prefix, single eos,
  * pad suffix, HF-style truncation — no Spark needed (pure function), plus
  * one UDF round-trip.
  */
class EsmTokenizerSpec extends AnyFunSuite {
  import EsmTokenizer._

  test("golden: LAG at max_length 10") {
    assert(tokenize("LAG", 10).toSeq === Seq(0, 4, 5, 6, 2, 1, 1, 1, 1, 1))
  }

  test("unknown characters map to <unk>") {
    assert(tokenize("LJ", 6).toSeq === Seq(ClsId, 4, UnkId, EosId, PadId, PadId))
  }

  test("truncation keeps cls + first maxLen-2 chars + eos") {
    val t = tokenize("LLLLLLLLLL", 6) // 10 chars, room for 4
    assert(t.toSeq === Seq(ClsId, 4, 4, 4, 4, EosId))
  }

  private val aminoGen = Gen.stringOf(Gen.oneOf("LAGVSERTIDPKQNFYMHWCXBUZO.-J*z "))

  test("property: length, cls, single eos, pad-only suffix") {
    forAllSampled(Gen.zip(aminoGen, Gen.choose(4, 40)), 50) { case (s, maxLen) =>
      val t = tokenize(s, maxLen)
      assert(t.length === maxLen)
      assert(t.head === ClsId)
      assert(t.count(_ == EosId) === 1)
      val eosIdx = t.indexOf(EosId)
      assert(t.drop(eosIdx + 1).forall(_ == PadId))
      assert(t.slice(1, eosIdx).forall(id => id != PadId && id != ClsId && id != EosId))
      assert(eosIdx === math.min(s.length, maxLen - 2) + 1)
    }
  }

  test("UDF round-trip over a DataFrame") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq("LAG", "XX").toDF("seq")
      .select(tokenizeUdf(8)(col("seq")).as("tokens"))
      .as[Seq[Int]].collect()
    assert(got(0) === Seq(0, 4, 5, 6, 2, 1, 1, 1))
    assert(got(1) === Seq(0, 24, 24, 2, 1, 1, 1, 1))
  }

  test("native expression equals the UDF, including nulls and SQL registration") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Some("LAG"), Some("XXJ"), None).toDF("seq")
    val both = df.select(
      tokenizeCol(col("seq"), 8).as("native"),
      tokenizeUdf(8)(col("seq")).as("viaUdf"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_esm_tokenize('LAG', 8) AS t").as[Seq[Int]].collect()(0)
    assert(viaSql === Seq(0, 4, 5, 6, 2, 1, 1, 1))
  }
}
