package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Null propagation of the four custom Catalyst expressions: a null input
  * must yield a null output (never a crash or a phantom value) in BOTH the
  * interpreted and the whole-stage-codegen paths — library users will feed
  * tables with null text/embeddings even though the harness tables don't.
  */
class NullSafetySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def textDf = Seq(Some("a b c d"), None).toDF("t")

  test("WordShingles: null text -> null array") {
    val got = textDf.select(WordShingles($"t", 3).as("s")).collect()
    assert(got(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(got(1).isNullAt(0))
  }

  test("RollingHash: null text -> null hash") {
    val got = textDf.select(RollingHash($"t").as("h")).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
  }

  test("EsmTokenizeExpr: null sequence -> null tokens") {
    val got = textDf.select(EsmTokenizeExpr($"t", 8).as("tok")).collect()
    assert(got(0).getSeq[Int](0).head === 0) // <cls>
    assert(got(1).isNullAt(0))
  }

  test("all five expressions are reachable from plain SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_rolling_hash('ab') AS h,
        |       graft_esm_tokenize('MK', 6) AS t,
        |       graft_word_shingles('a b c d', 2) AS s,
        |       graft_vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       graft_simhash('the quick fox') AS sh""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) != 0L)
    assert(r.getSeq[Int](1).head === 0)
    assert(r.getSeq[String](2) === Seq("a b", "b c", "c d"))
    assert(r.getDouble(3) === 11.0)
    assert(r.getLong(4) != 0L)
  }

  test("SimHashExpr: null text -> null hash") {
    val got = textDf.select(SimHashExpr($"t").as("h")).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
  }

  test("MinHashExpr: null text -> null signature; SQL-registered") {
    val got = textDf.select(MinHashExpr($"t", 8).as("m")).collect()
    assert(got(0).getSeq[Long](0).length === 8)
    assert(got(1).isNullAt(0))
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_minhash('a b c d', 8) AS m")
      .collect()(0).getSeq[Long](0).length === 8)
  }

  test("VecDot: null on either side -> null") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(3.0f, 4.0f))),
      (Some(Seq(1.0f, 2.0f)), None)
    ).toDF("a", "b")
    val got = df.select(VecDot($"a", $"b").as("d")).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
  }
}
