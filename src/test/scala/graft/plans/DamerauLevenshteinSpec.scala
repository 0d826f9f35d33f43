package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark

class DamerauLevenshteinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dl(a: String, b: String): Long =
    DamerauLevenshtein.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("unrestricted variant: a transposed pair may be edited again (CA→ABC = 2)") {
    // optimal string alignment would give 3; true DL gives 2
    assert(dl("CA", "ABC") === 2L)
    assert(dl("ABC", "CA") === 2L)
  }

  test("adjacent transpositions cost 1") {
    assert(dl("ab", "ba") === 1L)
    assert(dl("abc", "acb") === 1L)
    assert(dl("abcdef", "abcfed") === 2L) // swap + substitution chain
  }

  test("reduces to Levenshtein without transpositions") {
    assert(dl("kitten", "sitting") === 3L)
    assert(dl("", "abc") === 3L)
    assert(dl("abc", "") === 3L)
    assert(dl("same", "same") === 0L)
  }

  test("symmetry and triangle sanity on a sample (codegen path via DataFrame)") {
    val pairs = Seq(("red anvil", "red ring"), ("cold widget", "old widget"),
      ("small ring", "smal ring"), ("blue bolt", "bolt blue"))
    val df = pairs.toDF("a", "b")
    val fwd = df.select(DamerauLevenshtein(col("a"), col("b"))).as[Long].collect()
    val rev = df.select(DamerauLevenshtein(col("b"), col("a"))).as[Long].collect()
    assert(fwd.toSeq === rev.toSeq)
    // DL never exceeds plain Levenshtein
    val lev = df.select(org.apache.spark.sql.functions
      .levenshtein(col("a"), col("b")).cast("long")).as[Long].collect()
    assert(fwd.zip(lev).forall { case (d, l) => d <= l })
  }

  test("SQL registration via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_damerau_levenshtein('CA', 'ABC') AS d")
      .as[Long].collect()(0)
    assert(got === 2L)
  }

  test("null input yields null") {
    val got = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
      .select(DamerauLevenshtein(col("a"), col("b"))).collect()(0)
    assert(got.isNullAt(0))
  }
}
