package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distinctive vocabularies classify to the diagonal") {
    val docs = Seq(
      (1L, "apple banana apple", "fruit"),
      (2L, "banana apple banana", "fruit"),
      (3L, "gear piston gear engine", "machine"),
      (4L, "piston engine piston", "machine"))
      .toDF("doc_id", "text", "source")
    val cm = NaiveBayes.sourceAttribution(docs, "doc_id", "text", "source")
      .as[(String, String, Long)].collect().toSet
    assert(cm === Set(("fruit", "fruit", 2L), ("machine", "machine", 2L)))
  }

  test("a doc whose tokens dominate in another label crosses the diagonal") {
    // Doc 4 says "aa bb" but is labeled small; "aa"/"bb" occur 3× each in
    // big vs 1× in small and big's prior is 3/4 — big must win doc 4.
    val docs = Seq(
      (1L, "aa bb", "big"),
      (2L, "aa bb", "big"),
      (3L, "aa bb", "big"),
      (4L, "aa bb", "small"))
      .toDF("doc_id", "text", "source")
    val cm = NaiveBayes.sourceAttribution(docs, "doc_id", "text", "source")
      .as[(String, String, Long)].collect()
      .map { case (a, p, n) => (a, p) -> n }.toMap
    assert(cm === Map(("big", "big") -> 3L, ("small", "big") -> 1L))
  }

  test("null-text docs are excluded, not crashed on") {
    val docs = Seq(
      (1L, "x y z", "a"),
      (2L, null.asInstanceOf[String], "b"))
      .toDF("doc_id", "text", "source")
    val cm = NaiveBayes.sourceAttribution(docs, "doc_id", "text", "source").collect()
    assert(cm.map(_.getLong(2)).sum === 1L)
  }
}
