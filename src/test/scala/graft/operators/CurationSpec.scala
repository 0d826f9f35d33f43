package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("funnel counts input, quality-passing, and post-dedup survivors per group") {
    val long  = ("the quick brown fox jumps over the lazy dog and runs far " * 8).trim
    val other = ("a small bird sits on a tall tree of green leaves today " * 8).trim
    val docs = Seq(
      (1L, long, "en"),   // passes quality; duplicated by 2
      (2L, long, "en"),   // near-dup loser (higher id)
      (3L, "tiny", "en"), // fails quality (1 word, no stopwords)
      (4L, other, "fr")   // passes, textually unrelated → survives
    ).toDF("doc_id", "text", "lang")
    val got = Curation.funnel(docs, "doc_id", "text", "lang", qualityThreshold = 0.3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("en", 3L, 2L, 1L), ("fr", 1L, 1L, 1L)))
  }
}
