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

  test("keeper policies keep one doc per cluster: totals equal, quality keeper can differ") {
    // cluster {1, 2, 3}: 1 and 2 identical, 3 a longer near-dup with more
    // words → higher quality score → quality policy keeps 3, min-id keeps 1
    val base = "the quick brown fox jumps over the lazy dog and runs far today"
    val docs = Seq(
      (1L, base, "A"),
      (2L, base, "B"),
      (3L, base + " with many more trailing words of fine text here", "C"),
      (4L, "a completely unrelated document about other things entirely", "D")
    ).toDF("doc_id", "text", "source")
    val rows = Curation.keeperPolicyComparison(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // every source has 1 doc; doc 4 untouched by dedup
    assert(rows("D") === ((1L, 1L, 1L)))
    val totalMin = rows.values.map(_._2).sum
    val totalQ = rows.values.map(_._3).sum
    assert(totalMin === totalQ) // one keeper per cluster under either policy
    if (rows("A")._2 == 1L && rows("C")._2 == 0L) {
      // {1,2,3} clustered together: min-id keeps A's doc, quality keeps C's
      assert(rows("C")._3 === 1L && rows("A")._3 === 0L)
    }
  }
}
