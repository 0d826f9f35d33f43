package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "vector vector vector search index"),       // tf(vector)=3, len 5
    (2L, "vector search over a stream of updates"),  // tf(vector)=1 tf(stream)=1, len 7
    (3L, "filter filter filter filter filter"),      // tf(filter)=5, len 5
    (4L, "plain prose with no query words at all"),  // no terms, len 8
    (5L, "vector stream filter"),                    // all three, len 3
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private val terms = Seq("vector", "stream", "filter")

  test("bm25: docs without query terms are absent; n_terms counts matched terms") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms)
      .select("doc_id", "n_terms").as[(Long, Long)].collect().toMap
    assert(!got.contains(4L) && !got.contains(6L))
    assert(got(5L) === 3L && got(2L) === 2L && got(1L) === 1L && got(3L) === 1L)
  }

  test("bm25: higher tf at equal length scores higher; all scores positive") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(got.values.forall(_ > 0.0))
    // docs 1 and 3 have equal length; filter is rarer (df 2 vs 3) and has
    // higher tf (5 vs 3), so doc 3 must outscore doc 1
    assert(got(3L) > got(1L))
    // doc 5 matches all three terms and is shortest → must beat doc 2
    assert(got(5L) > got(2L))
  }

  test("bm25: partition-count invariant (integer micro scores commute)") {
    val base = Retrieval.bm25TopK(docs, "doc_id", "text", terms)
      .as[(Long, Long, Double)].collect().toSeq
    val reparted = Retrieval.bm25TopK(docs.repartition(7), "doc_id", "text", terms)
      .as[(Long, Long, Double)].collect().toSeq
    assert(base === reparted)
  }

  test("bm25: k limits the result") {
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 2).count() === 2L)
  }

  test("rrfFuse: union semantics, exact nano contributions, absent rank reported as 0") {
    val sparse = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val dense = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(sparse, dense, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // 1e9/61 = 16393443 (rounded), 1e9/62 = 16129032
    assert(got === Seq(
      (2L, 2L, 1L, 16129032L + 16393443L), // in both rankings → top
      (1L, 1L, 0L, 16393443L),
      (3L, 0L, 2L, 16129032L)))
  }
}
