package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Dedup

/** Streaming dedup-on-arrival ≡ batch: streaming a corpus through
  * `DocStream.dedupOnArrival` in two separate runs (two arrival chunks)
  * must emit exactly the candidate-pair set the batch
  * `Dedup.minhashCandidates` finds on the full corpus — old-vs-new pairs
  * from the store join, new-vs-new from the batch self-join, nothing
  * twice.
  */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two-chunk streaming arrival emits exactly the full-corpus candidate pairs") {
    val root = Files.createTempDirectory("graft_docstream").toString
    val (in, ck, store, pairs) = (s"$root/in", s"$root/ck", s"$root/store", s"$root/pairs")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id", "text")

    // chunk 1 arrives, first run drains it
    docs.filter("doc_id % 2 = 0").write.parquet(in)
    DocStream.dedupOnArrival(spark, in, docs.schema, ck, store, pairs)
    val afterFirst = DocStream.emittedPairs(spark, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // chunk 2 arrives, second run picks up ONLY the delta
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(in)
    DocStream.dedupOnArrival(spark, in, docs.schema, ck, store, pairs)
    val afterSecond = DocStream.emittedPairs(spark, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val full = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val evenOnly = Dedup.minhashCandidates(docs.filter("doc_id % 2 = 0"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(afterFirst === evenOnly, "first run must find exactly the even-chunk pairs")
    assert(afterSecond === full, "after both chunks the union must equal the batch result")
    assert((afterSecond -- afterFirst).forall { case (a, b) => a % 2 == 1 || b % 2 == 1 },
      "second run must only add pairs involving a chunk-2 doc")
  }
}
