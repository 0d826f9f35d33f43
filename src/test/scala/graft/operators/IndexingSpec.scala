package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, sum => sqlsum}

import graft.TestSpark

class IndexingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // "a" in docs 0,1,2,70000 (two chunks); "b" in docs 5 and 200 (one chunk,
  // two runs); "c" once
  private lazy val docs = Seq(
    (0L, "a b c"), (1L, "a"), (2L, "a"), (5L, "b"), (200L, "b"), (70000L, "a"))
    .toDF("doc_id", "text")

  test("chunk-local gaps: first posting takes local+1, runs detected") {
    val g = Indexing.postingsChunks(docs, "doc_id", "text")
      .orderBy("w", "chunk", "local")
      .select("w", "chunk", "local", "gap", "run_start")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(g === Seq(
      ("a", 0L, 0L, 1L, 1L),      // doc 0: gap from chunk base −1
      ("a", 0L, 1L, 1L, 0L),      // consecutive → run continues
      ("a", 0L, 2L, 1L, 0L),
      ("a", 1L, 4464L, 4465L, 1L), // 70000 % 65536, fresh chunk restarts
      ("b", 0L, 0L, 1L, 1L),      // doc 0 "a b c" posts b too
      ("b", 0L, 5L, 5L, 1L),      // non-consecutive → second run
      ("b", 0L, 200L, 195L, 1L),  // third run
      ("c", 0L, 0L, 1L, 1L)))
  }

  test("vbyte widths follow the 7-bit thresholds") {
    val widths = Seq(1L, 127L, 128L, 16383L, 16384L, 2097151L, 2097152L)
      .toDF("gap")
      .select(Indexing.vbyteBytes("gap").cast("long")).as[Long].collect().toSeq
    assert(widths === Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L))
  }

  test("container census conserves postings across container classes") {
    // total postings must equal the distinct (w, doc) count = 8
    val total = Indexing.containerCensus(docs, "doc_id", "text")
      .agg(sqlsum(col("n_postings"))).as[Long].collect()(0)
    assert(total === 8L)
  }

  test("a fully-consecutive chunk costs less as run than array once long enough") {
    val seq = (0L until 100L).map(i => (i, "x")).toDF("doc_id", "text")
    val census = Indexing.containerCensus(seq, "doc_id", "text")
      .select("container", "n_chunks", "n_postings", "total_bytes")
      .as[(String, Long, Long, Long)].collect().toSeq
    // 100 consecutive postings: one run → 6 bytes, array would be 200
    assert(census === Seq(("run", 1L, 100L, 6L)))
  }
}
