package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.CorpusStats

/** Streaming sketch ≡ batch sketch: draining the documents corpus through
  * the streaming cell-count aggregation — in any arrival chunking — must
  * produce exactly the batch sketch pass's cell counts.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed CMS cell counts equal the batch sketch over a 2-chunk arrival") {
    val tmp = Files.createTempDirectory("graft_sketch_stream").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // two arrival chunks
    docs.filter("doc_id % 2 = 0").write.mode("overwrite").parquet(s"$tmp/a")
    docs.filter("doc_id % 2 = 1").write.mode("overwrite").parquet(s"$tmp/b")

    val batch = CorpusStats.sketchCellRows(docs, "text", depth = 2, width = 1024)
      .groupBy("d", "cell").count()
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

    val streamed = SketchStream.runAvailableNow(
      spark, s"$tmp/*", docs.schema, "text", "sketch_stream_test", depth = 2, width = 1024)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
