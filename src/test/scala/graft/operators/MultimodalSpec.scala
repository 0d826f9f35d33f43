package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary column + stub decode yields deterministic metadata") {
    val df   = Seq((7L, "x" * 600)).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.withMediaColumn(df, "text"), "doc_id")
    val r    = meta.collect()(0)
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === 600L)             // n_bytes
    assert(r.getInt(2) === 600 % 512)         // width
    assert(r.getInt(3) === (600 * 7) % 512)   // height
    assert(r.getInt(4) === 600 % 16)          // n_frames
  }

  test("resize stub halves dimensions with a 1px floor") {
    val df   = Seq((2L, "z" * 600)).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.withMediaColumn(df, "text"), "doc_id")
    val r = Multimodal.resizeStub(meta, factor = 2).select("width", "height")
      .as[(Int, Int)].collect()(0)
    assert(r === (((600 % 512) / 4, (600 * 7 % 512) / 4)))
  }

  test("frame sampling strides over n_frames") {
    val df   = Seq((1L, "y" * 26)).toDF("doc_id", "text") // n_frames = 26 % 16 = 10
    val meta = Multimodal.extractMeta(Multimodal.withMediaColumn(df, "text"), "doc_id")
    val got  = Multimodal.sampleFrames(meta, stride = 4)
      .select("sampled_frames").as[Seq[Int]].collect()(0)
    assert(got === Seq(0, 4, 8))
  }
}
