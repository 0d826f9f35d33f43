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

  test("BMP decoder parses golden header bytes exactly (incl. top-down negative height)") {
    val b = Multimodal.makeBmp(640, 480)
    assert(Multimodal.decodeBmp(b) === Some((54L, 640, 480, 1)))
    // top-down BMP stores height negative; logical height is |height|
    val td = Multimodal.makeBmp(33, -7)
    assert(Multimodal.decodeBmp(td) === Some((54L, 33, 7, 1)))
    assert(Multimodal.decodeBmp("BM".getBytes) === None, "truncated header must not decode")
    assert(Multimodal.decodeBmp("plain text".getBytes) === None)
  }

  test("WAV decoder reads rate/channels/frames from a canonical RIFF header") {
    val b = Multimodal.makeWav(rate = 16000, channels = 2, frames = 25)
    // width=rate, height=channels, n_frames = dataSize/blockAlign
    assert(Multimodal.decodeWav(b) === Some((144L, 16000, 2, 25)))
    assert(Multimodal.decodeWav(java.util.Arrays.copyOf(b, 20)) === None)
    val zeroAlign = b.clone(); zeroAlign(32) = 0; zeroAlign(33) = 0
    assert(Multimodal.decodeWav(zeroAlign) === None, "zero blockAlign must not divide")
  }

  test("PPM decoder handles whitespace and comment variants") {
    assert(Multimodal.decodePpm("P6\n12 34\n255\n".getBytes)
      === Some((13L, 12, 34, 1)))
    assert(Multimodal.decodePpm("P6 # a comment\n# more\n 5\t6 \n255 ".getBytes)
      .map { case (_, w, h, f) => (w, h, f) } === Some((5, 6, 1)))
    assert(Multimodal.decodePpm("P6\n12".getBytes) === None, "missing fields must not decode")
    assert(Multimodal.decodePpm("P3\n1 1\n255\n".getBytes) === None, "ASCII PPM is not P6")
  }

  test("decode dispatches by magic and falls back to the stub for unknown payloads") {
    assert(Multimodal.decode(Multimodal.makeBmp(9, 8)) === ((54L, 9, 8, 1)))
    assert(Multimodal.decode(Multimodal.makeWav(8000, 1, 4)) === ((52L, 8000, 1, 4)))
    val text = ("q" * 600).getBytes
    assert(Multimodal.decode(text) === Multimodal.decodeStub(text))
  }

  test("extractMeta with the real decoder runs distributed over synthesized containers") {
    val df = (1 to 40).map(i => (i.toLong, i)).toDF("doc_id", "w")
    val media = df.repartition(4)
      .select(org.apache.spark.sql.functions.col("doc_id"), org.apache.spark.sql.functions.col("w"))
      .as[(Long, Int)]
      .map { case (id, w) => (id, Multimodal.makeBmp(w, w * 2)) }
      .toDF("doc_id", "media")
    val meta = Multimodal.extractMeta(media, "doc_id", Multimodal.decode)
      .orderBy("doc_id").collect()
    assert(meta.length === 40)
    meta.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(2) === i + 1, "width")
      assert(r.getInt(3) === 2 * (i + 1), "height")
      assert(r.getInt(4) === 1, "n_frames")
    }
  }
}
