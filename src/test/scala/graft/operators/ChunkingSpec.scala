package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.TestSpark

class ChunkingSpec extends AnyFunSuite with TableDrivenPropertyChecks {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunksOf(text: String, w: Int = 128, s: Int = 96): Seq[(Long, Long, Long)] =
    Chunking.charChunks(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", w, s)
      .select("chunk_id", "off", "chunk_len")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("short text yields one whole-text chunk") {
    assert(chunksOf("hello world") === Seq((0L, 1L, 11L)))
  }

  test("text of exactly width yields one chunk, no redundant tail") {
    assert(chunksOf("x" * 128) === Seq((0L, 1L, 128L)))
  }

  test("width+1 spills into a clamped second chunk") {
    assert(chunksOf("x" * 129) === Seq((0L, 1L, 128L), (1L, 97L, 33L)))
  }

  test("every character is covered and interior chunks are full-width") {
    val lens = Table("len", 1, 95, 96, 97, 128, 200, 224, 225, 300, 1000)
    forAll(lens) { n =>
      val cs = chunksOf("x" * n)
      // gapless: next chunk starts inside the previous one (stride < width)
      cs.sliding(2).foreach {
        case Seq((_, o1, l1), (_, o2, _)) => assert(o2 <= o1 + l1)
        case _ =>
      }
      assert(cs.last._2 + cs.last._3 - 1 === n) // tail reaches the end
      assert(cs.init.forall(_._3 === 128L))     // only the tail may run short
    }
  }

  test("chunk md5 matches the substring content") {
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val got = Chunking.charChunks(Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select("off", "chunk_md5").as[(Long, String)].collect().toMap
    got.foreach { case (off, m) =>
      val sub = text.substring(off.toInt - 1, math.min(off.toInt - 1 + 128, text.length))
      val ref = java.security.MessageDigest.getInstance("MD5").digest(sub.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(m === ref)
    }
  }

  test("null text contributes no chunks") {
    val df = Seq((1L, null: String), (2L, "ok")).toDF("doc_id", "text")
    assert(Chunking.charChunks(df, "doc_id", "text").groupBy().count().as[Long].head === 1L)
  }
}
