package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Small-files compaction must shrink the file count to the byte-derived
  * target while leaving the data bit-identical.
  */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compact merges a fragmented prefix losslessly") {
    val dir  = Files.createTempDirectory("graft_compact").toString + "/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.repartition(16).write.parquet(dir)

    def parts = new java.io.File(dir).listFiles
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    def fingerprint = spark.read.parquet(dir)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

    assert(parts === 16)
    val before = fingerprint
    val target = Zones.compact(spark, dir, targetFileBytes = 1L << 30) // everything fits in one
    assert(target === 1)
    assert(parts === 1)
    assert(fingerprint === before)
  }
}
