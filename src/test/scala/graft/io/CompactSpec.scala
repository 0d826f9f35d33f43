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

  test("compactZOrder clusters only the backlog and carries clustered files by reference") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Zones.tempDir("txczo")
    def rows(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, (i * 37 % 1024).toLong, s"r$i")).toDF("a", "b", "payload")
    // one clustered base (2 full-size files by this test's threshold)...
    TxLog.commit(spark, root, rows(0, 4000).repartition(2), TxLog.Append,
      statsCols = Seq("a", "b"))
    val baseFiles = TxLog.replay(root, TxLog.headVersion(root)).files.toSet
    val threshold = TxLog.replay(root, TxLog.headVersion(root))
      .entries.flatMap(_.bytes).min
    // ...then a small-file append backlog
    (0 until 4).foreach(k => TxLog.commit(spark, root,
      rows(4000 + k * 100, 4100 + k * 100).coalesce(1), TxLog.Append,
      statsCols = Seq("a", "b")))
    TxLog.compactZOrder(spark, root, "a", "b", smallBytes = threshold)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    // the 2 base files are carried untouched; the 4-file backlog became
    // ≤ 2 clustered files with fresh 2-D zone maps
    assert(baseFiles.subsetOf(r.files.toSet), "clustered base must be carried by reference")
    val rewritten = r.entries.filterNot(e => baseFiles(e.path))
    assert(rewritten.nonEmpty && rewritten.size < 4)
    assert(rewritten.forall(e =>
      e.stats.contains("a") && e.stats.contains("b")),
      "backlog output must carry 2-D zone maps")
    // content identical
    assert(TxLog.snapshot(spark, root).count() === 4400L)
    assert(TxLog.snapshot(spark, root).agg(sum(col("a"))).head().getLong(0)
      === (0L until 4400L).sum)
  }
}
