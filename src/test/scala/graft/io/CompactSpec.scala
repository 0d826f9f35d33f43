package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions.col
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

  test("clustering keys live in the log and CHANGE without a rewrite; both generations prune") {
    import spark.implicits._
    val root = Zones.tempDir("ckevo")
    def mk(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, (i / 2000).toLong, (i / 4).toLong, s"r$i"))
      .toDF("a", "b", "c", "pay")
    TxLog.commit(spark, root, mk(0, 4000).repartition(4), TxLog.Append,
      statsCols = Seq("a", "b"))
    // the first keyed clustering pass records its keys in the log
    TxLog.optimizeZOrder(spark, root, targetFiles = 2, "a", "b")
    assert(TxLog.clusterKeysOf(root) === Seq("a", "b"))
    val filesBefore = TxLog.replay(root, TxLog.headVersion(root)).files.toSet
    // changing the keys is ONE metadata commit — zero data movement
    TxLog.setClusterKeys(root, Seq("a", "c"))
    assert(TxLog.clusterKeysOf(root) === Seq("a", "c"))
    assert(TxLog.replay(root, TxLog.headVersion(root)).files.toSet === filesBefore,
      "a key change must not rewrite any file")
    // ingest backlog (two small files), then the KEYLESS maintenance
    // pass: it follows the log's keys, clustering only the backlog by
    // the NEW pair while the clustered base carries by reference
    TxLog.append(spark, root, mk(4000, 4400).coalesce(1))
    TxLog.append(spark, root, mk(4400, 4800).coalesce(1))
    val sizes = TxLog.replay(root, TxLog.headVersion(root))
      .entries.flatMap(_.bytes)
    TxLog.compactZOrder(spark, root, smallBytes = (sizes.min + sizes.max) / 2)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    val (oldGen, newGen) = r.entries.partition(e => filesBefore(e.path))
    assert(oldGen.size === 2 && newGen.nonEmpty)
    assert(oldGen.forall(_.stats.keySet === Set("a", "b")),
      "carried files keep their OLD-key zone maps")
    assert(newGen.forall(_.stats.keySet === Set("a", "c")),
      "the re-clustered backlog carries NEW-key zone maps")
    // both generations prune on the shared dimension: 2 old files cover
    // a∈[0,4000) in clustered halves, the backlog covers [4000,4400)
    val q = TxLog.snapshot(spark, root).filter(col("a").between(0, 50))
    assert(q.count() === 51L)
    assert(TxLogFileIndex.of(q).lastListed.size === 1,
      "old-generation maps and new-generation maps must both prune")
    // the new dimension prunes the new generation (old files carry no c
    // stats and are conservatively kept)
    val q2 = TxLog.snapshot(spark, root).filter(col("c") === 10000L)
    assert(q2.count() === 0L)
    assert(!TxLogFileIndex.of(q2).lastListed.exists(p =>
      newGen.exists(e => p.endsWith(e.path))),
      "new-key predicates must prune the re-clustered generation")
    // the key state survives a checkpoint
    (0 until 10).foreach(i => TxLog.append(spark, root, mk(9000 + i, 9001 + i)))
    assert(TxLog.clusterKeysOf(root) === Seq("a", "c"))
    assert(TxLog.snapshot(spark, root).count() === 4810L)
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
