package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-9 lakehouse maintenance contracts: file-selective compaction
  * (rewrite the small-file backlog ONLY, never the table) and the
  * persisted change-data feed that lets incremental consumers read
  * THROUGH rewrites instead of dying on them.
  */
class TxLogCdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(): String = Zones.tempDir("txlog9")

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("compact rewrites ONLY the small files, carrying full-size files by reference") {
    val root = freshTable()
    // 2 "large" files in one commit + 8 small single-file append commits
    TxLog.commit(spark, root, batch(0, 2000).repartition(2),
      TxLog.Append, statsCols = Seq("id"))
    (0 until 8).foreach(k => TxLog.append(spark, root,
      batch(2000 + k * 10, 2000 + k * 10 + 10).coalesce(1)))
    val before = TxLog.replay(root, TxLog.headVersion(root))
    assert(before.files.size === 10)
    val largePaths = TxLog.replay(root, 1L).files.toSet
    val threshold = before.entries
      .filter(e => largePaths(e.path)).map(_.bytes.get).min
    val sumBefore = TxLog.snapshot(spark, root).agg(sum("id")).head.getLong(0)

    val v = TxLog.compact(spark, root, smallBytes = threshold,
      statsCols = Seq("id"))
    val after = TxLog.replay(root, v)
    // the 2 full-size files are carried BY REFERENCE (same paths, zone
    // maps intact); the 8-small backlog became a bounded rewrite
    assert(after.files.toSet.intersect(before.files.toSet) === largePaths,
      "full-size files must be carried by reference, small ones replaced")
    assert(after.files.size < before.files.size)
    largePaths.foreach(p => assert(after.stats.contains(p),
      s"carried file lost its zone maps: $p"))
    // content-preserving
    assert(TxLog.snapshot(spark, root).count() === 2080L)
    assert(TxLog.snapshot(spark, root).agg(sum("id")).head.getLong(0) === sumBefore)
    // idempotent: one merged small file left below threshold → no-op
    assert(TxLog.compact(spark, root, smallBytes = threshold) === v,
      "a second compact with nothing to do must not commit")
    // the change feed reads THROUGH a compact (empty delta by construction)
    TxLog.append(spark, root, batch(9000, 9005))
    val delta = TxLog.changes(spark, root, v - 1, TxLog.headVersion(root))
    assert(delta.count() === 5L,
      "a compact in range must contribute nothing, not refuse the read")
  }

  test("changes(withChangeType) survives a merge: the typed delta applies exactly") {
    val root = freshTable()
    TxLog.commit(spark, root, batch(0, 100).repartitionByRange(4, col("id")),
      TxLog.Append, statsCols = Seq("id")) // v1
    import spark.implicits._
    val updates = Seq((10L, "U-10"), (55L, "U-55"), (200L, "NEW-200"))
      .toDF("id", "payload")
    val v2 = TxLog.merge(spark, root, updates, "id")
    val delta = TxLog.changes(spark, root, 1L, v2, withChangeType = true)
    val byType = delta.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map(
      "update_preimage" -> 2L, "update_postimage" -> 2L, "insert" -> 1L))
    // preimages carry the OLD row images
    assert(delta.filter(col("_change_type") === "update_preimage")
      .orderBy("id").collect().map(_.getAs[String]("payload")).toSeq
      === Seq("row-10", "row-55"))
    assert(delta.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(v2))
    // THE contract: snapshot(v1) + typed delta ≡ snapshot(v2)
    val updatedKeys = delta
      .filter(col("_change_type") === "update_postimage").select("id")
    val applied = TxLog.snapshot(spark, root, Some(1L))
      .join(updatedKeys, Seq("id"), "left_anti")
      .unionByName(delta
        .filter(col("_change_type").isin("update_postimage", "insert"))
        .select("id", "payload"))
    val direct = TxLog.snapshot(spark, root, Some(v2)).select("id", "payload")
    assert(applied.exceptAll(direct).count() === 0L)
    assert(direct.exceptAll(applied).count() === 0L)
    // a plain (untyped) read across the merge still refuses: update rows
    // would be misapplied as appends by an additive consumer
    val e = intercept[IllegalArgumentException] {
      TxLog.changes(spark, root, 1L, v2).collect()
    }
    assert(e.getMessage.contains("withChangeType"), e.getMessage)
  }

  test("the change feed passes through empty-delta rewrites") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 10))      // v1
    TxLog.append(spark, root, batch(10, 20))     // v2
    TxLog.optimize(spark, root, targetFiles = 1) // v3: cdf = ""
    TxLog.append(spark, root, batch(20, 25))     // v4
    val byV = TxLog.changes(spark, root, 1L, 4L)
      .groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV === Map(2L -> 10L, 4L -> 5L),
      "an optimize in range contributes nothing and must not refuse")
    val typed = TxLog.changes(spark, root, 1L, 4L, withChangeType = true)
    assert(typed.count() === 15L)
    assert(typed.filter(col("_change_type") =!= "insert").count() === 0L)
    // a plain overwrite still has NO recoverable delta: refuse (not skip)
    TxLog.overwrite(spark, root, batch(100, 103)) // v5
    intercept[IllegalArgumentException] {
      TxLog.changes(spark, root, 4L, 5L)
    }
    assert(TxLog.changes(spark, root, 4L, 5L, skipRewrites = true).count() === 0L)
  }

  test("DELETE rewrites only candidate files, keeps NULL-predicate rows, feeds the CDF") {
    val root = freshTable()
    TxLog.commit(spark, root, batch(0, 1000).repartitionByRange(10, col("id")),
      TxLog.Append, statsCols = Seq("id")) // 10 range-disjoint files
    val before = TxLog.liveFiles(root, 1L).toSet
    val v = TxLog.delete(spark, root, col("id").between(150, 160),
      statsCols = Seq("id"))
    val after = TxLog.liveFiles(root, v).toSet
    assert(before.intersect(after).size === 9,
      "a key-range delete must rewrite exactly the one candidate file")
    assert(TxLog.snapshot(spark, root).count() === 989L)
    assert(TxLog.snapshot(spark, root)
      .filter(col("id").between(150, 160)).count() === 0L)
    // the deleted rows flow through the typed change feed...
    val delta = TxLog.changes(spark, root, 1L, v, withChangeType = true)
    val deleted = delta.filter(col("_change_type") === "delete")
    assert(deleted.count() === 11L)
    // ...and applying them reconstructs the post-delete snapshot
    val applied = TxLog.snapshot(spark, root, Some(1L))
      .join(deleted.select("id"), Seq("id"), "left_anti")
    assert(applied.exceptAll(TxLog.snapshot(spark, root, Some(v))).count() === 0L)
    // a provably-no-match delete is a pure no-op: no commit, same head
    assert(TxLog.delete(spark, root, col("id") === 99999L) === v)
    assert(TxLog.headVersion(root) === v)
    // NULL predicate means NOT deleted (ANSI/Delta DELETE semantics)
    import spark.implicits._
    val root2 = freshTable()
    TxLog.append(spark, root2,
      Seq((1L, Some(5L)), (2L, None), (3L, Some(9L))).toDF("id", "x"))
    TxLog.delete(spark, root2, col("x") > 4)
    assert(TxLog.snapshot(spark, root2).select("id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("UPDATE evaluates SET against the OLD row, touches only candidates, feeds the CDF") {
    import spark.implicits._
    val root = freshTable()
    TxLog.commit(spark, root,
      (0 until 1000).map(i => (i.toLong, i.toLong * 10, i.toLong * 100))
        .toDF("id", "a", "b").repartitionByRange(10, col("id")),
      TxLog.Append, statsCols = Seq("id"))
    val before = TxLog.liveFiles(root, 1L).toSet
    // swap semantics: both RHS see the OLD row
    val v = TxLog.update(spark, root, col("id").between(150, 152),
      Map("a" -> col("b"), "b" -> col("a")), statsCols = Seq("id"))
    val after = TxLog.liveFiles(root, v).toSet
    assert(before.intersect(after).size === 9,
      "a key-range update must rewrite exactly the one candidate file")
    val m = TxLog.snapshot(spark, root).filter(col("id").between(149, 153))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(150L) === (15000L, 1500L) && m(152L) === (15200L, 1520L),
      s"SET a = b, b = a must swap using OLD values: $m")
    assert(m(149L) === (1490L, 14900L) && m(153L) === (1530L, 15300L),
      "non-matching rows in a touched file rewrite verbatim")
    assert(TxLog.snapshot(spark, root).count() === 1000L)
    // pre/post images flow typed, and applying them reconstructs v
    val delta = TxLog.changes(spark, root, 1L, v, withChangeType = true)
    val post = delta.filter(col("_change_type") === "update_postimage")
    assert(post.count() === 3L)
    val applied = TxLog.snapshot(spark, root, Some(1L))
      .join(post.select("id"), Seq("id"), "left_anti")
      .unionByName(post.select("id", "a", "b"))
    assert(applied.exceptAll(TxLog.snapshot(spark, root, Some(v))).count() === 0L)
    // unknown SET column refuses; no-candidate update is a no-op
    intercept[IllegalArgumentException] {
      TxLog.update(spark, root, col("id") === 1L, Map("nope" -> lit(1)))
    }
    assert(TxLog.update(spark, root, col("id") === 99999L,
      Map("a" -> lit(0L))) === v)
  }

  test("optimizeZOrder re-clusters so range reads on BOTH columns prune") {
    import spark.implicits._
    val root = freshTable()
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, x * 64L + y)).toDF("x", "y", "p")
    TxLog.append(spark, root, grid.repartition(4)) // unclustered, stats-free
    TxLog.optimizeZOrder(spark, root, targetFiles = 16, "x", "y", bits = 6)
    val q = TxLog.snapshot(spark, root)
      .filter(col("x").between(10, 15) && col("y").between(20, 25))
    assert(q.count() === 36L)
    assert(TxLogFileIndex.of(q).lastListed.size < 16,
      "rectangle read must prune z-ordered files")
    val qy = TxLog.snapshot(spark, root).filter(col("y").between(0, 3))
    qy.count()
    assert(TxLogFileIndex.of(qy).lastListed.size < 16,
      "the SECOND column's predicate must prune after ZORDER — a 1-D sort can't")
    // content-preserving: the change feed reads through it
    assert(TxLog.changes(spark, root, 1L, TxLog.headVersion(root)).count() === 0L)
  }

  test("vacuum keeps referenced change data, collects aged unreferenced residue") {
    val root = freshTable()
    TxLog.commit(spark, root, batch(0, 100).repartitionByRange(4, col("id")),
      TxLog.Append, statsCols = Seq("id"))
    import spark.implicits._
    val v2 = TxLog.merge(spark, root,
      Seq((10L, "U-10")).toDF("id", "payload"), "id")
    val cdRoot = java.nio.file.Paths.get(root, "_change_data")
    def changeDirs(): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val it = java.nio.file.Files.list(cdRoot)
      try it.iterator().asScala.toList finally it.close()
    }
    assert(changeDirs().size === 1)
    // an abandoned change dir (merge retry loser) ages out; the
    // referenced one survives any retention because v2 still reads it
    val orphan = cdRoot.resolve("txn-deadbeef0000")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1))
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(0L))
    TxLog.vacuum(root)
    assert(changeDirs().map(_.getFileName.toString) !== Seq("txn-deadbeef0000"))
    assert(changeDirs().size === 1, "referenced change data must survive vacuum")
    assert(TxLog.changes(spark, root, 1L, v2, withChangeType = true).count() === 2L)
  }
}
