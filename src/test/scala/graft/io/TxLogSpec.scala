package graft.io

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The transaction-log guarantees, each proven mechanically:
  * concurrent committers serialize without loss, snapshots are immune to
  * later commits, overwrite resets the live set, and time travel replays
  * any historical version byte-for-byte.
  */
class TxLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(): String = Zones.tempDir("txlog")

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("append commits are serialized and contiguous under 8 concurrent committers") {
    val root = freshTable()
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val commits = (0 until 8).map { k =>
        Future(TxLog.append(spark, root, batch(k * 10, k * 10 + 10)))
      }
      val versions = Await.result(Future.sequence(commits), 120.seconds)
      // every committer got a DISTINCT version and the chain has no gaps —
      // the atomic hard-link claim is what forces this
      assert(versions.sorted == (1L to 8L))
      assert(TxLog.versions(root) == (1L to 8L))
      val all = TxLog.snapshot(spark, root)
      assert(all.count() === 80L)
      assert(all.agg(countDistinct(col("id"))).head.getLong(0) === 80L)
    } finally pool.shutdown()
  }

  test("a pinned snapshot is repeatable while later commits land") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 5))
    TxLog.append(spark, root, batch(5, 10))
    val pinned = TxLog.snapshot(spark, root, Some(2L))
    val before = pinned.orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(before == (0L until 10L))
    // commits after the pin: the resolved file list never mentions them
    TxLog.append(spark, root, batch(10, 15))
    TxLog.overwrite(spark, root, batch(100, 103))
    val after = pinned.orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(after == before, "snapshot changed under a concurrent writer")
    assert(TxLog.snapshot(spark, root).count() === 3L, "head must see only the overwrite")
  }

  test("overwrite resets the live set; time travel still reads every older version") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 4))     // v1
    TxLog.append(spark, root, batch(4, 6))     // v2
    TxLog.overwrite(spark, root, batch(50, 53)) // v3
    TxLog.append(spark, root, batch(53, 54))   // v4
    assert(TxLog.snapshot(spark, root, Some(1L)).count() === 4L)
    assert(TxLog.snapshot(spark, root, Some(2L)).count() === 6L)
    assert(TxLog.snapshot(spark, root, Some(3L)).count() === 3L)
    assert(TxLog.snapshot(spark, root, Some(4L)).count() === 4L)
    val ids4 = TxLog.snapshot(spark, root, Some(4L))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids4 == (50L until 54L), "post-overwrite chain must not resurrect pre-overwrite files")
  }

  test("history reports one row per version with the committed action") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 2))
    TxLog.overwrite(spark, root, batch(2, 4))
    val h = TxLog.history(spark, root).orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(h.map(_.getString(1)).toSeq == Seq("append", "overwrite"))
    assert(h.forall(_.getAs[Long]("n_files") >= 1L))
    // plain commits render their action as the operation
    assert(h.map(_.getAs[String]("operation")).toSeq == Seq("APPEND", "OVERWRITE"))
  }

  test("manifests reference only fully-written parquet files (no partial visibility)") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 10))
    val files = TxLog.liveFiles(root, 1L)
    assert(files.nonEmpty)
    files.foreach { f =>
      val p = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.exists(p), s"manifest lists missing file $f")
      assert(java.nio.file.Files.size(p) > 0L, s"manifest lists empty file $f")
    }
    // no temp-claim residue in the log directory
    val leftovers = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(root, "_txlog"))
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith(".tmp")).toList
      } finally it.close()
    }
    assert(leftovers.isEmpty, s"unreclaimed claim temps: $leftovers")
  }

  test("vacuum removes only what no retained snapshot can reach") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 5))       // v1
    TxLog.overwrite(spark, root, batch(10, 15))  // v2 — v1's files now unreachable from v2+
    TxLog.append(spark, root, batch(15, 20))     // v3
    // full retention: nothing reachable may go
    assert(TxLog.vacuum(root, retainFrom = 1L) === 0)
    assert(TxLog.snapshot(spark, root, Some(1L)).count() === 5L)
    // retain from v2: v1's overwritten files are the only garbage
    val deleted = TxLog.vacuum(root, retainFrom = 2L)
    assert(deleted >= 1, "the overwritten v1 data must be collected")
    assert(TxLog.snapshot(spark, root, Some(2L)).count() === 5L)
    assert(TxLog.snapshot(spark, root, Some(3L)).count() === 10L)
    intercept[Throwable] { // pre-horizon time travel is gone by contract
      TxLog.snapshot(spark, root, Some(1L)).count()
    }
  }

  test("appendOnce is exactly-once under batch replay") {
    val root = freshTable()
    assert(TxLog.appendOnce(spark, root, "stream#0", batch(0, 5)) === 1L)
    assert(TxLog.appendOnce(spark, root, "stream#1", batch(5, 10)) === 2L)
    // failure recovery re-delivers batch 1: same version back, no new data
    assert(TxLog.appendOnce(spark, root, "stream#1", batch(5, 10)) === 2L)
    assert(TxLog.headVersion(root) === 2L)
    assert(TxLog.snapshot(spark, root).count() === 10L)
    // an interleaved plain append does not confuse the txn bookkeeping
    TxLog.append(spark, root, batch(10, 12))
    assert(TxLog.appendOnce(spark, root, "stream#2", batch(12, 15)) === 4L)
    assert(TxLog.appendOnce(spark, root, "stream#2", batch(12, 15)) === 4L)
    assert(TxLog.snapshot(spark, root).count() === 15L)
  }

  test("merge upserts by key: matched rows replaced, unmatched inserted, history preserved") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 6)) // ids 0..5, payload row-i
    import spark.implicits._
    val updates = Seq((4L, "UPDATED-4"), (5L, "UPDATED-5"), (9L, "NEW-9"))
      .toDF("id", "payload")
    val v = TxLog.merge(spark, root, updates, "id")
    assert(v === 2L)
    val now = TxLog.snapshot(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(now === Seq(0L -> "row-0", 1L -> "row-1", 2L -> "row-2",
      3L -> "row-3", 4L -> "UPDATED-4", 5L -> "UPDATED-5", 9L -> "NEW-9"))
    // pre-merge snapshot is intact (copy-on-write, not in-place)
    val old = TxLog.snapshot(spark, root, Some(1L)).filter(col("id") === 4L)
      .head.getString(1)
    assert(old === "row-4")
  }

  test("checkpoints bound replay: reads above a checkpoint never touch older manifests") {
    val root = freshTable()
    // 25 commits with CheckpointEvery = 10 → checkpoints at v10 and v20
    (0 until 25).foreach(k => TxLog.append(spark, root, batch(k * 2, k * 2 + 2)))
    val ckpts = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(root, "_txlog"))
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.map(_.getFileName.toString)
          .filter(_.matches("""c\d{8}\.json""")).toList.sorted
      } finally it.close()
    }
    assert(ckpts === List("c00000010.json", "c00000020.json"))
    assert(TxLog.snapshot(spark, root).count() === 50L)
    assert(TxLog.snapshot(spark, root, Some(15L)).count() === 30L)
    // destroy an early manifest: replay for any pin ≥ 10 starts at a
    // checkpoint and must not care; a pin below the first checkpoint needs
    // it and must fail — proof the replay REALLY starts at the checkpoint
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_txlog", "v00000003.json"),
      "garbage".getBytes)
    assert(TxLog.snapshot(spark, root).count() === 50L)
    assert(TxLog.snapshot(spark, root, Some(12L)).count() === 24L)
    intercept[Throwable] { TxLog.snapshot(spark, root, Some(5L)).count() }
  }

  test("per-file stats prune a range read to the matching commits only") {
    val root = freshTable()
    // 4 commits with disjoint id ranges, stats on id — zone maps disjoint
    (0 until 4).foreach { k =>
      TxLog.commit(spark, root, batch(k * 100, k * 100 + 100).coalesce(1),
        TxLog.Append, statsCols = Seq("id"))
    }
    // plus one stats-free commit: must never be skipped
    TxLog.append(spark, root, batch(1000, 1001).coalesce(1))
    val v = TxLog.headVersion(root)
    val all = TxLog.liveFiles(root, v)
    val pruned = TxLog.prunedFiles(root, v, "id", 150, 160)
    assert(pruned.size < all.size, "pruning must drop non-matching files")
    // exactly: the k=1 commit's file + the stats-free file
    assert(pruned.size === 2, s"expected 2 candidate files, got ${pruned.size}")
    val got = TxLog.snapshotRange(spark, root, "id", 150, 160)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got === (150L to 160L))
    // boundary inclusivity: a range touching a file's max must read it
    assert(TxLog.snapshotRange(spark, root, "id", 99, 100).count() === 2L)
    // stats survive replay order under an overwrite reset
    TxLog.commit(spark, root, batch(5000, 5100).coalesce(1),
      TxLog.Overwrite, statsCols = Seq("id"))
    assert(TxLog.prunedFiles(root, TxLog.headVersion(root), "id", 0, 400).isEmpty,
      "overwrite must reset the zone maps with the live set")
  }

  test("optimize compacts and range-clusters without changing content or history") {
    val root = freshTable()
    // 6 interleaved commits: ids NOT clustered by file
    (0 until 6).foreach { k =>
      import spark.implicits._
      val rows = (0 until 60).filter(_ % 6 == k)
        .map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
      TxLog.append(spark, root, rows.coalesce(1))
    }
    val before = TxLog.snapshot(spark, root).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    val preVersion = TxLog.headVersion(root)
    // every file spans nearly the whole id range: pruning is useless
    assert(TxLog.prunedFiles(root, preVersion, "id", 10, 15).size ===
      TxLog.liveFiles(root, preVersion).size)
    val v = TxLog.optimize(spark, root, targetFiles = 3, sortCol = Some("id"))
    assert(v === preVersion + 1)
    // content byte-identical, file count compacted
    val after = TxLog.snapshot(spark, root).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(after === before, "optimize must not change table content")
    assert(TxLog.liveFiles(root, v).size === 3)
    // range clustering: a narrow range now touches ONE file
    assert(TxLog.prunedFiles(root, v, "id", 10, 15).size === 1,
      "range-sorted rewrite must make zone maps disjoint")
    // pre-optimize snapshots read their own (untouched) files
    assert(TxLog.snapshot(spark, root, Some(preVersion)).count() === 60L)
    assert(TxLog.snapshot(spark, root, Some(3L)).count() === 30L)
  }

  test("concurrent merges serialize: no lost update under read-modify-write races") {
    import spark.implicits._
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 10)) // ids 0..9, payload row-i
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // two merges over DISJOINT keys race; without the expectHead
      // conflict check, whichever overwrite lands second was derived from
      // the PRE-race snapshot and silently reverts the first one
      val m1 = Future(TxLog.merge(spark, root,
        Seq((2L, "M1-2"), (20L, "M1-20")).toDF("id", "payload"), "id"))
      val m2 = Future(TxLog.merge(spark, root,
        Seq((5L, "M2-5"), (50L, "M2-50")).toDF("id", "payload"), "id"))
      Await.result(Future.sequence(Seq(m1, m2)), 180.seconds)
      val now = TxLog.snapshot(spark, root).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(now.size === 12, s"expected 12 rows, got ${now.size}")
      assert(now(2L) === "M1-2" && now(20L) === "M1-20", "merge 1 effect lost")
      assert(now(5L) === "M2-5" && now(50L) === "M2-50", "merge 2 effect lost")
    } finally pool.shutdown()
  }

  test("additive schema evolution: head reads the union schema, time travel the old one") {
    import spark.implicits._
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 3)) // (id, payload)
    TxLog.append(spark, root,
      Seq((10L, "row-10", "en")).toDF("id", "payload", "lang"))
    val head = TxLog.snapshot(spark, root)
    assert(head.columns.sorted.toSeq === Seq("id", "lang", "payload"))
    val byId = head.collect().map(r => r.getLong(0) ->
      Option(r.getAs[String]("lang"))).toMap
    assert(byId(10L) === Some("en"))
    assert(byId(0L) === None, "pre-evolution rows must backfill null")
    // time travel below the evolution: old schema only
    assert(TxLog.snapshot(spark, root, Some(1L)).columns.sorted.toSeq
      === Seq("id", "payload"))
  }

  test("vacuum collects aborted-commit residue (data dir with no manifest)") {
    val root = freshTable()
    TxLog.append(spark, root, batch(0, 5))
    // simulate a crash between data write and manifest publish
    batch(90, 95).write.parquet(s"$root/data/txn-aborted0001")
    val deleted = TxLog.vacuum(root)
    assert(deleted >= 1, "unpublished data files must be collected")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/data/txn-aborted0001")))
    assert(TxLog.snapshot(spark, root).count() === 5L, "published data must survive")
  }
}
