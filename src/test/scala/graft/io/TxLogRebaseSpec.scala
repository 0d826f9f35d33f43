package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Append-rebase for content-preserving rewrites: a maintenance commit
  * (optimize/compact/zorder) that loses its head to interleaved PLAIN
  * APPENDS folds them into its manifest by reference and publishes —
  * one rewrite, zero recompute — instead of re-reading and re-writing
  * its whole input per lost round (under continuous ingest that loop
  * starves, the one maintenance behavior a 100 TB table cannot afford).
  * Delta's write-serializable reordering for blind appends, proven
  * deterministically via the publish-window race hook. Anything other
  * than a plain append still conflicts and the op re-reads. Plus:
  * VACUUM dry run — the reclaim preview with zero mutation.
  *
  * Every case runs over BOTH store flavors ([[StoreFlavors]]): the local
  * hard-link claim and the object store's conditional PUT.
  */
class TxLogRebaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  // store-agnostic: child count of the data dir (one dir per commit)
  private def dataDirs(root: String): Int =
    LogStore.forRoot(root).list(s"$root/data").size

  private def parquets(root: String): Int =
    LogStore.forRoot(root).walk(s"$root/data")
      .count(_.relPath.endsWith(".parquet"))

  for ((flavor, mkRoot) <- StoreFlavors.flavors("txreb")) {

    def table3(): String = {
      val root = mkRoot()
      (0 until 3).foreach(k => TxLog.commit(spark, root,
        batch(k * 100, k * 100 + 100).coalesce(1), TxLog.Append,
        statsCols = Seq("id")))
      root
    }

    test(s"optimize rebases an interleaved plain append: one rewrite, nothing lost [$flavor]") {
      val root = table3()
      assert(dataDirs(root) === 3)
      // the race: an ingest append lands INSIDE optimize's compute→publish
      // window, deterministically
      TxLog.testRaceHook =
        () => { TxLog.append(spark, root, batch(900, 910).coalesce(1)); () }
      val v = TxLog.optimize(spark, root, targetFiles = 2, sortCol = Some("id"))
      assert(v === 5L, "optimize must land AFTER the interleaved append")
      // ONE optimize rewrite: 3 base dirs + 1 append + 1 optimize — a
      // conflict-retry would have left an abandoned 6th
      assert(dataDirs(root) === 5,
        "rebase must publish without recomputing the rewrite")
      val snap = TxLog.snapshot(spark, root)
      assert(snap.count() === 310L)
      assert(snap.filter(col("id") >= 900L).count() === 10L,
        "the interleaved append's rows must survive the rewrite")
      // the optimize manifest carries the appended file by reference
      assert(TxLog.replay(root, 5L).files.size === 3) // 2 optimized + 1 appended
      // and the audit trail names both operations
      val ops = TxLog.history(spark, root).orderBy("version").collect()
        .map(_.getAs[String]("operation")).toSeq
      assert(ops === Seq("APPEND", "APPEND", "APPEND", "APPEND", "OPTIMIZE"))
    }

    test(s"rebase folds a WHOLE BURST of interleaved appends, not just one [$flavor]") {
      val root = table3()
      TxLog.testRaceHook = () => {
        (0 until 3).foreach(k =>
          TxLog.append(spark, root, batch(900 + k * 10, 910 + k * 10).coalesce(1)))
        ()
      }
      val v = TxLog.optimize(spark, root, targetFiles = 2, sortCol = Some("id"))
      assert(v === 7L) // 3 base + 3 interleaved appends + the optimize
      assert(dataDirs(root) === 7, "still exactly one rewrite")
      assert(TxLog.snapshot(spark, root).count() === 330L)
      assert(TxLog.replay(root, 7L).files.size === 5) // 2 optimized + 3 appended
    }

    test(s"compactZOrder rebases too, and the folded entry keeps its zone maps [$flavor]") {
      val root = table3()
      TxLog.testRaceHook =
        () => { TxLog.commit(spark, root, batch(900, 910).coalesce(1),
          TxLog.Append, statsCols = Seq("id")); () }
      TxLog.compactZOrder(spark, root, "id", "id", smallBytes = Long.MaxValue)
      val r = TxLog.replay(root, TxLog.headVersion(root))
      assert(TxLog.snapshot(spark, root).count() === 310L)
      // the folded append's entry round-tripped with its stats intact
      val folded = r.entries.filter(e =>
        e.stats.get("id").exists { case (lo, hi) => lo == 900L && hi == 909L })
      assert(folded.size === 1, "rebase must preserve the folded entry's zone maps")
    }

    test(s"a rebased publish landing on a checkpoint boundary carries the folded entries [$flavor]") {
      val root = mkRoot()
      // 8 commits, then an optimize racing an append: append claims v9,
      // the rebased optimize claims v10 — the CHECKPOINT version
      (0 until 8).foreach(k => TxLog.commit(spark, root,
        batch(k * 100, k * 100 + 100).coalesce(1), TxLog.Append,
        statsCols = Seq("id")))
      TxLog.testRaceHook =
        () => { TxLog.append(spark, root, batch(900, 910).coalesce(1)); () }
      val v = TxLog.optimize(spark, root, targetFiles = 2, sortCol = Some("id"))
      assert(v === 10L && v % TxLog.CheckpointEvery === 0L)
      // destroy every pre-checkpoint manifest: replay must reconstruct the
      // rebased state (optimized files + the folded append) from c10 alone
      (1 to 9).foreach { k =>
        LogStore.forRoot(root).putReplace(f"$root/_txlog/v$k%08d.json",
          "garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val snap = TxLog.snapshot(spark, root)
      assert(snap.count() === 810L)
      assert(snap.filter(col("id") >= 900L).count() === 10L)
    }

    test(s"a non-append interloper still conflicts: the rewrite re-reads and stays correct [$flavor]") {
      val root = table3()
      TxLog.testRaceHook =
        () => { TxLog.overwrite(spark, root, batch(500, 520).coalesce(1)); () }
      TxLog.optimize(spark, root, targetFiles = 1, sortCol = Some("id"))
      // first attempt conflicted (interloper is an overwrite); the retry
      // re-read and optimized the OVERWRITTEN state
      val got = TxLog.snapshot(spark, root).orderBy("id")
        .collect().map(_.getLong(0)).toSeq
      assert(got === (500L until 520L))
    }

    test(s"exactly-once bookkeeping survives a rebase [$flavor]") {
      val root = table3()
      TxLog.testRaceHook =
        () => { TxLog.appendOnce(spark, root, "once-1",
          batch(900, 910).coalesce(1)); () }
      TxLog.optimize(spark, root, targetFiles = 2, sortCol = Some("id"))
      // a replay of the same txnId after the rewrite is still a no-op
      val v = TxLog.appendOnce(spark, root, "once-1", batch(990, 999))
      assert(v === 4L, "replayed txnId must return its original version")
      assert(TxLog.snapshot(spark, root).count() === 310L)
    }

    test(s"vacuum dryRun counts the reclaim without deleting anything [$flavor]") {
      val root = table3()
      TxLog.overwrite(spark, root, batch(0, 5).coalesce(1)) // 3 dirs go dead
      val before = parquets(root)
      val head = TxLog.headVersion(root)
      val dry = TxLog.vacuum(root, retainFrom = head, inflightGraceMs = 0L,
        dryRun = true)
      assert(dry === 3, s"dry run should count the 3 dead files, got $dry")
      assert(parquets(root) === before, "dry run must not delete anything")
      assert(TxLog.snapshot(spark, root, Some(1L)).count() === 100L,
        "time travel must still work after a dry run")
      val real = TxLog.vacuum(root, retainFrom = head, inflightGraceMs = 0L)
      assert(real === dry, "the dry-run count must equal the real reclaim")
      assert(parquets(root) === before - 3)
    }
  }
}
