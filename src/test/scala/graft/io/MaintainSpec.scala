package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The one-call maintenance policy: [[TxLog.maintain]] reads the log's
  * own ledger (sizes, row/deleted counts, recorded clustering keys) and
  * issues exactly the operations the table's state warrants — purge for
  * a heavily-deleted file, clustered compaction when keys are recorded,
  * plain compaction otherwise, then a retention vacuum — and NOTHING on
  * a healthy table. Runs over both store flavors.
  */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, i.toLong * 31 % 97, s"payload-$i"))
      .toDF("id", "bucket", "payload")
  }

  for ((flavor, mkRoot) <- StoreFlavors.flavors("txmaint")) {

    test(s"small files + a 90%-deleted file + stale clustering → exactly PURGE, ZORDER, VACUUM [$flavor]") {
      val root = mkRoot()
      // 4 small stats-bearing commits, then a clustered compaction that
      // RECORDS the keys, then 2 more small appends (stale clustering),
      // then a DV delete wiping 90% of one appended file
      (0 until 4).foreach(k => TxLog.commit(spark, root,
        rows(k * 100, k * 100 + 100).coalesce(1), TxLog.Append,
        statsCols = Seq("id", "bucket")))
      TxLog.compactZOrder(spark, root, "id", "bucket",
        smallBytes = Long.MaxValue)
      (4 until 6).foreach(k => TxLog.commit(spark, root,
        rows(k * 100, k * 100 + 100).coalesce(1), TxLog.Append,
        statsCols = Seq("id", "bucket")))
      TxLog.deleteVectors(spark, root,
        col("id").between(400L, 489L)) // 90 of file 4's 100 rows
      val wantRows = 600L - 90L

      val ops = TxLog.maintain(spark, root, smallBytes = Long.MaxValue,
        dvThreshold = 0.5, retainVersions = 1L, inflightGraceMs = 0L)
      assert(ops.map(_._1) === Seq("PURGE", "ZORDER", "VACUUM"),
        s"expected the three ledger-driven ops, got $ops")

      val r = TxLog.replay(root, TxLog.headVersion(root))
      assert(TxLog.snapshot(spark, root).count() === wantRows)
      assert(TxLog.snapshot(spark, root)
        .filter(col("id").between(400L, 489L)).count() === 0L)
      assert(r.entries.forall(_.dvs.isEmpty), "purge must materialize DVs")
      assert(r.clusterBy === Seq("id", "bucket"),
        "the clustered compaction must keep the recorded keys")
      // the rewrites preserved the ledger's stats columns: still one
      // zone-mapped range per file on id
      assert(r.entries.forall(_.stats.contains("id")),
        s"maintain must carry the ledger's stats columns: ${r.entries}")
      assert(TxLog.rowCount(root) === Some(wantRows))

      // a healthy table: the SAME call is all-skips, zero new commits
      val headBefore = TxLog.headVersion(root)
      val ops2 = TxLog.maintain(spark, root, smallBytes = Long.MaxValue,
        dvThreshold = 0.5, retainVersions = 1L, inflightGraceMs = 0L)
      assert(ops2.isEmpty, s"a maintained table must be all-skips: $ops2")
      assert(TxLog.headVersion(root) === headBefore)
    }

    test(s"maintain's ZORDER keeps ledger stats on NON-key columns [$flavor]") {
      import spark.implicits._
      val root = mkRoot()
      // three small files whose zone maps cover a column that is NOT a
      // cluster key ("extra"): the clustered rewrite must re-record it,
      // or routine maintenance regresses data skipping on that column
      (0 until 3).foreach(k => TxLog.commit(spark, root,
        (k * 100 until k * 100 + 100)
          .map(i => (i.toLong, i.toLong * 31 % 97, i.toLong * 7, s"p-$i"))
          .toDF("id", "bucket", "extra", "payload").coalesce(1),
        TxLog.Append, statsCols = Seq("id", "bucket", "extra")))
      TxLog.setClusterKeys(root, Seq("id", "bucket"))
      val ops = TxLog.maintain(spark, root, smallBytes = Long.MaxValue,
        retainVersions = 1L, inflightGraceMs = 0L)
      assert(ops.map(_._1) === Seq("ZORDER", "VACUUM"))
      val r = TxLog.replay(root, TxLog.headVersion(root))
      assert(r.entries.nonEmpty && r.entries.forall(e =>
        e.stats.contains("extra") && e.stats.contains("id") &&
          e.stats.contains("bucket")),
        s"ZORDER must carry the ledger's non-key stats columns: ${r.entries}")
      assert(TxLog.snapshot(spark, root).count() === 300L)
    }

    test(s"without recorded keys the compaction is plain COMPACT [$flavor]") {
      val root = mkRoot()
      (0 until 3).foreach(k => TxLog.commit(spark, root,
        rows(k * 100, k * 100 + 100).coalesce(1), TxLog.Append,
        statsCols = Seq("id")))
      val ops = TxLog.maintain(spark, root, smallBytes = Long.MaxValue,
        retainVersions = 1L, inflightGraceMs = 0L)
      assert(ops.map(_._1) === Seq("COMPACT", "VACUUM"))
      val r = TxLog.replay(root, TxLog.headVersion(root))
      assert(r.entries.size === 1 && r.entries.forall(_.stats.contains("id")))
      assert(TxLog.snapshot(spark, root).count() === 300L)
    }
  }
}
