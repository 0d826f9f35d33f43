package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deletion vectors (merge-on-read DELETE): a delete writes matched
  * POSITIONS, not rewritten files — commit cost O(matched rows). Proven:
  * no data file is touched, reads subtract exactly the deleted rows,
  * deletes compose and never re-report, time travel sees pre-delete
  * state, rewrites materialize the deletes and drop the refs, the typed
  * CDF reads through a DV delete, vacuum ties DV-dir lifetime to the
  * manifests that reference them, and clones resolve external DVs.
  */
class TxLogDvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 4 range-clustered files: file f holds ids [1000f, 1000f+999]. */
  private def table(): String = {
    import spark.implicits._
    val root = Zones.tempDir("txdv")
    (0 until 4).foreach { f =>
      val df = (0 until 1000).map(i => (1000L * f + i, s"row-$f-$i"))
        .toDF("id", "payload")
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("id"))
    }
    root
  }

  private def dataFiles(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
    try w.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSet
    finally w.close()
  }

  test("a DV delete removes exactly the matching rows without touching a data file") {
    val root = table()
    val before = dataFiles(root)
    val v = TxLog.deleteVectors(spark, root, col("id") % 10 === 3)
    assert(v === 5L)
    assert(dataFiles(root) === before, "merge-on-read must not rewrite data files")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 3600L)
    assert(snap.filter(col("id") % 10 === 3).count() === 0L)
    // every file held matches: every entry carries the dv ref
    val r = TxLog.replay(root, v)
    assert(r.entries.forall(_.dvs.size === 1))
    // time travel below the delete still sees everything
    assert(TxLog.snapshot(spark, root, Some(4L)).count() === 4000L)
  }

  test("DV deletes compose, and a re-matching predicate never re-reports") {
    val root = table()
    val v1 = TxLog.deleteVectors(spark, root, col("id") < 100L)
    // overlapping second predicate: the 100 already-deleted rows must
    // not re-enter the vector or the change feed
    val v2 = TxLog.deleteVectors(spark, root, col("id") < 200L)
    assert(TxLog.snapshot(spark, root).count() === 3800L)
    val d2 = TxLog.changes(spark, root, v1, v2, withChangeType = true)
    assert(d2.count() === 100L, "second delete must report only newly deleted rows")
    assert(d2.agg(min(col("id"))).head().getLong(0) === 100L)
    // only file 0 matched either delete: one entry carries 2 refs
    val r = TxLog.replay(root, v2)
    assert(r.entries.map(_.dvs.size).sorted === Vector(0, 0, 0, 2))
  }

  test("the typed CDF reads through a DV delete like a copy-on-write one") {
    val root = table()
    val base = TxLog.headVersion(root)
    val v = TxLog.deleteVectors(spark, root, col("id").between(500L, 509L))
    val d = TxLog.changes(spark, root, base, v, withChangeType = true)
    assert(d.filter(col("_change_type") === "delete").count() === 10L)
    assert(d.count() === 10L)
  }

  test("a rewrite materializes the deletes and drops the refs; carried files keep theirs") {
    import spark.implicits._
    val root = table()
    TxLog.deleteVectors(spark, root, col("id") % 10 === 7)
    // merge touching only file 1: its rewrite materializes file 1's
    // deletes; files 0/2/3 carry their refs
    TxLog.merge(spark, root, Seq((1500L, "patched")).toDF("id", "payload"), "id")
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.entries.count(_.dvs.nonEmpty) === 3)
    val snap = TxLog.snapshot(spark, root)
    assert(snap.filter(col("id") % 10 === 7).count() === 0L)
    assert(snap.count() === 3600L)
    assert(snap.filter(col("id") === 1500L).head().getString(1) === "patched")
    // full compact materializes everything: no refs left
    TxLog.compact(spark, root, smallBytes = Long.MaxValue, statsCols = Seq("id"))
    val r2 = TxLog.replay(root, TxLog.headVersion(root))
    assert(r2.entries.forall(_.dvs.isEmpty))
    assert(TxLog.snapshot(spark, root).count() === 3600L)
  }

  test("plan-time pruning still applies on a DV-bearing table") {
    val root = table()
    TxLog.deleteVectors(spark, root, col("id") === 2500L)
    val q = TxLog.snapshot(spark, root).filter(col("id").between(2400L, 2600L))
    assert(q.count() === 200L) // 201 minus the deleted row
    assert(TxLogFileIndex.of(q).lastListed.size === 1,
      "zone maps must keep pruning under the DV anti-join")
  }

  test("vacuum keeps referenced DV dirs and collects them once a rewrite drops the refs") {
    val root = table()
    TxLog.deleteVectors(spark, root, col("id") % 10 === 1)
    def dvDirs(): Int = {
      val p = java.nio.file.Paths.get(root, "_dv")
      if (!java.nio.file.Files.isDirectory(p)) 0
      else {
        import scala.jdk.CollectionConverters._
        val it = java.nio.file.Files.list(p)
        try it.iterator().asScala.size finally it.close()
      }
    }
    assert(dvDirs() === 1)
    // retained-from-head vacuum while the head still references the dv
    TxLog.vacuum(root, retainFrom = TxLog.headVersion(root), inflightGraceMs = 0L)
    assert(dvDirs() === 1, "a referenced DV dir must survive vacuum")
    assert(TxLog.snapshot(spark, root).count() === 3600L)
    // optimize materializes the deletes; the refs drop; vacuum collects
    TxLog.optimize(spark, root, targetFiles = 2, sortCol = Some("id"))
    TxLog.vacuum(root, retainFrom = TxLog.headVersion(root), inflightGraceMs = 0L)
    assert(dvDirs() === 0, "an unreferenced DV dir must be collected")
    assert(TxLog.snapshot(spark, root).count() === 3600L)
  }

  test("a no-match DV delete/update is a clean no-op: no residue dirs, head unchanged") {
    val root = table()
    def side(sub: String): Boolean =
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, sub))
    val head = TxLog.headVersion(root)
    // payload carries no zone map, so every file is a candidate — the
    // position scan runs and finds nothing; the op must clean up after
    // itself instead of leaving vacuum-bait `_dv`/`_change_data` residue
    assert(TxLog.deleteVectors(spark, root,
      col("payload") === "no-such-row") === head)
    assert(!side("_dv") && !side("_change_data"),
      "a no-match DV delete must leave no residue dirs")
    assert(TxLog.updateVectors(spark, root, col("payload") === "no-such-row",
      Map("payload" -> lit("x"))) === head)
    assert(!side("_dv") && !side("_change_data"),
      "a no-match MoR update must leave no residue dirs")
    assert(TxLog.headVersion(root) === head)
    assert(TxLog.snapshot(spark, root).count() === 4000L)
  }

  test("merge-on-read UPDATE vectorizes old positions and appends post-images") {
    import spark.implicits._
    val root = Zones.tempDir("txdvu")
    (0 until 2).foreach { f =>
      val df = (0 until 100).map(i => (100L * f + i, 10L + i, 1000L + i))
        .toDF("id", "a", "b")
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("id"))
    }
    val before = dataFiles(root)
    val base = TxLog.headVersion(root)
    // swap semantics: both RHS read the OLD row
    val v = TxLog.updateVectors(spark, root, col("id") === 105L,
      Map("a" -> col("b"), "b" -> col("a")))
    val after = dataFiles(root)
    assert(before.subsetOf(after), "MoR update must not rewrite old files")
    assert((after -- before).size === 1, "post-images should land as one appended file")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 200L)
    val row = snap.filter(col("id") === 105L).head()
    assert(row.getAs[Long]("a") === 1005L && row.getAs[Long]("b") === 15L)
    // an unmatched row is untouched
    val other = snap.filter(col("id") === 7L).head()
    assert(other.getAs[Long]("a") === 17L && other.getAs[Long]("b") === 1007L)
    // typed CDF: one pre-image + one post-image
    val d = TxLog.changes(spark, root, base, v, withChangeType = true)
    assert(d.filter(col("_change_type") === "update_preimage").count() === 1L)
    assert(d.filter(col("_change_type") === "update_postimage")
      .head().getAs[Long]("a") === 1005L)
    // time travel below the update sees the old values
    assert(TxLog.snapshot(spark, root, Some(base)).filter(col("id") === 105L)
      .head().getAs[Long]("a") === 15L)
  }

  test("merge-on-read UPDATE validates CHECK constraints on its post-images") {
    import spark.implicits._
    val root = Zones.tempDir("txdvuc")
    TxLog.commit(spark, root,
      (0 until 10).map(i => (i.toLong, 10L + i)).toDF("id", "a").coalesce(1),
      TxLog.Append, statsCols = Seq("id"))
    TxLog.addConstraint(spark, root, "a_pos", "a > 0")
    val head = TxLog.headVersion(root)
    assertThrows[TxLog.ConstraintViolation](
      TxLog.updateVectors(spark, root, col("id") === 3L, Map("a" -> -col("a"))))
    assert(TxLog.headVersion(root) === head)
    assert(TxLog.snapshot(spark, root).filter(col("id") === 3L)
      .head().getAs[Long]("a") === 13L)
  }

  test("an oversized deletion vector falls back to a shuffled anti-join, results identical") {
    val root = table()
    TxLog.deleteVectors(spark, root, col("id") % 10 === 6)
    val was = TxLogFileIndex.broadcastDvBytes
    val wasAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // over the explicit threshold AND past Spark's own auto-broadcast
      // sizing (which a genuinely huge vector would exceed anyway): the
      // subtraction must plan WITHOUT forcing a broadcast
      TxLogFileIndex.broadcastDvBytes = 0L
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val q = TxLog.snapshot(spark, root)
      val plan = q.queryExecution.executedPlan.toString // pre-execution
      assert(!plan.contains("BroadcastHashJoin"),
        s"an over-threshold vector must not be force-broadcast:\n$plan")
      assert(plan.contains("LeftAnti"), s"still an anti-join:\n$plan")
      assert(q.count() === 3600L)
      assert(q.filter(col("id") % 10 === 6).count() === 0L)
    } finally {
      TxLogFileIndex.broadcastDvBytes = was
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", wasAuto)
    }
  }

  test("deletion vectors work on a hive-partitioned table") {
    import spark.implicits._
    val root = Zones.tempDir("txdvpart")
    val df = (0 until 1000).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else "fr", s"row-$i"))
      .toDF("id", "lang", "payload")
    TxLog.commit(spark, root, df, TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang"))
    val v = TxLog.deleteVectors(spark, root,
      col("lang") === "en" && col("id") < 300L)
    assert(v === 2L)
    val snap = TxLog.snapshot(spark, root)
    // deleted: multiples of 3 below 300 → 100 rows
    assert(snap.count() === 900L)
    assert(snap.filter(col("lang") === "en" && col("id") < 300L).count() === 0L)
    assert(snap.filter(col("lang") === "fr").count() === 666L)
    // partition-column reads still resolve (values come from k=v dirs)
    assert(snap.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("en" -> 234L, "fr" -> 666L))
  }

  test("purge rewrites only files past the deleted-fraction threshold; the anti-join disappears when none remain") {
    val root = table()
    // file 0: 90% deleted; file 2: one row deleted — only file 0 crosses θ=0.5
    TxLog.deleteVectors(spark, root, col("id") < 900L)
    TxLog.deleteVectors(spark, root, col("id") === 2500L)
    val before = dataFiles(root)
    val v = TxLog.purge(spark, root, threshold = 0.5, statsCols = Seq("id"))
    val r = TxLog.replay(root, v)
    // files 1/3 carried untouched, file 2 carried WITH its ref, file 0
    // materialized into fresh file(s) without refs
    assert(r.entries.count(_.dvs.nonEmpty) === 1,
      "the lightly-deleted file must carry its ref")
    assert(before.subsetOf(dataFiles(root)), "purge must not delete data files")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 4000L - 900L - 1L)
    assert(snap.filter(col("id") < 900L).count() === 0L)
    assert(TxLog.rowCount(root) === Some(3099L))
    // a below-threshold pass is a no-op
    assert(TxLog.purge(spark, root, threshold = 0.5) === v)
    // θ=0 purges the rest: no refs remain and the READ PLAN loses the
    // anti-join entirely — the merge-on-read debt is paid off
    TxLog.purge(spark, root, threshold = 0.0, statsCols = Seq("id"))
    val r2 = TxLog.replay(root, TxLog.headVersion(root))
    assert(r2.entries.forall(_.dvs.isEmpty))
    val plan = TxLog.snapshot(spark, root).queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"),
      s"after a full purge the read plan must drop the DV anti-join:\n$plan")
    assert(TxLog.snapshot(spark, root).count() === 3099L)
  }

  test("two concurrent DV deletes on DISJOINT files both commit in one attempt (fold, not retry)") {
    val root = table()
    val base = TxLog.headVersion(root)
    val conflictsBefore = TxLog.rmwConflicts.get()
    // the race: a delete over file 3 lands inside the publish window of
    // a delete over file 0 — zone maps make each op's candidate set one
    // file, the touched sets are disjoint, so the loser FOLDS
    TxLog.testRaceHook = () => {
      TxLog.deleteVectors(spark, root,
        col("id") >= 3000L && col("id") % 10 === 1L); ()
    }
    val v = TxLog.deleteVectors(spark, root,
      col("id") < 1000L && col("id") % 10 === 2L)
    assert(v === base + 2, "the folded delete must land AFTER the interloper")
    assert(TxLog.rmwConflicts.get() === conflictsBefore,
      "a disjoint-file race must fold, never conflict-retry")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 3800L)
    assert(snap.filter(col("id") < 1000L && col("id") % 10 === 2L).count() === 0L)
    assert(snap.filter(col("id") >= 3000L && col("id") % 10 === 1L).count() === 0L)
    val r = TxLog.replay(root, v)
    assert(r.entries.map(_.dvs.size).sorted === Vector(0, 0, 1, 1))
    assert(TxLog.rowCount(root) === Some(3800L))
    // contrast: an OVERLAPPING race (same file) still conflicts and
    // retries — and stays correct
    TxLog.testRaceHook = () => {
      TxLog.deleteVectors(spark, root,
        col("id") < 1000L && col("id") % 10 === 3L); ()
    }
    TxLog.deleteVectors(spark, root,
      col("id") < 1000L && col("id") % 10 === 4L)
    assert(TxLog.rmwConflicts.get() > conflictsBefore,
      "an overlapping race must conflict-retry")
    assert(TxLog.snapshot(spark, root).count() === 3600L)
    assert(TxLog.rowCount(root) === Some(3600L))
  }

  test("a disjoint DV fold landing on a checkpoint boundary reconstructs from the checkpoint alone") {
    import spark.implicits._
    val root = table() // v1-v4
    (0 until 4).foreach(k => TxLog.commit(spark, root,
      (0 until 10).map(i => (10000L + 10 * k + i, s"x-$k-$i"))
        .toDF("id", "payload").coalesce(1),
      TxLog.Append, statsCols = Seq("id"))) // v5-v8
    // the race: the interloper claims v9, the folded delete claims v10 —
    // the CHECKPOINT version, whose replay must carry BOTH vectors' refs,
    // counts, and byte-ledger entries
    TxLog.testRaceHook = () => {
      TxLog.deleteVectors(spark, root,
        col("id") >= 3000L && col("id") < 4000L && col("id") % 10 === 1L); ()
    }
    val v = TxLog.deleteVectors(spark, root,
      col("id") < 1000L && col("id") % 10 === 2L)
    assert(v === 10L && v % TxLog.CheckpointEvery === 0L)
    // destroy every pre-checkpoint manifest: reads must reconstruct the
    // folded state (both DV refs + the appends) from c10 alone
    (1 to 9).foreach { k =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "_txlog", f"v$k%08d.json"),
        "garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 4000L + 40L - 200L)
    assert(snap.filter(col("id") < 1000L && col("id") % 10 === 2L).count() === 0L)
    assert(snap.filter(col("id") >= 3000L && col("id") < 4000L &&
      col("id") % 10 === 1L).count() === 0L)
    assert(TxLog.rowCount(root) === Some(3840L))
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.entries.count(_.dvs.nonEmpty) === 2)
    val live = r.entries.iterator.flatMap(_.dvs).toSet
    assert(live.forall(r.dvBytes.contains),
      "the checkpoint must carry the dv-byte ledger for live refs")
  }

  test("a clone resolves the source's deletion vectors externally") {
    val root = table()
    TxLog.deleteVectors(spark, root, col("id") % 10 === 9)
    val dst = Zones.tempDir("txdvclone")
    TxLog.cloneTable(root, dst)
    val snap = TxLog.snapshot(spark, dst)
    assert(snap.count() === 3600L)
    assert(snap.filter(col("id") % 10 === 9).count() === 0L)
  }
}
