package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hive-style partition columns on the transaction log: the LOG declares
  * the layout (no directory discovery, no type inference), the file
  * index populates real partition values, pushed-down partition filters
  * prune DIRECTORIES, and zone maps still prune FILES inside surviving
  * partitions — the two prunings compose.
  */
class TxLogPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(): String = Zones.tempDir("txlogp")

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Seq("de", "en", "fr", "ja")(i % 4), s"doc-$i")
    }.toDF("id", "lang", "text")
  }

  test("a partitioned snapshot reads values from k=v dirs and prunes partitions at plan time") {
    val root = freshTable()
    TxLog.commit(spark, root, corpus(400).repartition(2), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang"))
    // partition values round-trip with their recorded type
    val q = TxLog.snapshot(spark, root).filter(col("lang") === "en")
    val rows = q.collect()
    assert(rows.length === 100)
    assert(rows.forall(_.getAs[String]("lang") === "en"))
    // the filter became a PARTITION filter: only en's files were listed
    val listed = TxLogFileIndex.of(q).lastListed
    assert(listed.nonEmpty && listed.forall(_.contains("lang=en")),
      s"partition pruning must keep only lang=en files, got $listed")
    // ... and the plan says so
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected a partition filter in the plan:\n$plan")
    // partition pruning COMPOSES with zone maps: id range prunes files
    // WITHIN the surviving partition
    val q2 = TxLog.snapshot(spark, root)
      .filter(col("lang") === "en" && col("id") < 10)
    assert(q2.count() === 3L) // ids 1, 5, 9 are lang=en (i % 4 == 1)
    val listed2 = TxLogFileIndex.of(q2).lastListed
    assert(listed2.forall(_.contains("lang=en")))
    assert(listed2.size <= listed.size)
  }

  test("merge, optimize, and compact round-trip a partitioned layout") {
    import spark.implicits._
    val root = freshTable()
    TxLog.commit(spark, root, corpus(100), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang"))
    // merge: update one row, insert one — layout preserved
    TxLog.merge(spark, root,
      Seq((5L, "en", "UPDATED"), (1000L, "zh", "NEW")).toDF("id", "lang", "text"),
      "id")
    val afterMerge = TxLog.replay(root, TxLog.headVersion(root))
    assert(afterMerge.partitionBy === Some(Seq("lang")))
    assert(afterMerge.files.forall(_.contains("lang=")),
      s"merge must rewrite partitioned files partitioned: ${afterMerge.files}")
    // partition columns surface LAST in a file-source scan (stock Spark
    // layout: dataSchema ++ partitionSchema) — read by name
    val m = TxLog.snapshot(spark, root).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("lang"), r.getAs[String]("text"))).toMap
    assert(m.size === 101)
    assert(m(5L) === ("en", "UPDATED") && m(1000L) === ("zh", "NEW"))
    assert(m(6L) === ("fr", "doc-6"))
    // optimize: re-layouts WITHIN the declared partitioning
    TxLog.optimize(spark, root, targetFiles = 2, sortCol = Some("id"))
    val afterOpt = TxLog.replay(root, TxLog.headVersion(root))
    assert(afterOpt.partitionBy === Some(Seq("lang")))
    assert(TxLog.snapshot(spark, root).count() === 101L)
    // compact: everything is tiny at this scale, so all files qualify —
    // the rewrite must come out partitioned again
    TxLog.compact(spark, root, smallBytes = 64L * 1024 * 1024,
      statsCols = Seq("id"))
    val afterCmp = TxLog.replay(root, TxLog.headVersion(root))
    assert(afterCmp.partitionBy === Some(Seq("lang")))
    assert(afterCmp.files.forall(_.contains("lang=")))
    assert(TxLog.snapshot(spark, root).count() === 101L)
    // a partitioned append declaring a DIFFERENT layout is refused
    val c = intercept[IllegalArgumentException] {
      TxLog.commit(spark, root, corpus(8), TxLog.Append,
        partitionBy = Seq("text"))
    }
    assert(c.getMessage.contains("partitioned"), c.getMessage)
  }

  test("mixed layout generations READ correctly per-file (partition evolution, not refusal)") {
    val root = freshTable()
    TxLog.commit(spark, root, corpus(40), TxLog.Append,
      partitionBy = Seq("lang"))
    // an UNPARTITIONED append lands: its files carry lang IN-FILE while
    // the older generation keeps it in k=v dirs — each file reads under
    // its own path-declared layout (Iceberg's spec evolution semantics)
    TxLog.append(spark, root, corpus(4))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 44L)
    val byLang = snap.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("de" -> 11L, "en" -> 11L, "fr" -> 11L, "ja" -> 11L))
    // doc ids 0-3 exist in BOTH generations now
    assert(snap.filter(col("id") === 1L).count() === 2L)
    // time travel below the evolution sees one uniform generation
    assert(TxLog.snapshot(spark, root, Some(1L)).count() === 40L)
    // crucially the BLIND flat append did not change the current spec —
    // only an explicit declaration moves it, so rewrites keep
    // partitioning and the flat generation migrates at the next compact
    assert(TxLog.replay(root, TxLog.headVersion(root)).partitionBy
      === Some(Seq("lang")))
    TxLog.compact(spark, root, smallBytes = Long.MaxValue)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.files.forall(_.contains("lang=")),
      s"compaction must migrate the blind flat generation back: ${r.files}")
    assert(TxLog.snapshot(spark, root).count() === 44L)
  }

  test("explicit partition evolution: a layout change at a commit boundary reads, prunes, and compacts away") {
    val root = freshTable()
    // generation 1: flat; generation 2: partitioned by lang — an
    // explicit spec change (the default still refuses disagreement)
    TxLog.commit(spark, root, corpus(40), TxLog.Append, statsCols = Seq("id"))
    TxLog.commit(spark, root,
      corpus(40).withColumn("id", col("id") + 100), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang"),
      evolvePartitions = true)
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 80L)
    assert(snap.groupBy("lang").count().collect()
      .map(_.getLong(1)).forall(_ === 20L))
    // the CURRENT spec is the latest declaration: a plain same-layout
    // append keeps working, a disagreeing one still refuses
    TxLog.commit(spark, root,
      corpus(4).withColumn("id", col("id") + 900), TxLog.Append,
      partitionBy = Seq("lang"))
    assertThrows[IllegalArgumentException] {
      TxLog.commit(spark, root, corpus(4), TxLog.Append,
        partitionBy = Seq("text"))
    }
    assert(TxLog.snapshot(spark, root).count() === 84L)
    // a DV delete on the mixed table is conservative but CORRECT
    TxLog.deleteVectors(spark, root, col("lang") === "ja")
    assert(TxLog.snapshot(spark, root).count() === 63L)
    assert(TxLog.snapshot(spark, root)
      .filter(col("lang") === "ja").count() === 0L)
    // compact MIGRATES every generation to the current spec: uniform again
    TxLog.compact(spark, root, smallBytes = Long.MaxValue, statsCols = Seq("id"))
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.files.forall(_.contains("lang=")),
      s"compaction must migrate old-generation files to the current layout: ${r.files}")
    val q = TxLog.snapshot(spark, root).filter(col("lang") === "en")
    assert(q.count() === 21L)
    assert(TxLogFileIndex.of(q).lastListed.forall(_.contains("lang=en")),
      "after migration, partition pruning applies to the whole table")
  }

  test("DELETE on a partition predicate touches only that partition's files") {
    val root = freshTable()
    TxLog.commit(spark, root, corpus(200), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang"))
    val before = TxLog.liveFiles(root, 1L).toSet
    val v = TxLog.delete(spark, root, col("lang") === "en")
    val after = TxLog.liveFiles(root, v).toSet
    assert(before.intersect(after) === before.filterNot(_.contains("lang=en")),
      "every non-en file must carry by reference; every en file must go")
    assert(TxLog.snapshot(spark, root).filter(col("lang") === "en").count() === 0L)
    assert(TxLog.snapshot(spark, root).count() === 150L)
    // the 50 deleted rows are typed change rows with their lang restored
    val deleted = TxLog.changes(spark, root, 1L, v, withChangeType = true)
      .filter(col("_change_type") === "delete")
    assert(deleted.count() === 50L)
    assert(deleted.select("lang").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("en"))
  }

  test("appendOnce lands partitioned and replays idempotently") {
    val root = freshTable()
    TxLog.appendOnce(spark, root, "mb#0", corpus(40), partitionBy = Seq("lang"))
    // the replayed microbatch no-ops; the landed one is really partitioned
    assert(TxLog.appendOnce(spark, root, "mb#0", corpus(40),
      partitionBy = Seq("lang")) === 1L)
    assert(TxLog.headVersion(root) === 1L)
    assert(TxLog.replay(root, 1L).partitionBy === Some(Seq("lang")))
    val q = TxLog.snapshot(spark, root).filter(col("lang") === "de")
    assert(q.count() === 10L)
    assert(TxLogFileIndex.of(q).lastListed.forall(_.contains("lang=de")))
  }

  test("vacuum collects a partitioned table's dropped files without touching the head") {
    val root = freshTable()
    TxLog.commit(spark, root, corpus(100), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang")) // v1
    TxLog.commit(spark, root, corpus(20), TxLog.Overwrite,
      statsCols = Seq("id"), partitionBy = Seq("lang")) // v2
    // retain-head: v1's nested k=v files are collectable; the flat
    // listing of round 8 would crash on the non-empty partition dirs
    val deleted = TxLog.vacuum(root, retainFrom = 2L)
    assert(deleted >= 1, "the overwritten partitioned files must collect")
    assert(TxLog.snapshot(spark, root).count() === 20L)
    assert(TxLog.snapshot(spark, root).filter(col("lang") === "en").count() === 5L)
    // full-retention vacuum stays a no-op
    assert(TxLog.vacuum(root) === 0)
  }

  test("the change feed restores partition values for partitioned appends and merges") {
    import spark.implicits._
    val root = freshTable()
    TxLog.commit(spark, root, corpus(40), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang")) // v1
    TxLog.commit(spark, root,
      corpus(8).withColumn("id", col("id") + 100), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang")) // v2
    val delta = TxLog.changes(spark, root, 1L, 2L)
    assert(delta.count() === 8L)
    assert(delta.columns.contains("lang"))
    val langs = delta.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("lang")).toMap
    assert(langs(100L) === "de" && langs(101L) === "en")
    // through a merge, typed: change files carry the full row while
    // append files re-derive lang from the path — both must agree
    val v3 = TxLog.merge(spark, root,
      Seq((101L, "en", "U-101")).toDF("id", "lang", "text"), "id")
    val typed = TxLog.changes(spark, root, 2L, v3, withChangeType = true)
    val byType = typed.collect()
      .map(r => r.getAs[String]("_change_type") -> r.getAs[String]("lang"))
    assert(byType.toSet === Set(
      "update_preimage" -> "en", "update_postimage" -> "en"))
  }

  test("a MIXED-layout table still checkpoints: replay stays bounded while generations coexist") {
    val root = freshTable()
    // generation 1: flat; generation 2: partitioned by lang — then keep
    // committing WITHOUT compacting, across two checkpoint boundaries.
    // A checkpoint skip here would mean O(history) replay on every
    // evolved high-commit-rate table — the exact failure checkpoints
    // exist to prevent.
    TxLog.commit(spark, root, corpus(40), TxLog.Append, statsCols = Seq("id"))
    TxLog.commit(spark, root,
      corpus(40).withColumn("id", col("id") + 100), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang"),
      evolvePartitions = true)
    (0 until 20).foreach(k => TxLog.commit(spark, root,
      corpus(4).withColumn("id", col("id") + 1000 + k * 10), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang")))
    val head = TxLog.headVersion(root)
    assert(head === 22L)
    val ckpt = (head / TxLog.CheckpointEvery) * TxLog.CheckpointEvery
    assert(LogStore.forRoot(root).exists(f"$root/_txlog/c$ckpt%08d.json"),
      "a mixed partition layout must not skip checkpoints")
    // ONE replay at head reads the checkpoint + the suffix, bounded
    TxLog.manifestReads.set(0L)
    val r = TxLog.replay(root, head)
    assert(TxLog.manifestReads.get() <= TxLog.CheckpointEvery + 1,
      s"mixed-layout replay read ${TxLog.manifestReads.get()} manifests")
    assert(r.partitionBy === Some(Seq("lang")),
      "the checkpoint must preserve the CURRENT declared spec")
    // destroy every pre-checkpoint manifest: both GENERATIONS must
    // reconstruct from the checkpoint alone (entries carry their own
    // k=v layouts; the read derives each file's layout from its path)
    (1L until ckpt).foreach(k => LogStore.forRoot(root).putReplace(
      f"$root/_txlog/v$k%08d.json",
      "garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 40L + 40L + 20L * 4L)
    assert(snap.filter(col("lang") === "en").count() === 10L + 10L + 20L)
    // per-generation directory pruning still applies post-checkpoint
    val q = snap.filter(col("lang") === "ja")
    assert(q.count() === 40L)
    // and the mixed state still migrates away cleanly
    TxLog.compact(spark, root, smallBytes = Long.MaxValue, statsCols = Seq("id"))
    val rc = TxLog.replay(root, TxLog.headVersion(root))
    assert(rc.files.forall(_.contains("lang=")),
      "compact must migrate the flat generation to the current spec")
    assert(TxLog.snapshot(spark, root).count() === 160L)
  }
}
