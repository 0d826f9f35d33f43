package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column mapping (RENAME/DROP COLUMN): logical names live in the
  * recorded schema, physical names live in the files, `colmap` bridges
  * them — so a rename is one metadata commit, pre-rename files read
  * through the new name, pre-rename zone maps and blooms keep pruning,
  * a dropped column's bytes never resurface on re-add, and the state
  * survives checkpoints. Delta's column-mapping semantics at txlog size.
  */
class ColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(lo: Int, hi: Int, tag: String = "v") = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"$tag-$i")).toDF("id", "payload")
  }

  test("RENAME COLUMN reads pre-rename files through the new name; old zone maps keep pruning") {
    val root = Zones.tempDir("cmren")
    (0 until 3).foreach(f => TxLog.commit(spark, root,
      batch(1000 * f, 1000 * f + 1000).coalesce(1), TxLog.Append,
      statsCols = Seq("id"), bloomCols = Map("payload" -> 1000L)))
    val v = TxLog.renameColumn(root, "payload", "text")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("id", "text"))
    assert(snap.count() === 3000L)
    assert(snap.filter(col("text") === "v-42").count() === 1L)
    // pre-rename ZONE MAPS prune through the mapping (id untouched here,
    // but the point lookup runs under the renamed schema)
    val q = snap.filter(col("id").between(1100L, 1200L))
    assert(q.count() === 101L)
    assert(TxLogFileIndex.of(q).lastListed.size === 1)
    // pre-rename BLOOM sidecars prune on the RENAMED column
    val b = TxLog.snapshot(spark, root).filter(col("text") === "v-2042")
    assert(b.count() === 1L)
    assert(TxLogFileIndex.of(b).lastListed.size === 1,
      "a bloom built under the old name must prune under the new one")
    // time travel below the rename sees the old name
    assert(TxLog.snapshot(spark, root, Some(v - 1)).columns.toSeq
      === Seq("id", "payload"))
    // appends under the NEW name interleave with old files seamlessly
    import spark.implicits._
    TxLog.commit(spark, root,
      Seq((9000L, "new-0")).toDF("id", "text").coalesce(1), TxLog.Append,
      statsCols = Seq("id"))
    val all = TxLog.snapshot(spark, root)
    assert(all.count() === 3001L)
    assert(all.filter(col("text") === "new-0").count() === 1L)
    assert(all.filter(col("text") === "v-7").count() === 1L)
  }

  test("DML (merge / DV delete / MoR update / compact) works across a rename") {
    import spark.implicits._
    val root = Zones.tempDir("cmdml")
    (0 until 2).foreach(f => TxLog.commit(spark, root,
      batch(1000 * f, 1000 * f + 1000).coalesce(1), TxLog.Append,
      statsCols = Seq("id")))
    TxLog.renameColumn(root, "payload", "text")
    // merge on the unmapped key: file-granular, logical-name updates df
    TxLog.merge(spark, root, Seq((1500L, "patched")).toDF("id", "text"), "id")
    assert(TxLog.snapshot(spark, root).filter(col("id") === 1500L)
      .head().getString(1) === "patched")
    // DV delete filtered on the RENAMED column
    val base = TxLog.headVersion(root)
    val v = TxLog.deleteVectors(spark, root, col("text") === "v-42")
    assert(TxLog.snapshot(spark, root).count() === 1999L)
    // the typed CDF surfaces the logical (renamed) schema
    val d = TxLog.changes(spark, root, base, v, withChangeType = true)
    assert(d.columns.contains("text") && !d.columns.contains("payload"))
    assert(d.filter(col("_change_type") === "delete").count() === 1L)
    // MoR update through the mapping
    TxLog.updateVectors(spark, root, col("id") === 7L,
      Map("text" -> lit("u7")))
    assert(TxLog.snapshot(spark, root).filter(col("id") === 7L)
      .head().getString(1) === "u7")
    // compact materializes everything and keeps the logical schema
    TxLog.compact(spark, root, smallBytes = Long.MaxValue, statsCols = Seq("id"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("id", "text"))
    assert(snap.count() === 1999L)
    assert(snap.filter(col("id") === 7L).head().getString(1) === "u7")
    assert(TxLog.rowCount(root) === Some(1999L))
  }

  test("DROP then RE-ADD: the old column's bytes never resurface") {
    import spark.implicits._
    val root = Zones.tempDir("cmdrop")
    TxLog.commit(spark, root,
      (0 until 100).map(i => (i.toLong, s"secret-$i")).toDF("id", "payload")
        .coalesce(1), TxLog.Append, statsCols = Seq("id"))
    TxLog.dropColumn(root, "payload")
    assert(TxLog.snapshot(spark, root).columns.toSeq === Seq("id"))
    // re-add the same logical name via an evolving append: fresh
    // physical, so rows from the OLD files read NULL, never "secret-*"
    TxLog.commit(spark, root,
      (100 until 110).map(i => (i.toLong, s"fresh-$i")).toDF("id", "payload")
        .coalesce(1), TxLog.Append, statsCols = Seq("id"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 110L)
    assert(snap.filter(col("payload").startsWith("secret")).count() === 0L,
      "dropped bytes must not resurface on re-add")
    assert(snap.filter(col("payload").startsWith("fresh")).count() === 10L)
    assert(snap.filter(col("id") < 100L && col("payload").isNull).count() === 100L)
    // time travel below the drop still sees the secrets (immutability)
    assert(TxLog.snapshot(spark, root, Some(1L))
      .filter(col("payload").startsWith("secret")).count() === 100L)
  }

  test("mapping state survives a checkpoint and refuses guarded columns") {
    import spark.implicits._
    val root = Zones.tempDir("cmckpt")
    TxLog.commit(spark, root, batch(0, 100).coalesce(1), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Nil)
    TxLog.renameColumn(root, "payload", "text")
    // push past a checkpoint boundary (CheckpointEvery = 10)
    (0 until 10).foreach(i => TxLog.append(spark, root,
      Seq((1000L + i, s"t-$i")).toDF("id", "text")))
    assert(TxLog.headVersion(root) >= TxLog.CheckpointEvery)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.colMap === Map("text" -> "payload"),
      "the mapping must survive checkpoint-bounded replay")
    val snap = TxLog.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("id", "text"))
    assert(snap.filter(col("text") === "v-5").count() === 1L)
    assert(snap.count() === 110L)
    // a constraint-referenced column refuses rename/drop
    TxLog.addConstraint(spark, root, "id_pos", "id >= 0")
    assertThrows[IllegalArgumentException](TxLog.renameColumn(root, "id", "key"))
    assertThrows[IllegalArgumentException](TxLog.dropColumn(root, "id"))
    // a partitioned table renames BOTH kinds of column: data columns as
    // always, and the partition column itself through the mapping (the
    // dedicated partition-rename case covers dirs/pruning/checkpoints)
    val proot = Zones.tempDir("cmpart")
    TxLog.commit(spark, proot,
      Seq((1L, "en", "a"), (2L, "fr", "b")).toDF("id", "lang", "t"),
      TxLog.Append, partitionBy = Seq("lang"))
    TxLog.renameColumn(proot, "t", "body")
    TxLog.renameColumn(proot, "lang", "language")
    val ps = TxLog.snapshot(spark, proot)
    assert(ps.columns.toSet === Set("id", "language", "body"))
    assert(ps.count() === 2L)
    assert(ps.filter(col("language") === "en").head()
      .getAs[String]("body") === "a")
  }

  test("PARTITION column rename: old dirs, new writes, pruning, and checkpoints all resolve") {
    import spark.implicits._
    val root = Zones.tempDir("cmpren")
    def rows(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Seq("de", "en", "fr", "ja")(i % 4), s"doc-$i"))
      .toDF("id", "lang", "text")
    TxLog.commit(spark, root, rows(0, 80), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("lang"))
    TxLog.renameColumn(root, "lang", "language")
    // pre-rename generation reads through the new logical name
    val snap = TxLog.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("id", "text", "language"))
    assert(snap.filter(col("language").isNull).count() === 0L)
    assert(snap.groupBy("language").count().collect()
      .map(_.getLong(1)).forall(_ === 20L))
    // new writes declare the NEW name but land in the OLD physical dirs:
    // the layout stays physically uniform (one generation, no union)
    TxLog.commit(spark, root,
      rows(80, 120).withColumnRenamed("lang", "language"), TxLog.Append,
      statsCols = Seq("id"), partitionBy = Seq("language"))
    assert(TxLog.replay(root, TxLog.headVersion(root)).files
      .forall(_.contains("lang=")),
      "post-rename writes must keep the physical directory name")
    // directory PRUNING applies across both eras under the new name
    val q = TxLog.snapshot(spark, root).filter(col("language") === "en")
    assert(q.count() === 30L)
    assert(TxLogFileIndex.of(q).lastListed.forall(_.contains("lang=en")),
      "partition pruning must resolve the renamed column to its dirs")
    // a stale writer still declaring the OLD name refuses loudly
    assertThrows[IllegalArgumentException](TxLog.commit(spark, root,
      rows(200, 204), TxLog.Append, partitionBy = Seq("lang")))
    // DML across the renamed partition column stays partition-granular
    val before = TxLog.replay(root, TxLog.headVersion(root)).files.toSet
    TxLog.delete(spark, root, col("language") === "ja")
    val after = TxLog.replay(root, TxLog.headVersion(root)).files.toSet
    assert(before.intersect(after) === before.filterNot(_.contains("lang=ja")),
      "delete must touch only the renamed partition's files")
    assert(TxLog.snapshot(spark, root).filter(col("language") === "ja")
      .count() === 0L)
    // push past a checkpoint boundary; the mapping + layout survive
    (0 until 10).foreach(i => TxLog.commit(spark, root,
      Seq((2000L + i, "en", s"late-$i")).toDF("id", "language", "text"),
      TxLog.Append, partitionBy = Seq("language")))
    val head = TxLog.headVersion(root)
    assert(head >= TxLog.CheckpointEvery)
    val ckpt = (head / TxLog.CheckpointEvery) * TxLog.CheckpointEvery
    assert(LogStore.forRoot(root).exists(f"$root/_txlog/c$ckpt%08d.json"))
    (1L until ckpt).foreach(k => LogStore.forRoot(root).putReplace(
      f"$root/_txlog/v$k%08d.json",
      "garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val r = TxLog.replay(root, head)
    assert(r.partitionBy === Some(Seq("language")))
    assert(r.colMap.get("language") === Some("lang"),
      "the partition mapping must survive checkpoint-bounded replay")
    val s2 = TxLog.snapshot(spark, root)
    assert(s2.count() === 90L + 10L) // 120 − 30 ja + 10 late
    assert(s2.filter(col("language") === "en").count() === 40L)
  }

  test("CDF across a partition-column rename restores k=v values from the PHYSICAL dirs") {
    import spark.implicits._
    val root = Zones.tempDir("cmprencdf")
    def rows(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Seq("de", "en")(i % 2), s"doc-$i"))
      .toDF("id", "lang", "text")
    TxLog.commit(spark, root, rows(0, 20), TxLog.Append,
      partitionBy = Seq("lang"))                       // v1: pre-rename era
    TxLog.renameColumn(root, "lang", "language")       // v2: content-preserving
    TxLog.commit(spark, root,
      rows(100, 110).withColumnRenamed("lang", "language"), TxLog.Append,
      partitionBy = Seq("language"))                   // v3: post-rename era
    val cdf = TxLog.changes(spark, root, 0L, 3L, withChangeType = true)
    // subscribers see the logical name as of `to`, with the partition
    // values re-derived from the physical lang= dirs — never NULL
    assert(cdf.columns.contains("language") && !cdf.columns.contains("lang"))
    assert(cdf.count() === 30L)
    assert(cdf.filter(col("language").isNull).count() === 0L,
      "CDF must restore renamed partition values from the physical dirs")
    assert(cdf.filter(col("language") === "en").count() === 15L)
    val v3 = cdf.filter(col("_commit_version") === 3L)
    assert(v3.count() === 10L &&
      v3.collect().forall(_.getAs[String]("_change_type") == "insert"))
  }

  test("a RENAME landing inside an append's write window conflicts loudly, never resurrects") {
    val root = Zones.tempDir("cmrace")
    TxLog.commit(spark, root, batch(0, 50).coalesce(1), TxLog.Append,
      statsCols = Seq("id"))
    // the race: the append wrote its files under the OLD physical names,
    // then the rename publishes first — merging the append's recorded
    // schema would resurrect the old logical name over retired bytes, so
    // the append must conflict instead (deterministic via the
    // publish-window hook)
    TxLog.testRaceHook =
      () => { TxLog.renameColumn(root, "payload", "text"); () }
    assertThrows[TxLog.CommitConflict](TxLog.append(spark, root, batch(50, 60)))
    assert(TxLog.snapshot(spark, root).columns.toSeq === Seq("id", "text"))
    assert(TxLog.snapshot(spark, root).count() === 50L,
      "the conflicted append must leave no rows behind")
    // a retry under the new schema lands cleanly
    import spark.implicits._
    TxLog.append(spark, root, Seq((50L, "ok")).toDF("id", "text"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 51L)
    assert(snap.filter(col("text") === "v-7").count() === 1L)
    assert(snap.filter(col("text") === "ok").count() === 1L)
  }

  test("rename then re-append under the OLD name makes a fresh column, not a collision") {
    import spark.implicits._
    val root = Zones.tempDir("cmcollide")
    TxLog.commit(spark, root, batch(0, 50).coalesce(1), TxLog.Append,
      statsCols = Seq("id"))
    TxLog.renameColumn(root, "payload", "text")
    // an old writer still appending `payload`: becomes a NEW logical
    // column with a fresh physical — the renamed column's bytes stay put
    TxLog.commit(spark, root,
      Seq((500L, "t", "p")).toDF("id", "text", "payload").coalesce(1),
      TxLog.Append, statsCols = Seq("id"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.columns.toSet === Set("id", "text", "payload"))
    assert(snap.filter(col("payload").isNotNull).count() === 1L,
      "only the new row carries the re-added column")
    assert(snap.filter(col("text") === "v-7").count() === 1L,
      "the renamed column still reads the old files' bytes")
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.colMap("text") === "payload")
    assert(r.colMap.contains("payload") &&
      r.colMap("payload").startsWith("c_"),
      s"the re-added column needs a fresh physical name: ${r.colMap}")
  }

  test("clone carries the mapping: a clone-after-rename reads real values, not NULLs") {
    import spark.implicits._
    val src = Zones.tempDir("cmclsrc")
    TxLog.commit(spark, src,
      (0 until 100).map(i => (i.toLong, s"keep-$i", s"secret-$i"))
        .toDF("id", "payload", "extra").coalesce(1),
      TxLog.Append, statsCols = Seq("id"))
    TxLog.commit(spark, src,
      (100 until 120).map(i => (i.toLong, s"keep-$i", s"secret-$i"))
        .toDF("id", "payload", "extra").coalesce(1),
      TxLog.Append, statsCols = Seq("id")) // 2nd file so zorder rewrites
    TxLog.renameColumn(src, "payload", "text") // colMap
    TxLog.dropColumn(src, "extra")             // droppedPhys
    TxLog.addConstraint(spark, src, "id_pos", "id >= 0") // constraints
    TxLog.compactZOrder(spark, src, "id", "id",
      smallBytes = Long.MaxValue) // records cluster keys
    assert(TxLog.clusterKeysOf(src) === Seq("id", "id"))

    val dst = Zones.tempDir("cmcldst")
    TxLog.cloneTable(src, dst)
    // the clone's scan resolves logical→physical through the carried
    // map: every pre-rename value reads back, none as NULL
    val snap = TxLog.snapshot(spark, dst)
    assert(snap.columns.toSeq === Seq("id", "text"))
    assert(snap.filter(col("text").isNull).count() === 0L,
      "a clone without the column mapping reads every renamed column as NULL")
    assert(snap.filter(col("text") === "keep-42").count() === 1L)
    val r = TxLog.replay(dst, TxLog.headVersion(dst))
    assert(r.colMap === Map("text" -> "payload"))
    assert(r.droppedPhys === Set("extra"),
      "retired physicals must ride the clone or a re-add resurfaces bytes")
    assert(r.constraints === Map("id_pos" -> "id >= 0"))
    assert(TxLog.clusterKeysOf(dst) === Seq("id", "id"))
    // re-adding the dropped name in the CLONE gets a fresh physical:
    // the source's "secret-*" bytes never resurface
    TxLog.commit(spark, dst,
      Seq((500L, "t-500", "fresh")).toDF("id", "text", "extra").coalesce(1),
      TxLog.Append, statsCols = Seq("id"))
    val snap2 = TxLog.snapshot(spark, dst)
    assert(snap2.filter(col("extra").startsWith("secret")).count() === 0L,
      "dropped bytes must not resurface through a clone")
    assert(snap2.filter(col("extra") === "fresh").count() === 1L)
    // the carried constraint is live in the clone
    intercept[TxLog.ConstraintViolation](TxLog.commit(spark, dst,
      Seq((-1L, "bad")).toDF("id", "text").coalesce(1), TxLog.Append))
  }

  test("RESTORE below a rename rewinds the mapping: the old name appends and reads again") {
    import spark.implicits._
    val root = Zones.tempDir("cmrestren")
    TxLog.commit(spark, root, batch(0, 50).coalesce(1), TxLog.Append,
      statsCols = Seq("id"))                       // v1: payload era
    TxLog.renameColumn(root, "payload", "text")    // v2
    TxLog.append(spark, root,
      Seq((900L, "post")).toDF("id", "text"))      // v3: text era
    TxLog.restore(spark, root, 1L)                 // v4: payload again
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.colMap.isEmpty,
      s"restore below the rename must rewind the mapping: ${r.colMap}")
    // the old name appends IDENTITY-mapped — no fresh physical, so the
    // restored files keep reading (the pre-fix behavior NULLed them)
    TxLog.append(spark, root, Seq((901L, "new")).toDF("id", "payload"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("id", "payload"))
    assert(snap.count() === 51L)
    assert(snap.filter(col("payload").isNull).count() === 0L,
      "post-restore appends must not orphan the restored files' column")
    assert(snap.filter(col("payload") === "v-7").count() === 1L)
    assert(snap.filter(col("payload") === "new").count() === 1L)
    // time travel into the text era still reads through ITS mapping
    assert(TxLog.snapshot(spark, root, Some(3L))
      .filter(col("text") === "v-7").count() === 1L)
  }

  test("a RENAME landing inside RESTORE's window is not lost: the claim is head-pinned") {
    import spark.implicits._
    val root = Zones.tempDir("cmrestrace")
    TxLog.commit(spark, root, batch(0, 50).coalesce(1), TxLog.Append,
      statsCols = Seq("id"))                       // v1: payload era
    TxLog.renameColumn(root, "payload", "text")    // v2
    // the race: a SECOND rename (text → label) commits between restore's
    // head/mapping read and its claim. An unpinned restore would compute
    // colUnmap from the stale mapping ({text}), miss {label}, and leave
    // label → payload-physical alive after the restore — a later append
    // of a "label" column would then write into the restored payload
    // column's bytes (silent collision). The pinned claim conflicts,
    // rereads, and unmaps the mapping that actually holds at commit time.
    TxLog.testRaceHook =
      () => { TxLog.renameColumn(root, "text", "label"); () }
    TxLog.restore(spark, root, 1L)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(r.colMap.isEmpty,
      s"the interleaved rename's mapping must be unmapped too: ${r.colMap}")
    // appending a fresh "label" column now makes a NEW column — it must
    // never alias the restored payload's physical bytes
    TxLog.append(spark, root,
      Seq((900L, "old-style", "fresh")).toDF("id", "payload", "label"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 51L)
    assert(snap.filter(col("payload") === "v-7").count() === 1L,
      "restored payload bytes must read back intact")
    assert(snap.filter(col("label").isNotNull).count() === 1L,
      "label is a fresh column: null for every restored row, set for the new one")
    assert(snap.filter(col("label") === "fresh" &&
      col("payload") === "old-style").count() === 1L)
  }

  test("RESTORE below a drop resurrects the column: identity physical, no NULLing append") {
    import spark.implicits._
    val root = Zones.tempDir("cmrestdrop")
    TxLog.commit(spark, root,
      (0 until 40).map(i => (i.toLong, s"keep-$i")).toDF("id", "extra")
        .coalesce(1), TxLog.Append, statsCols = Seq("id"))  // v1
    TxLog.dropColumn(root, "extra")                          // v2
    TxLog.restore(spark, root, 1L)                           // v3: extra is back
    assert(TxLog.snapshot(spark, root)
      .filter(col("extra").startsWith("keep")).count() === 40L,
      "restore must resurrect the dropped column's values")
    // an append under the resurrected name keeps the IDENTITY physical
    // (the schema reads it live), so nothing NULLs out
    TxLog.append(spark, root, Seq((500L, "fresh")).toDF("id", "extra"))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 41L)
    assert(snap.filter(col("extra").isNull).count() === 0L,
      "an append after restore-below-drop must not orphan the column")
    assert(snap.filter(col("extra") === "fresh").count() === 1L)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    assert(!r.colMap.contains("extra"),
      s"the resurrected column must stay identity-mapped: ${r.colMap}")
    // the retirement ledger stays monotone — dropping AGAIN and
    // re-adding still takes a fresh physical (no byte resurfacing)
    TxLog.dropColumn(root, "extra")
    TxLog.append(spark, root, Seq((600L, "readd")).toDF("id", "extra"))
    val snap2 = TxLog.snapshot(spark, root)
    assert(snap2.filter(col("extra").startsWith("keep")).count() === 0L,
      "re-add after a live drop must still never resurface old bytes")
    assert(snap2.filter(col("extra") === "readd").count() === 1L)
  }

  test("rename of a recorded cluster key rewrites the keys; drop of one refuses") {
    import spark.implicits._
    val root = Zones.tempDir("cmclkey")
    TxLog.commit(spark, root,
      (0 until 100).map(i => (i.toLong, i.toLong * 7 % 100, s"v-$i"))
        .toDF("a", "b", "payload").coalesce(1),
      TxLog.Append, statsCols = Seq("a", "b"))
    TxLog.append(spark, root, Seq((500L, 1L, "x")).toDF("a", "b", "payload"))
    TxLog.compactZOrder(spark, root, "a", "b", smallBytes = Long.MaxValue)
    assert(TxLog.clusterKeysOf(root) === Seq("a", "b"))
    TxLog.renameColumn(root, "b", "bucket")
    assert(TxLog.clusterKeysOf(root) === Seq("a", "bucket"),
      "cluster keys must follow the rename in the same commit")
    // keyless re-cluster resolves through the rewritten keys
    TxLog.append(spark, root, Seq((600L, 2L, "y")).toDF("a", "bucket", "payload"))
    TxLog.compactZOrder(spark, root)
    assert(TxLog.snapshot(spark, root).count() === 102L)
    // dropping a recorded cluster key is refused, like a partition column
    val e = intercept[IllegalArgumentException](TxLog.dropColumn(root, "bucket"))
    assert(e.getMessage.contains("clustering key"))
  }
}
