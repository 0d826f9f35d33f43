package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The txlog's storage interface: schemeless roots keep the fully-atomic
  * hard-link store, scheme-ful roots run the Hadoop FileSystem store —
  * proven here by running a table END TO END against `file:///` through
  * the Hadoop implementation (commits, zone maps, blooms, DV delete,
  * compact, vacuum, time travel, exactly-once), plus unit coverage of
  * both stores' claim semantics and the manifest dv-byte ledger that
  * makes the read path's broadcast sizing metadata-only.
  */
class LogStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("store routing: every scheme reaches the store whose claim is atomic there") {
    assert(LogStore.forRoot("/tmp/x") eq LocalLogStore)
    // file: must NOT reach the Hadoop store: its local rename can
    // overwrite, so two racing committers could both claim one version
    assert(LogStore.forRoot("file:///tmp/x") eq FileSchemeLogStore)
    assert(FileSchemeLogStore.strip("file:///tmp/x") === "/tmp/x")
    assert(FileSchemeLogStore.strip("file:/tmp/x") === "/tmp/x")
    assert(LogStore.forRoot("hdfs://nn/x") eq HadoopLogStore)
    assert(LogStore.forRoot("mem://b/x") eq ObjectStoreLogStore.Mem)
    // Hadoop Path/URI semantics: file: URIs carry percent-encoded
    // octets — an encoded root must resolve to the DECODED directory the
    // table previously lived at, not a literal '%20' path
    assert(FileSchemeLogStore.strip("file:/data/my%20table") === "/data/my table")
    assert(FileSchemeLogStore.strip("file:///a/b%2Bc") === "/a/b+c")
    // a raw (unencoded) path with characters a URI refuses keeps working
    // byte-for-byte via the literal fallback
    assert(FileSchemeLogStore.strip("file:/data/my table") === "/data/my table")
    // deployment-registered schemes route to their object store
    val probe = new ObjectStoreLogStore(p => (InMemoryObjectStore.bucket("rt"), p))
    LogStore.registerScheme("probe", probe)
    assert(LogStore.forRoot("probe://b/x") eq probe)
  }

  test("both stores: putIfAbsent claims exactly once and publishes complete bytes") {
    for ((s, root) <- Seq(
      (LocalLogStore: LogStore, Zones.tempDir("lsloc")),
      (HadoopLogStore: LogStore, "file://" + Zones.tempDir("lshad")))) {
      s.mkdirs(s"$root/d")
      val p = s"$root/d/claim.json"
      assert(s.putIfAbsent(p, "first".getBytes("UTF-8")))
      assert(!s.putIfAbsent(p, "second".getBytes("UTF-8")),
        "a taken slot must refuse the claim")
      assert(s.readText(p) === "first", "the loser must not damage the winner")
      // no temp residue from the losing claim
      assert(s.list(s"$root/d").forall(!_.startsWith(".tmp-")))
      // replace is atomic overwrite
      s.putReplace(p, "third".getBytes("UTF-8"))
      assert(s.readText(p) === "third")
      // walk returns sizes inline, relative paths
      val w = s.walk(s"$root/d")
      assert(w.map(_.relPath) === Seq("claim.json"))
      assert(w.head.size === 5L)
      // delete refuses a non-empty dir, then takes the emptied one
      assert(!s.delete(s"$root/d"))
      assert(s.delete(p))
      assert(s.delete(s"$root/d"))
    }
  }

  test("a txlog table runs end-to-end against file:/// through the Hadoop store") {
    val root = "file://" + Zones.tempDir("lse2e")
    // three zone-mapped, bloom-indexed, range-clustered commits
    (0 until 3).foreach { f =>
      val df = batch(1000 * f, 1000 * f + 1000)
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("id"), bloomCols = Map("payload" -> 1000L))
    }
    assert(TxLog.headVersion(root) === 3L)
    assert(TxLog.rowCount(root) === Some(3000L))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 3000L)
    // zone-map pruning works through the scheme-ful index keys
    val q = snap.filter(col("id").between(1100L, 1200L))
    assert(q.count() === 101L)
    assert(TxLogFileIndex.of(q).lastListed.size === 1,
      "zone maps must prune on a file:/// root")
    // bloom point lookup prunes to the one file that can hold the value
    val b = TxLog.snapshot(spark, root).filter(col("payload") === "row-2042")
    assert(b.count() === 1L)
    assert(TxLogFileIndex.of(b).lastListed.size === 1,
      "bloom sidecars must probe through the store")
    // merge-on-read delete + metadata-only count + CDF
    val v = TxLog.deleteVectors(spark, root, col("id") % 10 === 3L)
    assert(TxLog.rowCount(root) === Some(2700L))
    assert(TxLog.snapshot(spark, root).count() === 2700L)
    assert(TxLog.changes(spark, root, v - 1, v, withChangeType = true)
      .count() === 300L)
    // time travel below the delete
    assert(TxLog.snapshot(spark, root, Some(3L)).count() === 3000L)
    // exactly-once bookkeeping through the store
    val v1 = TxLog.appendOnce(spark, root, "once#1", batch(9000, 9010))
    assert(TxLog.appendOnce(spark, root, "once#1", batch(9000, 9010)) === v1)
    assert(TxLog.snapshot(spark, root).count() === 2710L)
    // compact materializes the deletes; vacuum reclaims the old files
    TxLog.compact(spark, root, smallBytes = Long.MaxValue, statsCols = Seq("id"))
    assert(TxLog.replay(root, TxLog.headVersion(root)).entries
      .forall(_.dvs.isEmpty))
    val reclaimed = TxLog.vacuum(root,
      retainFrom = TxLog.headVersion(root), inflightGraceMs = 0L)
    assert(reclaimed >= 4, s"expected the 4 pre-compact files gone, got $reclaimed")
    assert(TxLog.snapshot(spark, root).count() === 2710L)
    assert(TxLog.rowCount(root) === Some(2710L))
  }

  test("manifests carry dv byte sizes: the broadcast decision reads no dv dir") {
    val root = Zones.tempDir("lsdvb")
    (0 until 2).foreach(f => TxLog.commit(spark, root,
      batch(1000 * f, 1000 * f + 1000).coalesce(1), TxLog.Append,
      statsCols = Seq("id")))
    TxLog.deleteVectors(spark, root, col("id") % 7 === 0L)
    val r = TxLog.replay(root, TxLog.headVersion(root))
    val refs = r.entries.iterator.flatMap(_.dvs).toSet
    assert(refs.size === 1)
    val ledger = r.dvBytes
    assert(refs.forall(ledger.contains),
      s"every dv ref must carry its byte size in the log: $ledger")
    assert(ledger.values.forall(_ > 0L))
    // the ledger equals the actual dir size (so the fallback walk and
    // the metadata path agree), and it survives a checkpoint
    refs.foreach { d =>
      assert(ledger(d) === TxLogFileIndex.dirBytes(s"$root/$d"))
    }
    (0 until 10).foreach(i => TxLog.append(spark, root, batch(5000 + i, 5001 + i)))
    val r2 = TxLog.replay(root, TxLog.headVersion(root))
    assert(refs.forall(r2.dvBytes.contains),
      "the dv-byte ledger must survive checkpoint-bounded replay")
    assert(TxLog.snapshot(spark, root).count() === 2000L - 286L + 10L)
  }
}
