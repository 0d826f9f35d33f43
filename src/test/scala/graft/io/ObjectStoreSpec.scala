package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The object-store port of the commit protocol: the [[ObjectStoreApi]]
  * semantics (CAS put-if-absent, last-write-wins PUT, PAGED lexicographic
  * LIST, no rename, no directories), the [[ObjectStoreLogStore]] adapter's
  * LogStore contract on top of them, the [[MemFileSystem]] that lets
  * Spark's data I/O share the fake bucket, one full txlog table run
  * end-to-end on a `mem://` root, and the [[S3ObjectStore]] SigV4 signer
  * against AWS's own documented example vectors (the only part of the
  * real-S3 port that is pure computation — the HTTP surface reuses the
  * exact semantics proven here in-process).
  */
class ObjectStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  private def freshRoot(tag: String): String =
    s"mem://$tag-${java.util.UUID.randomUUID().toString.take(8)}/tbl"

  test("SigV4 signing matches AWS's published example vectors") {
    // the canonical example from the AWS SigV4 documentation:
    // GET https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08
    val auth = S3ObjectStore.sigV4(
      method = "GET",
      canonicalPath = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payloadHash = S3ObjectStore.hexSha256(Array.emptyByteArray),
      dateStamp = "20150830",
      region = "us-east-1",
      service = "iam",
      accessKey = "AKIDEXAMPLE",
      secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
    assert(auth ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    // the empty-payload hash is the documented constant
    assert(S3ObjectStore.hexSha256(Array.emptyByteArray) ===
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("in-memory store: CAS claim, LWW put, and genuinely paged LIST") {
    val api = new InMemoryObjectStore("cas-test", pageSize = 3)
    assert(api.putIfNoneMatch("k/a", "first".getBytes("UTF-8")))
    assert(!api.putIfNoneMatch("k/a", "second".getBytes("UTF-8")),
      "a taken key must refuse the conditional PUT")
    assert(new String(api.get("k/a").get, "UTF-8") === "first")
    api.put("k/a", "third".getBytes("UTF-8")) // unconditional = LWW
    assert(new String(api.get("k/a").get, "UTF-8") === "third")
    // 10 keys through page size 3: 4 pages, truncation flags honest
    (0 until 10).foreach(i => api.put(f"k/p$i%02d", Array[Byte](1)))
    val (page1, trunc1) = api.listPage("k/p", "", 100)
    assert(page1.size === 3 && trunc1, "the fake's page bound must bite")
    val all = ObjectStoreApi.listAll(api, "k/p").map(_.key).toList
    assert(all === (0 until 10).map(i => f"k/p$i%02d").toList,
      "paged drain must return every key in lexicographic order")
    // prefix isolation: a LIST never leaks past its prefix
    assert(ObjectStoreApi.listAll(api, "k/a").map(_.key).toList === List("k/a"))
    api.delete("k/a")
    api.delete("k/a") // idempotent, S3 DeleteObject semantics
    assert(api.get("k/a").isEmpty)
  }

  test("the conditional PUT is a true CAS: 32 racing writers, exactly one winner") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val api = new InMemoryObjectStore("cas-race")
    val pool = Executors.newFixedThreadPool(32)
    try {
      (0 until 20).foreach { round =>
        val key = s"log/v$round.json"
        val start = new CountDownLatch(1)
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val done = new CountDownLatch(32)
        (0 until 32).foreach { w =>
          pool.execute(() => {
            start.await()
            if (api.putIfNoneMatch(key, s"writer-$w".getBytes("UTF-8")))
              wins.incrementAndGet()
            done.countDown()
          })
        }
        start.countDown() // all 32 release on the same claim at once
        assert(done.await(30, TimeUnit.SECONDS))
        assert(wins.get() === 1, s"round $round: ${wins.get()} claims won")
        // every loser observes the winner's COMPLETE bytes
        val body = new String(api.get(key).get, "UTF-8")
        assert(body.startsWith("writer-"), s"partial/corrupt claim: $body")
      }
    } finally pool.shutdown()
  }

  test("ObjectStoreLogStore meets the LogStore contract on the fake") {
    val root = freshRoot("lscontract")
    val s = LogStore.forRoot(root)
    assert(s eq ObjectStoreLogStore.Mem)
    s.mkdirs(s"$root/d") // a no-op: object stores have no directories
    val p = s"$root/d/claim.json"
    assert(s.putIfAbsent(p, "first".getBytes("UTF-8")))
    assert(!s.putIfAbsent(p, "second".getBytes("UTF-8")),
      "a taken slot must refuse the claim")
    assert(s.readText(p) === "first", "the loser must not damage the winner")
    s.putReplace(p, "third".getBytes("UTF-8"))
    assert(s.readText(p) === "third")
    assert(s.exists(p) && !s.isDir(p))
    assert(s.isDir(s"$root/d") && s.exists(s"$root/d"))
    val w = s.walk(s"$root/d")
    assert(w.map(_.relPath) === Seq("claim.json") && w.head.size === 5L)
    assert(s.list(s"$root/d") === Seq("claim.json"))
    // a marker errors on its second creation (the createMarker contract)
    s.createMarker(s"$root/d/_marker")
    intercept[java.nio.file.FileAlreadyExistsException](
      s.createMarker(s"$root/d/_marker"))
    // delete refuses a non-empty "dir", takes files
    assert(!s.delete(s"$root/d"))
    assert(s.delete(p) && s.delete(s"$root/d/_marker"))
    assert(!s.delete(p), "deleting an absent file reports false")
    // deep walk is relative and complete through many pages
    (0 until 25).foreach(i =>
      s.putIfAbsent(f"$root/deep/x$i%02d/f.bin", Array[Byte](1, 2)))
    val deep = s.walk(s"$root/deep")
    assert(deep.size === 25 && deep.forall(_.size == 2L))
    assert(deep.map(_.relPath).contains("x07/f.bin"))
    assert(s.walkDirs(s"$root/deep").toSet === (0 until 25).map(i => f"x$i%02d").toSet)
  }

  test("a steady-state append pays O(1) LIST pages — independent of table history") {
    // LIST is the expensive, rate-limited call on a real object store;
    // a commit whose LIST cost grew with the table's history would be
    // the metadata analogue of a full scan. Measure the SAME single-file
    // append against a 5-commit table and a 35-commit table (3
    // checkpoints deep): the page counts must be EQUAL, and small.
    def appendPages(history: Int): Long = {
      val bucket = s"lp-${java.util.UUID.randomUUID().toString.take(8)}"
      val root = s"mem://$bucket/tbl"
      (0 until history).foreach(k =>
        TxLog.append(spark, root, batch(k * 10, k * 10 + 10).coalesce(1)))
      val api = InMemoryObjectStore.bucket(bucket)
      api.listPageCalls.set(0L)
      TxLog.append(spark, root, batch(9000, 9010).coalesce(1))
      api.listPageCalls.get()
    }
    val shallow = appendPages(5)
    val deep = appendPages(35)
    assert(deep === shallow,
      s"append LIST cost must not grow with history: $shallow -> $deep")
    // ~17 pages at the fake's deliberately tiny 7-key pages (committer
    // staging listings + existence probes + the commit's own dir walk);
    // the EQUALITY above is the scale guard, this bound just keeps the
    // constant honest
    assert(shallow <= 24L,
      s"a single-file append paid $shallow LIST pages; bound is 24")
  }

  test("a txlog table runs end-to-end on a mem:// object-store root") {
    val root = freshRoot("lse2e")
    // three zone-mapped, bloom-indexed commits, Spark data I/O through
    // MemFileSystem (PUT-on-close, copy+delete renames) — the claim
    // itself through the conditional PUT
    (0 until 3).foreach { f =>
      val df = batch(1000 * f, 1000 * f + 1000)
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("id"), bloomCols = Map("payload" -> 1000L))
    }
    assert(TxLog.headVersion(root) === 3L)
    assert(TxLog.rowCount(root) === Some(3000L))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 3000L)
    // zone-map pruning works through object-store index keys
    val q = snap.filter(col("id").between(1100L, 1200L))
    assert(q.count() === 101L)
    assert(TxLogFileIndex.of(q).lastListed.size === 1,
      "zone maps must prune on a mem:// root")
    // bloom point lookup probes sidecars through the object store
    val b = TxLog.snapshot(spark, root).filter(col("payload") === "row-2042")
    assert(b.count() === 1L)
    assert(TxLogFileIndex.of(b).lastListed.size === 1,
      "bloom sidecars must probe through the object store")
    // merge-on-read delete + metadata-only count + CDF + time travel
    val v = TxLog.deleteVectors(spark, root, col("id") % 10 === 3L)
    assert(TxLog.rowCount(root) === Some(2700L))
    assert(TxLog.snapshot(spark, root).count() === 2700L)
    assert(TxLog.changes(spark, root, v - 1, v, withChangeType = true)
      .count() === 300L)
    assert(TxLog.snapshot(spark, root, Some(3L)).count() === 3000L)
    // exactly-once bookkeeping through the conditional PUT
    val v1 = TxLog.appendOnce(spark, root, "once#1", batch(9000, 9010))
    assert(TxLog.appendOnce(spark, root, "once#1", batch(9000, 9010)) === v1)
    assert(TxLog.snapshot(spark, root).count() === 2710L)
    // compact materializes the deletes; vacuum walks the paged LIST
    TxLog.compact(spark, root, smallBytes = Long.MaxValue, statsCols = Seq("id"))
    assert(TxLog.replay(root, TxLog.headVersion(root)).entries
      .forall(_.dvs.isEmpty))
    val reclaimed = TxLog.vacuum(root,
      retainFrom = TxLog.headVersion(root), inflightGraceMs = 0L)
    assert(reclaimed >= 4, s"expected the 4 pre-compact files gone, got $reclaimed")
    assert(TxLog.snapshot(spark, root).count() === 2710L)
    assert(TxLog.rowCount(root) === Some(2710L))
  }
}
