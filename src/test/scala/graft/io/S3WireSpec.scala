package graft.io

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import S3StubServer.{ApplyThen, ApplyThenHangup, Fault, Refuse}

/** Hadoop FS over HTTP-S3 buckets (`s3stub://<bucket>/...`): the same
  * [[ObjectStoreFileSystem]] the mem:// fake rides, with each bucket
  * resolving to a registered [[S3ObjectStore]] client — so a whole
  * txlog table (Spark parquet data files AND the log) runs against the
  * loopback S3 wire protocol, not just the in-process fake.
  */
final class S3StubFileSystem extends ObjectStoreFileSystem {
  override def getScheme: String = "s3stub"
  override protected def resolveBucket(bucket: String): ObjectStoreApi =
    S3StubFileSystem.buckets.getOrElse(bucket,
      throw new IllegalStateException(s"s3stub bucket not registered: $bucket"))
}

object S3StubFileSystem {
  val buckets =
    scala.collection.concurrent.TrieMap.empty[String, ObjectStoreApi]
}

/** The S3 port, WIRE-proven: [[S3ObjectStore]] driven against a real
  * loopback HTTP server ([[S3StubServer]]) that authenticates every
  * request (payload hash + full SigV4 reconstruction from the wire) and
  * answers current-AWS-shaped XML. Covers the ObjectStoreApi contract,
  * the LogStore contract through [[ObjectStoreLogStore]], ListObjectsV2
  * paging over HTTP, the fault classes the conditional-PUT
  * disambiguation exists for (lost success responses, 503 bursts, 409
  * ConditionalRequestConflict), the order-independent XML parse, and a
  * full txlog table end-to-end — commits, pruning, deletion vectors,
  * time travel, compact, vacuum, and a concurrent chaos run — on an
  * `s3stub://` root whose every byte crossed the HTTP socket.
  */
class S3WireSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One stub per suite: tiny 3-key LIST pages so every wire listing is
    * genuinely multi-page.
    */
  private lazy val backing = new InMemoryObjectStore("s3wire", pageSize = 3)
  private lazy val stub = new S3StubServer(backing)
  private lazy val client = new S3ObjectStore(
    stub.endpoint, "s3wire", stub.region, stub.accessKey, stub.secretKey)

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("ListObjectsV2 parse is order-independent and survives current AWS responses") {
    // the 2025+ AWS shape: ChecksumAlgorithm/ChecksumType between ETag
    // and Size, StorageClass and Owner after, whitespace everywhere
    val aws =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
        |  <Name>bucket</Name><Prefix>log/</Prefix><KeyCount>2</KeyCount>
        |  <MaxKeys>2</MaxKeys><IsTruncated>true</IsTruncated>
        |  <Contents>
        |    <Key>log/v00000001.json</Key>
        |    <LastModified>2025-03-01T12:00:00.000Z</LastModified>
        |    <ETag>&quot;abc123&quot;</ETag>
        |    <ChecksumAlgorithm>CRC64NVME</ChecksumAlgorithm>
        |    <ChecksumType>FULL_OBJECT</ChecksumType>
        |    <Size>1042</Size>
        |    <StorageClass>STANDARD</StorageClass>
        |    <Owner><ID>me</ID></Owner>
        |  </Contents>
        |  <Contents><Key>log/v&amp;2 &lt;odd&gt;.json</Key><StorageClass>STANDARD</StorageClass><Size>7</Size><LastModified>2025-03-01T12:00:01Z</LastModified></Contents>
        |</ListBucketResult>""".stripMargin.getBytes(StandardCharsets.UTF_8)
    val (metas, truncated) = S3ObjectStore.parseList(aws)
    assert(truncated)
    assert(metas.map(_.key) ===
      Seq("log/v00000001.json", "log/v&2 <odd>.json"),
      "every <Contents> must parse, fields in ANY order, entities decoded")
    assert(metas.map(_.size) === Seq(1042L, 7L))
    assert(metas.head.mtimeMillis ===
      java.time.Instant.parse("2025-03-01T12:00:00Z").toEpochMilli)
    // a <Contents> missing a required field is a loud protocol error,
    // never a silently dropped entry
    val broken =
      """<ListBucketResult><IsTruncated>false</IsTruncated>
        |<Contents><Key>k</Key><LastModified>2025-01-01T0:0:00Z</LastModified></Contents>
        |</ListBucketResult>""".stripMargin.getBytes(StandardCharsets.UTF_8)
    intercept[java.io.IOException](S3ObjectStore.parseList(broken))
    // an empty listing parses clean
    val empty =
      """<ListBucketResult><IsTruncated>false</IsTruncated></ListBucketResult>"""
        .getBytes(StandardCharsets.UTF_8)
    assert(S3ObjectStore.parseList(empty) === (Seq.empty, false))
  }

  test("the wire contract: CAS claim, LWW put, HEAD metadata, paged LIST, idempotent DELETE") {
    assert(client.putIfNoneMatch("w/a", "first".getBytes("UTF-8")))
    assert(!client.putIfNoneMatch("w/a", "second".getBytes("UTF-8")),
      "a taken key must refuse the conditional PUT over HTTP")
    assert(new String(client.get("w/a").get, "UTF-8") === "first")
    client.put("w/a", "third".getBytes("UTF-8")) // unconditional = LWW
    assert(new String(client.get("w/a").get, "UTF-8") === "third")
    val meta = client.head("w/a").get
    assert(meta.size === 5L && meta.mtimeMillis > 0L,
      "HEAD must carry Content-Length and Last-Modified through the wire")
    assert(client.get("w/absent").isEmpty && client.head("w/absent").isEmpty)
    // 10 keys through the stub's 3-key pages: the drain crosses ≥ 4
    // HTTP LIST round trips and returns every key in order
    (0 until 10).foreach(i => client.put(f"w/p$i%02d", Array[Byte](1)))
    val lists0 = stub.hitCount("GET")
    val all = ObjectStoreApi.listAll(client, "w/p").map(_.key).toList
    assert(all === (0 until 10).map(i => f"w/p$i%02d").toList)
    assert(stub.hitCount("GET") - lists0 >= 4,
      "a 10-key drain at 3-key pages must be genuinely multi-request")
    assert(ObjectStoreApi.listAll(client, "w/a").map(_.key).toList === List("w/a"),
      "a LIST must never leak past its prefix")
    client.delete("w/a")
    client.delete("w/a") // idempotent, S3 DeleteObject semantics
    assert(client.get("w/a").isEmpty)
  }

  test("the stub authenticates: a client signing with the wrong secret gets 403") {
    val bad = new S3ObjectStore(
      stub.endpoint, "s3wire", stub.region, stub.accessKey, "wrong-secret")
    val e = intercept[java.io.IOException](bad.get("w/anything"))
    assert(e.getMessage.contains("403"),
      s"the stub must verify SigV4, not rubber-stamp: ${e.getMessage}")
    // and the REAL client passes that same verification (each prior test
    // request was authenticated; one more, explicitly)
    client.put("w/auth", "ok".getBytes("UTF-8"))
    assert(new String(client.get("w/auth").get, "UTF-8") === "ok")
  }

  test("ObjectStoreLogStore meets the LogStore contract over the wire") {
    LogStore.registerScheme("s3stub", new ObjectStoreLogStore(p => {
      val rest = p.stripPrefix("s3stub://")
      val i = rest.indexOf('/')
      (S3StubFileSystem.buckets(rest.substring(0, i)), rest.substring(i + 1))
    }))
    S3StubFileSystem.buckets.put("s3wire", client)
    val root = "s3stub://s3wire/contract"
    val s = LogStore.forRoot(root)
    s.mkdirs(s"$root/d") // a no-op: object stores have no directories
    val p = s"$root/d/claim.json"
    assert(s.putIfAbsent(p, "first".getBytes("UTF-8")))
    assert(!s.putIfAbsent(p, "second".getBytes("UTF-8")))
    assert(s.readText(p) === "first", "the loser must not damage the winner")
    s.putReplace(p, "third".getBytes("UTF-8"))
    assert(s.readText(p) === "third")
    assert(s.exists(p) && !s.isDir(p))
    assert(s.isDir(s"$root/d") && s.exists(s"$root/d"))
    val w = s.walk(s"$root/d")
    assert(w.map(_.relPath) === Seq("claim.json") && w.head.size === 5L)
    assert(s.list(s"$root/d") === Seq("claim.json"))
    s.createMarker(s"$root/d/_marker")
    intercept[java.nio.file.FileAlreadyExistsException](
      s.createMarker(s"$root/d/_marker"))
    assert(!s.delete(s"$root/d"), "a non-empty dir must refuse deletion")
    assert(s.delete(p) && s.delete(s"$root/d/_marker"))
    assert(!s.delete(p), "deleting an absent file reports false")
    // deep walk crosses many HTTP LIST pages, stays relative + complete
    (0 until 25).foreach(i =>
      s.putIfAbsent(f"$root/deep/x$i%02d/f.bin", Array[Byte](1, 2)))
    val deep = s.walk(s"$root/deep")
    assert(deep.size === 25 && deep.forall(_.size == 2L))
    assert(s.walkDirs(s"$root/deep").toSet ===
      (0 until 25).map(i => f"x$i%02d").toSet)
  }

  test("a lost PUT success response is reclaimed as our own claim (ambiguous-412 read-back)") {
    // the stub APPLIES the conditional PUT, then hangs up: the client
    // sees an IOException, retries, reads 412 — and must recognize the
    // existing object as its OWN write, or a committer would misread
    // its landed commit as a competitor's and fold its rows twice
    stub.faults.add(Fault("PUT", ApplyThenHangup))
    assert(client.putIfNoneMatch("amb/v1", "mine-uuid-1".getBytes("UTF-8")),
      "a landed claim whose success response was lost is still OURS")
    assert(new String(client.get("amb/v1").get, "UTF-8") === "mine-uuid-1")
    // same class via a 500 after the write landed
    stub.faults.add(Fault("PUT", ApplyThen(500)))
    assert(client.putIfNoneMatch("amb/v2", "mine-uuid-2".getBytes("UTF-8")))
    // and the NEGATIVE: a competitor already holds the slot; our write
    // never landed; the ambiguous retry must still report LOST
    backing.put("amb/v3", "competitor".getBytes("UTF-8"))
    stub.faults.add(Fault("PUT", ApplyThenHangup))
    assert(!client.putIfNoneMatch("amb/v3", "mine-uuid-3".getBytes("UTF-8")),
      "ambiguity must never claim a slot whose bytes are not ours")
    assert(new String(backing.get("amb/v3").get, "UTF-8") === "competitor")
  }

  test("503 SlowDown bursts are absorbed by bounded backoff") {
    stub.faults.add(Fault("PUT", Refuse(503)))
    stub.faults.add(Fault("PUT", Refuse(503)))
    val puts0 = stub.hitCount("PUT")
    assert(client.putIfNoneMatch("sl/v1", "x".getBytes("UTF-8")))
    assert(stub.hitCount("PUT") - puts0 >= 3,
      "two 503s must cost two retries, then succeed")
    stub.faults.add(Fault("GET", Refuse(503)))
    assert(new String(client.get("sl/v1").get, "UTF-8") === "x",
      "an idempotent GET retries blindly through a 503")
  }

  test("409 ConditionalRequestConflict re-probes and retries — it is not 'slot taken'") {
    // transient 409 with NO object at the key: the claim must eventually
    // succeed (returning false here would leave the version unowned:
    // both racers report lost)
    stub.faults.add(Fault("PUT", Refuse(409)))
    assert(client.putIfNoneMatch("cf/v1", "mine".getBytes("UTF-8")),
      "a 409 with no object present must retry, not report lost")
    // 409 where a competitor's object IS present: lost, honestly
    backing.put("cf/v2", "competitor".getBytes("UTF-8"))
    stub.faults.add(Fault("PUT", Refuse(409)))
    assert(!client.putIfNoneMatch("cf/v2", "mine".getBytes("UTF-8")))
    // a PERSISTENT 409 storm surfaces as an error, never a silent verdict
    (0 until 8).foreach(_ => stub.faults.add(Fault("PUT", Refuse(409))))
    intercept[java.io.IOException](
      client.putIfNoneMatch("cf/v3", "mine".getBytes("UTF-8")))
    stub.faults.clear()
  }

  test("a txlog table runs end-to-end over the HTTP wire") {
    LogStore.registerScheme("s3stub", new ObjectStoreLogStore(p => {
      val rest = p.stripPrefix("s3stub://")
      val i = rest.indexOf('/')
      (S3StubFileSystem.buckets(rest.substring(0, i)), rest.substring(i + 1))
    }))
    S3StubFileSystem.buckets.put("s3wire", client)
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3stub.impl", classOf[S3StubFileSystem].getName)
    val root = "s3stub://s3wire/tbl"
    (0 until 3).foreach { f =>
      TxLog.commit(spark, root, batch(1000 * f, 1000 * f + 1000).coalesce(1),
        TxLog.Append, statsCols = Seq("id"))
    }
    assert(TxLog.headVersion(root) === 3L)
    assert(TxLog.rowCount(root) === Some(3000L))
    val snap = TxLog.snapshot(spark, root)
    assert(snap.count() === 3000L)
    // zone-map pruning works through wire-listed index keys
    val q = snap.filter(col("id").between(1100L, 1200L))
    assert(q.count() === 101L)
    assert(TxLogFileIndex.of(q).lastListed.size === 1,
      "zone maps must prune on an s3stub:// root")
    // merge-on-read delete + CDF + time travel, all over HTTP
    val v = TxLog.deleteVectors(spark, root, col("id") % 10 === 3L)
    assert(TxLog.snapshot(spark, root).count() === 2700L)
    assert(TxLog.changes(spark, root, v - 1, v, withChangeType = true)
      .count() === 300L)
    assert(TxLog.snapshot(spark, root, Some(3L)).count() === 3000L)
    // exactly-once bookkeeping through the wire conditional PUT
    val v1 = TxLog.appendOnce(spark, root, "wire#1", batch(9000, 9010))
    assert(TxLog.appendOnce(spark, root, "wire#1", batch(9000, 9010)) === v1)
    assert(TxLog.snapshot(spark, root).count() === 2710L)
    TxLog.compact(spark, root, smallBytes = Long.MaxValue, statsCols = Seq("id"))
    val reclaimed = TxLog.vacuum(root,
      retainFrom = TxLog.headVersion(root), inflightGraceMs = 0L)
    assert(reclaimed >= 4, s"expected the pre-compact files gone, got $reclaimed")
    assert(TxLog.snapshot(spark, root).count() === 2710L)
  }

  test("chaos over the wire: racing committers under injected faults lose nothing") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    LogStore.registerScheme("s3stub", new ObjectStoreLogStore(p => {
      val rest = p.stripPrefix("s3stub://")
      val i = rest.indexOf('/')
      (S3StubFileSystem.buckets(rest.substring(0, i)), rest.substring(i + 1))
    }))
    S3StubFileSystem.buckets.put("s3wire", client)
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3stub.impl", classOf[S3StubFileSystem].getName)
    val root = "s3stub://s3wire/chaos"
    import spark.implicits._
    def rows(tag: String, n: Int) =
      (0 until n).map(i => (s"$tag-$i", s"p-$i")).toDF("id", "payload")
    TxLog.append(spark, root, rows("seed", 10))
    // faults land on whichever requests hit them mid-race — the
    // invariants must hold REGARDLESS of which operation absorbs each
    (0 until 3).foreach(_ => stub.faults.add(Fault("PUT", ApplyThenHangup)))
    (0 until 3).foreach(_ => stub.faults.add(Fault("PUT", Refuse(503))))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val work: Seq[Future[Any]] =
        (0 until 4).map(k => Future(
          TxLog.append(spark, root, rows(s"app$k", 10)))) ++
        (0 until 2).map(k => Future {
          TxLog.appendOnce(spark, root, s"wire#$k", rows(s"once$k", 5))
          TxLog.appendOnce(spark, root, s"wire#$k", rows(s"once$k", 5))
        })
      Await.result(Future.sequence(work), 180.seconds)
    } finally pool.shutdown()
    stub.faults.clear()
    // every batch exactly once: 10 seed + 4×10 + 2×5
    val got = TxLog.snapshot(spark, root)
    assert(got.count() === 60L,
      "lost or doubled rows under wire faults")
    assert(got.select("id").distinct().count() === 60L)
  }
}
