package graft.io

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mixed-workload concurrency: appenders, idempotent appenders, mergers,
  * an OPTIMIZE, a DELETE, an UPDATE, a COMPACT, and vacuums all race on
  * one table — then every invariant the log promises is checked at once.
  * This is the composition test the per-feature specs can't give:
  * in-flight markers must protect racing commit windows from the
  * vacuums, every read-modify-write (merge/delete/update/optimize/
  * compact) must serialize against appends AND each other, checkpoints
  * written mid-race must carry consistent entries/schema/txns, and the
  * final replay must account for every row exactly once. Runs over BOTH
  * store flavors ([[StoreFlavors]]): the local hard-link claim and the
  * object store's conditional PUT under paged LISTs and no rename.
  */
class TxLogChaosSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(tag: String, lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (s"$tag-$i", s"payload-$tag-$i")).toDF("id", "payload")
  }

  for ((flavor, mkRoot) <- StoreFlavors.flavors("txlog_chaos"))
  test(s"appends, idempotent appends, merges, optimize, and vacuum race without loss [$flavor]") {
    val root = mkRoot()
    TxLog.append(spark, root, rows("seed", 0, 10)) // v1
    TxLog.append(spark, root, rows("del", 0, 5))   // v2: the CoW delete's prey
    TxLog.append(spark, root, rows("dvd", 0, 5))   // v3: the DV delete's prey
    val pool = Executors.newFixedThreadPool(14)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val work: Seq[Future[Any]] =
        // 4 plain appenders, 10 disjoint rows each
        (0 until 4).map(k => Future(
          TxLog.append(spark, root, rows(s"app$k", 0, 10)))) ++
        // 2 idempotent appenders, each delivering its batch TWICE
        (0 until 2).map(k => Future {
          TxLog.appendOnce(spark, root, s"chaos#$k", rows(s"once$k", 0, 5))
          TxLog.appendOnce(spark, root, s"chaos#$k", rows(s"once$k", 0, 5))
        }) ++
        // 2 mergers on DISJOINT seed keys (update 1, insert 1 each)
        (0 until 2).map { k =>
          import spark.implicits._
          Future(TxLog.merge(spark, root,
            Seq((s"seed-$k", s"UPD-$k"), (s"new-$k", s"INS-$k"))
              .toDF("id", "payload"), "id"))
        } ++
        Seq(
          // an OPTIMIZE (whole-table rewrite racing everything)
          Future(TxLog.optimize(spark, root, targetFiles = 2)),
          // a copy-on-write DELETE of the pre-seeded prey rows
          Future(TxLog.delete(spark, root, col("id").startsWith("del-"))),
          // a merge-on-read DELETE of ITS prey (deletion vectors racing
          // everything, including the rewrites that materialize them)
          Future(TxLog.deleteVectors(spark, root, col("id").startsWith("dvd-"))),
          // a merge-on-read UPDATE of one seed row nobody else touches
          Future(TxLog.updateVectors(spark, root, col("id") === "seed-7",
            Map("payload" -> lit("MOR-7")))),
          // a copy-on-write UPDATE of one seed row nobody else touches
          Future(TxLog.update(spark, root, col("id") === "seed-5",
            Map("payload" -> lit("UPDATED-5")))),
          // a file-selective compact (content-preserving by contract)
          Future(TxLog.compact(spark, root)),
          // a DV purge (content-preserving materialization of whatever
          // vectors exist when it lands)
          Future(TxLog.purge(spark, root, threshold = 0.0))) ++
        // 2 vacuums mid-race (in-flight markers must protect open windows)
        (0 until 2).map(_ => Future(TxLog.vacuum(root)))
      Await.result(Future.sequence(work), 600.seconds)
    } finally pool.shutdown()

    // the version chain is contiguous (atomic claim) and every manifest parses
    val vs = TxLog.versions(root)
    assert(vs === (1L to vs.last), s"version chain has gaps: $vs")
    assert(TxLog.history(spark, root).count() === vs.last)

    // exact row accounting: 10 seed (2 merged, 2 updated) + 2×5 prey rows
    // DELETED + 40 appended + 10 idempotent (NOT 20) + 2 merge inserts
    val now = TxLog.snapshot(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(now.size === 62, s"expected 62 rows, got ${now.size}")
    (0 until 5).foreach { i =>
      assert(!now.contains(s"del-$i"), s"deleted row del-$i resurrected")
      assert(!now.contains(s"dvd-$i"), s"DV-deleted row dvd-$i resurrected")
    }
    assert(now("seed-5") === "UPDATED-5", "racing CoW update lost")
    assert(now("seed-7") === "MOR-7", "racing MoR update lost")
    (0 until 4).foreach(k => (0 until 10).foreach(i =>
      assert(now.contains(s"app$k-$i"), s"lost append row app$k-$i")))
    (0 until 2).foreach(k => (0 until 5).foreach(i =>
      assert(now(s"once$k-$i") == s"payload-once$k-$i", s"lost once$k-$i")))
    (0 until 2).foreach { k =>
      assert(now(s"seed-$k") === s"UPD-$k", s"merge $k update lost")
      assert(now(s"new-$k") === s"INS-$k", s"merge $k insert lost")
    }
    // a post-race full-retention vacuum collects only aborted residue;
    // every historical version stays readable afterwards
    TxLog.vacuum(root)
    vs.foreach(v => assert(TxLog.snapshot(spark, root, Some(v)).count() >= 1L,
      s"v$v unreadable after vacuum"))
    // idempotence map survived the race (replay still a no-op)
    val head = TxLog.headVersion(root)
    TxLog.appendOnce(spark, root, "chaos#0", rows("once0", 0, 5))
    assert(TxLog.headVersion(root) === head, "post-race re-delivery double-landed")
  }
}
