package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.TxLog

/** Streaming OUT of the transaction log: the txlog as a Structured
  * Streaming source whose offsets are table versions and whose
  * microbatches are `changes(from, to)` — plus the end-to-end
  * lakehouse pipeline (txlog source → transform → exactly-once txlog
  * sink) the source/sink pair exists for.
  */
class TxLogSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("the source delivers each commit exactly once, tagged with its version") {
    val root = Files.createTempDirectory("graft_src_txlog").toString
    TxLog.append(spark, root, batch(0, 10))  // v1
    TxLog.append(spark, root, batch(10, 25)) // v2

    val ck = Files.createTempDirectory("graft_src_ck").toString
    // foreachBatch accumulator (the memory sink can't recover from a
    // checkpoint, and checkpointed recovery is exactly what's under test)
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.TxLogSourceProvider")
        .option("root", root)
        .load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => delivered.add(
            (r.getAs[Long]("id"), r.getAs[Long]("_commit_version"))))
          ()
        }
        .start()
      q.awaitTermination()
    }

    drain()
    import scala.jdk.CollectionConverters._
    val got1 = delivered.asScala.toSeq
    // startingVersion defaults to 0: v1 and v2 both delivered, each row
    // tagged with the version that landed it
    assert(got1.length === 25)
    assert(got1.filter(_._2 == 1L).map(_._1).sorted === (0L until 10L))
    assert(got1.filter(_._2 == 2L).map(_._1).sorted === (10L until 25L))

    // later commits arrive incrementally on the SAME checkpoint — the
    // already-delivered versions are not re-read (offset = version)
    TxLog.append(spark, root, batch(25, 30)) // v3
    drain()
    val got2 = delivered.asScala.toSeq
    assert(got2.length === 30, "exactly the v3 delta must be appended")
    assert(got2.count(_._2 == 3L) === 5)
  }

  test("a rewrite commit fails the stream by default and is skippable by option") {
    val root = Files.createTempDirectory("graft_src_txlog2").toString
    TxLog.append(spark, root, batch(0, 5))      // v1
    TxLog.overwrite(spark, root, batch(50, 53)) // v2 — no row-level delta
    TxLog.append(spark, root, batch(53, 55))    // v3

    def drain(skip: Boolean, name: String): Unit = {
      val q = spark.readStream
        .format("graft.streaming.TxLogSourceProvider")
        .option("root", root)
        .option("skipRewrites", skip.toString)
        .load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft_src_ck_$name").toString)
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
      q.awaitTermination()
    }

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(skip = false, "txlog_src_fail")
    }
    assert(e.getMessage.contains("overwrite") || Option(e.getCause)
      .exists(_.getMessage.contains("overwrite")),
      s"stream must fail naming the rewrite; got: ${e.getMessage}")

    drain(skip = true, "txlog_src_skip")
    val got = spark.table("txlog_src_skip").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("_commit_version")))
    assert(got.map(_._1).sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L, 53L, 54L),
      "skipRewrites must deliver the appends on both sides of the rewrite")
    assert(!got.exists(r => r._1 >= 50L && r._1 < 53L), "rewrite rows must be skipped")
    spark.sql("DROP TABLE IF EXISTS txlog_src_skip")
  }

  test("end-to-end lakehouse pipeline: txlog source → transform → exactly-once txlog sink") {
    val src = Files.createTempDirectory("graft_pipe_src").toString
    val dst = Files.createTempDirectory("graft_pipe_dst").toString
    val ck = Files.createTempDirectory("graft_pipe_ck").toString
    TxLog.append(spark, src, batch(0, 10))
    TxLog.append(spark, src, batch(10, 20))

    def run(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.TxLogSourceProvider")
        .option("root", src)
        .load()
        .withColumn("id2", col("id") * 2)
        .drop("_commit_version")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          TxLog.appendOnce(df.sparkSession, dst, s"pipe#$id", df)
          ()
        }
        .start()
      q.awaitTermination()
    }

    run()
    assert(TxLog.snapshot(spark, dst).count() === 20L)
    // incremental: one more upstream commit flows through on restart,
    // and only that commit is re-processed
    TxLog.append(spark, src, batch(20, 23))
    run()
    val out = TxLog.snapshot(spark, dst)
    assert(out.count() === 23L)
    assert(out.agg(countDistinct(col("id"))).head.getLong(0) === 23L,
      "source offsets + idempotent sink must yield exactly-once end to end")
    assert(out.filter(col("id2") =!= col("id") * 2).count() === 0L)
  }

  test("the txlog sink is a writeStream FORMAT: exactly-once, stats-bearing, restart-safe") {
    val src = Files.createTempDirectory("graft_sinkf_src").toString
    val dst = Files.createTempDirectory("graft_sinkf_dst").toString
    val ck = Files.createTempDirectory("graft_sinkf_ck").toString
    TxLog.commit(spark, src, batch(0, 10), TxLog.Append, statsCols = Seq("id"))
    TxLog.commit(spark, src, batch(10, 20), TxLog.Append, statsCols = Seq("id"))

    def run(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.TxLogSourceProvider")
        .option("root", src)
        .load()
        .drop("_commit_version")
        .writeStream
        .format("graft.streaming.TxLogSinkProvider")
        .option("root", dst)
        .option("statsCols", "id")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }

    run()
    assert(TxLog.snapshot(spark, dst).count() === 20L)
    // a no-new-data restart lands nothing; a new upstream commit flows
    // through exactly once
    run()
    assert(TxLog.snapshot(spark, dst).count() === 20L)
    TxLog.append(spark, src, batch(20, 25))
    run()
    val out = TxLog.snapshot(spark, dst)
    assert(out.count() === 25L)
    assert(out.agg(countDistinct(col("id"))).head.getLong(0) === 25L)
    // statsCols flowed through: the sink table is born metadata-countable
    assert(TxLog.rowCount(dst) === Some(25L))
  }

  test("changeTypes streams THROUGH a merge as a typed CDF; optimize passes silently") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_src_cdf").toString
    TxLog.commit(spark, root, batch(0, 20).repartitionByRange(2, col("id")),
      TxLog.Append, statsCols = Seq("id"))                         // v1
    TxLog.merge(spark, root,
      Seq((5L, "U-5"), (100L, "NEW-100")).toDF("id", "payload"), "id") // v2
    TxLog.optimize(spark, root, targetFiles = 1, sortCol = Some("id")) // v3
    TxLog.append(spark, root, batch(200, 202))                     // v4
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream
      .format("graft.streaming.TxLogSourceProvider")
      .option("root", root)
      .option("changeTypes", "true")
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_src_cdf_ck").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => rows.add((r.getAs[Long]("id"),
          r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"))))
        ()
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = rows.asScala.toSeq
    // v1 appends (20 inserts) + v2 merge (pre+post for 5, insert for 100)
    // + v3 optimize (NOTHING) + v4 appends (2 inserts)
    assert(got.count(_._3 == 1L) === 20)
    assert(got.filter(_._3 == 2L).map(t => (t._1, t._2)).sorted === Seq(
      (5L, "update_postimage"), (5L, "update_preimage"), (100L, "insert")))
    assert(got.count(_._3 == 3L) === 0, "an optimize must stream zero rows")
    assert(got.count(_._3 == 4L) === 2)
  }

  test("changeTypes streams THROUGH a deletion-vector delete and a merge-on-read update") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_src_dv").toString
    TxLog.commit(spark, root, batch(0, 20).repartitionByRange(2, col("id")),
      TxLog.Append, statsCols = Seq("id"))                            // v1
    TxLog.deleteVectors(spark, root, col("id") === 3L)                // v2
    TxLog.updateVectors(spark, root, col("id") === 7L,
      Map("payload" -> org.apache.spark.sql.functions.lit("U-7")))    // v3
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream
      .format("graft.streaming.TxLogSourceProvider")
      .option("root", root)
      .option("changeTypes", "true")
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_src_dv_ck").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => rows.add((r.getAs[Long]("id"),
          r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"))))
        ()
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = rows.asScala.toSeq
    assert(got.count(_._3 == 1L) === 20)
    // the DV delete streams its deleted row; the MoR update its images
    assert(got.filter(_._3 == 2L).map(t => (t._1, t._2)) === Seq((3L, "delete")))
    assert(got.filter(_._3 == 3L).map(t => (t._1, t._2)).sorted === Seq(
      (7L, "update_postimage"), (7L, "update_preimage")))
  }

  test("maxVersionsPerBatch chunks a catch-up backlog into bounded microbatches") {
    val root = Files.createTempDirectory("graft_src_rate").toString
    (0 until 20).foreach(k => TxLog.append(spark, root, batch(k * 2, k * 2 + 2)))
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // NOT AvailableNow: its wrapper pins the source's first offered
    // offset as the final target, so a rate-limited source would stop
    // after one chunk per run — the continuous trigger exercises the
    // chunking end to end and processAllAvailable() drains the backlog
    val q = spark.readStream
      .format("graft.streaming.TxLogSourceProvider")
      .option("root", root)
      .option("maxVersionsPerBatch", "5")
      .load()
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_src_rate_ck").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.sum === 40L, "every commit must be delivered exactly once")
    assert(sizes.forall(_ <= 10L),
      s"a microbatch must cover at most 5 versions (10 rows); got $sizes")
    assert(sizes.length >= 4, s"a 20-commit backlog must chunk; got ${sizes.length} batches")
  }

  test("a rate-limited stream keeps draining its backlog across restarts") {
    val root = Files.createTempDirectory("graft_src_rate_rs").toString
    (0 until 12).foreach(k => TxLog.append(spark, root, batch(k * 2, k * 2 + 2)))
    val ck = Files.createTempDirectory("graft_src_rate_rs_ck").toString
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      // AvailableNow pins the FIRST offered offset as the run's target, so
      // each run drains exactly one ≤4-version chunk and commits cleanly —
      // the restart then begins from a COMPLETE offset log, the case where
      // a v1 source sees no getBatch before its first getOffset and an
      // unpersisted rate-control floor would reset to startingVersion
      // (offering ≤ the committed offset: a stalled or inverted stream)
      val q = spark.readStream
        .format("graft.streaming.TxLogSourceProvider")
        .option("root", root)
        .option("maxVersionsPerBatch", "4")
        .load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => delivered.add(r.getAs[Long]("id")))
          ()
        }
        .start()
      q.awaitTermination()
    }
    run()
    import scala.jdk.CollectionConverters._
    assert(delivered.asScala.size === 8, "run 1 must drain exactly one 4-version chunk")
    run()
    assert(delivered.asScala.size === 16, "run 2 must drain the NEXT chunk, not stall at the committed offset")
    run()
    assert(delivered.asScala.toSeq.sorted === (0L until 24L),
      "three chunked runs must deliver the whole backlog exactly once")
  }

  test("startingTimestamp subscribes strictly after the version at that instant") {
    val root = Files.createTempDirectory("graft_src_ts").toString
    TxLog.append(spark, root, batch(0, 5))   // v1
    TxLog.append(spark, root, batch(5, 12))  // v2
    TxLog.append(spark, root, batch(12, 20)) // v3
    val ts = TxLog.history(spark, root).orderBy("version").collect()
      .map(_.getAs[Long]("commit_ts"))
    assume(ts(0) < ts(1), "commits landed in one millisecond; boundary ambiguous")
    val q = spark.readStream
      .format("graft.streaming.TxLogSourceProvider")
      .option("root", root)
      .option("startingTimestamp", ts(0).toString) // = v1's instant
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_src_ts_ck").toString)
      .format("memory")
      .queryName("txlog_src_ts")
      .outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("txlog_src_ts").collect()
      .map(_.getAs[Long]("_commit_version"))
    assert(got.length === 15, "only v2+v3 rows must stream")
    assert(got.toSet === Set(2L, 3L))
    spark.sql("DROP TABLE IF EXISTS txlog_src_ts")
  }

  test("a catch-up batch predating an additive evolution conforms to the stream schema") {
    import spark.implicits._
    val root = Files.createTempDirectory("txsrc_evo").toString
    TxLog.append(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "payload")) // v1
    TxLog.append(spark, root,
      Seq((3L, "c", "en")).toDF("id", "payload", "lang")) // v2: evolved
    // the stream pins the HEAD schema (id, payload, lang); a recovery
    // batch over v1 alone reads files without `lang` — conform must
    // backfill a typed null, not let the select kill the stream
    val schema = TxLogSource.streamSchema(Map("root" -> root))
    assert(schema.fieldNames.contains("lang"))
    val b = TxLogSource.conform(TxLog.changes(spark, root, 0L, 1L), schema)
    assert(b.columns.toSeq === schema.fieldNames.toSeq)
    assert(b.schema("lang").dataType === org.apache.spark.sql.types.StringType)
    val rows = b.collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("lang"))))
    // a post-evolution batch carries the real values untouched
    val b2 = TxLogSource.conform(TxLog.changes(spark, root, 1L, 2L), schema)
    assert(b2.collect().map(_.getAs[String]("lang")).toSeq === Seq("en"))
  }

  test("a RENAME during the stream fails loudly; the restarted stream adopts the new schema") {
    val root = Files.createTempDirectory("graft_src_ren").toString
    TxLog.append(spark, root, batch(0, 5)) // v1
    val ck = Files.createTempDirectory("graft_src_ren_ck").toString
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def drain(col0: String): Unit = {
      val q = spark.readStream
        .format("graft.streaming.TxLogSourceProvider")
        .option("root", root)
        .load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => delivered.add(r.getAs[String](col0)))
          ()
        }
        .start()
      q.awaitTermination()
    }
    drain("payload")
    assert(delivered.size === 5)
    // the rename + a post-rename append land while the stream is down
    TxLog.renameColumn(root, "payload", "text")          // v2
    import spark.implicits._
    TxLog.append(spark, root,
      Seq((9L, "after")).toDF("id", "text"))             // v3
    // catch-up: null-filling `payload` would be silent data loss — the
    // stream must DIE with a restart instruction instead
    val e = intercept[Exception](drain("payload"))
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null)).mkString(" | ")
    assert(rootMsg(e).contains("renamed"),
      s"expected the rename-detected failure, got: ${rootMsg(e)}")
    // a FRESH stream (new checkpoint) declares the new schema and reads
    // every generation through the mapping
    val ck2 = Files.createTempDirectory("graft_src_ren_ck2").toString
    val texts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = spark.readStream
      .format("graft.streaming.TxLogSourceProvider")
      .option("root", root)
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck2)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => texts.add(r.getAs[String]("text")))
        ()
      }
      .start()
    q2.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(texts.asScala.toSeq.sorted ===
      (Seq("after") ++ (0 until 5).map(i => s"row-$i")).sorted)
  }
}
