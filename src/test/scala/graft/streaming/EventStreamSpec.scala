package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.EventWindows

/** Structured Streaming ≡ batch: the watermarked hourly windowed aggregation
  * over a file stream must produce exactly the batch `EventWindows.hourly`
  * result once the stream drains (AvailableNow).
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AvailableNow stream over events matches the batch hourly aggregation") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").parquet(tmp)

    val batch = EventWindows.hourly(spark.read.parquet(tmp))
      .collect().map(_.toSeq).toSet

    val streamed = EventStream.runAvailableNow(spark, tmp, events.schema, "hourly_events_test")
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup within watermark collapses a duplicated input to the single-copy result") {
    val single = Files.createTempDirectory("graft_stream_one").toString
    val doubled = Files.createTempDirectory("graft_stream_two").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").parquet(single)
    events.write.mode("overwrite").parquet(s"$doubled/a")
    events.write.mode("overwrite").parquet(s"$doubled/b")

    val batchOnce = EventWindows.hourly(spark.read.parquet(single))
      .collect().map(_.toSeq).toSet
    val schema = events.schema
    val streamed = EventStream.runToTable(
      EventStream.dedupedHourlyCounts(spark, s"$doubled/*", schema), "dedup_hourly_test")
      .collect().map(_.toSeq).toSet

    assert(streamed === batchOnce)
  }

  test("stream-stream interval join matches the equivalent batch join") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft_stream_join").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").parquet(tmp)

    val ev = spark.read.parquet(tmp)
    def batchSide(kind: String, p: String) =
      ev.filter(col("event_type") === kind)
        .select(col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"), col("event_id").as(s"${p}_id"))
    val batch = batchSide("error", "e").join(
        batchSide("purchase", "p"),
        col("e_user") === col("p_user") &&
          col("p_ts") <= col("e_ts") &&
          col("p_ts") >= col("e_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("e_user").as("user_id"), col("e_id").as("err_id"), col("p_id"))
      .collect().map(_.toSeq).toSet

    val streamed = EventStream.runToTable(
      EventStream.errorPurchaseJoin(spark, tmp, events.schema, windowMinutes = 30),
      "err_purchase_join_test", outputMode = "append")
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("incremental ingest processes only new files per run, exactly once") {
    import org.apache.spark.sql.functions._
    val root   = Files.createTempDirectory("graft_incr").toString
    val in     = s"$root/in"
    val out    = s"$root/out"
    val chk    = s"$root/chk"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val half   = events.count() / 2

    def run(): Unit = EventStream.incrementalIngest(spark, in, events.schema, chk, out)(
      _.filter(col("event_type") === "purchase").select("event_id", "user_id", "value"))
    def sinkIds = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).toSeq

    events.filter(col("event_id") <= half).write.mode("append").parquet(in)
    run()
    val afterA = sinkIds
    assert(afterA.nonEmpty && afterA.forall(_ <= half))

    events.filter(col("event_id") > half).write.mode("append").parquet(in)
    run()
    val afterB = sinkIds
    // second run appended ONLY batch_b rows: no duplicates, full coverage
    assert(afterB.length === afterB.distinct.length)
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(afterB.length.toLong === expected)
  }
}
