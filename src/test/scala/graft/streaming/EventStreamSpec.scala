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
}
