package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.TxLog

/** Streaming ingestion INTO the transaction log: a real Structured
  * Streaming job writing each microbatch through `TxLog.appendOnce`
  * keyed by the stream's batchId — the exactly-once sink wiring.
  *
  * The crash window Structured Streaming leaves open is
  * "sink write succeeded, checkpoint commit didn't": on restart the SAME
  * batchId is re-delivered and a plain append would double-land it. The
  * spec runs the real stream, then replays the recorded last batch
  * by hand (exactly what a recovery re-delivery does) and proves the
  * table is unchanged.
  */
class StreamingTxLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("foreachBatch + appendOnce lands every microbatch once, survives batch re-delivery") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stream_txlog").toString
    val (in, ck) = (s"$root/in", s"$root/ck")

    val docs = (1 to 40).map(i => (i.toLong, s"payload-$i")).toDF("id", "payload")
    docs.write.parquet(in)

    // remember what each batch carried so re-delivery can be replayed
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Array[org.apache.spark.sql.Row]]()
    def run(): Unit = {
      val q = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // several real microbatches
        .parquet(in)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.put(id, df.collect())
          TxLog.appendOnce(df.sparkSession, root, s"ingest#$id", df)
          ()
        }
        .start()
      q.awaitTermination()
    }

    run()
    val versionsAfterRun = TxLog.headVersion(root)
    val n0 = TxLog.snapshot(spark, root).count()
    assert(n0 === 40L)
    assert(versionsAfterRun >= 1L)
    assert(seen.size() >= 1)

    // crash-window re-delivery: the recovery run hands the SAME batchId
    // with the SAME rows to foreachBatch again
    val lastId = seen.keySet().toArray.map(_.asInstanceOf[Long]).max
    val replayRows = seen.get(lastId).toSeq
    val replayDf = spark.createDataFrame(
      spark.sparkContext.parallelize(replayRows), docs.schema)
    val v = TxLog.appendOnce(spark, root, s"ingest#$lastId", replayDf)
    assert(v <= versionsAfterRun, "re-delivery must return the original version, not commit")
    assert(TxLog.headVersion(root) === versionsAfterRun, "no new version on re-delivery")
    assert(TxLog.snapshot(spark, root).count() === 40L, "re-delivery must not double-land rows")

    // new data after recovery still lands (idempotence is per txnId, not a latch)
    Seq((100L, "late")).toDF("id", "payload").write.mode("append").parquet(in)
    run()
    assert(TxLog.snapshot(spark, root).count() === 41L)
  }
}
