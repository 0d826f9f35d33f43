package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.streaming.SessionStream._

class SessionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  test("flatMapGroupsWithState closes sessions on gap and event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = SessionStream.sessionize(input.toDS(), gapMinutes = 30).writeStream
      .format("memory")
      .queryName("sess_stream_test")
      .outputMode("append")
      .start()
    try {
      // session 1: two events 10 min apart
      input.addData(
        SessionEvent(1, ts(0), 7, 10.0),
        SessionEvent(2, ts(10), 7, 20.0))
      q.processAllAvailable()
      // much later event: same user → closes session 1 in-batch AND pushes
      // the watermark (max event time - 1h) past session 1's timeout
      input.addData(SessionEvent(3, ts(600), 7, 30.0))
      q.processAllAvailable()
      // one more batch so timeout processing observes the advanced watermark
      input.addData(SessionEvent(4, ts(610), 8, 40.0))
      q.processAllAvailable()

      val got = spark.table("sess_stream_test")
        .as[CompletedSession].collect().sortBy(s => (s.user_id, s.start_us)).toSeq
      assert(got.exists(s =>
        s.user_id == 7 && s.n_events == 2 && s.duration_us == 600000000L && s.value_cents == 3000L))
    } finally q.stop()
  }
}
