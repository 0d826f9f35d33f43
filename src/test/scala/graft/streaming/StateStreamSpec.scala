package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.streaming.StateStream._

/** Stream ≡ batch for the CDC latest-state operator: any chunking of the
  * changelog converges to the state table the batch rule (q189's
  * last-write-wins over (us, event_id)) produces over the full log —
  * including out-of-order delivery ACROSS batches, which the windowed
  * batch query never sees but the stateful operator must absorb.
  */
class StateStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  test("latest-state converges to the batch last-write-wins table over any chunking") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val q = StateStream.latestState(input.toDS()).writeStream
      .format("memory")
      .queryName("state_stream_test")
      .outputMode("update")
      .start()
    try {
      input.addData(
        ChangeEvent(1, ts(0), 7, "signup"),
        ChangeEvent(2, ts(5), 7, "click"),
        ChangeEvent(3, ts(1), 8, "signup"))
      q.processAllAvailable()
      // second chunk: user 7 gets a LATER write and an out-of-order
      // EARLIER one — the earlier write must bump n_updates/first_us but
      // not the latest-type; user 8 ties on timestamp (event_id breaks it)
      input.addData(
        ChangeEvent(9, ts(10), 7, "purchase"),
        ChangeEvent(4, ts(2), 7, "view"),
        ChangeEvent(8, ts(1), 8, "click"))
      q.processAllAvailable()

      // update-mode memory sink appends per-batch emissions; the live row
      // per key is the one with the highest n_updates
      val got = spark.table("state_stream_test").as[CurrentRow].collect()
        .groupBy(_.user_id).map { case (_, rs) => rs.maxBy(_.n_updates) }
        .toSeq.sortBy(_.user_id)

      assert(got === Seq(
        CurrentRow(7, "purchase", ts(10).getTime * 1000, ts(0).getTime * 1000, 4),
        CurrentRow(8, "click", ts(1).getTime * 1000, ts(1).getTime * 1000, 2)))
    } finally q.stop()
  }
}
