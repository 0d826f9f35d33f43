package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("matches the most recent right row at or before each left row") {
    val left = Seq(
      (7L, ts(5), 101L),   // after purchase at t=0 → matches 1
      (7L, ts(30), 102L),  // after purchases at 0 and 20 → matches 2
      (7L, ts(20), 103L),  // exactly at purchase t=20 → matches 2 (<=)
      (8L, ts(5), 104L)    // user with no purchases → null
    ).toDF("user_id", "ts", "err_id")
    val right = Seq(
      (7L, ts(0), 1L, 10.0),
      (7L, ts(20), 2L, 20.0)
    ).toDF("user_id", "ts", "p_id", "p_value")

    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "p_id", Seq("p_value"))
      .select("err_id", "asof_p_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(101L -> Some(1L), 102L -> Some(2L), 103L -> Some(2L), 104L -> None))
  }

  test("a null payload on the newest right row is NOT stitched with an older row's value") {
    val left = Seq((1L, ts(30), 900L)).toDF("user_id", "ts", "err_id")
    val right = Seq(
      (1L, ts(0), 1L, Some(5.0)),
      (1L, ts(20), 2L, None: Option[Double]) // newest purchase has null value
    ).toDF("user_id", "ts", "p_id", "p_value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "p_id", Seq("p_value"))
      .select("asof_p_id", "asof_p_value")
      .as[(Option[Long], Option[Double])].collect()(0)
    // the whole newest ROW carries: id 2 with its null value — not (2, 5.0)
    assert(got === ((Some(2L), None)))
  }

  test("tie between right rows at the same timestamp resolves to the larger id") {
    val left  = Seq((1L, ts(10), 900L)).toDF("user_id", "ts", "err_id")
    val right = Seq((1L, ts(0), 1L, 1.0), (1L, ts(0), 2L, 2.0)).toDF("user_id", "ts", "p_id", "p_value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "p_id", Seq("p_value"))
      .select("asof_p_id").as[Long].collect()
    assert(got.toSeq === Seq(2L)) // ordered by p_id → last carried wins
  }

  test("nearest picks the closer side, ties to past, equal-time counts as past") {
    val left = Seq(
      (1L, ts(10), 100L), // past at t0 (Δ10), future at t12 (Δ2) → future
      (1L, ts(13), 101L), // past at t12 (Δ1), future at t15 (Δ2) → past
      (1L, ts(12), 102L), // right row AT t12 → past, gap 0
      (2L, ts(5), 200L),  // only a future right exists
      (3L, ts(5), 300L))  // no right rows at all
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(0), 1L), (1L, ts(12), 2L), (1L, ts(15), 3L),
      (2L, ts(9), 4L))
      .toDF("user_id", "ts", "event_id")
    val got = AsOfJoin.nearest(left, right, "user_id", "ts", "event_id", "event_id")
      .select("event_id", "nearest_event_id", "gap_us", "direction")
      .as[(Long, Option[Long], Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val min = 60000000L // one spec-minute in µs
    assert(got(100L) === ((Some(2L), Some(2 * min), "future")))
    assert(got(101L) === ((Some(2L), Some(1 * min), "past")))
    assert(got(102L) === ((Some(2L), Some(0L), "past")))
    assert(got(200L) === ((Some(4L), Some(4 * min), "future")))
    assert(got(300L) === ((None, None, "none")))
  }

  test("nearest equidistant past/future resolves to past") {
    val left  = Seq((1L, ts(10), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(5), 1L), (1L, ts(15), 2L)).toDF("user_id", "ts", "event_id")
    val got = AsOfJoin.nearest(left, right, "user_id", "ts", "event_id", "event_id")
      .select("nearest_event_id", "direction").as[(Long, String)].collect()
    assert(got.toSeq === Seq((1L, "past")))
  }
}
