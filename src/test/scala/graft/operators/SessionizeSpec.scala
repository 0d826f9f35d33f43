package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  test("gap > 30min opens a new session; duration and counts per session") {
    val events = Seq(
      (1L, ts(0), 7L, 10.0, "p"),
      (2L, ts(10), 7L, 20.0, "p"),
      (3L, ts(120), 7L, 30.0, "p"),
      (4L, ts(125), 7L, 40.0, "p"),
      (5L, ts(0), 8L, 50.0, "p")
    ).toDF("event_id", "ts", "user_id", "value", "props")
    val got = EventWindows.sessionize(events, 30)
      .select("user_id", "sess_idx", "n_events", "duration_us", "value_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (7L, 1L, 2L, 600000000L, 3000L),
      (7L, 2L, 2L, 300000000L, 7000L),
      (8L, 1L, 1L, 0L, 5000L)))
  }

  test("window-function sessions agree with built-in session_window") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val ours = EventWindows.sessionize(events, 30)
      .select("user_id", "n_events", "value_cents")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val builtin = EventWindows.sessionWindowAgg(events, "30 minutes")
      .select("user_id", "n_events", "value_cents")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(ours === builtin)
    assert(ours.nonEmpty)
  }

  test("retention cohorts: Monday-start weeks, offsets from the user's first week") {
    import org.apache.spark.sql.functions.to_timestamp
    // 2024-01-01 is a Monday. u1: weeks 0 and 1 of cohort 01-01;
    // u2: one event in the week of 01-08; u3: two events same week → one active row
    val events = Seq(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-10 09:00:00"),
      (2L, "2024-01-09 12:00:00"),
      (3L, "2024-01-02 08:00:00"),
      (3L, "2024-01-03 08:00:00")
    ).toDF("user_id", "s").withColumn("ts", to_timestamp($"s"))
    val got = EventWindows.retentionCohorts(events)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L), // u1 + u3 active in their cohort week
      ("2024-01-01", 1L, 1L), // u1 returns the next week
      ("2024-01-08", 0L, 1L)))
  }

  test("gap-fill densifies the hour grid and forward-fills the hole") {
    // user 7: active at hour 0 (10.00) and hour 2 (30.00) — hour 1 is a
    // gap forward-filled with 1000 cents; user 8: one hour, no gaps
    val events = Seq(
      (1L, ts(0), 7L, 10.0, "p"),
      (2L, ts(121), 7L, 30.0, "p"),
      (3L, ts(5), 8L, 50.0, "p")
    ).toDF("event_id", "ts", "user_id", "value", "props")
    val got = EventWindows.gapFillHourly(events)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (7L, 3L, 2L, 1000L + 1000L + 3000L, 0.333333),
      (8L, 1L, 1L, 5000L, 0.0)))
  }
}
