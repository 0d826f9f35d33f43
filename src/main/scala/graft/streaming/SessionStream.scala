package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` (beyond-reference; the built-in `session_window`
  * covers the aggregate case, this covers arbitrary per-session state).
  *
  * Sessions close either (a) within a batch when the next event's gap
  * exceeds the limit, or (b) via event-time timeout once the watermark
  * passes last-event + gap — so state is bounded and late events beyond the
  * watermark can't reopen a session. Output matches
  * `EventWindows.sessionize` fields (duration in exact µs, value in cents).
  */
object SessionStream {

  final case class SessionEvent(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long, cents: Long)
  final case class CompletedSession(
      user_id: Long, start_us: Long, n_events: Long, duration_us: Long, value_cents: Long)

  /** Epoch micros with floor semantics — plain `getTime / 1000` truncates
    * toward zero pre-epoch while `getNanos` is always non-negative, which
    * would double-count the sub-second part for pre-1970 timestamps.
    */
  def usOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** HALF_UP away from zero — the same rule as `EventWindows.cents`
    * (Spark `round`); `math.round` rounds -12.5 to -12, Spark to -13.
    */
  private def centsOf(v: Double): Long =
    BigDecimal(v * 100.0).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int, watermark: String = "1 hour")
      : Dataset[CompletedSession] = {
    val gapUs = gapMinutes * 60L * 1000000L
    import events.sparkSession.implicits._

    def complete(uid: Long, s: OpenSession): CompletedSession =
      CompletedSession(uid, s.startUs, s.n, s.lastUs - s.startUs, s.cents)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, CompletedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(complete(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
            var open   = state.getOption
            val closed = List.newBuilder[CompletedSession]
            sorted.foreach { e =>
              val us = usOf(e.ts)
              open match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  // min/max: a within-watermark late event from a later
                  // micro-batch must not regress the session bounds (a
                  // negative-duration session); it extends backwards instead
                  open = Some(OpenSession(
                    math.min(s.startUs, us), math.max(s.lastUs, us),
                    s.n + 1, s.cents + centsOf(e.value)))
                case Some(s) =>
                  closed += complete(uid, s)
                  open = Some(OpenSession(us, us, 1, centsOf(e.value)))
                case None =>
                  open = Some(OpenSession(us, us, 1, centsOf(e.value)))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close via timeout once the watermark passes last + gap
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
