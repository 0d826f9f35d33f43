package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming CDC apply: last-write-wins state materialization with
  * `mapGroupsWithState` — the continuous twin of the batch changelog-apply
  * query (q189). Each key holds ONE fixed-size state record (latest write,
  * first-write time, update count), so state is bounded by key cardinality
  * regardless of stream length — the property that makes the operator safe
  * on an unbounded changelog where a windowed dedup would grow forever.
  *
  * Ordering: "latest" is the (event-time µs, event_id) total order, the
  * same tie-break the batch query uses, so replaying any chunking of the
  * changelog converges to the identical state table (spec-proven).
  */
object StateStream {

  final case class ChangeEvent(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

  final case class KeyState(
      lastUs: Long, lastEventId: Long, lastType: String, firstUs: Long, nUpdates: Long)

  final case class CurrentRow(
      user_id: Long, last_type: String, last_us: Long, first_us: Long, n_updates: Long)

  /** Latest state per key, emitted in Update mode — each batch re-emits
    * only the keys it touched; the sink upserts by `user_id`.
    */
  def latestState(changes: Dataset[ChangeEvent]): Dataset[CurrentRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.user_id)
      .mapGroupsWithState[KeyState, CurrentRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[ChangeEvent], state) =>
          var st = state.getOption
            .getOrElse(KeyState(Long.MinValue, Long.MinValue, "", Long.MaxValue, 0L))
          it.foreach { e =>
            val us = SessionStream.usOf(e.ts)
            val newer =
              us > st.lastUs || (us == st.lastUs && e.event_id > st.lastEventId)
            st = KeyState(
              if (newer) us else st.lastUs,
              if (newer) e.event_id else st.lastEventId,
              if (newer) e.event_type else st.lastType,
              math.min(st.firstUs, us),
              st.nUpdates + 1L)
          }
          state.update(st)
          CurrentRow(uid, st.lastType, st.lastUs, st.firstUs, st.nUpdates)
      }
  }

  /** The OutputMode this operator requires (update — keys re-emit). */
  val outputMode: OutputMode = OutputMode.Update
}
