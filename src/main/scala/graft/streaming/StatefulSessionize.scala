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
  * aggregates) — O(1) and bounded. Sessions are emitted when they
  * CLOSE: either a new event arrives past the gap, or (via
  * EventTimeTimeout) the watermark passes `last event + gap`, which
  * flushes idle users without waiting for their next event. Sessions
  * whose `last event + gap` is still ahead of the final watermark
  * remain buffered — standard watermark semantics, there is no
  * "end of stream" signal in a continuous query.
  */
object StatefulSessionize {

  final case class Event(user_id: Long, event_id: Long, us: Long,
      ts: java.sql.Timestamp)
  final case class SessionState(
      sessionId: Long, lastUs: Long, startUs: Long, n: Long)
  final case class Session(
      user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  val DefaultGapUs: Long = 1800000000L // 30 min

  def sessionize(events: Dataset[Event], gapUs: Long = DefaultGapUs,
      watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs+gap with no new events: the open
            // session can never be extended — close and emit it
            val st = state.get
            state.remove()
            Iterator.single(Session(user, st.sessionId, st.n, st.startUs, st.lastUs))
          } else {
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
            // schedule the idle flush; the timestamp must stay ahead
            // of the current watermark or Spark rejects it
            val flushAtMs = st.lastUs / 1000L + gapUs / 1000L
            state.setTimeoutTimestamp(
              math.max(flushAtMs, state.getCurrentWatermarkMs + 1L))
            out.iterator
          }
      }
  }
}
