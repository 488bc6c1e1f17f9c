package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming: gap-based session windows over an event stream
  * via `flatMapGroupsWithState` (the engine's `KeyValueGroupedDataset`
  * surface for state Spark's built-ins can't express).
  *
  * Semantics: a session is a maximal run of a user's events where
  * consecutive event times are ≤ `gapMs` apart. Sessions are emitted in
  * append mode when CLOSED — either a later event arrives beyond the gap,
  * or the event-time watermark passes sessionEnd + gap (timeout), so an
  * idle user's last session still flushes.
  *
  * Scale: state per key is one open session (3 longs) — state size is
  * O(active users), not O(events); watermark timeout bounds lifetime.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)
  final case class OpenSession(start: Long, end: Long, n: Long)

  def sessionize(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              Session(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val sorted = it.toArray.sortBy(_.ts.getTime)
            val closed = ListBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within the gap of the open session's interval (late
                // but above-watermark events may precede it): extend
                case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
                  cur = Some(OpenSession(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1))
                // beyond the gap AFTER the session: close it, open new
                case Some(s) if t > s.end + gapMs =>
                  closed += Session(user, new Timestamp(s.start),
                    new Timestamp(s.end), s.n)
                  cur = Some(OpenSession(t, t, 1))
                // beyond the gap BEFORE the session: a straggler forming
                // its own already-complete session — emit it closed
                case Some(_) =>
                  closed += Session(user, new Timestamp(t), new Timestamp(t), 1)
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp: an event-time timeout must be later than the
              // current watermark or GroupStateImpl throws and kills the
              // query (routine during backlog catch-up)
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }
}
