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
            // standard interval merge over (open session ∪ batch events)
            // sorted by start: consecutive intervals ≤ gap apart fuse.
            // Late-but-above-watermark stragglers that precede the open
            // session merge with EACH OTHER this way too (not just with
            // the open session), instead of leaking out as singletons.
            val items = (state.getOption.toSeq ++
              it.map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1L)))
              .sortBy(s => (s.start, s.end))
            val merged = ListBuffer.empty[OpenSession]
            items.foreach { s =>
              merged.lastOption match {
                case Some(p) if s.start <= p.end + gapMs =>
                  merged(merged.length - 1) =
                    OpenSession(p.start, math.max(p.end, s.end), p.n + s.n)
                case _ => merged += s
              }
            }
            // every merged run except the latest is already complete —
            // emit closed; the latest stays open in state
            val closed = merged.dropRight(1).map(s =>
              Session(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
            val cur = merged.lastOption
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
