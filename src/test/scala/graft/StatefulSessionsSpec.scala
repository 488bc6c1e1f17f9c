package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, Session}

/** flatMapGroupsWithState sessionization: close-by-gap, close-by-timeout,
  * bounded per-key state.
  */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions close on gap and flush on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(
      mem.toDS(), gapMs = 60000L, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      // batch 1: user 1 has two close events (one open session);
      // user 2 has one event
      mem.addData(
        Event(1L, ts("2024-01-01 00:00:00")),
        Event(1L, ts("2024-01-01 00:00:30")),
        Event(2L, ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // nothing closed yet

      // batch 2: user 1 event far beyond the gap → closes session 1
      mem.addData(Event(1L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      // run an extra empty-ish cycle so the watermark from batch 2
      // triggers user 2's timeout
      mem.addData(Event(3L, ts("2024-01-01 00:10:01")))
      q.processAllAvailable()

      val rows = spark.table("sessions_out").as[Session].collect()
      val u1 = rows.find(_.user_id == 1L).get
      assert(u1.session_start == ts("2024-01-01 00:00:00"))
      assert(u1.session_end == ts("2024-01-01 00:00:30"))
      assert(u1.n_events == 2L)
      // user 2's lone session flushed by timeout (watermark 00:10:00 >
      // 00:00:10 + 60s)
      val u2 = rows.find(_.user_id == 2L).get
      assert(u2.n_events == 1L)
    } finally q.stop()
  }

  test("late above-watermark events extend session_start backwards") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(
      mem.toDS(), gapMs = 60000L, watermarkDelay = "1 hour")
    val q = sessions.writeStream
      .format("memory").queryName("late_sessions_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      mem.addData(Event(1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // 30s-late event (within gap, above the 1h watermark): must extend
      // the session's START, not be swallowed
      mem.addData(Event(1L, ts("2024-01-01 11:59:30")))
      q.processAllAvailable()
      // far-away event closes the session
      mem.addData(Event(1L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val s = spark.table("late_sessions_out").as[Session].collect()
        .find(_.user_id == 1L).get
      assert(s.session_start == ts("2024-01-01 11:59:30"))
      assert(s.session_end == ts("2024-01-01 12:00:00"))
      assert(s.n_events == 2L)
    } finally q.stop()
  }

  test("pre-session stragglers within the gap of each other merge") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(
      mem.toDS(), gapMs = 60000L, watermarkDelay = "1 hour")
    val q = sessions.writeStream
      .format("memory").queryName("straggler_sessions_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      mem.addData(Event(1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // two late events > gap before the open session but within the gap
      // of EACH OTHER: one two-event session, not two singletons
      mem.addData(
        Event(1L, ts("2024-01-01 11:50:00")),
        Event(1L, ts("2024-01-01 11:50:20")))
      q.processAllAvailable()
      val rows = spark.table("straggler_sessions_out").as[Session].collect()
      assert(rows.length == 1)
      assert(rows.head.session_start == ts("2024-01-01 11:50:00"))
      assert(rows.head.session_end == ts("2024-01-01 11:50:20"))
      assert(rows.head.n_events == 2L)
    } finally q.stop()
  }
}
