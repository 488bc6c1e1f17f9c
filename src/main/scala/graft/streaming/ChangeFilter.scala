package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One raw feed tick: the station's reported availability at `ts`.
  * (Shape of the reference's per-minute `station_status` snapshots —
  * `/root/reference/src/realtime_pubsub_to_spark.py:141-152` — reduced
  * to the one metric the compactor keys on.) */
final case class StatusTick(station_id: String, num_bikes: Long,
    ts: java.sql.Timestamp)

/** A COMPACTED tick: emitted only when the value differs from the
  * key's previously-emitted value; `prev_bikes` is None on the key's
  * first-ever emission. */
final case class StatusChange(station_id: String, num_bikes: Long,
    prev_bikes: Option[Long], ts: java.sql.Timestamp)

/** Per-key changelog compaction on the modern `transformWithState`
  * API (Spark 4 arbitrary stateful processing): drop every tick whose
  * value equals the key's last EMITTED value, across micro-batch
  * boundaries.
  *
  * Why this operator: a polling feed re-reports unchanged state every
  * cadence tick — the reference's station feed snapshots every minute
  * whether anything moved or not. At 100 TB-scale intake the compactor
  * is the first stateful filter: downstream storage and dedup see the
  * CHANGE stream (∝ activity), not the snapshot stream (∝ stations ×
  * cadence). State is one value per key in the RocksDB state store
  * (off-heap, TTL-boundable via `ttl`), so state size is the key
  * cardinality — never the stream length.
  *
  * Why `transformWithState` rather than `flatMapGroupsWithState`
  * (which [[StatefulSessions]] uses): typed per-state-variable handles
  * with independent TTLs, timers decoupled from data arrival, and
  * schema-evolvable state — the API Spark 4 positions for new stateful
  * operators; this operator doubles as the engine's coverage of it.
  */
class ChangeCompactor(ttl: Option[java.time.Duration] = None)
    extends StatefulProcessor[String, StatusTick, StatusChange] {
  @transient private var last: ValueState[Long] = _

  // ttl is a CONSTRUCTOR field so it serializes with the processor to
  // executor JVMs — a companion-object var would only ever mutate the
  // driver's copy (silently unbounded state on a real cluster) and
  // race between concurrent queries in one JVM
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[Long]("last_bikes", Encoders.scalaLong,
      ChangeCompactor.ttlFor(ttl, timeMode))

  override def handleInputRows(key: String, rows: Iterator[StatusTick],
      timers: TimerValues): Iterator[StatusChange] = {
    val prev0 = if (last.exists()) Some(last.get()) else None
    val (out, prevN) = ChangeCompactor.compact(key, rows, prev0)
    prevN.foreach(last.update)
    out.iterator
  }
}

object ChangeCompactor {
  /** The compaction core, shared verbatim by the streaming processor
    * (per micro-batch, threading `prev` through RocksDB state) and the
    * batch path (one call per key over all its rows). Rows process in
    * deterministic (event time, value) order — a micro-batch has no
    * inherent row order. Returns (emitted changes, last emitted value).
    */
  private[streaming] def compact(key: String, rows: Iterator[StatusTick],
      prev0: Option[Long]): (Seq[StatusChange], Option[Long]) = {
    val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, t.num_bikes))
    val out = Seq.newBuilder[StatusChange]
    var prev = prev0
    sorted.foreach { t =>
      if (!prev.contains(t.num_bikes)) {
        out += StatusChange(key, t.num_bikes, prev, t.ts)
        prev = Some(t.num_bikes)
      }
    }
    (out.result(), prev)
  }

  /** TTL for the per-key value: bounded when the query runs in
    * processing-time mode (keys silent past the TTL re-emit as fresh —
    * the state-size bound for unbounded key spaces), unbounded under
    * TimeMode.None (TTL requires a processing-time clock). */
  private[streaming] def ttlFor(ttl: Option[java.time.Duration],
      timeMode: TimeMode): TTLConfig = ttl match {
    case Some(d) if timeMode == TimeMode.ProcessingTime() => TTLConfig(d)
    case _ => TTLConfig.NONE
  }
}

object ChangeFilter {

  /** Batch twin of [[changesOnly]] — same compaction core, no state
    * store (each key's full history arrives in one group): one shuffle
    * on the key, then a per-group pass. Provably equal to running the
    * stream over the same rows in event-time order — the spec pins the
    * two paths equal on shared data; the oracle gate pairs this path
    * against the lag()-window reduction.
    */
  def changesOnlyBatch(ticks: Dataset[StatusTick]): Dataset[StatusChange] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.station_id).flatMapGroups { (k, rows) =>
      ChangeCompactor.compact(k, rows, None)._1.iterator
    }
  }

  /** Compact a tick stream to its change stream. Append-mode output;
    * one state value per key on RocksDB. Pass `ttl` to bound state for
    * unbounded key spaces (requires the processing-time time mode,
    * which `ttl.isDefined` selects).
    */
  def changesOnly(ticks: Dataset[StatusTick],
      ttl: Option[java.time.Duration] = None): Dataset[StatusChange] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ticks.groupByKey(_.station_id)
      .transformWithState(new ChangeCompactor(ttl), timeMode,
        OutputMode.Append())
  }
}
