package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.gbfs.GbfsSchemas

/** The reference's real-time pipeline (SURVEY §2.10 ST1-ST6, §3.3),
  * Pub/Sub swapped for any unbounded source of byte payloads — the
  * engine's contract is "streaming DataFrame with a binary `data`
  * column"; tests drive it from MemoryStream, production from
  * Kafka/files, with identical semantics.
  *
  * Plan shape per micro-batch: parse → explode → flatten (narrow) →
  * watermark+dedup (stateful, keyed by station_id+report_time, state
  * expired past the 2-minute watermark) → stream-static broadcast join
  * (no shuffle of the stream) → foreachBatch partitioned append.
  */
object StatusStreamPipeline {

  val WatermarkDelay = "2 minutes"

  /** S5-as-pluggable-source over the reference's archive layout (S11 path
    * contract, `api_to_bucket.py:99-105`):
    * `{root}/gbfs/{feed}/{YYYY}/{MM}/{DD}/{ts}-{suffix}-{feed}.json`, one
    * JSON payload per object. A file-streaming scan discovers new drops
    * per micro-batch; `wholetext` makes each file one payload row and the
    * glob filter enforces the `*-{feed}.json` naming so co-archived
    * feeds in the same tree don't leak in. Emits the same binary `data`
    * column contract as the Pub/Sub/Memory sources, so [[clean]] and
    * everything downstream is source-agnostic.
    */
  def fileSource(spark: SparkSession, archiveRoot: String,
      feed: String = "station_status",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", s"*-$feed.json")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.text(s"$archiveRoot/gbfs/$feed")
      .select(col("value").cast("binary").as("data"))
  }

  /** S5 Pub/Sub-shaped PUSH source: an unbounded `rate` stream wrapped
    * into the same binary `data` envelope as the Pub/Sub subscriber
    * (reference `realtime_pubsub_to_spark.py:99-115` — messages arrive
    * continuously, not as file drops). Each tick synthesizes one
    * station_status payload, deterministic in the tick value, with
    * strictly increasing `last_reported` so event time advances like a
    * live feed. `rowsPerSecond` is the push-source backpressure lever —
    * the `maxFilesPerTrigger` analogue: it caps per-micro-batch intake
    * so a backlog drains at a bounded rate instead of one giant batch
    * (what a Kafka `maxOffsetsPerTrigger` does in production).
    */
  def rateSource(spark: SparkSession, rowsPerSecond: Int,
      stations: Int = 8): DataFrame =
    statusEnvelope(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString)
        .load(), // (timestamp, value)
      stations)

  /** The rate-tick → station_status payload construction shared by the
    * streaming [[rateSource]] and its batch analog
    * [[rateIntakeAccounting]]: each (timestamp, value) tick becomes one
    * JSON payload in the binary `data` envelope, deterministic in the
    * tick value, with strictly increasing `last_reported` so event time
    * advances like a live feed.
    */
  def statusEnvelope(ticks: DataFrame, stations: Int): DataFrame =
    ticks.select(to_json(struct(
        unix_timestamp(col("timestamp")).as("last_updated"),
        lit(10).as("ttl"),
        lit("2.3").as("version"),
        struct(array(struct(
          concat(lit("st"), (col("value") % stations).cast("string"))
            .as("station_id"),
          (col("value") % 20).cast("int").as("num_bikes_available"),
          ((col("value") + 7) % 20).cast("int").as("num_docks_available"),
          lit(true).as("is_installed"),
          lit(true).as("is_renting"),
          lit(true).as("is_returning"),
          // unique, monotone event time per tick: never a dedup-key
          // collision, never late against the 2-minute watermark
          (unix_timestamp(col("timestamp")) + col("value"))
            .as("last_reported"))).as("stations")).as("data")))
        .cast("binary").as("data"))

  /** Envelope decode: bytes → JSON → explode stations → flatten +
    * epoch→timestamp. Works identically on streaming and batch frames —
    * the testable half of [[clean]].
    */
  def decode(payloads: DataFrame): DataFrame =
    payloads
      .selectExpr("CAST(data AS STRING) AS json_payload")
      .select(from_json(col("json_payload"), GbfsSchemas.stationStatus).as("j"))
      .select(col("j.last_updated"), col("j.ttl"), col("j.version"),
        explode(col("j.data.stations")).as("station"))
      .select(
        col("station.station_id").as("station_id"),
        col("station.num_bikes_available").as("bikes_available"),
        col("station.num_docks_available").as("docks_available"),
        col("station.is_installed").as("is_installed"),
        col("station.is_renting").as("is_renting"),
        col("station.is_returning").as("is_returning"),
        timestamp_seconds(col("station.last_reported")).as("report_time"),
        col("last_updated"), col("ttl"), col("version"))

  /** Batch analog of the rate-source intake path, oracle-paired as the
    * `st_rate_intake` gate: synthesize the ticks the rate source would
    * emit over `nTicks` at `rowsPerSecond` (the backpressure cap —
    * Kafka's `maxOffsetsPerTrigger` analogue), round-trip them through
    * the REAL binary-envelope encode + [[decode]], recover each tick
    * from the decoded fields alone (value = last_reported −
    * last_updated, proving the decode preserved both), and account
    * rows per 1-second micro-batch. `within_cap` asserts the intake
    * bound: no batch admits more than `rowsPerSecond` rows.
    */
  def rateIntakeAccounting(spark: SparkSession, nTicks: Long,
      rowsPerSecond: Int, stations: Int, epochStart: Long): DataFrame = {
    val ticks = spark.range(nTicks).select(
      col("id").as("value"),
      timestamp_seconds(
        lit(epochStart) + (col("id") / rowsPerSecond).cast("long"))
        .as("timestamp"))
    val decoded = decode(statusEnvelope(ticks, stations))
    decoded
      .withColumn("tick",
        unix_timestamp(col("report_time")) - col("last_updated"))
      .groupBy((col("tick") / rowsPerSecond).cast("long").as("batch_id"))
      .agg(
        count(lit(1)).as("n_admitted"),
        countDistinct(col("station_id")).as("n_stations"),
        sum(col("bikes_available")).as("sum_bikes"),
        (count(lit(1)) <= rowsPerSecond).as("within_cap"))
  }

  /** ST-clean (reference `clean_data`, `realtime_pubsub_to_spark.py:121-156`):
    * [[decode]] → watermark → stateful dedup.
    */
  def clean(payloads: DataFrame): DataFrame =
    decode(payloads)
      .withWatermark("report_time", WatermarkDelay)
      // dropDuplicatesWithinWatermark, not dropDuplicates: state is
      // guaranteed evicted once the watermark passes an entry's event
      // time + delay, whatever the key shape — the bounded-state contract
      // a 24/7 pipeline needs. With report_time part of the key the
      // OUTPUT is identical to dropDuplicates (a duplicate arriving
      // after its state was evicted is by definition older than the
      // watermark and dropped as late), so the dedup semantics of
      // reference realtime_pubsub_to_spark.py:152-153 are preserved;
      // StreamingSpec pins within-batch, cross-batch, and late cases.
      .dropDuplicatesWithinWatermark("station_id", "report_time")

  /** ST3 (reference `enrich_data`, `:162-186`): stream-static left join
    * against explicitly broadcast station metadata. The static side is
    * re-resolved per micro-batch by Spark; broadcasting keeps the
    * streaming side shuffle-free.
    */
  def enrich(stream: DataFrame, stationInfo: DataFrame): DataFrame = {
    val info = stationInfo
      .select(col("meta.station_id").as("station_id"),
        col("meta.name").as("station_name"),
        col("meta.lat").as("latitude"),
        col("meta.lon").as("longitude"),
        col("meta.address").as("address"),
        col("meta.capacity").as("station_capacity"))
    stream.join(broadcast(info), Seq("station_id"), "left")
  }

  /** Static metadata loader for [[enrich]] (multiline JSON feed snapshot,
    * reference `:164-167`).
    */
  def loadStationInfo(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiline", "true").json(path)
      .selectExpr("explode(data.stations) AS meta")

  /** ST5/S8/S9 (reference `write_stream`, `:192-220`): checkpointed
    * foreachBatch sink appending day-partitioned, station-clustered
    * parquet. Write failures stop every stream (at-least-once + external
    * retry, matching the reference's `streams.stopAll(); sys.exit(1)` —
    * minus the exit so tests can assert).
    */
  def start(df: DataFrame, outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        try {
          batch
            .withColumn("p_date", to_date(col("report_time")))
            .sortWithinPartitions("station_id") // clustering analogue (S8)
            .write.mode("append")
            .partitionBy("p_date")
            .parquet(outPath)
        } catch {
          case e: Exception =>
            System.err.println(s"[stream] batch $batchId failed: ${e.getMessage}")
            // stop peers from a helper thread: stopping from the failing
            // query's own execution thread would self-interrupt before the
            // rethrow and mask the original failure
            val streams = batch.sparkSession.streams
            new Thread(() => streams.active.foreach { q =>
              try q.stop() catch { case _: Exception => () }
            }, "graft-stream-failstop").start()
            throw e
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Watermarked tumbling-window aggregation over the cleaned stream —
    * the streaming form of the marts' hour-truncation group-bys: per
    * (hour, station) availability stats, emitted in append mode once the
    * watermark passes the window end.
    */
  def hourlyStats(cleaned: DataFrame): DataFrame =
    cleaned
      .groupBy(window(col("report_time"), "1 hour"), col("station_id"))
      .agg(
        count(lit(1)).as("n_reports"),
        avg(col("bikes_available")).as("avg_bikes"),
        max(col("docks_available")).as("max_docks"))
      .select(col("window.start").as("hour_start"), col("station_id"),
        col("n_reports"), col("avg_bikes"), col("max_docks"))

  /** ST6 — block the driver on all active streams
    * (reference `spark.streams.awaitAnyTermination()`, `:243`).
    */
  def awaitAll(spark: SparkSession): Unit =
    spark.streams.awaitAnyTermination()

  /** Full pipeline wiring (reference `main`, `:227-243`). */
  def run(spark: SparkSession, payloads: DataFrame, stationInfoPath: String,
      outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery =
    start(
      enrich(clean(payloads), loadStationInfo(spark, stationInfoPath)),
      outPath, checkpoint, trigger)
}
