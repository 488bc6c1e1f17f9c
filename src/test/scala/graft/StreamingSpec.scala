package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatusStreamPipeline

/** ST1-ST6 on a MemoryStream standing in for Pub/Sub: watermarked stateful
  * dedup (within and across micro-batches), late-data drop, stream-static
  * broadcast enrichment, checkpointed day-partitioned foreachBatch sink.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val T = GbfsFixtures.T1

  private def envelope(lastUpdated: Long, stations: String*): String =
    s"""{"feed_name": "station_status", "source_url": "mem://feed",
        "last_updated": $lastUpdated, "ttl": 10, "version": "2.3",
        "data": {"stations": [${stations.mkString(",")}]}}"""
      .replaceAll("\n", " ")

  private def writeInfoFile(): String = {
    val dir = tmpDir("gbfs-info")
    val json =
      """{"last_updated": 1747000000, "ttl": 10, "version": "2.3",
         "data": {"stations": [
           {"station_id": "s1", "name": "Alpha", "lat": 59.9, "lon": 10.7,
            "address": "A st", "capacity": 30},
           {"station_id": "s2", "name": "Beta", "lat": 59.91, "lon": 10.71,
            "address": "B st", "capacity": 20}]}}"""
    Files.writeString(Paths.get(dir, "info.json"), json)
    dir
  }

  test("streamed sink is batch-queryable: partition-pruned mart equals direct computation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val payloads = mem.toDF().select(col("value").cast("binary").as("data"))
    val out = tmpDir("integ-out")
    val q = StatusStreamPipeline.start(
      StatusStreamPipeline.clean(payloads), out, tmpDir("integ-ckpt"),
      Trigger.ProcessingTime("1 second"))
    try {
      // two days of snapshots for two stations
      val day2 = T + 86400
      mem.addData(
        envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T),
          GbfsFixtures.station("s2", 1, 19, reported = T)),
        envelope(T + 60, GbfsFixtures.station("s1", 6, 9, reported = T + 60)))
      q.processAllAvailable()
      mem.addData(
        envelope(day2, GbfsFixtures.station("s1", 2, 13, reported = day2)))
      q.processAllAvailable()
    } finally q.stop()

    // the realtime sink is now a warehouse table: day-1 reads prune to
    // one partition and aggregate to the same numbers as computing
    // directly from the feed
    val sink = spark.read.parquet(out)
    val day1 = sink.filter(col("p_date") === "2025-05-11")
    assert(graft.sources.Warehouse.partitionsRead(day1) == 1)
    val agg = day1.groupBy("station_id")
      .agg(count(lit(1)).as("n"), avg(col("bikes_available")).as("avg_bikes"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(agg("s1") == ((2L, 5.5)))
    assert(agg("s2") == ((1L, 1.0)))
    assert(sink.count() == 4)
  }

  test("file source over the archive path convention drives the full pipeline") {
    // reference layout (api_to_bucket.py:99-105):
    //   {root}/gbfs/{feed}/{YYYY}/{MM}/{DD}/{ts}-{suffix}-{feed}.json
    val root = tmpDir("archive-root")
    val day = Paths.get(root, "gbfs", "station_status", "2025", "05", "11")
    Files.createDirectories(day)
    def drop(name: String, payload: String): Unit =
      Files.writeString(day.resolve(name), payload)
    drop("20250511T214640000000Z-ab12-station_status.json",
      envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T),
        GbfsFixtures.station("s2", 1, 19, reported = T)))
    // a co-archived foreign feed in the same tree must NOT match the glob
    val infoDay = Paths.get(root, "gbfs", "station_status", "2025", "05", "12")
    Files.createDirectories(infoDay)
    Files.writeString(
      infoDay.resolve("20250512T000000000000Z-ffff-station_information.json"),
      """{"not": "a status payload"}""")

    val out = tmpDir("file-stream-out")
    val enriched = StatusStreamPipeline.enrich(
      StatusStreamPipeline.clean(
        StatusStreamPipeline.fileSource(spark, root)),
      StatusStreamPipeline.loadStationInfo(spark, writeInfoFile()))
    val q = StatusStreamPipeline.start(enriched, out, tmpDir("file-stream-ckpt"),
      Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      val b1 = spark.read.parquet(out)
      assert(b1.count() == 2) // two stations, foreign feed filtered out
      // a new drop is discovered by a later micro-batch (the pluggable
      // bit: file arrival == message arrival)
      drop("20250511T214740000000Z-cd34-station_status.json",
        envelope(T + 60, GbfsFixtures.station("s1", 6, 9, reported = T + 60)))
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
      assert(rows.count() == 3)
      val latest = rows.filter(col("report_time") ===
        timestamp_seconds(lit(T + 60))).head()
      assert(latest.getAs[String]("station_name") == "Alpha") // enriched
    } finally q.stop()
  }

  test("watermarked tumbling-window stats emit once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val payloads = mem.toDF().select(col("value").cast("binary").as("data"))
    val stats = StatusStreamPipeline.hourlyStats(
      StatusStreamPipeline.clean(payloads))
    val q = stats.writeStream.format("memory").queryName("hourly_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      // T1 = 1747000000 → 2025-05-11 21:46:40; window 21:00-22:00
      mem.addData(
        envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T)),
        envelope(T, GbfsFixtures.station("s1", 7, 8, reported = T + 60)))
      q.processAllAvailable()
      assert(spark.table("hourly_out").count() == 0) // window still open
      // an event at 22:03 pushes the watermark (delay 2 min) past 22:00
      mem.addData(envelope(T + 1000,
        GbfsFixtures.station("s1", 1, 14, reported = T + 1000)))
      q.processAllAvailable()
      mem.addData(envelope(T + 1100,
        GbfsFixtures.station("s1", 2, 13, reported = T + 1100)))
      q.processAllAvailable()
      val rows = spark.table("hourly_out").collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert(r.getAs[Long]("n_reports") == 2L)
      assert(math.abs(r.getAs[Double]("avg_bikes") - 6.0) < 1e-12)
      assert(r.getAs[java.sql.Timestamp]("hour_start").toString
        .startsWith("2025-05-11 21:00:00"))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to purchases with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    // the streaming form of the j8_range_join attribution: two watermarked
    // streams, inner join on user + a time-range condition — watermarks
    // bound both sides' state so the join survives unbounded input
    val memC = MemoryStream[(Long, Long)] // (user_id, epoch s)
    val memP = MemoryStream[(Long, Long, Long)] // (purchase_id, user_id, epoch s)
    val clicks = memC.toDF().toDF("c_user", "c_epoch")
      .select(col("c_user"), timestamp_seconds(col("c_epoch")).as("c_time"))
      .withWatermark("c_time", "10 minutes")
    val purchases = memP.toDF().toDF("purchase_id", "p_user", "p_epoch")
      .select(col("purchase_id"), col("p_user"),
        timestamp_seconds(col("p_epoch")).as("p_time"))
      .withWatermark("p_time", "10 minutes")
    val joined = clicks.join(purchases,
      expr("""c_user = p_user AND
              c_time >= p_time - INTERVAL 1 HOUR AND c_time < p_time"""))
    val q = joined.writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      // user 1: two clicks inside the hour before the purchase, one after,
      // user 2: click 2 h before its purchase (outside the window)
      memC.addData((1L, T), (1L, T + 1800), (1L, T + 4000), (2L, T))
      memP.addData((100L, 1L, T + 3600), (200L, 2L, T + 7200))
      q.processAllAvailable()
      val rows = spark.table("ss_join_out")
        .select("purchase_id", "c_user").collect()
      assert(rows.map(_.getLong(0)).toSeq.sorted == Seq(100L, 100L))
      assert(rows.forall(_.getLong(1) == 1L))
    } finally q.stop()
  }

  test("streaming session windows merge within-gap events and emit past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val payloads = mem.toDF().select(col("value").cast("binary").as("data"))
    val sessions = StatusStreamPipeline.clean(payloads)
      .groupBy(session_window(col("report_time"), "10 minutes"), col("station_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("station_id"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("session_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      // two reports 60 s apart: one merged session [T, T+60+600)
      mem.addData(
        envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T)),
        envelope(T + 60, GbfsFixtures.station("s1", 6, 9, reported = T + 60)))
      q.processAllAvailable()
      assert(spark.table("session_out").count() == 0) // watermark not past end
      // a report 40 min later closes the session (watermark delay 2 min)
      mem.addData(envelope(T + 2400,
        GbfsFixtures.station("s1", 2, 13, reported = T + 2400)))
      q.processAllAvailable()
      mem.addData(envelope(T + 2500,
        GbfsFixtures.station("s1", 3, 12, reported = T + 2500)))
      q.processAllAvailable()
      val rows = spark.table("session_out").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("n") == 2L)
      val span = (rows(0).getAs[java.sql.Timestamp]("e").getTime -
        rows(0).getAs[java.sql.Timestamp]("s").getTime) / 1000
      assert(span == 60 + 600) // last event + gap
    } finally q.stop()
  }

  test("stateful dedup runs on the RocksDB state store with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    val mem = MemoryStream[String]
    val payloads = mem.toDF().select(col("value").cast("binary").as("data"))
    val q = StatusStreamPipeline.clean(payloads)
      .writeStream.format("memory").queryName("rocksdb_dedup_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      mem.addData(
        envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T)),
        envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T)))
      q.processAllAvailable()
      mem.addData(
        envelope(T + 60, GbfsFixtures.station("s1", 5, 10, reported = T),
          GbfsFixtures.station("s1", 6, 9, reported = T + 60)))
      q.processAllAvailable()
      // identical dedup semantics to dropDuplicates on the event-time key
      assert(spark.table("rocksdb_dedup_out").count() == 2)
      // the state operator is the watermark-bounded dedup variant and its
      // state really lives in RocksDB (provider-specific metrics present)
      val op = q.lastProgress.stateOperators.head
      assert(op.operatorName == "dedupeWithinWatermark")
      assert(op.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb")))
    } finally q.stop()
  }

  test("streaming curation: quality gate + content dedup compose unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.TextAnalysis
    val mem = MemoryStream[(Long, String, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "source", "ts")
      .withColumn("event_time", timestamp_seconds(col("ts")))
    // the batch curation stages are pure projections/filters, so they are
    // streaming-safe verbatim; exact dedup swaps the groupBy for the
    // watermark-bounded stateful variant (same content-hash key)
    val curated = TextAnalysis.textStats(docs)
      .withColumn("quality",
        TextAnalysis.qualityScore(col("n_tokens"), col("stopword_ratio")))
      .filter(col("quality") >= 0.05)
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("event_time", "2 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = curated.select("doc_id", "source", "quality")
      .writeStream.format("memory").queryName("stream_curation_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      val good = "a genuinely informative document about spark streaming pipelines"
      mem.addData(
        (0L, good, "web", T),
        (1L, good, "web", T),                         // exact dup: dropped
        (2L, "the the the the the the", "web", T))    // stopword soup: gated
      q.processAllAvailable()
      assert(spark.table("stream_curation_out").count() == 1)
      mem.addData((3L, good + " second edition", "books", T + 30))
      q.processAllAvailable()
      val rows = spark.table("stream_curation_out").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 3L))
    } finally q.stop()
  }

  test("streaming near-dup suppression drops a cross-batch near-copy by signature") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("event_time", timestamp_seconds(col("ts")))
    val q = graft.streaming.DocStream
      .nearDupSuppress(docs, watermarkDelay = "2 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("stream_neardup_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      val a = "the quick brown fox jumps over the lazy dog tonight"
      mem.addData(
        (0L, a, T),
        (1L, "a completely different document about spark", T))
      q.processAllAvailable()
      assert(spark.table("stream_neardup_out").count() == 2)
      // batch 2, LATER arrival: a token-reversed near-copy of doc 0 —
      // different text (content-hash dedup would admit it), same token
      // multiset, hence the same SimHash signature → suppressed against
      // batch-1 state; a genuinely fresh doc is admitted
      mem.addData(
        (2L, a.split(" ").reverse.mkString(" "), T + 30),
        (3L, "fresh reporting on an unrelated topic entirely", T + 30))
      q.processAllAvailable()
      val admitted = spark.table("stream_neardup_out").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(admitted == Set(0L, 1L, 3L),
        "the cross-batch near-copy (doc 2) must be suppressed by signature")
    } finally q.stop()
  }

  test("drift-tolerant streaming intake conforms per-generation schemas on a backfill") {
    import spark.implicits._
    val root = tmpDir("stream-drift")
    // gen1 predates `source` and narrows doc_id; gen2 stringifies n_chars
    // (one cell unparseable) and carries an unknown column
    Seq((1, "alpha"), (2, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/gen1")
    Seq((3L, "gamma", "web", "42", "f7"), (4L, "delta", "cc", "n/a", "f7"))
      .toDF("doc_id", "text", "source", "n_chars", "fetcher")
      .write.mode("overwrite").parquet(s"$root/gen2")
    val canonical = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT")
    val intake = graft.streaming.DocStream.conformedIntake(spark, Seq(
      s"$root/gen1" -> "doc_id INT, text STRING",
      s"$root/gen2" ->
        "doc_id BIGINT, text STRING, source STRING, n_chars STRING, fetcher STRING"),
      canonical)
    assert(intake.isStreaming)
    val q = intake.writeStream.format("memory").queryName("drift_intake")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("drift_intake").orderBy("doc_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
      assert(rows(0).isNullAt(2) && rows(0).isNullAt(3)) // gen1 absences
      assert(rows(2).getLong(3) == 42L)                  // gen2 parsed cell
      assert(rows(3).isNullAt(3))                        // gen2 bad cell -> NULL
    } finally q.stop()
  }

  test("streaming quality classifier: offline-trained model scores a stream map-only") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.QualityModel
    // train OFFLINE on a batch corpus (the production lifecycle: fit
    // once, ship coefficients), then score an unbounded stream — LR
    // transform is a pure projection, so it is streaming-safe verbatim
    val prose = "the data we have with that and this system will keep " +
      "improving because the work is careful and honest over time"
    val junk = ("## #### " * 12).trim
    import spark.implicits._
    val labeled = QualityModel.featurize(
      (0 until 30).map(i => (i.toLong, s"$prose v$i", 1.0))
        .toDF("doc_id", "text", "label")
        .union((0 until 30).map(i => (100L + i, s"$junk $i", 0.0))
          .toDF("doc_id", "text", "label")))
    val model = QualityModel.train(labeled)
    val mem = MemoryStream[(Long, String)]
    val scored = QualityModel.score(model, mem.toDF().toDF("doc_id", "text"))
      .select(col("doc_id"), (col("quality_prob") > 0.5).as("keep"))
    val q = scored.writeStream.format("memory")
      .queryName("stream_quality_out").outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      mem.addData((10L, s"$prose fresh"), (11L, s"$junk 9 9 9"))
      q.processAllAvailable()
      val rows = spark.table("stream_quality_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
      assert(rows == Map(10L -> true, 11L -> false))
      // streamed verdicts equal the batch path on identical rows
      val batch = QualityModel.score(model,
        Seq((10L, s"$prose fresh"), (11L, s"$junk 9 9 9"))
          .toDF("doc_id", "text"))
        .select(col("doc_id"), (col("quality_prob") > 0.5).as("keep"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Boolean]("keep")).toMap
      assert(batch == rows)
    } finally q.stop()
  }

  test("streaming multimodal: real image decode runs stateless on a byte-payload stream") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import graft.llm.{Codecs, Multimodal}
    val mem = MemoryStream[(Long, Array[Byte])]
    val px = Array.tabulate(4 * 3 * 3)(i => (i * 7).toByte)
    // decodeImage is select + mapPartitions — stateless, so it composes
    // onto a stream verbatim; corrupt payloads quarantine in-stream
    val q = Multimodal.decodeImage(mem.toDF().toDF("doc_id", "payload"), bins = 8)
      .writeStream.format("memory").queryName("stream_decode_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      mem.addData(
        (0L, Codecs.PpmCodec.encode(4, 3, px)),
        (1L, Codecs.BmpCodec.encode(4, 3, px)),
        (2L, "corrupt bytes".getBytes))
      q.processAllAvailable()
      val rows = spark.table("stream_decode_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(rows.size == 3)
      assert(rows(0L).getAs[Boolean]("valid") && rows(1L).getAs[Boolean]("valid"))
      assert(rows(0L).getAs[Int]("width") == 4 && rows(1L).getAs[Int]("height") == 3)
      // PPM and BMP of the SAME pixels decode to the same feature vector
      assert(rows(0L).getAs[scala.collection.Seq[Double]]("feature") ==
        rows(1L).getAs[scala.collection.Seq[Double]]("feature"))
      assert(!rows(2L).getAs[Boolean]("valid"))
    } finally q.stop()
  }

  test("Pub/Sub-shaped rate source: binary envelope parses and per-batch intake stays bounded") {
    val rps = 40
    val payloads = StatusStreamPipeline.rateSource(spark, rowsPerSecond = rps)
    val out = tmpDir("rate-out")
    val ckpt = tmpDir("rate-ckpt")
    // short trigger so several micro-batches complete inside the test
    // window — the backpressure claim is "a continuous feed is consumed
    // as a sequence of rate-bounded batches", the push-source analogue
    // of the file source's maxFilesPerTrigger contract
    val q = StatusStreamPipeline.start(
      StatusStreamPipeline.clean(payloads), out, ckpt,
      Trigger.ProcessingTime("500 milliseconds"))
    try {
      val deadline = System.currentTimeMillis() + 30000
      def doneBatches = q.recentProgress.count(_.numInputRows > 0)
      while (doneBatches < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      assert(progress.length >= 3,
        "continuous feed must be consumed as multiple micro-batches")
      // intake per batch is bounded by the configured rate (generous
      // factor for trigger jitter) — never one giant catch-up batch
      assert(progress.forall(_.numInputRows <= rps * 5L),
        s"per-batch intake exceeded the rate bound: ${
          progress.map(_.numInputRows).mkString(",")}")
    } finally { q.stop(); q.awaitTermination() }
    // every envelope parsed through the SAME clean() path as Pub/Sub/
    // file payloads: non-null keys, synthetic station universe
    val sunk = spark.read.parquet(out)
    assert(sunk.count() > 0)
    assert(sunk.filter(col("station_id").isNull ||
      col("report_time").isNull).count() == 0)
    assert(sunk.select("station_id").distinct().count() <= 8)
  }

  test("streaming pipeline: dedup within+across batches, drop late, enrich, partition sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val payloads = mem.toDF().select(col("value").cast("binary").as("data"))

    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    val enriched = StatusStreamPipeline.enrich(
      StatusStreamPipeline.clean(payloads),
      StatusStreamPipeline.loadStationInfo(spark, writeInfoFile()))
    val q = StatusStreamPipeline.start(enriched, out, ckpt,
      Trigger.ProcessingTime("1 second"))
    try {
      // batch 1: s1+s2 at T, plus an exact duplicate of s1@T in-batch
      mem.addData(
        envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T)),
        envelope(T, GbfsFixtures.station("s1", 5, 10, reported = T),
          GbfsFixtures.station("s2", 0, 20, reported = T)))
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(out)
      assert(afterB1.count() == 2) // in-batch dedup collapsed s1@T

      // batch 2: duplicate s1@T again (cross-batch state hit), a fresh
      // s1@T+60, and a very late s2@T-3600 (beyond the 2-min watermark)
      mem.addData(
        envelope(T + 60,
          GbfsFixtures.station("s1", 5, 10, reported = T),
          GbfsFixtures.station("s1", 6, 9, reported = T + 60),
          GbfsFixtures.station("s2", 9, 9, reported = T - 3600)))
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
      assert(rows.count() == 3) // only s1@T+60 added
      val latest = rows.filter(col("report_time") ===
        timestamp_seconds(lit(T + 60))).head()
      assert(latest.getAs[String]("station_name") == "Alpha") // enriched
      assert(latest.getAs[Long]("station_capacity") == 30L)
      // day-partitioned layout (S8)
      assert(Files.list(Paths.get(out)).toArray.map(_.toString)
        .exists(_.contains("p_date=2025-05-11")))
    } finally q.stop()
  }
}
