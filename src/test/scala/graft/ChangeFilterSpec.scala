package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{ChangeFilter, StatusTick}

/** transformWithState changelog compaction (streaming/ChangeFilter):
  * per-key value state on RocksDB suppresses unchanged re-reports
  * within AND across micro-batches; first sight of a key emits with no
  * previous value.
  */
class ChangeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  test("changesOnly drops unchanged ticks across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatusTick]
    val out = ChangeFilter.changesOnly(mem.toDS())
    val ckpt = tmpDir("chg-ckpt")
    val q = out.writeStream.format("memory").queryName("changes")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // batch 1: s1 re-reports 5 twice then moves to 6; s2 first sight
    mem.addData(
      StatusTick("s1", 5, ts(0)), StatusTick("s1", 5, ts(60)),
      StatusTick("s1", 6, ts(120)), StatusTick("s2", 3, ts(0)))
    q.processAllAvailable()
    // batch 2: s1 re-reports 6 (suppressed by CROSS-BATCH state) then
    // 7; s2 re-reports 3 (suppressed) then 4
    mem.addData(
      StatusTick("s1", 6, ts(180)), StatusTick("s1", 7, ts(240)),
      StatusTick("s2", 3, ts(60)), StatusTick("s2", 4, ts(120)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("changes")
      .as[(String, Long, Option[Long], java.sql.Timestamp)]
      .collect().map(r => (r._1, r._2, r._3)).toSet
    assert(rows == Set(
      ("s1", 5L, None), ("s1", 6L, Some(5L)), ("s1", 7L, Some(6L)),
      ("s2", 3L, None), ("s2", 4L, Some(3L))),
      s"got $rows")
    // compaction ratio: 8 ticks in, 5 changes out — and the suppressed
    // rows are exactly the unchanged re-reports
    assert(spark.table("changes").count() == 5)
  }

  test("streaming compaction equals the batch twin on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    // event-time-ordered batches (batch 1's times precede batch 2's):
    // the precondition under which threading state across micro-batches
    // must reproduce the one-pass batch result exactly
    val b1 = Seq(StatusTick("a", 1, ts(0)), StatusTick("a", 1, ts(30)),
      StatusTick("b", 9, ts(10)))
    val b2 = Seq(StatusTick("a", 2, ts(60)), StatusTick("b", 9, ts(70)),
      StatusTick("b", 8, ts(80)))
    val mem = MemoryStream[StatusTick]
    val q = ChangeFilter.changesOnly(mem.toDS())
      .writeStream.format("memory").queryName("changes3")
      .option("checkpointLocation", tmpDir("chg-ckpt3"))
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("changes3")
      .as[(String, Long, Option[Long], java.sql.Timestamp)].collect().toSet
    val batch = ChangeFilter.changesOnlyBatch((b1 ++ b2).toDS())
      .as[(String, Long, Option[Long], java.sql.Timestamp)].collect().toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(batch.map(_._2) == Set(1L, 2L, 9L, 8L))
  }

  test("TTL selects the processing-time mode and analyzes cleanly") {
    implicit val sqlCtx = spark.sqlContext
    // ttl selects TimeMode.ProcessingTime and a TTLConfig on the value
    // state — the state-size bound for unbounded key spaces. This test
    // pins the WIRING (the TTL query builds, analyzes as a streaming
    // Dataset with the compacted schema, and the TTLConfig plumbs
    // through to the state variable); the eviction RUNTIME is pinned by
    // the poll-the-sink test below, which sidesteps the Spark 4.1
    // local-harness wedge in ProcessingTime-mode trailing batches.
    val mem = MemoryStream[StatusTick]
    val out = ChangeFilter.changesOnly(mem.toDS(),
      ttl = Some(java.time.Duration.ofHours(1)))
    assert(out.isStreaming)
    assert(out.schema.fieldNames.toSeq ==
      Seq("station_id", "num_bikes", "prev_bikes", "ts"))
    // the analyzed plan carries a TransformWithState node (not a
    // fallback shape) — the TTL path did not silently change operators
    val hasTws = out.queryExecution.analyzed.collect {
      case n if n.nodeName.toLowerCase.contains("transformwithstate") => n
    }.nonEmpty
    assert(hasTws, "ttl path no longer plans transformWithState")
  }

  test("TTL actually evicts: a key silent past the TTL re-emits as first sight") {
    implicit val sqlCtx = spark.sqlContext
    // The RUNTIME pin for the state-size bound the wiring test above
    // only plumbs: with a 500 ms TTL, the same (key, value) re-reported
    // after a 2 s silence must come back as a FIRST-sight emission
    // (prev None) — the state was evicted, not consulted. Without
    // eviction the tick would be suppressed entirely (the cross-batch
    // suppression path is pinned by the first test in this suite), so
    // the second output row is unforgeable evidence of eviction.
    //
    // Harness shape: ProcessingTime-mode transformWithState wedges
    // Spark 4.1's local harness AFTER the data batch (the AvailableNow
    // trailing bookkeeping hits SPARK's TransformWithStateExec/
    // PythonSQLMetrics construction NPE), so the test polls the
    // parquet sink for the batch's output and stops the query instead
    // of awaiting termination; each run is a fresh query on the same
    // checkpoint (restart = the production shape for AvailableNow),
    // with placeholder MemoryStream blocks aligning source offsets.
    val ckpt = tmpDir("ttl-evict-ckpt")
    val outDir = tmpDir("ttl-evict-out")
    def readOut() =
      try spark.read.schema(
          "station_id string, num_bikes long, prev_bikes long, ts timestamp")
        .parquet(outDir)
        .as[(String, Long, Option[Long], java.sql.Timestamp)]
        .collect().map(r => (r._1, r._2, r._3)).toSeq
      catch { case _: Exception => Seq.empty }
    def runOnce(tick: StatusTick, skipBlocks: Int, expectRows: Int): Unit = {
      val mem = MemoryStream[StatusTick]
      (0 until skipBlocks).foreach(_ =>
        mem.addData(StatusTick("skip", -1, ts(-1))))
      mem.addData(tick)
      val q = ChangeFilter.changesOnly(mem.toDS(),
        ttl = Some(java.time.Duration.ofMillis(500)))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (readOut().size < expectRows && System.nanoTime() < deadline &&
            q.exception.isEmpty)
          Thread.sleep(200)
        // only an exception that prevented the DATA batch's output is a
        // failure — the documented trailing-batch wedge may surface as
        // q.exception AFTER the rows landed, and that must not flake
        // the eviction assertion the rows already prove
        if (readOut().size < expectRows)
          q.exception.foreach(e => fail(s"query failed before output: $e"))
      } finally q.stop()
    }
    runOnce(StatusTick("s1", 5, ts(0)), skipBlocks = 0, expectRows = 1)
    Thread.sleep(2000) // 4x the TTL: the key's state is expired
    runOnce(StatusTick("s1", 5, ts(60)), skipBlocks = 1, expectRows = 2)
    val rows = readOut().sortBy(_.toString)
    assert(rows == Seq(("s1", 5L, None), ("s1", 5L, None)),
      s"expected the unchanged re-report to re-emit as first sight " +
        s"(state evicted), got: $rows")
  }

  test("within-batch order is event-time deterministic") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatusTick]
    val out = ChangeFilter.changesOnly(mem.toDS())
    val q = out.writeStream.format("memory").queryName("changes2")
      .option("checkpointLocation", tmpDir("chg-ckpt2"))
      .outputMode("append").start()
    // delivered out of order inside one batch: processing follows ts
    mem.addData(
      StatusTick("s9", 8, ts(120)), StatusTick("s9", 5, ts(0)),
      StatusTick("s9", 8, ts(60)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("changes2")
      .as[(String, Long, Option[Long], java.sql.Timestamp)]
      .collect().map(r => (r._2, r._3)).toSet
    // ts order 5 → 8 → 8: the second 8 (ts 120) is a no-change drop
    assert(rows == Set((5L, None), (8L, Some(5L))), s"got $rows")
  }
}
