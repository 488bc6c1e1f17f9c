package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dbt._
import graft.dbt.Materialization.Incremental
import graft.sources.Warehouse

/** End-to-end proof of the 100 TB incremental story (D4 at scale): a
  * date-partitioned incremental fact with a `scanPredicate` window must
  * (a) PRUNE the existing-side read of the anti-join to the window's
  * partitions — not rescan full history — and (b) still dedup correctly
  * inside the window.
  */
class IncrementalPruningSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(f"2026-01-$d%02d")

  /** (snap_id, event_date, v) rows: `perDay` snapshots for days [from,to]. */
  private def rows(from: Int, to: Int, perDay: Int = 3): DataFrame =
    (from to to).flatMap(d => (0 until perDay)
      .map(i => (s"d$d-$i", day(d), d * 100 + i)))
      .toDF("snap_id", "event_date", "v")

  // collisions can only occur inside the window (snapshot ids are
  // date-prefixed), which is the documented precondition for scanPredicate
  private val window = "event_date >= date'2026-01-08'"

  private def runner(wh: String, source: DataFrame): DagRunner = {
    val reg = new ModelRegistry().register(Model(
      name = "fact_events",
      deps = Nil,
      materialization = Incremental("snap_id", Some(window),
        partitionBy = Seq("event_date")),
      build = ctx => {
        val out = ctx.source("t", "events")
        // {% if is_incremental() %} … NOT IN (SELECT snap_id FROM this):
        // ctx.self is the scanPredicate-scoped read of the existing table
        ctx.self match {
          case Some(existing) =>
            out.join(existing.select("snap_id"), Seq("snap_id"), "left_anti")
          case None => out
        }
      }))
    new DagRunner(spark, reg, (_, _) => source, wh)
  }

  test("scanPredicate + partitionBy prune the incremental anti-join scan") {
    val wh = tmpDir("incr-prune-wh")

    // run 1: full build, 10 days of history → 10 date partitions
    runner(wh, rows(1, 10)).run()
    val all1 = spark.read.parquet(s"$wh/fact_events")
    assert(all1.count() == 30)
    assert(Warehouse.partitionsRead(all1) == 10)

    // the existing-side scan the runner performs on an incremental run is
    // exactly this shape; the window covers days 8-10 → 3 of 10 partitions
    val scoped = spark.read.parquet(s"$wh/fact_events").filter(window)
    assert(Warehouse.partitionsRead(scoped) == 3,
      "scanPredicate window must partition-prune the existing-side read")

    // run 2: re-deliver days 9-10 (already present) plus new days 11-12 —
    // in-window duplicates must be dropped, new days appended, partitioned
    runner(wh, rows(9, 12)).run()
    val all2 = spark.read.parquet(s"$wh/fact_events")
    assert(all2.count() == 36, "6 new rows (days 11-12), 6 dups dropped")
    assert(all2.select("snap_id").distinct().count() == 36)
    assert(Warehouse.partitionsRead(all2) == 12,
      "delta append must preserve the partition layout")

    // the appended days are themselves prunable
    val newDays = spark.read.parquet(s"$wh/fact_events")
      .filter("event_date >= date'2026-01-11'")
    assert(Warehouse.partitionsRead(newDays) == 2)
    assert(newDays.count() == 6)
  }

  private def mergeRunner(wh: String, source: DataFrame): DagRunner = {
    val reg = new ModelRegistry().register(Model(
      name = "fact_events",
      deps = Nil,
      materialization = Incremental("snap_id", Some(window),
        partitionBy = Seq("event_date"),
        strategy = Materialization.IncrementalStrategy.Merge),
      build = ctx => ctx.source("t", "events")))
    new DagRunner(spark, reg, (_, _) => source, wh)
  }

  test("Merge strategy updates re-delivered keys in place, rewriting only touched partitions") {
    val wh = tmpDir("incr-merge-wh")

    // run 1: full build, days 1-10
    mergeRunner(wh, rows(1, 10)).run()
    assert(spark.read.parquet(s"$wh/fact_events").count() == 30)
    val day3FilesBefore = new java.io.File(s"$wh/fact_events")
      .listFiles().filter(_.getName.startsWith("event_date=2026-01-03"))
      .flatMap(_.listFiles()).map(_.getName).toSet

    // run 2: re-deliver days 9-10 with CHANGED values (+ days 11-12 new).
    // Under merge, the re-delivered snapshot_ids must UPDATE, not dup.
    val redelivered = rows(9, 12)
      .withColumn("v", col("v") + lit(100000))
    mergeRunner(wh, redelivered).run()
    val all = spark.read.parquet(s"$wh/fact_events")
    assert(all.count() == 36, "no duplicates: 30 + 6 new")
    assert(all.select("snap_id").distinct().count() == 36)
    // updated in place: days 9-10 carry the new values ...
    assert(all.filter("event_date >= date'2026-01-09' and event_date <= date'2026-01-10'")
      .filter(col("v") < 100000).count() == 0)
    // ... days 1-8 keep the originals
    assert(all.filter("event_date < date'2026-01-09'")
      .filter(col("v") >= 100000).count() == 0)
    // untouched partitions were NOT rewritten (same physical files)
    val day3FilesAfter = new java.io.File(s"$wh/fact_events")
      .listFiles().filter(_.getName.startsWith("event_date=2026-01-03"))
      .flatMap(_.listFiles()).map(_.getName).toSet
    assert(day3FilesAfter == day3FilesBefore,
      "dynamic partition overwrite must leave untouched partitions alone")
  }

  test("Merge strategy evicts a re-delivered key from its OLD partition when the partition value changed") {
    val wh = tmpDir("incr-merge-move-wh")
    mergeRunner(wh, rows(1, 10)).run()

    // corrected event_dates: one snapshot of day 9 moves to day 16, ALL
    // of day 10 move to day 17 (dbt merge matches on key regardless of
    // location — the old rows must be evicted, not duplicated)
    val moved = rows(9, 9, perDay = 1)
      .withColumn("event_date", lit(day(16)))
      .withColumn("v", col("v") + lit(100000))
    val movedAll = rows(10, 10)
      .withColumn("event_date", lit(day(17)))
      .withColumn("v", col("v") + lit(100000))
    mergeRunner(wh, moved.unionByName(movedAll)).run()

    val all = spark.read.parquet(s"$wh/fact_events")
    assert(all.count() == 30, "pure relocation: row count unchanged")
    assert(all.select("snap_id").distinct().count() == 30,
      "exactly one row per key after relocation")
    assert(all.filter(col("snap_id") === "d9-0")
      .select("event_date").as[java.sql.Date].head() == day(16))
    assert(all.filter("event_date = date'2026-01-09'").count() == 2,
      "old partition keeps its 2 unmoved rows")
    assert(all.filter("event_date = date'2026-01-17'").count() == 3)
    // day 10 was fully vacated: zero output rows meant dynamic overwrite
    // never visited it — the runner must drop the stale directory
    assert(all.filter("event_date = date'2026-01-10'").count() == 0)
    assert(!new java.io.File(s"$wh/fact_events/event_date=2026-01-10").exists(),
      "fully vacated partition directory must be deleted")
  }

  test("composite unique_key: both columns must match to dedup/merge") {
    def reg(batch: DataFrame, strategy: Materialization.IncrementalStrategy) =
      new ModelRegistry().register(Model(
        name = "inc2", deps = Nil,
        materialization = Incremental(Seq("k1", "k2"),
          strategy = strategy),
        // append models NOT-IN-filter on the composite key (reference
        // style); merge models hand the batch over and let the runner
        // upsert
        build = ctx => (ctx.self, strategy) match {
          case (Some(existing), Materialization.IncrementalStrategy.AppendNewKeys) =>
            batch.join(existing.select("k1", "k2"), Seq("k1", "k2"), "left_anti")
          case _ => batch
        }))
    def runOnce(wh: String, batch: DataFrame,
        strategy: Materialization.IncrementalStrategy): Unit =
      new DagRunner(spark, reg(batch, strategy),
        (_, _) => sys.error("no sources"), wh).run(runTests = false)

    val r1 = Seq((1, "a", 10), (1, "b", 11), (2, "a", 12)).toDF("k1", "k2", "v")
    val r2 = Seq((1, "a", 99), (2, "b", 13)).toDF("k1", "k2", "v")

    // AppendNewKeys: (1,a) exists → kept at v=10; (2,b) is NEW even
    // though k1=2 exists — a single-column matcher would drop it
    val whA = tmpDir("inc-composite-a")
    runOnce(whA, r1, Materialization.IncrementalStrategy.AppendNewKeys)
    runOnce(whA, r2, Materialization.IncrementalStrategy.AppendNewKeys)
    val outA = spark.read.parquet(s"$whA/inc2")
      .as[(Int, String, Int)].collect().toSet
    assert(outA == Set((1, "a", 10), (1, "b", 11), (2, "a", 12), (2, "b", 13)))

    // Merge: (1,a) replaced by v=99, siblings sharing one key column
    // untouched, (2,b) inserted
    val whM = tmpDir("inc-composite-m")
    runOnce(whM, r1, Materialization.IncrementalStrategy.Merge)
    runOnce(whM, r2, Materialization.IncrementalStrategy.Merge)
    val outM = spark.read.parquet(s"$whM/inc2")
      .as[(Int, String, Int)].collect().toSet
    assert(outM == Set((1, "a", 99), (1, "b", 11), (2, "a", 12), (2, "b", 13)))
  }

  test("full refresh rebuilds the partitioned table from scratch") {
    val wh = tmpDir("incr-prune-fr")
    runner(wh, rows(1, 10)).run()
    runner(wh, rows(5, 6)).run(fullRefresh = true)
    val all = spark.read.parquet(s"$wh/fact_events")
    assert(all.count() == 6)
    assert(Warehouse.partitionsRead(all) == 2)
  }
}
