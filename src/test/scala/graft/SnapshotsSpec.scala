package graft

import org.apache.spark.sql.functions._
import graft.dbt._

/** dbt snapshot (SCD2, timestamp strategy) semantics: version open /
  * close-out / no-op replay, per the dbt contract.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("snapshot opens, closes, and replays versions per dbt timestamp strategy") {
    val b1 = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00"))).toDF("id", "state", "updated_at")
    val s1 = Snapshots.applyBatch(None, b1, "id", "updated_at")
    assert(s1.count() == 2)
    assert(s1.filter(col("dbt_valid_to").isNotNull).count() == 0)

    // key 1 changes, key 2 unchanged, key 3 is new
    val b2 = Seq(
      (1L, "a2", ts("2024-01-05 00:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00")),
      (3L, "c", ts("2024-01-04 00:00:00"))).toDF("id", "state", "updated_at")
    val s2 = Snapshots.applyBatch(Some(s1), b2, "id", "updated_at")
    val rows = s2.orderBy("id", "dbt_valid_from").collect()
    assert(rows.length == 4, "2 versions of key 1 + key 2 + key 3")
    val k1 = rows.filter(_.getLong(0) == 1L)
    assert(k1.length == 2)
    // old version closed AT the new version's start; new version open
    assert(k1(0).getAs[java.sql.Timestamp]("dbt_valid_to") ==
      ts("2024-01-05 00:00:00"))
    assert(k1(1).getAs[String]("state") == "a2" &&
      k1(1).isNullAt(k1(1).fieldIndex("dbt_valid_to")))
    // unchanged key: single open version, original valid_from
    val k2 = rows.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2(0).isNullAt(k2(0).fieldIndex("dbt_valid_to")))
    // new key: inserted open
    assert(rows.count(_.getLong(0) == 3L) == 1)

    // replaying the same batch is a no-op (idempotent deliveries)
    val s3 = Snapshots.applyBatch(Some(s2), b2, "id", "updated_at")
    assert(s3.count() == s2.count())
    assert(s3.exceptAll(s2).isEmpty && s2.exceptAll(s3).isEmpty)

    // an OLDER re-delivery must not reopen or duplicate
    val bOld = Seq((1L, "a", ts("2024-01-01 00:00:00")))
      .toDF("id", "state", "updated_at")
    val s4 = Snapshots.applyBatch(Some(s3), bOld, "id", "updated_at")
    assert(s4.exceptAll(s3).isEmpty && s3.exceptAll(s4).isEmpty)
  }

  test("Snapshot materialization runs the SCD2 lifecycle through the DAG runner") {
    val wh = tmpDir("snap-wh")
    def runWith(source: org.apache.spark.sql.DataFrame) = {
      val reg = new ModelRegistry().register(Model(
        name = "snap_users",
        deps = Nil,
        materialization = Materialization.Snapshot("id", "updated_at"),
        build = ctx => ctx.source("t", "users")))
      new DagRunner(spark, reg, (_, _) => source, wh).run()
    }
    runWith(Seq((1L, "a", ts("2024-01-01 00:00:00")))
      .toDF("id", "state", "updated_at"))
    assert(spark.read.parquet(s"$wh/snap_users").count() == 1)

    // second delivery: key 1 changed, key 2 new
    runWith(Seq(
      (1L, "a2", ts("2024-01-03 00:00:00")),
      (2L, "b", ts("2024-01-02 00:00:00")))
      .toDF("id", "state", "updated_at"))
    val snap = spark.read.parquet(s"$wh/snap_users")
    assert(snap.count() == 3, "two versions of key 1 + key 2")
    val closed = snap.filter(col("dbt_valid_to").isNotNull).collect()
    assert(closed.length == 1 && closed(0).getAs[String]("state") == "a"
      && closed(0).getAs[java.sql.Timestamp]("dbt_valid_to") ==
        ts("2024-01-03 00:00:00"))

    // full refresh resets to the delivered batch alone
    val reg = new ModelRegistry().register(Model(
      name = "snap_users", deps = Nil,
      materialization = Materialization.Snapshot("id", "updated_at"),
      build = ctx => ctx.source("t", "users")))
    new DagRunner(spark, reg, (_, _) =>
      Seq((1L, "a2", ts("2024-01-03 00:00:00")))
        .toDF("id", "state", "updated_at"), wh).run(fullRefresh = true)
    assert(spark.read.parquet(s"$wh/snap_users").count() == 1)
  }
}
