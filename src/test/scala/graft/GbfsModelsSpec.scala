package graft

import org.apache.spark.sql.functions._
import graft.dbt.{DagRunner, EngineConfig}
import graft.gbfs.GbfsModels

/** End-to-end DAG semantics on the FIXTURES.md data: staging flattening,
  * dimension dedup, fact keys/joins/incrementality, mart aggregates.
  */
class GbfsModelsSpec extends SparkSpec {

  private lazy val warehouse = tmpDir("gbfs-wh")
  private lazy val runner = new DagRunner(
    spark, GbfsModels.registry(), GbfsFixtures.sources(spark), warehouse,
    EngineConfig(today = Some(java.time.LocalDate.parse("2025-05-20"))))
  private lazy val built = runner.run()

  test("stg_station_status flattens 2 snapshots x 3 stations") {
    val df = built("stg_station_status")
    assert(df.count() == 6)
    val r = df.filter(col("station_id") === "s1" &&
      col("feed_updated_at") === timestamp_seconds(lit(GbfsFixtures.T1)))
      .select("bikes_available", "docks_available").head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 10)
  }

  test("stg_station_information: missing optional keys become NULL") {
    val s2 = built("stg_station_information")
      .filter(col("station_id") === "s2").head()
    assert(s2.getAs[Any]("address") == null)
    assert(s2.getAs[Any]("capacity") == null)
    assert(s2.getAs[Any]("is_virtual_station") == null)
    val s3 = built("stg_station_information")
      .filter(col("station_id") === "s3").head()
    assert(s3.getAs[Boolean]("is_virtual_station"))
    assert(s3.getAs[String]("uri_web") == "w://3")
    assert(s3.getAs[Any]("uri_android") == null)
  }

  test("stg_station_tariffs: safe_cast yields NULL for bad numerics") {
    val t = built("stg_station_tariffs")
    assert(t.count() == 3) // duplicate t1 still present at staging
    val bad = t.filter(col("tariff_id") === "t2").head()
    assert(bad.getAs[Any]("cost_per_hour") == null)
  }

  test("dim_tariff dedups the repeated tariff row (GROUP BY 1..5)") {
    assert(built("dim_tariff").count() == 2)
  }

  test("dim_stations is distinct per station") {
    assert(built("dim_stations").count() == 3)
  }

  test("dim_date spans min feed date to injected today") {
    val d = built("dim_date")
    // 2025-05-11 .. 2025-05-20 inclusive = 10 days
    assert(d.count() == 10)
    val first = d.orderBy("date_key").head()
    assert(first.getAs[java.sql.Date]("date_key").toString == "2025-05-11")
    assert(first.getAs[Int]("weekday") == 1) // 2025-05-11 is a Sunday
    assert(first.getAs[String]("date_int") == "20250511")
  }

  test("fact_station_status: snapshot keys and virtual-station coalesce") {
    val f = built("fact_station_status")
    assert(f.count() == 6)
    assert(f.select("snapshot_id").distinct().count() == 6)
    // s2 has no is_virtual_station in info → coalesced to false
    assert(!f.filter(col("station_id") === "s2").head()
      .getAs[Boolean]("is_virtual_station"))
    assert(f.filter(col("station_id") === "s3").head()
      .getAs[Boolean]("is_virtual_station"))
  }

  test("fact_station_status_latest keeps exactly the newest row per station") {
    val l = built("fact_station_status_latest")
    assert(l.count() == 3)
    assert(l.select(max(col("status_timestamp"))).head().getTimestamp(0) ==
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(GbfsFixtures.T2)))
    // s3's latest snapshot is the not-renting one
    assert(!l.filter(col("station_id") === "s3").head().getAs[Boolean]("is_renting"))
  }

  test("fact_station_uptime: s3 is up 1 of 2 snapshots") {
    val u = built("fact_station_uptime").filter(col("station_id") === "s3").head()
    assert(u.getAs[Long]("up_count") == 1L)
    assert(u.getAs[Long]("total_count") == 2L)
    assert(math.abs(u.getAs[Double]("uptime_pct") - 0.5) < 1e-12)
  }

  test("fact_trips: computed vs reported duration, md5 trip keys") {
    val t = built("fact_trips")
    assert(t.count() == 3)
    assert(t.select("trip_id").distinct().count() == 3)
    val mism = t.filter(col("raw_duration_s") =!= col("computed_duration_s"))
    assert(mism.count() == 1)
    assert(mism.head().getAs[Long]("computed_duration_s") == 300L)
    // trip 2: 05:00:00.5 → 05:20:00.75 = 1200.25s → truncates to 1200
    assert(t.filter(col("raw_duration_s") === 1200).head()
      .getAs[Long]("computed_duration_s") == 1200L)
  }

  test("mart_station_availability joins names and computes pct") {
    val m = built("mart_station_availability")
    assert(m.count() == 6)
    val r = m.filter(col("station_id") === "s1" &&
      col("bikes_available") === 5).head()
    assert(r.getAs[String]("station_name") == "Vippetangen øst")
    assert(math.abs(r.getAs[Double]("pct_bikes_available") - 0.333) < 1e-12)
  }

  test("mart_station_uptime countif ratios") {
    val m = built("mart_station_uptime").filter(col("station_id") === "s3").head()
    assert(m.getAs[Long]("total_snapshots") == 2L)
    assert(m.getAs[Long]("renting_snapshots") == 1L)
    assert(math.abs(m.getAs[Double]("pct_time_renting") - 0.5) < 1e-12)
  }

  test("mart_trip_metrics aggregates per station-day") {
    val m = built("mart_trip_metrics")
      .filter(col("station_id") === "441").head()
    assert(m.getAs[Long]("total_trips_started") == 2L)
    assert(math.abs(m.getAs[Double]("avg_reported_duration_s") - 900.0) < 1e-9)
    assert(m.getAs[Long]("count_mismatched_durations") == 0L)
  }

  test("demo customers: left join + coalesce(0) for orderless customer") {
    val c = built("customers")
    assert(c.count() == 3)
    assert(c.filter(col("customer_id") === 3).head()
      .getAs[Long]("number_of_orders") == 0L)
    assert(c.filter(col("customer_id") === 1).head()
      .getAs[Long]("number_of_orders") == 2L)
  }

  test("incremental models append only new snapshot keys on re-run") {
    built // force first full run
    val before = spark.read.parquet(s"$warehouse/fact_station_status_history").count()
    assert(before == 6)
    // second run with one extra feed snapshot: 3 new + 6 known keys
    val extended = {
      import spark.implicits._
      val t3 = GbfsFixtures.T2 + 60
      val rows = Seq(
        GbfsFixtures.rawStationStatus(spark),
        spark.read.schema(graft.gbfs.GbfsSchemas.rawStationStatus).json(Seq(
          s"""{"last_updated": $t3, "ttl": 10, "version": "2.3",
              "ingest_datetime": "2025-05-11T21:49:00.000Z",
              "data": {"stations": [
                ${GbfsFixtures.station("s1", 2, 13, reported = t3)},
                ${GbfsFixtures.station("s2", 3, 17, reported = t3)},
                ${GbfsFixtures.station("s3", 7, 3, reported = t3)}]}}""").toDS()))
      rows.reduce(_ unionByName _)
    }
    val sources2: (String, String) => org.apache.spark.sql.DataFrame = {
      case ("gbfs", "raw_station_status") => extended
      case other => GbfsFixtures.sources(spark)(other._1, other._2)
    }
    val runner2 = new DagRunner(spark, GbfsModels.registry(), sources2,
      warehouse, EngineConfig(today = Some(java.time.LocalDate.parse("2025-05-20"))))
    runner2.run(select = Seq("fact_station_status_history"))
    val after = spark.read.parquet(s"$warehouse/fact_station_status_history")
    assert(after.count() == 9)
    assert(after.select("snapshot_id").distinct().count() == 9)
    // third run with identical input: nothing appended
    runner2.run(select = Seq("fact_station_status_history"))
    assert(spark.read.parquet(s"$warehouse/fact_station_status_history").count() == 9)
    // --full-refresh rebuilds from scratch (back to the 9 current rows
    // even if history had drifted)
    runner2.run(select = Seq("fact_station_status_history"), fullRefresh = true)
    assert(spark.read.parquet(s"$warehouse/fact_station_status_history").count() == 9)
  }
}
