package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gbfs.GbfsSchemas

/** Fixture data per FIXTURES.md: GBFS feed snapshots (clean + edge cases),
  * historic trips, and the jaffle-shop demo tables.
  *
  * Epochs: feed 1 = 1747000000 (2025-05-11 21:46:40 UTC),
  * feed 2 = 1747000060 (one minute later).
  */
object GbfsFixtures {

  val T1 = 1747000000L
  val T2 = 1747000060L

  private def statusJson(lastUpdated: Long, stations: String): String =
    s"""{"last_updated": $lastUpdated, "ttl": 10, "version": "2.3",
        "ingest_datetime": "2025-05-11T21:47:00.000Z",
        "data": {"stations": [$stations]}}"""

  def station(id: String, bikes: Int, docks: Int, installed: Boolean = true,
      renting: Boolean = true, returning: Boolean = true,
      reported: Long = T1): String =
    s"""{"station_id": "$id", "num_bikes_available": $bikes,
        "vehicle_types_available": [{"vehicle_type_id": "bike", "count": $bikes}],
        "num_docks_available": $docks, "is_installed": $installed,
        "is_renting": $renting, "is_returning": $returning,
        "last_reported": $reported}"""

  /** Two feed snapshots × 3 stations; station 3 goes down in snapshot 2. */
  def rawStationStatus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      statusJson(T1, Seq(
        station("s1", 5, 10, reported = T1),
        station("s2", 0, 20, reported = T1),
        station("s3", 7, 3, reported = T1)).mkString(",")),
      statusJson(T2, Seq(
        station("s1", 6, 9, reported = T2),
        station("s2", 1, 19, reported = T2),
        station("s3", 7, 3, installed = true, renting = false,
          returning = true, reported = T2)).mkString(",")))
    spark.read.schema(GbfsSchemas.rawStationStatus).json(rows.toDS())
  }

  /** data_json string table; s2 misses optional keys, s3 is virtual. */
  def rawStationInformation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dataJson =
      """{"stations": [
        {"station_id": "s1", "name": "Vippetangen \u00f8st", "lat": 59.903989,
         "lon": 10.741077, "address": "Kai 1", "cross_street": "X",
         "capacity": 30, "is_virtual_station": "false",
         "rental_uris": {"android": "a://1", "ios": "i://1", "web": "w://1"}},
        {"station_id": "s2", "name": "Midten", "lat": 59.91, "lon": 10.75},
        {"station_id": "s3", "name": "Virtuell", "lat": 59.92, "lon": 10.76,
         "capacity": 12, "is_virtual_station": "true",
         "rental_uris": {"web": "w://3"}}],
       "tariffs": [
        {"tariff_id": "t1", "name": "Day", "cost_per_hour": 12.5,
         "currency": "NOK", "duration_minutes": 60},
        {"tariff_id": "t1", "name": "Day", "cost_per_hour": 12.5,
         "currency": "NOK", "duration_minutes": 60},
        {"tariff_id": "t2", "name": "Night", "cost_per_hour": "n/a",
         "currency": "NOK", "duration_minutes": 30}]}"""
    Seq((T1, 10, "2.3", Timestamp.valueOf("2025-05-11 21:47:00"), dataJson))
      .toDF("last_updated", "ttl", "version", "ingest_datetime", "data_json")
  }

  /** Trips: t1/t2 normal, t3 mismatched duration, all on 2025-01-01;
    * two start stations.
    */
  def rawHistoricTrips(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("2025-01-01 04:00:00.000000+00:00", "2025-01-01 04:10:00.000000+00:00",
        600, "441", "A", "d", 59.9, 10.7, "442", "B", "d", 59.91, 10.71),
      ("2025-01-01 05:00:00.500000+00:00", "2025-01-01 05:20:00.750000+00:00",
        1200, "441", "A", "d", 59.9, 10.7, "443", "C", "d", 59.92, 10.72),
      ("2025-01-01 06:00:00.000000+00:00", "2025-01-01 06:05:00.000000+00:00",
        999, "442", "B", "d", 59.91, 10.71, "441", "A", "d", 59.9, 10.7))
      .toDF("started_at", "ended_at", "duration", "start_station_id",
        "start_station_name", "start_station_description",
        "start_station_latitude", "start_station_longitude",
        "end_station_id", "end_station_name", "end_station_description",
        "end_station_latitude", "end_station_longitude")
      .withColumn("started_at",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("started_at")))
      .withColumn("ended_at",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("ended_at")))
  }

  def demoCustomers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1, "Ada", "L"), (2, "Grace", "H"), (3, "Edsger", "D"))
      .toDF("id", "first_name", "last_name")
  }

  def demoOrders(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (10, 1, "2024-01-01", "placed"),
      (11, 1, "2024-02-01", "completed"),
      (12, 2, "2024-03-01", "shipped"))
      .toDF("id", "user_id", "order_date", "status")
      .withColumn("order_date",
        org.apache.spark.sql.functions.col("order_date").cast("date"))
  }

  /** Source resolver for DagRunner covering both projects. */
  def sources(spark: SparkSession): (String, String) => DataFrame = {
    case ("gbfs", "raw_station_status")      => rawStationStatus(spark)
    case ("gbfs", "raw_station_information") => rawStationInformation(spark)
    case ("trips", "raw_historic_trips")     => rawHistoricTrips(spark)
    case ("demo", "customers")               => demoCustomers(spark)
    case ("demo", "orders")                  => demoOrders(spark)
    case (s, t) => sys.error(s"unknown source $s.$t")
  }
}
