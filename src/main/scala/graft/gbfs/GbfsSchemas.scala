package graft.gbfs

import org.apache.spark.sql.types._

/** Declared schemas for the GBFS ingestion surface (FIXTURES.md §2-§4;
  * reference `src/realtime_pubsub_to_spark.py:60-79`).
  */
object GbfsSchemas {

  /** STATION_STATUS_SCHEMA — 3 levels deep, exactly the reference's. */
  val stationStatus: StructType = StructType(Seq(
    StructField("last_updated", LongType),
    StructField("ttl", IntegerType),
    StructField("version", StringType),
    StructField("data", StructType(Seq(
      StructField("stations", ArrayType(StructType(Seq(
        StructField("station_id", StringType),
        StructField("num_bikes_available", IntegerType),
        StructField("vehicle_types_available", ArrayType(StructType(Seq(
          StructField("vehicle_type_id", StringType),
          StructField("count", IntegerType))))),
        StructField("num_docks_available", IntegerType),
        StructField("is_installed", BooleanType),
        StructField("is_renting", BooleanType),
        StructField("is_returning", BooleanType),
        StructField("last_reported", LongType))))))))))

  /** The streaming envelope published per FIXTURES.md §4
    * (reference `src/api_to_bucket.py:158-167`).
    */
  val statusEnvelope: StructType = StructType(Seq(
    StructField("feed_name", StringType),
    StructField("source_url", StringType)) ++ stationStatus.fields)

  /** raw_station_status landing table = payload schema + ingest_datetime
    * (reference `src/pyspark_gbfs_raw_load.py:99`).
    */
  val rawStationStatus: StructType =
    StructType(stationStatus.fields :+ StructField("ingest_datetime", TimestampType))

  /** raw_station_information: `data` serialized to a JSON string
    * (reference `src/pyspark_gbfs_raw_load.py:102-104`).
    */
  val rawStationInformation: StructType = StructType(Seq(
    StructField("last_updated", LongType),
    StructField("ttl", IntegerType),
    StructField("version", StringType),
    StructField("ingest_datetime", TimestampType),
    StructField("data_json", StringType)))

  /** raw_historic_trips CSV schema (FIXTURES.md §1). */
  val rawHistoricTripsDdl: String =
    """started_at TIMESTAMP, ended_at TIMESTAMP, duration INT,
       start_station_id STRING, start_station_name STRING,
       start_station_description STRING, start_station_latitude DOUBLE,
       start_station_longitude DOUBLE, end_station_id STRING,
       end_station_name STRING, end_station_description STRING,
       end_station_latitude DOUBLE, end_station_longitude DOUBLE"""
}
