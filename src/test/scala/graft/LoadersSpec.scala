package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.ingest.Loaders

class LoadersSpec extends SparkSpec {
  import spark.implicits._

  private def writeFeedFile(dir: String, name: String): String = {
    val json =
      """{"last_updated": 1747000000, "ttl": 10, "version": "2.3",
         "data": {"stations": [
           {"station_id": "s1", "name": "Alpha", "lat": 59.9, "lon": 10.7,
            "capacity": 30,
            "station_area": {"type": "MultiPolygon", "coordinates": [[[[1.0, 2.0]]]]}},
           {"station_id": "s2", "name": "Beta", "lat": 59.91, "lon": 10.71,
            "capacity": 20,
            "station_area": {"type": "MultiPolygon", "coordinates": [[[[3.0, 4.0]]]]}}],
          "tariffs": [{"tariff_id": "t1", "cost_per_hour": 12.5}]}}"""
    val p = Paths.get(dir, name)
    Files.writeString(p, json)
    p.toString
  }

  test("loadGbfsFeed(station_status) drops station_area structurally") {
    val dir = tmpDir("gbfs-json")
    writeFeedFile(dir, "f1.json")
    val df = Loaders.loadGbfsFeed(spark, dir, "station_status",
      ingestAt = Some(java.sql.Timestamp.valueOf("2025-05-11 21:47:00")))
    val elem = df.schema("data").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("stations").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(!elem.fieldNames.contains("station_area"))
    assert(elem.fieldNames.contains("station_id"))
    assert(df.select(explode(col("data.stations")).as("s"))
      .select("s.station_id").as[String].collect().sorted
      .sameElements(Array("s1", "s2")))
  }

  test("loadGbfsFeed(station_information) serializes data to data_json") {
    val dir = tmpDir("gbfs-json2")
    writeFeedFile(dir, "f1.json")
    val df = Loaders.loadGbfsFeed(spark, dir, "station_information",
      ingestAt = Some(java.sql.Timestamp.valueOf("2025-05-11 21:47:00")))
    assert(df.columns.contains("data_json") && !df.columns.contains("data"))
    val j = df.select("data_json").as[String].head()
    assert(!j.contains("station_area"))
    assert(get_json_object(lit(j), "$.stations[0].station_id") != null)
    // staging path can parse it
    val parsed = df.select(
      get_json_object(col("data_json"), "$.stations[1].name").as("n")).head()
    assert(parsed.getString(0) == "Beta")
  }

  test("appendAndRetire appends parquet and deletes consumed inputs") {
    val dir = tmpDir("gbfs-json3")
    val f = writeFeedFile(dir, "f1.json")
    val out = tmpDir("raw-out") + "/raw_station_status"
    val df = Loaders.loadGbfsFeed(spark, dir, "station_status",
      ingestAt = Some(java.sql.Timestamp.valueOf("2025-05-11 21:47:00")))
    Loaders.appendAndRetire(spark, df, out, Seq(f))
    assert(spark.read.parquet(out).count() == 1)
    assert(!Files.exists(Paths.get(f)))
    // new arrival; failure to delete a missing path is non-fatal
    // (reference :119-121)
    val f2 = writeFeedFile(dir, "f2.json")
    val df2 = Loaders.loadGbfsFeed(spark, dir, "station_status",
      ingestAt = Some(java.sql.Timestamp.valueOf("2025-05-11 21:48:00")))
    Loaders.appendAndRetire(spark, df2, out, Seq(s"$dir/missing.json"))
    assert(spark.read.parquet(out).count() == 2)
    assert(Files.exists(Paths.get(f2)))
  }

  test("cleanTrips drops rows missing endpoints and parses offset timestamps") {
    val raw = Seq(
      (Option("2025-01-01 04:37:39.287000+00:00"),
        Option("2025-01-01 04:47:39.000000+00:00"), "600", "441"),
      (None, Option("2025-01-01 05:00:00.000000+00:00"), "60", "442"))
      .toDF("started_at", "ended_at", "duration", "start_station_id")
      .withColumn("end_station_id", lit(7)) // numeric-typed id → cast to string
    val cleaned = Loaders.cleanTrips(raw)
    assert(cleaned.count() == 1)
    val r = cleaned.head()
    assert(r.getAs[java.sql.Timestamp]("started_at").toInstant.toString
      == "2025-01-01T04:37:39.287Z")
    assert(r.getAs[Int]("duration") == 600)
    assert(r.getAs[String]("end_station_id") == "7")
  }
}
