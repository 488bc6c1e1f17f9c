package graft

import org.apache.spark.sql.SparkSession

import graft.dbt.{DagRunner, EngineConfig}
import graft.gbfs.{GbfsModels, GbfsSchemas}
import graft.ingest.Loaders
import graft.sources.Tables

/** CLI entry: run the GBFS model DAG end-to-end over a trips CSV glob and
  * (optionally) a GBFS JSON feed archive, writing the warehouse and
  * printing mart summaries.
  *
  *   runMain graft.RunGbfs <tripsCsvGlob> <warehouseDir> [gbfsJsonDir]
  *
  * Without a feed archive only the trips branch
  * (stg_historic_trips → fact_trips → mart_trip_metrics) and the demo
  * project run — the GBFS feed branch needs landed status/information
  * snapshots.
  */
object RunGbfs {
  def main(args: Array[String]): Unit = {
    val Array(csvGlob, warehouse, rest @ _*) = args
    val spark = graft.core.GraftSession.local("graft-gbfs")

    val trips = Loaders.cleanTrips(
      Tables.csvWithSchema(spark, csvGlob, GbfsSchemas.rawHistoricTripsDdl))

    val gbfsSources: Map[(String, String), org.apache.spark.sql.DataFrame] =
      rest.headOption match {
        case Some(jsonDir) => Map(
          ("gbfs", "raw_station_status") ->
            Loaders.loadGbfsFeed(spark, jsonDir, "station_status"),
          ("gbfs", "raw_station_information") ->
            Loaders.loadGbfsFeed(spark, jsonDir, "station_information"))
        case None => Map.empty
      }

    val demo = Map(
      ("demo", "customers") -> spark.range(0).toDF().selectExpr(
        "cast(id as int) id", "'x' first_name", "'y' last_name"),
      ("demo", "orders") -> spark.range(0).toDF().selectExpr(
        "cast(id as int) id", "cast(id as int) user_id",
        "cast(null as date) order_date", "'placed' status"))

    val sources: (String, String) => org.apache.spark.sql.DataFrame = {
      case ("trips", "raw_historic_trips") => trips
      case key if gbfsSources.contains(key) => gbfsSources(key)
      case key if demo.contains(key)        => demo(key)
      case (s, t) => sys.error(s"source $s.$t not provided")
    }

    val runner = new DagRunner(spark, GbfsModels.registry(), sources,
      warehouse, EngineConfig())
    val selection =
      if (gbfsSources.nonEmpty) Nil // full DAG
      else Seq("mart_trip_metrics", "customers")
    val built = runner.run(select = selection)

    val mart = built("mart_trip_metrics")
    println(s"[gbfs] fact_trips rows: ${built("fact_trips").count()}")
    println(s"[gbfs] mart_trip_metrics rows: ${mart.count()}")
    mart.orderBy(org.apache.spark.sql.functions.desc("total_trips_started"))
      .show(5, truncate = false)
    val mismatches = mart.agg(org.apache.spark.sql.functions
      .sum("count_mismatched_durations")).head().getLong(0)
    println(s"[gbfs] total mismatched durations: $mismatches")
    spark.stop()
  }
}
