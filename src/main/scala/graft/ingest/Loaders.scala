package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Batch ingestion operators (SURVEY §2.1 S3/S4/S6/S7/S10, §3.2).
  *
  * Mirrors the reference's two batch loaders as composable DataFrame
  * stages. Scale notes versus the reference:
  *  - no `df.count()` progress logging mid-pipeline (reference
  *    `src/historical_bucket_to_bq.py:64` — a full extra job per load);
  *    row counts at 100 TB come from write metrics, not actions;
  *  - CSV reads take an explicit schema (inference is a second full pass).
  */
object Loaders {

  // ------------------------------------------------------ historic trips

  /** Clean the historic-trips frame: drop rows missing trip endpoints,
    * normalize timestamps (µs+offset strings), cast duration to int and
    * station ids to string (`src/historical_bucket_to_bq.py:70-91`).
    */
  def cleanTrips(raw: DataFrame): DataFrame = {
    def ts(c: Column): Column =
      // works for both string-typed ("2025-01-01 04:37:39.287000+00:00")
      // and already-inferred timestamp columns
      to_timestamp(c)
    raw
      .withColumn("started_at", ts(col("started_at")))
      .withColumn("ended_at", ts(col("ended_at")))
      // drop AFTER parsing (unlike the reference, which drops first) so a
      // non-null-but-unparseable endpoint is dropped rather than flowing
      // through as NULL and tripping downstream not_null tests
      .na.drop(Seq("started_at", "ended_at"))
      .withColumn("duration", col("duration").cast("int"))
      .withColumn("start_station_id", col("start_station_id").cast("string"))
      .withColumn("end_station_id", col("end_station_id").cast("string"))
  }

  /** Full CSV→parquet trips load (S4 → clean → S7 overwrite). */
  def loadTrips(spark: SparkSession, csvPath: String, outPath: String): Unit =
    cleanTrips(
      graft.sources.Tables.csvWithSchema(spark, csvPath,
        graft.gbfs.GbfsSchemas.rawHistoricTripsDdl))
      .write.mode("overwrite").parquet(outPath)

  // ----------------------------------------------------- GBFS JSON feeds

  /** P9 — structurally drop a field from every element of `data.stations`
    * (the reference removes `station_area` because its geometry breaks
    * schema inference, `src/pyspark_gbfs_raw_load.py:74-83`). Rebuilds
    * each struct from its kept fields via a higher-order `transform`.
    */
  def dropStationField(df: DataFrame, field: String): DataFrame = {
    val stationsType = df.schema("data").dataType
      .asInstanceOf[StructType]("stations").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    val elem = stationsType.elementType.asInstanceOf[StructType]
    if (!elem.fieldNames.contains(field)) df
    else {
      val kept = elem.fieldNames.filter(_ != field)
      df.withColumn("data",
        struct(
          transform(col("data.stations"), s =>
            struct(kept.map(f => s.getField(f).as(f)).toSeq: _*))
            .as("stations")))
    }
  }

  /** Load archived GBFS JSON (S3) into the raw landing shape:
    * station_status keeps the typed struct; station_information serializes
    * `data` to a JSON string (`src/pyspark_gbfs_raw_load.py:94-113`).
    * `ingestAt` is injectable for deterministic tests (the reference
    * stamps `current_timestamp()`).
    */
  def loadGbfsFeed(spark: SparkSession, jsonPath: String, feed: String,
      ingestAt: Option[java.sql.Timestamp] = None): DataFrame = {
    val raw = graft.sources.Tables.jsonArchive(spark, jsonPath)
    val stamped = raw.withColumn("ingest_datetime",
      ingestAt.map(t => lit(t)).getOrElse(current_timestamp()))
    feed match {
      case "station_status" =>
        dropStationField(stamped, "station_area")
      case "station_information" =>
        dropStationField(stamped, "station_area")
          .withColumn("data_json", to_json(col("data")))
          .drop("data")
      case other => sys.error(s"unknown feed $other")
    }
  }

  /** S6/S10 — append to the landing table, then delete consumed source
    * files; deletion failures log but never fail the load (reference
    * `src/pyspark_gbfs_raw_load.py:110-121`).
    */
  def appendAndRetire(spark: SparkSession, df: DataFrame, outPath: String,
      consumed: Seq[String]): Unit = {
    df.write.mode("append").parquet(outPath)
    val conf = spark.sessionState.newHadoopConf()
    consumed.foreach { p =>
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).delete(hp, false)
      } catch {
        case e: Exception =>
          System.err.println(s"[ingest] retaining $p: delete failed: ${e.getMessage}")
      }
    }
  }
}
