package graft.gbfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.dbt._
import graft.dbt.Materialization._
import graft.dbt.SchemaTest._
import graft.functions.{safeDivide, surrogateKey, timestampDiffSeconds}

/** The reference's 15 dbt models (+ 4 jaffle-shop demo models),
  * re-expressed as Spark DataFrame builders. Each builder cites its
  * source SQL under `/root/reference/models/`; materializations follow
  * `dbt_project.yml:41-77` (staging=view, dims/facts/marts=table, two
  * incremental facts, two explicit view overrides).
  *
  * All model bodies are pure Catalyst plans: views/ephemerals fuse into
  * consumers, so e.g. mart_trip_metrics compiles to a single scan →
  * project → hash-aggregate pipeline across three model "layers".
  */
object GbfsModels {

  /** `json_extract_scalar(j, '$.p')` over a JSON-string column. */
  private def jes(j: Column, path: String): Column = get_json_object(j, path)

  /** `json_extract_array(j, '$.p')` — BigQuery returns ARRAY<JSON>; here
    * array<string> of serialized objects, same downstream contract.
    */
  private def jsonArray(j: Column): Column =
    from_json(j, ArrayType(StringType))

  // ------------------------------------------------------------- staging

  /** models/staging/stg_station_status.sql:1-34 */
  val stgStationStatus: Model = Model(
    name = "stg_station_status",
    deps = Nil,
    materialization = View,
    build = ctx => {
      val src = ctx.source("gbfs", "raw_station_status")
        .select(
          col("ingest_datetime"),
          col("last_updated").as("feed_last_updated"),
          col("ttl"), col("version"),
          explode(col("data.stations")).as("s"))
        .select(col("ingest_datetime"), col("feed_last_updated"),
          col("ttl"), col("version"), col("s.*"))
      src.select(
        col("station_id"),
        timestamp_seconds(col("last_reported")).as("reported_at"),
        col("num_bikes_available").as("bikes_available"),
        col("num_docks_available").as("docks_available"),
        col("is_installed"), col("is_renting"), col("is_returning"),
        col("ingest_datetime").as("ingest_at"),
        timestamp_seconds(col("feed_last_updated")).as("feed_updated_at"),
        col("version"), col("ttl"))
    },
    tests = Seq("station_id", "reported_at", "bikes_available",
      "docks_available", "feed_updated_at", "ingest_at").map(NotNull(_)))

  /** models/staging/stg_station_information.sql:1-46 */
  val stgStationInformation: Model = Model(
    name = "stg_station_information",
    deps = Nil,
    materialization = View,
    build = ctx => {
      val exploded = ctx.source("gbfs", "raw_station_information")
        .select(
          col("ingest_datetime"),
          col("last_updated").as("feed_last_updated"),
          col("ttl"), col("version"),
          explode(jsonArray(jes(col("data_json"), "$.stations")))
            .as("station_json"))
      exploded.select(
        col("ingest_datetime"),
        timestamp_seconds(col("feed_last_updated")).as("feed_updated_at"),
        col("ttl"), col("version"),
        jes(col("station_json"), "$.station_id").as("station_id"),
        jes(col("station_json"), "$.name").as("station_name"),
        jes(col("station_json"), "$.lat").cast("double").as("lat"),
        jes(col("station_json"), "$.lon").cast("double").as("lon"),
        jes(col("station_json"), "$.address").as("address"),
        jes(col("station_json"), "$.cross_street").as("cross_street"),
        jes(col("station_json"), "$.capacity").cast("long").as("capacity"),
        (jes(col("station_json"), "$.is_virtual_station") === "true")
          .as("is_virtual_station"),
        jes(col("station_json"), "$.rental_uris.android").as("uri_android"),
        jes(col("station_json"), "$.rental_uris.ios").as("uri_ios"),
        jes(col("station_json"), "$.rental_uris.web").as("uri_web"))
    },
    tests = Seq("station_id", "feed_updated_at", "station_name", "lat", "lon")
      .map(NotNull(_)))

  /** models/staging/stg_station_tariffs.sql:1-33 (explicit view) */
  val stgStationTariffs: Model = Model(
    name = "stg_station_tariffs",
    deps = Nil,
    materialization = View,
    build = ctx => {
      val exploded = ctx.source("gbfs", "raw_station_information")
        .select(col("ingest_datetime"),
          explode(jsonArray(jes(col("data_json"), "$.tariffs")))
            .as("tariff_json"))
      exploded.select(
        col("ingest_datetime"),
        jes(col("tariff_json"), "$.tariff_id").as("tariff_id"),
        jes(col("tariff_json"), "$.name").as("tariff_name"),
        expr("try_cast(get_json_object(tariff_json, '$.cost_per_hour') AS double)")
          .as("cost_per_hour"),
        jes(col("tariff_json"), "$.currency").as("currency"),
        expr("try_cast(get_json_object(tariff_json, '$.duration_minutes') AS long)")
          .as("duration_minutes"))
    })

  /** models/staging/stg_historic_trips.sql:1-27 */
  val stgHistoricTrips: Model = Model(
    name = "stg_historic_trips",
    deps = Nil,
    materialization = View,
    build = ctx =>
      ctx.source("trips", "raw_historic_trips")
        .select(
          col("started_at"), col("ended_at"),
          col("duration").as("duration_s"),
          col("start_station_id"), col("start_station_name"),
          col("start_station_description"),
          col("start_station_latitude").as("start_lat"),
          col("start_station_longitude").as("start_lon"),
          col("end_station_id"), col("end_station_name"),
          col("end_station_description"),
          col("end_station_latitude").as("end_lat"),
          col("end_station_longitude").as("end_lon"))
        .withColumn("trip_date", to_date(col("started_at")))
        .withColumn("trip_hour", date_trunc("hour", col("started_at")))
        .withColumn("computed_duration_s",
          timestampDiffSeconds(col("ended_at"), col("started_at"))),
    tests = Seq("started_at", "ended_at", "duration_s", "computed_duration_s",
      "start_station_id", "end_station_id", "trip_date", "trip_hour")
      .map(NotNull(_)))

  // ---------------------------------------------------------- dimensions

  /** models/dimensions/dim_date.sql:1-31 — date spine with injectable
    * clock (EngineConfig.today) for deterministic tests.
    */
  val dimDate: Model = Model(
    name = "dim_date",
    deps = Seq("stg_station_status"),
    materialization = Table,
    build = ctx => {
      val bounds = ctx.ref("stg_station_status")
        .agg(min(to_date(col("feed_updated_at"))).as("min_feed_date"))
        .select(
          coalesce(col("min_feed_date"),
            add_months(ctx.config.currentDate, -12)).as("start_date"),
          ctx.config.currentDate.as("end_date"))
      bounds
        // BigQuery GENERATE_DATE_ARRAY(start, end) is empty when
        // start > end; Spark sequence() throws — guard to match
        .select(explode(when(col("start_date") <= col("end_date"),
          sequence(col("start_date"), col("end_date"), expr("interval 1 day")))
          .otherwise(array())).as("day"))
        .select(
          col("day").as("date_key"),
          year(col("day")).as("year"),
          month(col("day")).as("month"),
          dayofmonth(col("day")).as("day_of_month"),
          dayofweek(col("day")).as("weekday"), // 1=Sunday … 7=Saturday
          date_format(col("day"), "yyyyMMdd").as("date_int"))
        .orderBy("date_key")
    })

  /** models/dimensions/dim_stations.sql:1-22 */
  val dimStations: Model = Model(
    name = "dim_stations",
    deps = Seq("stg_station_information"),
    materialization = Table,
    build = ctx =>
      ctx.ref("stg_station_information")
        .select("station_id", "station_name", "lat", "lon", "address",
          "cross_street", "capacity", "is_virtual_station",
          "uri_android", "uri_ios", "uri_web")
        .distinct()
        .orderBy("station_id"))

  /** models/dimensions/dim_tariff.sql:1-5 — GROUP BY 1..5 dedup (A5). */
  val dimTariff: Model = Model(
    name = "dim_tariff",
    deps = Seq("stg_station_tariffs"),
    materialization = Table,
    build = ctx =>
      ctx.ref("stg_station_tariffs")
        .select("tariff_id", "tariff_name", "cost_per_hour", "currency",
          "duration_minutes")
        .dropDuplicates())

  // --------------------------------------------------------------- facts

  /** Shared snapshot projection of the three status facts. */
  private def statusCore(src: DataFrame): DataFrame =
    src
      .withColumn("snapshot_id",
        surrogateKey(col("feed_updated_at"), col("station_id")))
      .withColumn("status_timestamp", col("feed_updated_at"))
      .withColumn("status_date", to_date(col("feed_updated_at")))
      .withColumn("status_hour", date_trunc("hour", col("feed_updated_at")))

  /** models/facts/fact_station_status.sql:1-33 — incremental, left join
    * station info for is_virtual_station (J1+P6/D4/D5).
    */
  val factStationStatus: Model = Model(
    name = "fact_station_status",
    deps = Seq("stg_station_status", "stg_station_information"),
    materialization = Incremental("snapshot_id"),
    build = ctx => {
      val s = statusCore(ctx.ref("stg_station_status"))
      val i = ctx.ref("stg_station_information")
        .select("station_id", "is_virtual_station")
      val out = s.join(i, Seq("station_id"), "left")
        .select(
          col("snapshot_id"), col("status_timestamp"), col("status_date"),
          col("status_hour"), col("station_id"), col("bikes_available"),
          col("docks_available"),
          coalesce(col("is_virtual_station"), lit(false))
            .as("is_virtual_station"))
      // {% if is_incremental() %} … not in (select snapshot_id from this)
      ctx.self match {
        case Some(existing) =>
          out.join(existing.select("snapshot_id"), Seq("snapshot_id"), "left_anti")
        case None => out
      }
    })

  /** models/facts/fact_station_status_history.sql:1-29 — incremental. */
  val factStationStatusHistory: Model = Model(
    name = "fact_station_status_history",
    deps = Seq("stg_station_status"),
    materialization = Incremental("snapshot_id"),
    build = ctx => {
      val out = statusCore(ctx.ref("stg_station_status"))
        .select("snapshot_id", "status_timestamp", "status_date",
          "status_hour", "station_id", "bikes_available", "docks_available",
          "is_installed", "is_renting", "is_returning")
      ctx.self match {
        case Some(existing) =>
          out.join(existing.select("snapshot_id"), Seq("snapshot_id"), "left_anti")
        case None => out
      }
    })

  /** models/facts/fact_station_status_latest.sql:1-31 — view, W1 latest
    * snapshot per station.
    */
  val factStationStatusLatest: Model = Model(
    name = "fact_station_status_latest",
    deps = Seq("stg_station_status"),
    materialization = View,
    build = ctx => {
      val w = Window.partitionBy("station_id")
        .orderBy(col("feed_updated_at").desc)
      statusCore(ctx.ref("stg_station_status"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("snapshot_id", "status_timestamp", "status_date",
          "status_hour", "station_id", "bikes_available", "docks_available",
          "is_installed", "is_renting", "is_returning")
    })

  /** models/facts/fact_station_uptime.sql:1-37 — A1 grouped ratio. */
  val factStationUptime: Model = Model(
    name = "fact_station_uptime",
    deps = Seq("stg_station_status"),
    materialization = Table,
    build = ctx =>
      ctx.ref("stg_station_status")
        .select(
          col("station_id"),
          to_date(col("feed_updated_at")).as("status_date"),
          when(col("is_installed") && col("is_renting") && col("is_returning"), 1L)
            .otherwise(0L).as("up_flag"),
          lit(1L).as("record_count"))
        .groupBy("station_id", "status_date")
        .agg(
          sum(col("up_flag")).as("up_count"),
          sum(col("record_count")).as("total_count"))
        .withColumn("uptime_pct",
          safeDivide(col("up_count"), col("total_count"))))

  /** models/facts/fact_trips.sql:1-37 — md5 surrogate trip key. */
  val factTrips: Model = Model(
    name = "fact_trips",
    deps = Seq("stg_historic_trips"),
    materialization = Table,
    build = ctx =>
      ctx.ref("stg_historic_trips")
        .withColumn("trip_id",
          surrogateKey(col("started_at"), col("ended_at"),
            col("start_station_id"), col("end_station_id")))
        // byte-portable variant: keys match a BigQuery run bit-for-bit
        // because the timestamp parts render in BigQuery's cast format
        // (graft.functions.bqTimestampString) instead of Spark's
        .withColumn("trip_id_bq",
          surrogateKey(
            graft.functions.bqTimestampString(col("started_at")),
            graft.functions.bqTimestampString(col("ended_at")),
            col("start_station_id"), col("end_station_id")))
        .select("trip_id", "trip_id_bq", "started_at", "ended_at", "duration_s",
          "computed_duration_s", "trip_date", "trip_hour",
          "start_station_id", "end_station_id",
          "start_lat", "start_lon", "end_lat", "end_lon")
        .withColumnRenamed("duration_s", "raw_duration_s"))

  // --------------------------------------------------------------- marts

  /** models/marts/mart_station_availability.sql:1-18 — J2 inner join. */
  val martStationAvailability: Model = Model(
    name = "mart_station_availability",
    deps = Seq("fact_station_status", "dim_stations"),
    materialization = Table,
    build = ctx => {
      val fs = ctx.ref("fact_station_status")
      val ds = ctx.ref("dim_stations")
      fs.join(ds, Seq("station_id"))
        .select(
          col("status_date").as("date_key"),
          col("status_hour").as("hour_key"),
          col("station_id"), col("station_name"), col("lat"), col("lon"),
          col("bikes_available"), col("docks_available"),
          (col("bikes_available") + col("docks_available")).as("total_capacity"),
          // Spark round() here is INTENTIONAL reference parity with the
          // dbt model's ROUND(); these pct columns are outside every
          // hash-compared gate (compare_gbfs checks mart_trip_metrics
          // only). Anything that enters a DuckDB hash-compare must use
          // graft.functions.roundDet instead (.xx5 repr-vs-binary skew).
          round(col("bikes_available") /
            nullif(col("bikes_available") + col("docks_available"), lit(0)), 3)
            .as("pct_bikes_available"))
    })

  /** models/marts/mart_station_uptime.sql:1-20 — A2 countif family. */
  val martStationUptime: Model = Model(
    name = "mart_station_uptime",
    deps = Seq("fact_station_status_history"),
    materialization = Table,
    build = ctx =>
      ctx.ref("fact_station_status_history")
        .groupBy("station_id")
        .agg(
          count(lit(1)).as("total_snapshots"),
          count_if(col("is_installed")).as("installed_snapshots"),
          count_if(col("is_renting")).as("renting_snapshots"),
          count_if(col("is_returning")).as("returning_snapshots"))
        // round() (not roundDet): reference parity, see note in
        // mart_station_availability above
        .withColumn("pct_time_renting",
          round(col("renting_snapshots") / col("total_snapshots"), 3))
        .withColumn("pct_time_returning",
          round(col("returning_snapshots") / col("total_snapshots"), 3)))

  /** models/marts/mart_trip_metrics.sql:1-14 — A3 per station-day. */
  val martTripMetrics: Model = Model(
    name = "mart_trip_metrics",
    deps = Seq("fact_trips"),
    materialization = Table,
    build = ctx =>
      ctx.ref("fact_trips")
        .groupBy(
          col("trip_date").as("date_key"),
          col("start_station_id").as("station_id"))
        .agg(
          count(lit(1)).as("total_trips_started"),
          avg(col("raw_duration_s")).as("avg_reported_duration_s"),
          avg(col("computed_duration_s")).as("avg_computed_duration_s"),
          sum(when(col("raw_duration_s") =!= col("computed_duration_s"), 1L)
            .otherwise(0L)).as("count_mismatched_durations")))

  // ---------------------------------------------------------------- demo

  /** models_demo/stg_customers.sql */
  val stgCustomers: Model = Model(
    name = "stg_customers", deps = Nil, materialization = View,
    build = ctx => ctx.source("demo", "customers")
      .select(col("id").as("customer_id"), col("first_name"), col("last_name")),
    tests = Seq(Unique("customer_id"), NotNull("customer_id")))

  /** models_demo/stg_orders.sql */
  val stgOrders: Model = Model(
    name = "stg_orders", deps = Nil, materialization = View,
    build = ctx => ctx.source("demo", "orders")
      .select(col("id").as("order_id"), col("user_id").as("customer_id"),
        col("order_date"), col("status")),
    tests = Seq(Unique("order_id"), NotNull("order_id"),
      AcceptedValues("status",
        Seq("placed", "shipped", "completed", "return_pending", "returned")),
      NotNull("customer_id"),
      Relationships("customer_id", "stg_customers", "customer_id")))

  /** models_demo/stg_customer_orders.sql — ephemeral (dbt default for the
    * demo project has no config; dbt_project.yml:46-48 makes src ephemeral,
    * models default view; keep ephemeral to exercise D1).
    */
  val stgCustomerOrders: Model = Model(
    name = "stg_customer_orders", deps = Seq("stg_orders"),
    materialization = Ephemeral,
    build = ctx => ctx.ref("stg_orders")
      .groupBy("customer_id")
      .agg(
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("most_recent_order_date"),
        count(col("order_id")).as("number_of_orders")))

  /** models_demo/customers.sql — J3 left join + coalesce(…,0). */
  val customers: Model = Model(
    name = "customers", deps = Seq("stg_customers", "stg_customer_orders"),
    materialization = Table,
    build = ctx =>
      ctx.ref("stg_customers")
        .join(ctx.ref("stg_customer_orders"), Seq("customer_id"), "left")
        .select(col("customer_id"), col("first_name"), col("last_name"),
          col("first_order_date"), col("most_recent_order_date"),
          coalesce(col("number_of_orders"), lit(0L)).as("number_of_orders")),
    tests = Seq(Unique("customer_id"), NotNull("customer_id")))

  /** Full registry: the GBFS project + the demo project. */
  def registry(): ModelRegistry = {
    val r = new ModelRegistry
    Seq(stgStationStatus, stgStationInformation, stgStationTariffs,
      stgHistoricTrips, dimDate, dimStations, dimTariff,
      factStationStatus, factStationStatusHistory, factStationStatusLatest,
      factStationUptime, factTrips,
      martStationAvailability, martStationUptime, martTripMetrics,
      stgCustomers, stgOrders, stgCustomerOrders, customers)
      .foreach(r.register)
    r
  }
}
