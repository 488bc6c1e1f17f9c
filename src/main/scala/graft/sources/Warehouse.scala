package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse layout helpers: the physical-design levers that matter at
  * 100 TB (SURVEY §4 — the reference's day-partitioned, station-clustered
  * BigQuery sink, re-expressed for parquet).
  */
object Warehouse {

  /** S8 — date-partitioned, key-clustered append. Partition pruning makes
    * date-ranged reads touch only matching directories;
    * `sortWithinPartitions` is the clustering analogue (row-group stats
    * let the reader skip pages by the cluster key).
    */
  def writePartitioned(df: DataFrame, path: String, dateCol: String,
      clusterCol: String, mode: String = "append"): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .sortWithinPartitions(col("p_date"), col(clusterCol))
      .write.mode(mode).partitionBy("p_date").parquet(path)

  /** Bucketed table for co-located joins: both sides bucketed by the join
    * key into the same bucket count join WITHOUT a shuffle. This is the
    * pre-partitioning answer for repeated big-big joins (e.g. lineitem ⋈
    * orders at every mart build).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Interchange formats: the engine's canonical storage is parquet, but
    * warehouse exports/imports also speak ORC (columnar, predicate
    * pushdown and column pruning work identically through the same
    * FileSourceScan path — ORC jars ship with Spark). Same partitioning
    * levers apply.
    */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite",
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode).format("orc")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Small-file compaction for a partitioned parquet table — the
    * maintenance pass every streaming/incremental sink needs at scale:
    * micro-batches and per-trigger appends leave thousands of KB-sized
    * files per partition, and scan cost becomes file-open-bound instead
    * of byte-bound.
    *
    * One shuffle keyed on the partition column co-locates each partition
    * value in a single task, so every partition directory compacts to one
    * file (plus `maxRecordsPerFile` splits for oversized partitions).
    *
    * Swap semantics — be precise about what the two renames give you:
    * each rename is atomic on HDFS and local filesystems, but BETWEEN
    * them the table path does not exist, so a reader that lists exactly
    * in that window gets FileNotFound (a brief unavailability window,
    * NOT a partial mix — it never sees old and new files together). A
    * crash inside the window leaves the data intact at `.compact-old`;
    * recovery is a manual rename back, and this method fails fast on a
    * stale `.compact-old` rather than silently nesting the live table
    * inside it (Hadoop's rename-into-existing-directory semantics would
    * otherwise MOVE `path` under the stale dir instead of failing).
    * On object stores (S3A) rename is a non-atomic O(n) copy — do not
    * use this there; a metastore/manifest pointer swap (catalog `ALTER
    * TABLE SET LOCATION`) is the correct primitive for true atomicity.
    */
  def compact(spark: SparkSession, path: String,
      partitionCol: String = "p_date",
      maxRecordsPerFile: Long = 1L << 22): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".compact-tmp")
    val old = new Path(path + ".compact-old")
    // Stale .compact-old means a previous swap crashed mid-flight and
    // the ORIGINAL data may live there — never delete it, make the
    // operator resolve it first.
    require(!fs.exists(old),
      s"compact: stale $old exists (a prior compact crashed mid-swap); " +
        "inspect and restore/remove it before compacting")
    // Stale .compact-tmp is always a discardable partial rewrite.
    fs.delete(tmp, true)
    spark.read.parquet(path)
      .repartition(col(partitionCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(tmp.toString)
    require(fs.rename(p, old), s"compact: could not stage $path aside")
    require(fs.rename(tmp, p), s"compact: could not swap in $tmp")
    fs.delete(old, true)
  }

  /** True when a scan of `df` prunes partitions down to `expected` or
    * fewer — assertion helper for pruning tests and plan audits.
    */
  def partitionsRead(df: DataFrame): Int = {
    // sparkPlan, not executedPlan: AQE wraps the tree in
    // AdaptiveSparkPlanExec whose children are hidden from collect()
    val plan = df.queryExecution.sparkPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }
    if (scans.isEmpty) -1 else scans.sum[Int]
  }
}
