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
    * The rewrite stages into a sibling temp directory and swaps via two
    * renames — readers racing the swap see the old OR new listing, never
    * a partial mix of both.
    */
  def compact(spark: SparkSession, path: String,
      partitionCol: String = "p_date",
      maxRecordsPerFile: Long = 1L << 22): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = path + ".compact-tmp"
    spark.read.parquet(path)
      .repartition(col(partitionCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(tmp)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(path + ".compact-old")
    require(fs.rename(p, old), s"compact: could not stage $path aside")
    require(fs.rename(new Path(tmp), p), s"compact: could not swap in $tmp")
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
