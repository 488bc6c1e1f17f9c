package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sharding + global shuffle — the OUTPUT step of a
  * pretraining-data pipeline: the curated corpus must land in N shard
  * files whose membership AND internal order are reproducible across
  * runs, engines, cluster sizes, and retries, because the training run
  * consumes shards sequentially and a re-built corpus must not reorder
  * examples (that changes the data curriculum and breaks run-to-run
  * loss comparisons).
  *
  * Everything keys off the engine-portable md5 bucket (the
  * [[Sampling.hashBucket]] idiom): shard = hash(id) mod N, intra-shard
  * position = an independent salted hash of the same id — a
  * deterministic "global shuffle" with no rand(), no
  * zipWithIndex-style global counters, and no cross-partition
  * coordination.
  *
  * Scale shape: ONE shuffle (repartition on the shard id) + a sort
  * WITHIN each partition (no global sort / range exchange), then a
  * hive-partitioned write. At 100 TB with N=8192 shards each task
  * sorts one shard locally; nothing is driver-side.
  */
object Sharding {

  /** Shard id in [0, nShards) for a stable id — membership hash. */
  def shardOf(id: Column, nShards: Int, seed: String = "shard"): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(seed), id.cast("string"))),
      25, 8), 16, 10).cast("long"), lit(nShards.toLong))

  /** Intra-shard position key — a SEPARATE salted hash, so order within
    * a shard is independent of the membership hash (sorting by the
    * membership hash would cluster id-space neighbors). 32-bit range;
    * ties (≈ birthday-rare) break on the id itself at sort time. */
  def orderKey(id: Column, seed: String = "order"): Column =
    conv(substring(md5(concat_ws(":", lit(seed), id.cast("string"))),
      25, 8), 16, 10).cast("long")

  /** Attach `shard` and `order_key` columns. Pure projection. */
  def assignShards(df: DataFrame, idCol: String, nShards: Int,
      seed: String = "shard"): DataFrame =
    df.withColumn("shard", shardOf(col(idCol), nShards, seed))
      .withColumn("order_key", orderKey(col(idCol), s"$seed:order"))

  /** Write the corpus as `nShards` hive-partitioned shard directories,
    * each file internally sorted by (order_key, id) — the deterministic
    * global shuffle. One Exchange (hash on shard), local sorts, no
    * global ordering step. Returns the output path for chaining. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
      path: String, seed: String = "shard"): String = {
    assignShards(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("order_key"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    path
  }

  /** Per-shard balance/order audit: doc count, payload size, and
    * order-checksums (sum/min/max of the 32-bit order keys — exact
    * integer arithmetic, so the checksum is reproducible everywhere).
    * The gate pairs this with a DuckDB oracle recomputing every cell;
    * at production scale the same aggregation is the shard-balance
    * monitor (a shard 2× the mean means the membership hash broke). */
  def shardStats(df: DataFrame, idCol: String, nShards: Int,
      sizeCol: String, seed: String = "shard"): DataFrame =
    assignShards(df, idCol, nShards, seed)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("payload"),
        sum(col("order_key")).as("order_sum"),
        min(col("order_key")).as("order_min"),
        max(col("order_key")).as("order_max"))

  /** Read one shard back in its deterministic order — what a training
    * loader does. Partition pruning keeps this a one-directory scan; the
    * GLOBAL sort (not sortWithinPartitions) makes the order hold even
    * when the scan splits the shard's file across row-group input
    * partitions — and it costs no extra shuffle in the common case: one
    * shard is one file's worth of rows, so the range exchange is over a
    * single scan partition's output, tiny next to the training read. */
  def readShard(spark: SparkSession, path: String, shard: Int,
      idCol: String): DataFrame =
    spark.read.parquet(path).filter(col("shard") === shard)
      .orderBy(col("order_key"), col(idCol))
}
