package graft

import org.apache.spark.sql.functions._
import graft.llm.Sharding

/** Deterministic sharding (llm/Sharding.scala): membership/order
  * reproducibility, the physical write layout, and the single-Exchange
  * plan shape of the global shuffle. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val N = 8

  private lazy val docs = (0L until 5000L).toDF("doc_id")
    .withColumn("text", concat(lit("doc "), col("doc_id")))
    .withColumn("n_chars", length(col("text")).cast("long"))

  test("shard membership and order keys are id-stable and balanced") {
    val a = Sharding.assignShards(docs, "doc_id", N)
      .select("doc_id", "shard", "order_key").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Sharding.assignShards(docs.repartition(13).orderBy(desc("doc_id")),
      "doc_id", N).select("doc_id", "shard", "order_key").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b) // invariant under partitioning and input order
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L until N).toSet)
    val mean = 5000.0 / N
    sizes.values.foreach(s => assert(math.abs(s - mean) / mean < 0.15,
      s"shard imbalance: $sizes"))
    // order key is independent of membership: within a shard, sorting
    // by order_key must not reproduce id order (the degenerate shuffle)
    val shard0 = a.toSeq.filter(_._2._1 == 0L).sortBy(_._2._2).map(_._1)
    assert(shard0 != shard0.sorted, "order_key degenerated to id order")
  }

  test("writeShards lays out hive partitions, each file order-sorted") {
    val out = tmpDir("graft-shards") + "/corpus"
    Sharding.writeShards(docs, "doc_id", N, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq == (0 until N).map(i => s"shard=$i").sorted)
    // per-shard-directory re-read in file order equals the declared
    // deterministic order (order_key, doc_id)
    (0 until N).foreach { sh =>
      val rows = spark.read.parquet(s"$out/shard=$sh")
        .select("order_key", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == rows.toSeq.sortBy(identity),
        s"shard $sh not written in (order_key, id) order")
    }
    // no row lost or duplicated by the shuffle+write
    assert(spark.read.parquet(out).count() == 5000L)
    assert(spark.read.parquet(out).select("doc_id").distinct().count() == 5000L)
  }

  test("readShard prunes to one partition directory") {
    val out = tmpDir("graft-shards-prune") + "/corpus"
    Sharding.writeShards(docs, "doc_id", N, out)
    val df = Sharding.readShard(spark, out, 3, "doc_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("shard"), s"no partition filter in scan:\n$scan")
    val expect = Sharding.assignShards(docs, "doc_id", N)
      .filter(col("shard") === 3).count()
    assert(df.count() == expect)
  }

  test("readShard returns exact written order across row-group splits") {
    // force many small row groups on write and many input splits on
    // read — the layout where sortWithinPartitions silently returned a
    // partition-layout-dependent order before readShard went global
    val out = tmpDir("graft-shards-order") + "/corpus"
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    // fat rows + 2 shards so one shard file holds many row groups
    val fat = (0L until 4000L).toDF("doc_id")
      .withColumn("text", concat(lit("x" * 200), col("doc_id")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    try {
      hc.set("parquet.block.size", (16 * 1024).toString)
      Sharding.writeShards(fat, "doc_id", 2, out)
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val raw = spark.read.parquet(out).filter(col("shard") === 1)
      assert(raw.rdd.getNumPartitions > 1,
        "fixture failed to split the shard scan — case is vacuous")
      val got = Sharding.readShard(spark, out, 1, "doc_id")
        .select("order_key", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == got.sortBy(identity),
        "readShard order broke across input splits")
      assert(got.nonEmpty)
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
    }
  }

  test("the global shuffle is ONE exchange (no global sort / range part)") {
    val plan = Sharding.assignShards(docs, "doc_id", N)
      .repartition(N, col("shard"))
      .sortWithinPartitions(col("shard"), col("order_key"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, s"plan:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort crept in:\n$plan")
  }

  test("sequence-level sharding keeps whole sequences and conserves tokens") {
    // the x_training_shards glue: pack → shard on the (source, seq) key
    // must land every sequence in exactly one shard and lose no tokens
    val df = spark.range(400).select(col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
      (col("id") % 7 + 1).cast("long").as("n_tokens"))
    val inTokens = df.agg(sum("n_tokens")).head().getLong(0)
    val packed = graft.llm.Packing.packSequences(df, budgetTokens = 16L)
    val seqKey = concat_ws("#", col("source"), col("seq_id").cast("string"))
    val audit = packed
      .withColumn("shard", Sharding.shardOf(seqKey, nShards = 8))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(seqKey).as("n_seqs"),
        sum(col("n_tokens")).as("total_tokens"))
      .collect()
    assert(audit.map(_.getAs[Long]("total_tokens")).sum == inTokens,
      "token mass must be conserved through pack + shard")
    assert(audit.map(_.getAs[Long]("n_docs")).sum == 400L)
    // per-shard distinct sums to the GLOBAL distinct ⇔ no sequence
    // straddles two shards (the key is the sequence, not the doc)
    val globalSeqs = packed.select(seqKey.as("sk")).distinct().count()
    assert(audit.map(_.getAs[Long]("n_seqs")).sum == globalSeqs)
  }

  test("shardStats checksums match a direct aggregation") {
    val stats = Sharding.shardStats(docs, "doc_id", N, "n_chars")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val direct = Sharding.assignShards(docs, "doc_id", N)
      .groupBy("shard").agg(count(lit(1)).as("n"),
        sum("n_chars").as("p"), sum("order_key").as("os"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats == direct)
    assert(stats.values.map(_._1).sum == 5000L)
  }
}
