package graft

import org.apache.spark.sql.functions._
import graft.llm.{CurationPipeline, Sampling}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 20000L).toDF("doc_id")

  test("hashSplit is deterministic and proportional") {
    val s1 = Sampling.hashSplit(ids, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Sampling.hashSplit(ids.repartition(7), "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2) // invariant under repartitioning
    assert(s1("train") > 19000 && s1("val") > 50 && s1("test") > 50)
    assert(s1.values.sum == 20000L)
    // same doc always lands in the same split
    val a = Sampling.hashSplit(ids, "doc_id").filter(col("doc_id") === 123L)
      .select("split").head().getString(0)
    val b = Sampling.hashSplit(ids.orderBy(desc("doc_id")), "doc_id")
      .filter(col("doc_id") === 123L).select("split").head().getString(0)
    assert(a == b)
  }

  test("clusterSafeSplit: cluster members share a split; singletons keep hashSplit's") {
    // clusters {1,2,901} and {3,4}; 5..40 are singletons
    val docs = ((1L to 4L) ++ Seq(901L) ++ (5L to 40L)).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (901L, 1L), (3L, 3L), (4L, 3L))
      .toDF("id", "cluster_id")
    val out = Sampling.clusterSafeSplit(docs, clusters, "doc_id",
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every member of a cluster rides the same split — including 901,
    // whose own id would hash elsewhere
    assert(Set(out(1L), out(2L), out(901L)).size == 1)
    assert(out(3L) == out(4L))
    // singletons degrade to exactly hashSplit-by-id (cluster_id = id)
    val plain = Sampling.hashSplit((5L to 40L).toDF("doc_id"), "doc_id",
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    (5L to 40L).foreach(i => assert(out(i) == plain(i), s"doc $i"))
    // and the operator is doing real work: some clustered doc's split
    // differs from what its OWN id would have drawn (the leak a plain
    // split would have committed)
    val own = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(Seq(1L, 2L, 901L, 3L, 4L).exists(i => out(i) != own(i)))
  }

  test("clusterSafeSplit: corpus-sized clusters plan a shuffle join, not a broadcast") {
    // a forced broadcast() hint would bypass autoBroadcastJoinThreshold
    // and OOM at crawl scale (30-80% of real-crawl docs are in some
    // near-dup cluster, so the cluster table is corpus-sized); setting
    // the threshold to -1 simulates "too big to broadcast" and proves
    // the strategy choice is the PLANNER's, not a hint's
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = (1L to 100L).toDF("doc_id")
      val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
      val out = Sampling.clusterSafeSplit(docs, clusters, "doc_id",
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      val plan = out.queryExecution.sparkPlan
      val bcasts = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
      }
      assert(bcasts.isEmpty,
        s"clusters join must degrade to a shuffle join when over the " +
          s"broadcast threshold, got:\n${plan.treeString}")
      // and the semantics are unchanged by the strategy
      val keys = out.select("doc_id", "cluster_id")
        .as[(Long, Long)].collect().toMap
      assert(keys(2L) == 1L && keys(5L) == 5L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("clusterSafeSplit replaces a pre-existing cluster_id; small clusters auto-broadcast") {
    val docs = (1L to 10L).toDF("doc_id")
      .withColumn("cluster_id", org.apache.spark.sql.functions.lit(-99L))
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val out = Sampling.clusterSafeSplit(docs, clusters, "doc_id",
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
    // no ambiguous-reference failure; incoming cluster_id is REPLACED
    // by the effective split key (joined cluster, else own id)
    val keys = out.select("doc_id", "cluster_id").as[(Long, Long)]
      .collect().toMap
    assert(keys(2L) == 1L && keys(5L) == 5L && !keys.values.exists(_ == -99L))
    // the documented plan: the clusters side broadcasts
    val bcasts = out.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcasts.nonEmpty, "clusters join must be a broadcast join")
  }

  test("deterministicSample keeps ~fraction, exactly reproducibly") {
    val n1 = Sampling.deterministicSample(ids, "doc_id", 0.25).count()
    val n2 = Sampling.deterministicSample(ids, "doc_id", 0.25).count()
    assert(n1 == n2)
    assert(math.abs(n1 - 5000.0) / 5000.0 < 0.05)
    // nested property: a smaller fraction is a subset of a larger one
    val small = Sampling.deterministicSample(ids, "doc_id", 0.1)
    val large = Sampling.deterministicSample(ids, "doc_id", 0.25)
    assert(small.join(large, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("stratifiedSample rebalances per stratum") {
    val df = ids.withColumn("lang",
      when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    val sampled = Sampling.stratifiedSample(df, "lang", "doc_id",
      Map("en" -> 0.1)) // de unlisted → kept fully
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 10000L)
    assert(math.abs(byLang("en") - 1000.0) / 1000.0 < 0.2)
  }

  test("mixToWeights hits the target mix, bound by the scarcest source") {
    import org.apache.spark.sql.functions._
    // a: 6000 rows, b: 1000, c: 3000; target 50/30/20. b binds:
    // C = 1000/0.3 ≈ 3333 → keep ≈ 1667 a / 1000 b / 667 c
    val df = spark.range(10000).select(col("id").as("doc_id"),
      when(col("id") < 6000, "a").when(col("id") < 7000, "b").otherwise("c")
        .as("source"))
    val kept = Sampling.mixToWeights(df,
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), "source", "doc_id")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("b") == 1000L) // binding source keeps 100%
    assert(math.abs(kept("a") - 1667L) < 120, s"a=${kept("a")}")
    assert(math.abs(kept("c") - 667L) < 90, s"c=${kept("c")}")
    // dropped sources: unlisted source vanishes
    val dropped = Sampling.mixToWeights(
      df.withColumn("source", lit("zz")), Map("a" -> 1.0), "source", "doc_id")
    assert(dropped.isEmpty)
  }

  test("temperatureMix tilts toward sqrt proportions, id-stable") {
    // sources 9000 / 1000: alpha=0.5 targets 3:1 instead of 9:1.
    // scarce source binds (keeps 100%); big source keeps 3*1000.
    val df = (0 until 10000).map { i =>
      (i.toLong, if (i < 9000) "big" else "small")
    }.toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(df, alpha = 0.5, "source", "doc_id")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 1000L)
    assert(math.abs(kept("big") - 3000L) < 170, s"big=${kept("big")}")
    // alpha = 1 keeps the natural distribution (frac 1 everywhere)
    val nat = Sampling.temperatureMix(df, alpha = 1.0, "source", "doc_id")
    assert(nat.count() == 10000L)
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(df.repartition(7), 0.5, "source", "doc_id")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("mixToTokenBudget shares a budget by token mass, not row count") {
    // long: 1000 docs x 100 tokens = 100k; short: 1000 docs x 10 = 10k.
    // Budget 20k at 50/50 → each source gets a 10k-token share: long
    // keeps ~10% of its DOCS (same token mass), short keeps everything.
    val longText = Array.fill(100)("w").mkString(" ")
    val shortText = Array.fill(10)("w").mkString(" ")
    val df = spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") < 1000, "long").otherwise("short").as("source"),
      when(col("id") < 1000, longText).otherwise(shortText).as("text"))
    val kept = Sampling.mixToTokenBudget(df, 20000L,
      Map("long" -> 0.5, "short" -> 0.5))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("short") == 1000L) // under its share: keeps everything
    assert(math.abs(kept("long") - 100L) < 40, s"long=${kept("long")}")
    // deterministic under repartitioning; unlisted sources vanish
    val again = Sampling.mixToTokenBudget(df.repartition(7), 20000L,
      Map("long" -> 0.5, "short" -> 0.5))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
    assert(Sampling.mixToTokenBudget(df, 20000L, Map("zz" -> 1.0)).isEmpty)
  }

  test("mixToTokenBudgetByCount admits exactly mixToTokenBudget's documents") {
    // the mid-pipeline form (precomputed n_tokens) must be admission-
    // identical to the text form: same budget shares, same hash salt
    val df = spark.range(500).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("source"),
      when(col("id") % 3 === 0, "one two three four five")
        .otherwise("one two").as("text"))
    val w = Map("a" -> 0.5, "b" -> 0.5)
    val byText = Sampling.mixToTokenBudget(df, 300L, w)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val byCount = Sampling.mixToTokenBudgetByCount(
      df.withColumn("n_tokens",
        size(split(col("text"), " ")).cast("long")),
      300L, w, "n_tokens")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byText == byCount && byText.nonEmpty)
  }

  test("weightedSample: deterministic A-ES, weight-proportional, without replacement") {
    import org.apache.spark.sql.functions._
    // 100 heavy docs (w=1000) among 900 light (w=1): a k=100 A-ES draw
    // should be dominated by the heavy class
    val df = (0L until 1000L).toDF("doc_id")
      .withColumn("w", when(col("doc_id") < 100, 1000L).otherwise(1L))
    val sample = Sampling.weightedSample(df, k = 100, weightCol = "w")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sample.length == 100)
    assert(sample.map(_._1).distinct.length == 100) // without replacement
    val heavy = sample.count(_._1 < 100)
    assert(heavy >= 80, s"weighting ignored: $heavy/100 heavy docs sampled")
    // id-stable: identical selection and keys under any partitioning
    val again = Sampling.weightedSample(df.repartition(13), k = 100,
      weightCol = "w").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sample.toSeq.sortBy(_._1) == again.toSeq.sortBy(_._1))
    // plan: TakeOrdered (bounded per-partition top-k), not a global sort
    val plan = Sampling.weightedSample(df, 100, "w")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("curation pipeline filters, dedups, and splits end-to-end") {
    val base = "the quick brown fox jumps over the lazy dog while the sun " +
      "sets slowly behind distant purple mountains casting long warm shadows"
    val docs = Seq(
      (0L, base), (1L, base),                             // exact dup
      (2L, base.replace("purple", "crimson")),            // near dup
      (3L, "completely different text about spark engines shuffling data " +
        "across wide clusters with hash partitioned joins and big scans"),
      (4L, "the the a a of of"))                          // low quality
      .toDF("doc_id", "text")
    val out = CurationPipeline.curate(docs,
      CurationPipeline.Config(minQuality = 0.05, nearDupJaccard = 0.5))
    val kept = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 3L)) // 1 exact-dup, 2 near-dup, 4 quality-gated
    assert(out.columns.contains("split") && out.columns.contains("quality"))
  }
}
