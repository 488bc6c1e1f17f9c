package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Ranking}

/** BM25 retrieval + quality-aware cluster representatives. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK: ranking follows tf saturation, idf, and length norm") {
    val docs = Seq(
      (1L, "cat cat cat dog"),        // tf(cat)=3, short
      (2L, "cat dog bird fish mouse horse cow hen " +
        "dog bird fish mouse horse cow hen x"),   // tf(cat)=1, long
      (3L, "cat cat dog"),            // tf(cat)=2, shortest
      (4L, "dog bird"),               // no hit
      (5L, "rare rare other words here")) // rare term
      .toDF("doc_id", "text")
    val top = Ranking.bm25TopK(docs, Seq("cat", "rare"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // doc 4 matches nothing → absent; everyone else present
    assert(top.map(_._1).toSet == Set(1L, 2L, 3L, 5L))
    val score = top.toMap
    // more tf of 'cat' at comparable length ranks higher; the long doc
    // with one hit ranks below both short multi-hit docs
    assert(score(1L) > score(3L) && score(3L) > score(2L))
    // 'rare' (df=1) outscores any single 'cat' (df=3) occurrence
    assert(score(5L) > score(2L))
    // scores are positive integer micro-units
    assert(top.forall(_._2 > 0L))
  }

  test("bm25TopK: deterministic k-boundary (score ties cut by id)") {
    // four identical docs tie exactly; k=2 must keep the smallest ids
    val docs = (1L to 4L).map(i => (i, "same words here")).toDF("doc_id", "text")
    val top = Ranking.bm25TopK(docs, Seq("same"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L))
  }

  test("clusterRepresentatives: best-score member wins, ties to min id") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), // cluster 1: 2 wins tie vs 3
      (10L, 5L), (11L, 99L),                        // cluster 10: 11 wins
      (20L, 7L))                                    // singleton (not in clusters)
      .toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val out = Dedup.clusterRepresentatives(docs, clusters, "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set((1L, 2L, 30L, 3L), (10L, 11L, 99L, 2L), (20L, 20L, 7L, 1L)))
  }

  test("clusterRepresentatives: corpus-sized clusters plan a shuffle join") {
    // no forced broadcast hint: with the threshold at -1 (simulating a
    // cluster table too big to broadcast — the real-crawl case) the
    // planner must pick a shuffle join instead of OOMing on a hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = (1L to 50L).map(i => (i, i * 2L)).toDF("doc_id", "score")
      val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
      val out = Dedup.clusterRepresentatives(docs, clusters, "doc_id", "score")
      val plan = out.queryExecution.sparkPlan
      val bcasts = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
      }
      assert(bcasts.isEmpty,
        s"clusters join must degrade to a shuffle join, got:\n${plan.treeString}")
      val rep = out.filter(col("cluster_id") === 1L)
        .select("rep_id").head().getLong(0)
      assert(rep == 2L) // semantics unchanged by the join strategy
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("clusterRepresentatives: no window node (bounded top-1 aggregate)") {
    val docs = Seq((1L, 10L), (2L, 30L)).toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val out = Dedup.clusterRepresentatives(docs, clusters, "doc_id", "score")
    assert(out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "a hot cluster must not funnel through a window sort")
  }
}
