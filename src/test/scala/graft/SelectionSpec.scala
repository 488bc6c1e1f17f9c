package graft

import org.apache.spark.sql.functions._
import graft.llm.Selection

/** DSIR importance resampling (llm/Selection.scala): weight semantics
  * against a driver-side recompute, selection-path consistency, and the
  * broadcast shape of the scoring join. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  private lazy val corpus = Seq(
    (1L, "spark table scan join", "en"),
    (2L, "spark table scan scan", "en"),
    (3L, "der die das und", "de"),
    (4L, "le la les et", "fr"),
    (5L, "spark join join table", "en"),
    (6L, "one", "en"), // single word: no bigrams → weight 0
    (7L, "der die spark table", "de")).toDF("doc_id", "text", "lang")

  /** Driver-side recompute of the full DSIR pipeline with the same md5
    * feature map — the semantic spec in ~20 lines. */
  private def localWeights(rows: Seq[(Long, String, String)],
      buckets: Int): Map[Long, Double] = {
    def bucketsOf(t: String): Seq[Long] = {
      val ws = t.split(" ")
      ws.zip(ws.drop(1)).map { case (a, b) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"dsir:${a}_$b".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(24, 32)
        java.lang.Long.parseLong(hex, 16) % buckets
      }.toSeq
    }
    val all = rows.flatMap(r => bucketsOf(r._2))
    val tgt = rows.filter(_._3 == "en").flatMap(r => bucketsOf(r._2))
    val cT = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cR = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // same determinism discipline as the engine: ratios quantized to
    // 1e-6, summed in exact integer micro-units, divided once
    def ratioMicro(b: Long): Long = {
      val x =
        math.log((cT.getOrElse(b, 0L) + 1).toDouble / (tgt.size + buckets)) -
          math.log((cR.getOrElse(b, 0L) + 1).toDouble / (all.size + buckets))
      math.round(math.floor(x * 1e6 + 0.5) / 1e6 * 1e6)
    }
    rows.map(r => r._1 -> bucketsOf(r._2).map(ratioMicro).sum.toDouble / 1e6)
      .toMap
  }

  test("dsirLogWeights matches the driver-side recompute") {
    val got = Selection.dsirLogWeights(corpus,
      corpus.filter(col("lang") === "en"), buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = localWeights(
      corpus.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq, B)
    assert(got.keySet == want.keySet) // every doc scored, incl. no-bigram
    got.foreach { case (id, w) =>
      assert(math.abs(w - want(id)) < 1e-9, s"doc $id: $w vs ${want(id)}")
    }
    assert(got(6L) == 0.0) // no evidence → zero, not dropped/NaN
    // target-looking docs outrank off-target docs
    assert(got(1L) > got(3L) && got(5L) > got(4L))
  }

  test("weights are invariant under repartitioning") {
    val a = Selection.dsirLogWeights(corpus,
      corpus.filter(col("lang") === "en"), buckets = B).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Selection.dsirLogWeights(corpus.repartition(5),
      corpus.filter(col("lang") === "en").repartition(3), buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("topK and threshold selection agree at the same cut") {
    val w = Selection.dsirLogWeights(corpus,
      corpus.filter(col("lang") === "en"), buckets = B).cache()
    val top3 = Selection.dsirSelectTopK(w, 3).collect()
    val cut = top3.map(_.getDouble(1)).min
    val byThreshold = Selection.dsirSelectByThreshold(w, cut)
    // no boundary ties in this corpus, so the sets coincide exactly
    assert(byThreshold.count() == 3)
    assert(top3.map(_.getLong(0)).toSet ==
      byThreshold.collect().map(_.getLong(0)).toSet)
    w.unpersist()
  }

  test("scoring joins the ratio table by broadcast, not shuffle") {
    val plan = Selection.dsirLogWeights(corpus,
      corpus.filter(col("lang") === "en"), buckets = B)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast scoring join in:\n$plan")
  }

  test("quantileBuckets: exact cut is the dyadic-quartile contract; approx stays in tolerance") {
    import spark.implicits._
    val scored = (1L to 1000L).map(i => (i, i)).toDF("doc_id", "score")
    val exact = Selection.quantileBuckets(scored, "score",
      bucketCol = "bucket")
    val byBucket = exact.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quantile_cont semantics on 1..1000: t_lo = 250.75, t_hi = 750.25
    // → head = 751..1000 (250), middle = 251..750 (500), tail = 1..250
    assert(byBucket == Map("head" -> 250L, "middle" -> 500L, "tail" -> 250L))
    // approx mode: GK rank error ≤ n/accuracy — thresholds may sit a
    // few ranks off the interpolated cut, but assignment disagreement
    // is bounded by the rank error per threshold
    val approx = Selection.quantileBuckets(scored, "score", approx = true,
      bucketCol = "approx_bucket").select("doc_id", "approx_bucket")
    val joined = exact.join(approx, Seq("doc_id"))
    val agree = joined
      .filter(col("bucket") === col("approx_bucket")).count()
    assert(agree >= 990, s"approx bucket agreement $agree/1000 below tolerance")
    // both modes are one aggregate + a broadcast-literal CASE: no
    // shuffle beyond the threshold aggregate itself
    val plan = exact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast thresholds:\n$plan")
  }
}
