package graft

import org.apache.spark.sql.functions._
import graft.llm.{Drift, LanguageModel}

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Int): (Long, String) =
    (id, Seq.fill(words)("w").mkString(" "))

  test("psiTokenDrift is zero for identical snapshots and covers the spine") {
    val snap = (0L until 40L).map(i => doc(i, 8 + (i % 5).toInt * 40)).toDF("doc_id", "text")
    val rows = Drift.psiTokenDrift(snap, snap, binWidth = 32, nBins = 16).collect()
    assert(rows.length == 16, "one row per spine bin, including empty bins")
    assert(rows.forall(_.getAs[Double]("psi_contrib") == 0.0))
    // smoothed fractions over the full spine sum to ~1
    val s = rows.map(_.getAs[Double]("ref_frac")).sum
    assert(math.abs(s - 1.0) < 1e-4, s"fracs sum to $s")
  }

  test("binnedCounts scans each snapshot once through one aggregation") {
    val ref = (0L until 20L).map(i => doc(i, 10)).toDF("doc_id", "text")
    val cur = (0L until 20L).map(i => doc(i, 50)).toDF("doc_id", "text")
    val (shuffles, _, _) =
      graft.core.PlanAudit.counts(Drift.binnedCounts(ref, cur, 32, 16, "text"))
    assert(shuffles == 1,
      s"the corpus-sized work must be ONE tagged aggregation, got $shuffles")
  }

  test("psiTokenDrift flags a shifted length distribution") {
    val ref = (0L until 60L).map(i => doc(i, 10)).toDF("doc_id", "text")
    val cur = (0L until 60L).map(i => doc(i, 200)).toDF("doc_id", "text")
    val rows = Drift.psiTokenDrift(ref, cur).collect()
    val psi = rows.map(_.getAs[Double]("psi_contrib")).sum
    assert(psi > 0.25, s"disjoint bins must cross the action threshold, got $psi")
    // every contribution is non-negative by construction of the formula
    assert(rows.forall(_.getAs[Double]("psi_contrib") >= 0.0))
  }

  test("psiTokenDriftStream scores each window like the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = (0L until 30L)
      .map(i => doc(i, 8 + (i % 4).toInt * 40)).toDF("doc_id", "text")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:05:00")
    val t2 = java.sql.Timestamp.valueOf("2026-01-01 01:05:00")
    val mkText = (words: Int) => Seq.fill(words)("w").mkString(" ")
    // stable window: drawn from the reference's own length mixture
    val w1 = (0 until 20).map(i => (t1, mkText(8 + (i % 4) * 40)))
    val w2 = (0 until 20).map(_ => (t2, mkText(200)))  // drifted window
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = Drift.psiTokenDriftStream(
      mem.toDF.toDF("event_time", "text"), Drift.referenceFracs(ref),
      windowDur = "1 hour")
    assert(out.isStreaming, "the monitor must be a streaming plan")
    val q = out.writeStream.format("memory").queryName("psi_stream")
      .outputMode("complete").start()
    try { mem.addData(w1 ++ w2: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("psi_stream").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[Long]("bin")) ->
        (r.getAs[Double]("ref_frac"), r.getAs[Double]("cur_frac"),
          r.getAs[Double]("psi_contrib"))).toMap
    assert(got.size == 32, "16 bins per emitted window")
    // each window's rows equal the batch operator on that window's slice
    for ((ts, docsDf) <- Seq(
        t1 -> w1.map(_._2).zipWithIndex.map { case (t, i) => (i.toLong, t) },
        t2 -> w2.map(_._2).zipWithIndex.map { case (t, i) => (i.toLong, t) })) {
      val windowStart = java.sql.Timestamp.valueOf(
        ts.toLocalDateTime.withMinute(0).withSecond(0))
      val batch = Drift.psiTokenDrift(ref, docsDf.toDF("doc_id", "text"))
        .collect()
      batch.foreach { r =>
        val key = (windowStart, r.getAs[Long]("bin"))
        assert(got(key) == ((r.getAs[Double]("ref_frac"),
          r.getAs[Double]("cur_frac"), r.getAs[Double]("psi_contrib"))),
          s"window $windowStart bin ${r.getAs[Long]("bin")}")
      }
    }
    // the drifted window crosses the action threshold; the stable one not
    def psiSum(ts: java.sql.Timestamp): Double = {
      val ws = java.sql.Timestamp.valueOf(
        ts.toLocalDateTime.withMinute(0).withSecond(0))
      got.collect { case ((w, _), (_, _, p)) if w == ws => p }.sum
    }
    assert(psiSum(t2) > 0.25 && psiSum(t1) < 0.25)
  }

  test("psiTokenDriftStream finalizes windows under append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = (0L until 16L).map(i => doc(i, 10)).toDF("doc_id", "text")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:05:00")
    val late = java.sql.Timestamp.valueOf("2026-01-01 02:30:00")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = Drift.psiTokenDriftStream(
      mem.toDF.toDF("event_time", "text"), Drift.referenceFracs(ref),
      windowDur = "1 hour")
    val q = out.writeStream.format("memory").queryName("psi_append")
      .outputMode("append").start()
    try {
      mem.addData((0 until 8).map(_ => (t1, "w w w")): _*)
      q.processAllAvailable()
      // window still open: nothing emitted yet
      assert(spark.table("psi_append").isEmpty)
      // an event past watermarkDelay beyond the window closes it
      mem.addData((late, "w"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("psi_append").collect()
    assert(rows.length == 16, "the closed window emits its 16 bins once")
  }

  test("oovRateWithVocab scores new deliveries against frozen state") {
    val train = Seq((0L, "aa aa bb")).toDF("doc_id", "text")
    val vocab = LanguageModel.trainVocab(train, vocabSize = 2)
    // unseen delivery: "aa" and "bb" covered, "zz" OOV
    val delivery = Seq((7L, "aa zz bb zz")).toDF("doc_id", "text")
    val r = LanguageModel.oovRateWithVocab(delivery, vocab).head()
    assert(r.getAs[Long]("n_tokens") == 4L &&
      r.getAs[Double]("oov_rate") == 0.5)
  }

  test("oovRate scores vocabulary coverage with a deterministic boundary") {
    // corpus vocabulary: "aa" (4 occurrences), "bb" (2), "zz" (2) — with
    // vocabSize = 2 the cnt-DESC/word-ASC order keeps {aa, bb}, so the
    // bb/zz tie at the boundary resolves byte-wise
    val df = Seq(
      (0L, "aa aa bb zz"),
      (1L, "aa aa bb zz")).toDF("doc_id", "text")
    val got = LanguageModel.oovRate(df, vocabSize = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("oov_rate"))).toMap
    assert(got(0L) == ((4L, 0.25)) && got(1L) == ((4L, 0.25)))
    // full vocabulary → zero OOV
    val zero = LanguageModel.oovRate(df, vocabSize = 3).collect()
    assert(zero.forall(_.getAs[Double]("oov_rate") == 0.0))
  }
}
