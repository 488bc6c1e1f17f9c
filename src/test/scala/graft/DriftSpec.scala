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
