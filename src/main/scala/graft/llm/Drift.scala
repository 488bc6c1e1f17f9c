package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between corpus snapshots — the check a
  * continuously-refreshed training corpus runs before admitting a new
  * crawl: has the shape of the data moved enough that downstream mixing
  * weights / quality thresholds need re-tuning?
  *
  * The metric is the Population Stability Index over a binned feature
  * (here: document token count), the standard drift score:
  *   PSI = Σ_bins (cur_frac − ref_frac) · ln(cur_frac / ref_frac)
  * with add-one smoothing over the fixed bin spine so empty bins stay
  * finite. Conventional reading: < 0.1 stable, 0.1–0.25 moderate drift,
  * > 0.25 action required.
  *
  * Scale design (100 TB): each snapshot is scanned EXACTLY ONCE — both
  * snapshots union into one tagged, map-side-partial aggregation onto
  * the fixed bin spine, so the shuffle carries ≤ 2·nBins rows per task.
  * The aggregate (≤ 2·nBins rows — a constant, like a trained quantizer)
  * folds to fractions and per-bin PSI on the driver; nothing downstream
  * of the single aggregation touches the corpus again. Output is per-bin
  * (the auditable evidence, and — deliberately — no cross-engine sum of
  * doubles: the scalar PSI is the trivial fold of the returned rows).
  */
object Drift {

  /** Histogram bin of the token count: floor(tokens / binWidth), last
    * bin open-ended — the one binning shared by every PSI surface here
    * (batch, reference fold, streaming) so they cannot diverge.
    */
  def binCol(binWidth: Int, nBins: Int, textCol: String): Column =
    least(
      floor(size(split(col(textCol), " ")).cast("double") / binWidth),
      lit((nBins - 1).toDouble)).cast("long")

  /** Tagged per-(side, bin) counts of the token-count histogram — the
    * one corpus-sized aggregation behind [[psiTokenDrift]], exposed so
    * the plan shape (one shuffle, one scan per snapshot) is assertable.
    */
  def binnedCounts(ref: DataFrame, cur: DataFrame, binWidth: Int,
      nBins: Int, textCol: String): DataFrame = {
    def binned(df: DataFrame, side: String): DataFrame =
      df.select(binCol(binWidth, nBins, textCol).as("bin"),
        lit(side).as("side"))
    binned(ref, "ref").unionByName(binned(cur, "cur"))
      .groupBy("side", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Smoothed reference fractions of the token-count histogram — the
    * trained state a streaming drift monitor carries: nBins doubles,
    * computed once offline from the reference corpus (one aggregation,
    * one scan) and baked into the streaming plan as a literal.
    */
  def referenceFracs(ref: DataFrame, binWidth: Int = 32, nBins: Int = 16,
      textCol: String = "text"): Seq[Double] = {
    val counts = ref.select(binCol(binWidth, nBins, textCol).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("cnt")).toMap
    val total = counts.values.sum
    (0L until nBins).map(b =>
      (counts.getOrElse(b, 0L) + 1).toDouble / (total + nBins))
  }

  /** Streaming PSI drift monitor: per event-time window, the per-bin
    * PSI decomposition of the arriving documents' token-count
    * distribution against a reference histogram trained offline with
    * [[referenceFracs]]. The continuous-intake form of
    * [[psiTokenDrift]]: a crawl feed is scored window by window, and a
    * window whose Σ psi_contrib crosses the action threshold flags the
    * feed before downstream mixing weights go stale.
    *
    * Streaming shape: append mode forbids a second aggregation over the
    * first (the per-window total), so the whole histogram is ONE
    * windowed aggregation — nBins conditional counts + the total per
    * row — and the per-bin expansion afterwards is a stateless
    * posexplode. State per window is nBins+1 longs; the watermark
    * bounds how many windows are live. Same smoothing, rounding, and
    * evaluation order as the batch operator (asserted equal in
    * `DriftSpec`).
    */
  def psiTokenDriftStream(stream: DataFrame, refFracs: Seq[Double],
      binWidth: Int = 32, nBins: Int = 16, textCol: String = "text",
      timeCol: String = "event_time", windowDur: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(refFracs.length == nBins, s"need $nBins reference fractions")
    val bin = binCol(binWidth, nBins, textCol)
    val binCounts = (0 until nBins).map(b =>
      count(when(bin === b, 1)).as(s"_c$b"))
    val agged = stream
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowDur))
      .agg(count(lit(1)).as("_total"), binCounts: _*)
    val refArr = array(refFracs.map(lit(_)): _*)
    agged
      .select(col("window.start").as("window_start"), col("_total"),
        posexplode(array((0 until nBins).map(b => col(s"_c$b")): _*))
          .as(Seq("bin", "_cnt")))
      .select(col("window_start"), col("bin").cast("long").as("bin"),
        element_at(refArr, col("bin").cast("int") + 1).as("_rf"),
        ((col("_cnt") + lit(1L)).cast("double") /
          (col("_total") + lit(nBins.toLong)).cast("double")).as("_cf"))
      .select(col("window_start"), col("bin"),
        graft.functions.roundDet(col("_rf"), 6).as("ref_frac"),
        graft.functions.roundDet(col("_cf"), 6).as("cur_frac"),
        graft.functions.roundDet(
          (col("_cf") - col("_rf")) * log(col("_cf") / col("_rf")), 6)
          .as("psi_contrib"))
  }

  /** Per-bin PSI decomposition of the token-count distribution shift
    * between `ref` and `cur`. Returns (bin, ref_frac, cur_frac,
    * psi_contrib), fractions smoothed (cnt+1)/(total+nBins) and rounded
    * at 1e-6 (the repo's cross-engine determinism floor). PSI terms are
    * computed from the UNROUNDED fractions, then rounded — matching the
    * SQL oracle's evaluation order.
    */
  def psiTokenDrift(ref: DataFrame, cur: DataFrame, binWidth: Int = 32,
      nBins: Int = 16, textCol: String = "text"): DataFrame = {
    require(binWidth > 0 && nBins > 0, "binWidth and nBins must be positive")
    val spark = ref.sparkSession
    import spark.implicits._
    val counts = binnedCounts(ref, cur, binWidth, nBins, textCol)
      .collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("bin")) ->
        r.getAs[Long]("cnt"))
      .toMap
    def tot(side: String): Long =
      (0L until nBins).map(b => counts.getOrElse((side, b), 0L)).sum
    val (refTot, curTot) = (tot("ref"), tot("cur"))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def frac(side: String, total: Long, b: Long): Double =
      (counts.getOrElse((side, b), 0L) + 1).toDouble / (total + nBins)
    (0L until nBins).map { b =>
      val rf = frac("ref", refTot, b)
      val cf = frac("cur", curTot, b)
      (b, r6(rf), r6(cf), r6((cf - rf) * math.log(cf / rf)))
    }.toDF("bin", "ref_frac", "cur_frac", "psi_contrib")
  }
}
