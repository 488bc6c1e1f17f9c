package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.roundDet

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
  * Scale design (100 TB): each snapshot contributes ONE map-side-partial
  * aggregation onto a fixed `nBins`-row spine (driver state is the bin
  * count, a constant); the per-snapshot total is a one-row aggregate
  * broadcast in; the final join is nBins × nBins-row. Nothing here is
  * proportional to corpus size except the two scans. Output is per-bin
  * (the auditable evidence, and — deliberately — no cross-engine sum of
  * doubles: the scalar PSI is the trivial fold of the returned rows).
  */
object Drift {

  /** Per-bin PSI decomposition of the token-count distribution shift
    * between `ref` and `cur`. Returns (bin, ref_frac, cur_frac,
    * psi_contrib), fractions smoothed (cnt+1)/(total+nBins) and rounded
    * at 1e-6 (the repo's cross-engine determinism floor).
    */
  def psiTokenDrift(ref: DataFrame, cur: DataFrame, binWidth: Int = 32,
      nBins: Int = 16, textCol: String = "text"): DataFrame = {
    require(binWidth > 0 && nBins > 0, "binWidth and nBins must be positive")
    def fracs(df: DataFrame, out: String): DataFrame = {
      val spine = df.sparkSession.range(nBins.toLong)
        .select(col("id").as("bin"))
      val bin = least(
        floor(size(split(col(textCol), " ")).cast("double") / binWidth),
        lit((nBins - 1).toDouble)).cast("long").as("bin")
      val counts = df.select(bin).groupBy("bin").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
      spine.join(counts, Seq("bin"), "left")
        .crossJoin(broadcast(total))
        .select(col("bin"),
          ((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
            (col("total") + lit(nBins.toLong)).cast("double")).as(out))
    }
    fracs(ref, "ref_frac").join(fracs(cur, "cur_frac"), Seq("bin"))
      .select(col("bin"),
        roundDet(col("ref_frac"), 6).as("ref_frac"),
        roundDet(col("cur_frac"), 6).as("cur_frac"),
        roundDet((col("cur_frac") - col("ref_frac")) *
          log(col("cur_frac") / col("ref_frac")), 6).as("psi_contrib"))
  }
}
