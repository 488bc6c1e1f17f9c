package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Contract: print ONE compact JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`
  * as the LAST stdout bytes, and ALSO write the full report (per-run
  * times + spread) to well-known files so the driver can parse it even
  * if its stdout tail buffer truncates the line:
  *   /tmp/bench.json, bench_latest.json (CWD, volatile/gitignored),
  *   and bench_trial_{sfTag}.json (CWD, gitignored) — or, ONLY when
  *   `--publish` (or SPARK_GRAFT_BENCH_PUBLISH=1) is given,
  *   bench_{sfTag}.json, the COMMITTABLE artifact.
  *
  * The scale factor is stamped into the committable artifact's NAME
  * (bench_sf0.1.json vs bench_sf0.001.json), so a smoke-scale run can
  * never overwrite the sf0.1 headline artifact — the failure mode that
  * un-backed BASELINE.md's published numbers in rounds 6 AND 7 — and
  * publishing is opt-in, so the driver's own per-round run (or any
  * trial) can never clobber the committed headline either (round 14's
  * tree drift: a publishable:false hot-window run landed over the
  * published pair via the driver's round-close `git add -A`).
  * BASELINE.md's headline table is GENERATED from the committed
  * artifact pair by `tools/gen_baseline.py`, which refuses mismatched
  * or missing artifacts; hand-edited headline numbers are gone.
  *
  * Timing protocol: fixed query order (sorted by name), 5 timed passes
  * per query, per-query estimator = median of the 3 fastest runs
  * (2nd-smallest of 5 — tolerates two ambient-noise-inflated samples
  * per query wherever they land; all raw runs reported alongside).
  * Cache cleared after every query so the persist() calls
  * inside dedup/similarity pipelines can't leak storage into the next
  * measurement. THREE full warm-up passes AT THE BENCH SF remove
  * one-time JIT/codegen cost (what a long-lived cluster never pays per
  * query) from the numbers — warming at a smaller SF compiles different
  * plans (AQE broadcast decisions differ), one pass proved insufficient
  * (the round-7 driver run carried a 1.30× pass-1 spike because C2
  * compilation of ~100 generated stages straddles the first full pass),
  * and two proved insufficient once the codegen class cache was sized
  * to the session (C2 of the now-resident classes straddles pass 3).
  * `tools/duckdb_baseline.py` warms the same count symmetrically.
  */
object Bench {
  // 5 passes: the box shows ±10-15% ambient-noise windows lasting
  // minutes; a 5-sample median survives two bad passes where 3 did not
  private val Runs = 5
  // 3 warm-up passes (was 2 through r14): with the codegen class cache
  // sized to the session (GraftSession), steady state includes C2
  // compilation of the CACHED generated classes — measured pass totals
  // kept falling through pass 3 (44.0 -> 38.8 over five passes) with
  // only two warm-ups, blowing the spread bar on otherwise-quiet
  // windows. Symmetric: tools/duckdb_baseline.py warms the same count.
  private val WarmupPasses = 3

  /** Publish bar on pass-total spread — MUST match
    * tools/gen_baseline.py's refusal threshold (ContractSpec pins both):
    * a run whose passes disagree by more was measured under external
    * load and its per-query medians can re-rank queries out of noise.
    */
  val SpreadPublishBar = 1.15

  /** max/min pass-total ratio; +∞ for degenerate inputs. */
  def spreadOf(passTotals: Seq[Double]): Double =
    if (passTotals.isEmpty || passTotals.min <= 0) Double.PositiveInfinity
    else passTotals.max / passTotals.min

  /** Whether a run's spread qualifies it for the committed headline —
    * recorded in every bench artifact (including the driver-captured
    * stdout line) so a noisy window is marked non-publishable IN the
    * artifact instead of discovered later.
    */
  def publishable(spread: Double): Boolean = spread <= SpreadPublishBar

  /** Normalized-ratio bar above which a gate counts as a regression
    * outlier — ONE definition, echoed into the artifact's
    * `regressions.threshold` field so the recorded bar can never
    * diverge from the screen that produced the outlier list.
    */
  val RegressionThreshold = 1.3

  /** Absolute-delta floor for the regression screen: a gate is flagged
    * only when its heat-adjusted excess (now − ref × windowRatio)
    * exceeds this many seconds AND its normalized ratio exceeds
    * [[RegressionThreshold]]. Ratio-only screening flagged
    * `st_rate_intake` 0.18→0.23 s (1.47×) in the r17 driver window —
    * 50 ms of scheduler jitter on a micro-gate tripping the same alarm
    * as a real plan regression (the committed publish pair showed zero
    * outliers). 0.1 s is below any delta a genuine plan change
    * produces on a measurable gate, and far above per-gate jitter.
    */
  val RegressionDeltaFloorSec = 0.1

  /** Window-normalized per-gate regression screen against the COMMITTED
    * reference artifact — the r16 lesson automated: a whole-window heat
    * difference (the box running ~10% hotter) inflates every gate
    * uniformly and is NOT a regression, so each gate's now/ref ratio is
    * divided by the shared-gate total ratio before the threshold test.
    * Gates under `floorSec` in both runs are skipped (sub-100ms gates
    * re-rank on scheduler jitter alone); failed gates (negative
    * medians) and gates absent from either side (new/retired) are
    * excluded. Pure so ContractSpec can pin the screen's shape.
    * Returns (windowRatio, gate → (now, ref, normalized)) where
    * windowRatio is the MEDIAN of shared-gate ratios.
    */
  def regressionOutliers(now: Map[String, Double], ref: Map[String, Double],
      threshold: Double = RegressionThreshold, floorSec: Double = 0.1,
      deltaFloorSec: Double = RegressionDeltaFloorSec)
      : (Double, Map[String, (Double, Double, Double)]) = {
    val shared = now.keySet.intersect(ref.keySet)
      .filter(k => now(k) > 0 && ref(k) > 0)
    if (shared.isEmpty) return (1.0, Map.empty)
    // MEDIAN of per-gate ratios, not the total ratio: a single large
    // regressed gate inflates the shared total and would mask itself,
    // while the median is unmoved by a few true regressions and equals
    // the uniform heat factor on a quiet diff. The median is taken
    // over MEASURABLE gates only (≥ floorSec in both runs) — the
    // sub-floor gates' ratios re-rank on scheduler jitter alone, and
    // letting ~40 of them vote would let micro-gate noise shift the
    // normalizer every large gate is judged against. Degenerate case
    // (no measurable gate): fall back to all shared ratios.
    val measurable = shared.filter(g =>
      now(g) >= floorSec && ref(g) >= floorSec)
    val voters = if (measurable.nonEmpty) measurable else shared
    val ratios = voters.toSeq.map(g => now(g) / ref(g)).sorted
    val windowRatio = ratios(ratios.length / 2)
    val outliers = shared.iterator.flatMap { g =>
      val n = now(g); val r = ref(g)
      val norm = (n / r) / windowRatio
      // heat-adjusted excess seconds: what the gate costs BEYOND the
      // uniform window-heat expectation. Ratio alone re-flags
      // micro-gates on tens of milliseconds of jitter.
      val excess = n - r * windowRatio
      if (norm > threshold && math.max(n, r) >= floorSec &&
          excess > deltaFloorSec)
        Some(g -> (n, r, norm))
      else None
    }.toMap
    (windowRatio, outliers)
  }

  /** Per-gate medians of a committed bench artifact (its `detail` map);
    * empty when the file is missing or unparseable — the screen then
    * reports no outliers rather than failing the run.
    */
  def readCommittedMedians(path: String): Map[String, Double] = try {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(f)
    val det = root.get("detail")
    if (det == null) return Map.empty
    val it = det.properties().iterator()
    val b = Map.newBuilder[String, Double]
    while (it.hasNext) {
      val e = it.next()
      val m = e.getValue.get("median")
      if (m != null) b += e.getKey -> m.asDouble()
    }
    b.result()
  } catch { case _: Throwable => Map.empty }

  /** Committable artifact name iff the run EXPLICITLY asked to publish;
    * trial name (gitignored) otherwise. Pure so ContractSpec can pin
    * that no default invocation can reach the committable name.
    */
  def artifactFileName(sfTag: String, args: Array[String],
      env: Map[String, String]): String =
    if (args.contains("--publish") ||
        env.get("SPARK_GRAFT_BENCH_PUBLISH").contains("1"))
      s"bench_$sfTag.json"
    else s"bench_trial_$sfTag.json"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // static conf (builder-time only; tune() below can't set it): the
      // 155-gate loop holds >>100 codegen units — the 100-entry default
      // recompiles every gate's generated classes on every pass
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // fixed (sorted) order: run-to-run and round-to-round comparable
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm up JVM/codegen/parquet-footer paths so the first timed query
    // isn't charged ~5s of one-time session cost. Warm AT THE BENCH SF:
    // sf0.001 plans can compile different codegen (broadcast vs shuffle
    // join under AQE) and left pass-1 spikes in earlier rounds.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      // events.parquet is TIMESTAMP(NANOS): the legacy conf must be on
      // before any raw footer probe touches it (Tables.events sets it,
      // but the probe loop must not race ahead of that)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { tbl =>
        try spark.read.parquet(s"$sfDir/$tbl.parquet").limit(10).count()
        catch { case _: Throwable => }
      }
      (1 to WarmupPasses).foreach { _ =>
        queries.foreach { case (_, fn) =>
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => }
          spark.catalog.clearCache()
        }
      }
    } catch { case _: Throwable => }

    // noop sink evaluates every output column; count() would let
    // Catalyst prune the projections being measured
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      // stop the clock before cache teardown: unpersist cost belongs to
      // the harness, not the query being measured
      val dt = (System.nanoTime() - t0) / 1e9
      // drop any intra-query persist() state so the next measurement
      // starts from a cold cache (storage-memory isolation between queries)
      spark.catalog.clearCache()
      if (ok) dt else -dt // negative marks failure; |dt| still counts in totals
    }

    // Runs timed passes over the whole suite (pass-major, not
    // query-major: back-to-back repeats of one query would overstate
    // page-cache locality a real mixed workload doesn't have)
    val passBuf = scala.collection.mutable.ArrayBuffer.tabulate(Runs)(_ =>
      queries.map { case (n, fn) => (n, timeOnce(n, fn)) })
    // Publish-gate on ambient noise: a pass whose TOTAL is >1.25x the
    // fastest pass was measured under external load (round-6 committed
    // artifact had single passes of 62-193s against a 33s floor, and the
    // round-8 driver run's 1.19x spread was loose enough to hide ±8%
    // per-query "regressions" that the committed contemporaneous run
    // contradicted — not plan behavior). Re-measure the noisy pass in
    // place, up to 6 extras, so the published artifact is the run the
    // headline cites rather than one poisoned by a busy neighbor.
    // tools/gen_baseline.py independently REFUSES artifacts whose final
    // spread still exceeds 1.15x, so a box too noisy to converge yields
    // no headline rather than a false one.
    // The rerun trigger MATCHES gen_baseline's 1.15x publish refusal: a
    // pass in the 1.15-1.25x band used to be neither re-measured nor
    // publishable, so an otherwise-clean run died on one mildly-noisy
    // pass (round-10: two consecutive runs refused at 1.17x/1.21x).
    var reruns = 0
    def passTotalsNow = passBuf.map(_.map(t => math.abs(t._2)).sum)
    while (reruns < 6 &&
        !publishable(spreadOf(passTotalsNow.toSeq))) {
      val totals = passTotalsNow
      val noisy = totals.indexOf(totals.max)
      System.err.println(f"BENCH NOISY PASS ${noisy + 1} " +
        f"total=${totals(noisy)}%.1fs vs floor ${totals.min}%.1fs: re-running")
      passBuf(noisy) = queries.map { case (n, fn) => (n, timeOnce(n, fn)) }
      reruns += 1
    }
    val passes: Seq[Seq[(String, Double)]] = passBuf.toSeq
    // Ambient machine noise (another process grabbing the box for ~a
    // minute) inflates whole stretches of a run — in round 5 one spiked
    // pass dragged two query medians up 2-3x with no code change, and
    // noise windows are NOT pass-aligned, so discarding whole passes is
    // too coarse. The per-query estimator is therefore the median of
    // the 3 FASTEST of the 5 runs (= 2nd-smallest): it tolerates up to
    // two noise-inflated samples per query wherever they land, while
    // staying above the raw min (which can understate by catching one
    // lucky page-cache alignment). All 5 raw runs are reported.
    val byQueryAll: Seq[(String, Seq[Double])] =
      queries.map { case (n, _) => (n, passes.map(p => p.find(_._1 == n).get._2)) }
    val passTotals = passes.map(_.map(t => math.abs(t._2)).sum)

    // median of the 3 fastest of 5 = 2nd-smallest sample
    def trimmedMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length >= 2) s(1) else s.head
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    def r3(x: Double): Double = math.floor(x * 1000 + 0.5) / 1000

    val rows = byQueryAll.map { case (n, ts) =>
      val failed = ts.exists(_ < 0)
      val med = trimmedMedian(ts.map(math.abs))
      (n, if (failed) -med else med, ts)
    }
    // |dt| so a crashing query can never LOWER the reported total
    val total = r4(rows.map { case (_, m, _) => math.abs(m) }.sum)
    val failedNames = rows.collect { case (n, m, _) if m < 0 => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    // compact stdout line: 3-decimal medians keep it short enough to
    // survive a bounded stdout-tail capture
    val qsCompact = rows.map { case (n, m, _) => "\"" + n + "\":" + r3(m) }
      .mkString("{", ",", "}")
    // The driver captures only the LAST ~2000 chars of stdout and
    // json-parses the final line — a full 100+-entry query map overflows
    // that window and silently nulls the round's parsed metrics (round-9
    // advisory). Budget the stdout map: slowest queries first (the ones
    // a grader compares against the baseline), stop before the line can
    // outgrow the window, and say how many were elided. The COMPLETE map
    // always lands in /tmp/bench.json + bench_latest.json + bench_<sf>.json.
    val StdoutBudget = 1800
    // plan-floor sum (min across ALL passes per query): robust to
    // ambient host noise — when `value` and `min_total` diverge sharply
    // the machine was loaded during some passes, not the plans slower
    val minTotal = r4(byQueryAll.map { case (_, ts) => ts.map(math.abs).min }.sum)
    // SF-stamped committable artifact name: sf0.001 smoke runs write
    // bench_sf0.001.json and can never clobber the sf0.1 headline
    val sfTag = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9.]", "_")
    // TRIAL-by-default (round-14/15 lesson): the driver's post-round
    // re-run and any smoke invocation used to overwrite the committed
    // bench_sf0.1.json in the working tree, and a later `git add -A`
    // silently committed a hot-window (publishable:false) run as the
    // headline artifact. Only an EXPLICIT publish request may touch the
    // committable name; every other run writes bench_trial_<sf>.json
    // (gitignored) plus the volatile targets.
    val artifactName = artifactFileName(sfTag, args, sys.env)
    // regression tripwire vs the COMMITTED same-SF artifact, read
    // BEFORE any write below can touch it (a publish run overwrites
    // the very file it screens against)
    val referenceName = s"bench_$sfTag.json"
    val refMedians = readCommittedMedians(referenceName)
    val nowMedians = rows.collect {
      case (n, m, _) if m > 0 => n -> m
    }.toMap
    val (windowRatio, outliers) = regressionOutliers(nowMedians, refMedians)
    // spread + publishable travel IN the artifact (and the driver's
    // stdout-tail capture): a noisy window is marked non-publishable at
    // measurement time instead of re-ranking queries in a later report
    val spreadRaw = spreadOf(passTotals.toSeq)
    val spread = r3(spreadRaw)
    val pub = publishable(spreadRaw) // raw: same verdict gen_baseline reaches
    def summaryLine(entries: Seq[(String, Double)], elided: Int): String = {
      val qs = entries.map { case (n, m) => "\"" + n + "\":" + r3(m) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","min_total":$minTotal,"spread":$spread,"publishable":$pub,"regression_outliers":${outliers.size},"queries":$qs,"queries_elided":$elided,"failed":$failedNames,"detail_file":"$artifactName","sf":"$sfDir","runs":$Runs}"""
    }
    val bySlowest = rows.sortBy { case (_, m, _) => -math.abs(m) }
      .map { case (n, m, _) => (n, m) }
    val line = (bySlowest.length to 0 by -1).iterator
      .map(k => summaryLine(bySlowest.take(k), bySlowest.length - k))
      .find(_.length <= StdoutBudget)
      .getOrElse(summaryLine(Nil, bySlowest.length))
    // full report (ALL per-run times + spread + per-query min) for the
    // file targets
    val qsFull = byQueryAll.map { case (n, ts) =>
      val med = rows.find(_._1 == n).get._2
      val runs = ts.map(t => r4(math.abs(t))).mkString("[", ",", "]")
      val spread = r4(ts.map(math.abs).max - ts.map(math.abs).min)
      val qmin = r4(ts.map(math.abs).min)
      s""""$n":{"median":${r4(med)},"min":$qmin,"runs":$runs,"spread":$spread}"""
    }.mkString("{", ",", "}")
    val outliersJson = outliers.toSeq.sortBy(-_._2._3)
      .map { case (g, (n, r, norm)) =>
        s""""$g":{"now":${r4(n)},"ref":${r4(r)},"normalized":${r3(norm)}}""" }
      .mkString("{", ",", "}")
    val regressionsJson =
      s"""{"reference":"$referenceName","shared_gates":${
        nowMedians.keySet.intersect(refMedians.keySet).size
      },"window_ratio":${r3(windowRatio)},"threshold":$RegressionThreshold,"delta_floor_sec":$RegressionDeltaFloorSec,"outliers":$outliersJson}"""
    if (outliers.nonEmpty)
      System.err.println(s"BENCH REGRESSION SCREEN: ${outliers.size} " +
        s"window-normalized outlier(s) vs $referenceName " +
        s"(window ${r3(windowRatio)}x): " +
        outliers.toSeq.sortBy(-_._2._3).take(5).map { case (g, (n, r, norm)) =>
          f"$g $r%.2f->$n%.2fs (${norm}%.2fx)" }.mkString(", "))
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","min_total":$minTotal,"spread":$spread,"publishable":$pub,"pass_totals":${passTotals.map(r4).mkString("[", ",", "]")},"noisy_pass_reruns":$reruns,"regressions":$regressionsJson,"queries":$qsCompact,"detail":$qsFull,"failed":$failedNames,"sf":"$sfDir","runs":$Runs}"""
    Seq("/tmp/bench.json", "bench_latest.json", artifactName).foreach { p =>
      try {
        val w = new java.io.PrintWriter(new java.io.File(p))
        try w.println(full) finally w.close()
      } catch { case _: Throwable => }
    }
    // stop Spark BEFORE printing so shutdown log lines can't land after
    // the JSON line the driver parses
    spark.sparkContext.setLogLevel("ERROR")
    try spark.stop() catch { case _: Throwable => }
    println(line)
  }
}
