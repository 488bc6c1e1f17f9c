package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via hashed-n-gram importance resampling — the DSIR
  * family (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every raw document by how much its
  * hashed-bigram feature distribution looks like a TARGET corpus
  * (high-quality seed data) versus the RAW corpus it came from, then
  * keep the highest-scoring slice. The reference pipeline curates by
  * per-document rules (SURVEY §2 quality tests); importance resampling
  * is the corpus-level counterpart a pretraining pipeline runs before
  * tokenization.
  *
  * Scale shape: both feature distributions live on a FIXED bucket space
  * (`buckets`, default 4096) — two hash aggregations whose output is
  * config-sized regardless of corpus bytes, broadcast back as a log-ratio
  * table. Scoring is then one explode + broadcast-join + per-doc sum:
  * a single shuffle keyed by doc id, no driver state beyond the bucket
  * table. At 100 TB the bucket table is still 4096 rows.
  *
  * Determinism: buckets come from the engine-portable md5 scheme
  * ([[Sampling.hashBucket]]'s construction), so the same document scores
  * identically across runs, executors, and engines — the DuckDB oracle
  * recomputes the full pipeline bit-for-bit at 6-significant-digit
  * canonicalization.
  */
object Selection {

  /** Adjacent-word bigrams of a whitespace-tokenized text, joined with
    * '_' — the hashed feature of DSIR's "hashed n-gram" variant. */
  def bigrams(text: Column): Column = {
    val ws = split(text, " ")
    zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit("_"), b))
  }

  /** Engine-portable feature bucket in [0, buckets): 32 bits of
    * md5("dsir:" + bigram), mod the bucket count — the same md5 idiom as
    * [[Sampling.hashBucket]], so any engine with md5 reproduces the
    * exact feature map. */
  def featureBucket(bigram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit("dsir:"), bigram)), 25, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Per-bucket occurrence counts of a corpus: (bucket, n). Output is
    * bounded by `buckets` — config-sized, broadcastable. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(explode(bigrams(col(textCol))).as("bigram"))
      .select(featureBucket(col("bigram"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Add-one-smoothed log probability-ratio table between a target and a
    * raw corpus: (bucket, log_ratio) over the FULL bucket space, where
    * log_ratio(b) = log((nT(b)+1)/(NT+B)) − log((nR(b)+1)/(NR+B)).
    * Smoothing keeps never-seen buckets finite on both sides; the table
    * is B rows and broadcast into scoring. */
  def logRatioTable(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val spark = raw.sparkSession
    val b = lit(buckets.toLong)
    // materialized once: each count table is referenced twice below
    // (spine join + total), and a lazy subtree would re-explode the
    // corpus per reference. B-bounded rows — config-sized state.
    val tc = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("n", "n_t").localCheckpoint(true)
    val rc = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("n", "n_r").localCheckpoint(true)
    // totals derive from the count tables themselves (Σ n over B rows)
    // rather than re-exploding the corpus — the corpus is touched
    // exactly twice total (once per distribution); the full bucket
    // spine makes unseen buckets explicit rather than join-dropped
    val spine = spark.range(0, buckets).select(col("id").as("bucket"))
    spine
      .join(tc, Seq("bucket"), "left").join(rc, Seq("bucket"), "left")
      .crossJoin(tc.agg(coalesce(sum("n_t"), lit(0L)).as("tot_t")))
      .crossJoin(rc.agg(coalesce(sum("n_r"), lit(0L)).as("tot_r")))
      .select(col("bucket"),
        // 1e-6 quantization (the trainCentroids idiom): pins the ratio
        // table so per-doc sums — and the top-k selection boundary over
        // them — are identical bit patterns in any engine, instead of
        // depending on last-bit summation-order luck near the k-th rank
        graft.functions.roundDet(
          log((coalesce(col("n_t"), lit(0L)) + 1).cast("double") /
              (col("tot_t") + b).cast("double")) -
            log((coalesce(col("n_r"), lit(0L)) + 1).cast("double") /
              (col("tot_r") + b).cast("double")), 6).as("log_ratio"))
  }

  /** Per-document DSIR log importance weight: the sum of `log_ratio`
    * over the document's bigram occurrences (empty/1-word docs score
    * 0.0 — no evidence either way). One explode + one broadcast join
    * against the B-row ratio table + one per-doc aggregation: a single
    * id-keyed shuffle over the corpus. Output: (idCol, log_weight). */
  def dsirLogWeights(raw: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      buckets: Int = 4096): DataFrame =
    dsirLogWeightsWithTable(raw,
      logRatioTable(raw, target, textCol, buckets), textCol, idCol, buckets)

  /** Scoring against a PRE-TRAINED ratio table — the production entry
    * point: the (raw, target) distribution pair is corpus-level state
    * trained once offline (the [[Similarity.trainCentroids]] lifecycle);
    * per-batch scoring then issues zero training actions. `ratios` is
    * the B-row (bucket, log_ratio) table from [[logRatioTable]] —
    * B-bounded, so callers may hold it as collected config state. */
  def dsirLogWeightsWithTable(raw: DataFrame, ratioTable: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      buckets: Int = 4096): DataFrame = {
    val ratios = broadcast(ratioTable)
    // sum in exact integer micro-units, divide once at the end: double
    // summation is order-dependent in the last bits (partition merge
    // order, engine differences), which can flip the top-k boundary and
    // the rounded display value; a BIGINT sum of the 1e-6-quantized
    // ratios is associative, so the weight is bitwise identical on any
    // engine and any cluster layout
    raw.select(col(idCol), explode_outer(bigrams(col(textCol))).as("bigram"))
      .select(col(idCol), featureBucket(col("bigram"), buckets).as("bucket"))
      .join(ratios, Seq("bucket"), "left")
      .groupBy(idCol)
      .agg((coalesce(sum(round(col("log_ratio") * 1e6).cast("long")), lit(0L))
        .cast("double") / 1e6).as("log_weight"))
  }

  /** Keep the `k` highest-weight documents (ties broken on id, so the
    * selected SET is deterministic). Runs as TakeOrdered — each
    * partition surfaces at most k rows, the driver merges O(k) —
    * distributed top-k, not a global sort. For percentile-style
    * selection at 100 TB, compute a weight threshold once (the bucket
    * table makes weights reproducible) and select by pure filter;
    * [[dsirSelectByThreshold]] is that path. */
  def dsirSelectTopK(weighted: DataFrame, k: Int,
      idCol: String = "doc_id"): DataFrame =
    weighted.orderBy(col("log_weight").desc, col(idCol).asc).limit(k)

  /** Threshold selection: pure filter, zero extra shuffles — the
    * production path once a threshold has been chosen (e.g. from a
    * sampled quantile of `log_weight`). */
  def dsirSelectByThreshold(weighted: DataFrame, minLogWeight: Double): DataFrame =
    weighted.filter(col("log_weight") >= minLogWeight)

  /** Corpus-quantile bucketing of a scored table — the CCNet
    * head/middle/tail cut (Wenzek et al. 2020 §4.3): thresholds at the
    * `loP` / `hiP` quantiles of `scoreCol`, then a broadcast-literal
    * CASE labels each row `head` (≥ hi), `middle` (≥ lo) or `tail`.
    * Output: the input plus `<scoreCol>_bucket`.
    *
    * Two threshold modes, one operator:
    *
    *   - `approx = false` (default): exact `percentile`. With scores as
    *     INTEGER units and exact DYADIC fractions (0.25/0.75), every
    *     interpolation intermediate is exactly representable, so the
    *     thresholds are bit-identical across engines (the oracle
    *     contract). Aggregation state is the distinct-score set —
    *     bounded here by the integer quantization, but ∝ score
    *     cardinality in general.
    *   - `approx = true`: `approx_percentile` with `accuracy` — the
    *     Greenwald-Khanna sketch whose state is O(accuracy) regardless
    *     of corpus size and whose partials merge associatively: the
    *     100 TB path. Rank error ≤ n/accuracy per threshold, so at the
    *     default 1e4 at most 0.01 % of rows per threshold can land in
    *     the adjacent bucket vs the exact cut (the tolerance contract
    *     `x_ppl_buckets_approx` pins).
    */
  def quantileBuckets(scored: DataFrame, scoreCol: String,
      loP: Double = 0.25, hiP: Double = 0.75, approx: Boolean = false,
      accuracy: Int = 10000, bucketCol: String = "ppl_bucket"): DataFrame = {
    val sc = col(scoreCol)
    scored.crossJoin(
        broadcast(quantileThresholds(scored, scoreCol, loP, hiP, approx,
          accuracy)))
      .withColumn(bucketCol,
        when(sc >= col("t_hi"), lit("head"))
          .when(sc >= col("t_lo"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("t_lo", "t_hi")
  }

  /** The (t_lo, t_hi) threshold pair of [[quantileBuckets]] as a
    * one-row frame — exposed so a caller labeling the SAME scored
    * table under several threshold modes (the x_ppl_buckets_approx
    * tolerance gate) can run the mode aggregates as INDEPENDENT
    * parallel stages over one cached scan and attach each pair with
    * its own broadcast, instead of nesting one mode's labeled output
    * inside the other's aggregate (which serializes the stages) or
    * re-pairing rows with a join they never needed.
    */
  def quantileThresholds(scored: DataFrame, scoreCol: String,
      loP: Double = 0.25, hiP: Double = 0.75, approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    val sc = col(scoreCol)
    if (approx) scored.agg(
      approx_percentile(sc, lit(loP), lit(accuracy)).as("t_lo"),
      approx_percentile(sc, lit(hiP), lit(accuracy)).as("t_hi"))
    else scored.agg(
      expr(s"percentile($scoreCol, ${loP}d)").as("t_lo"),
      expr(s"percentile($scoreCol, ${hiP}d)").as("t_hi"))
  }
}
