package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators for training-data
  * pipelines.
  *
  * Everything keys off a stable id hash — NOT `rand()` — so assignments
  * are reproducible across runs, executors, retries, and repartitioning,
  * and a document keeps its split when the corpus is re-processed
  * (critical for avoiding train/test leakage across dataset versions at
  * 100 TB, where jobs always re-run somewhere).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform hash bucket in [0, 1e6) for a stable id. Each operator
    * salts the hash with its own tag: an unsalted shared bucket would
    * correlate composed operators (e.g. a 50% sample feeding a 98/1/1
    * split would land every surviving row in "train").
    *
    * Derived from 32 bits of md5 rather than xxhash64: md5 is the one
    * hash every engine agrees on byte-for-byte, so split assignments are
    * portable across Spark / DuckDB / BigQuery — a corpus re-processed
    * by a different engine keeps the same train/val/test membership
    * (the same leakage argument as run-to-run determinism). Cost is a
    * few ns/row more than xxhash64, irrelevant next to the scan.
    */
  def hashBucket(id: Column, salt: String): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 25, 8),
      16, 10).cast("long"), lit(Buckets))

  /** Assign train/val/test (or any named fractions summing to ≤ 1) by id
    * hash. Rows beyond the cumulative fractions get NULL (dropped splits).
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)): DataFrame = {
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val bucket = hashBucket(col(idCol), "split")
    // round, don't truncate: accumulated doubles like 0.7+0.2+0.1 land at
    // 0.9999999999999999 and truncation would NULL-drop the last bucket
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(f => math.round(f * Buckets))
    val assign = splits.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), onFalse) => when(bucket < hi, lit(name)).otherwise(onFalse)
    }
    df.withColumn("split", assign)
  }

  /** Leakage-safe split: assign train/val/test by the near-dup CLUSTER
    * id rather than the document id, so near-duplicate twins can never
    * land on opposite sides of a train/test boundary — the
    * contamination vector a plain per-document hash split leaves open
    * (Lee et al. 2022 §6: duplicated text across splits inflates eval).
    * `clusters` is [[Dedup.duplicateClusters]] output (id, cluster_id);
    * documents absent from it are their own singleton cluster. The
    * cluster table is ∝ the corpus's actual duplication — which on
    * real web crawls can be 30–80% of the corpus, far too big to force
    * into a broadcast — so the join strategy is LEFT TO THE PLANNER:
    * a small persisted cluster table auto-broadcasts under
    * `autoBroadcastJoinThreshold` (and AQE re-plans at runtime), while
    * a corpus-sized one degrades to a shuffle join instead of OOMing
    * the driver (a forced hint would bypass the threshold entirely).
    * Assignment itself is the same portable md5-bucket rule as
    * [[hashSplit]] — no extra shuffle beyond the one join. Output
    * carries the effective split
    * key as `cluster_id` — REPLACING any incoming column of that name
    * (the join itself works through namespaced internal columns, so an
    * input that already has `cluster_id` never hits an
    * ambiguous-reference failure). */
  def clusterSafeSplit(df: DataFrame, clusters: DataFrame, idCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)): DataFrame = {
    val c = clusters.select(col("id").as("__cs_id"),
      col("cluster_id").as("__cs_cluster"))
    val withCluster = df
      .join(c, df(idCol) === col("__cs_id"), "left")
      .drop("__cs_id")
      .withColumn("cluster_id", coalesce(col("__cs_cluster"), col(idCol)))
      .drop("__cs_cluster")
    hashSplit(withCluster, "cluster_id", splits)
  }

  /** Keep a deterministic `fraction` of rows, uniformly by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol), "sample") < math.round(fraction * Buckets))

  /** Per-stratum deterministic downsampling: `fractions(stratum)` of each
    * stratum survives (1.0 for unlisted strata). The usual tool for
    * rebalancing a language/source mix without a shuffle — pure filter.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(1.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), "stratified") < frac * Buckets)
  }

  /** Data mixing: downsample each listed source so the surviving corpus
    * matches the target proportions `weights` (which should sum to 1),
    * keeping as many rows as the scarcest source allows; unlisted
    * sources are dropped. keep_s = C·w_s with C = min_s(count_s / w_s),
    * so the binding source keeps 100% and everything else scales down.
    *
    * Scale: one count aggregation (collect is bounded by the number of
    * sources — mixing config state, like the IVF quantizer), then a pure
    * deterministic filter over the scan. Survivorship is id-stable: a
    * document that survives one mix run survives every re-run.
    */
  def mixToWeights(df: DataFrame, weights: Map[String, Double],
      srcCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val counts = df.groupBy(srcCol).count()
      .filter(col(srcCol).isin(weights.keys.toSeq: _*))
      // toString, not getString: a non-string source column (int ids)
      // should still match the Map[String, Double] key space
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.contains(s) }
    if (present.isEmpty) return df.filter(lit(false))
    val cap = present.map { case (s, w) => counts(s) / w }.min
    val fracCol = present.foldLeft(lit(-1.0)) { case (acc, (s, w)) =>
      when(col(srcCol) === s,
        lit(math.min(1.0, cap * w / counts(s).toDouble))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), "mix") < fracCol * Buckets)
  }

  /** Temperature-weighted mixing (the multilingual-LM standard, e.g.
    * XLM-R): target proportions p_s ∝ count_s^alpha. alpha=1 keeps the
    * natural distribution; alpha→0 flattens toward uniform, up-weighting
    * scarce sources. Downsamples (never oversamples) to the alpha-tilted
    * mix bound by the scarcest source, via the same cap formula as
    * [[mixToWeights]]: keep_s = C·w_s with w_s = count_s^alpha and
    * C = min_s(count_s / w_s) — normalization of w cancels in keep_s/count_s,
    * so no cross-source floating-point accumulation enters the per-row
    * filter threshold (bit-reproducible across engines).
    *
    * NULL sources are dropped up front, explicitly: `String.valueOf`
    * would otherwise fold a NULL source into the key "null" (colliding
    * with a literal 'null' source) while the `col === "null"` filter
    * could never readmit the NULL rows — and a NULL group entering the
    * cap min would diverge from SQL twins whose joins drop NULLs.
    *
    * Scale: one count aggregation (driver state = #sources), then a pure
    * deterministic md5-bucket filter over the scan — zero extra shuffles.
    */
  def temperatureMix(df: DataFrame, alpha: Double,
      srcCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val d = df.filter(col(srcCol).isNotNull)
    val counts = d.groupBy(srcCol).count()
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.filter(lit(false))
    val w = counts.map { case (s, c) => s -> math.pow(c.toDouble, alpha) }
    val cap = counts.map { case (s, c) => c.toDouble / w(s) }.min
    val fracCol = counts.keys.foldLeft(lit(-1.0)) { case (acc, s) =>
      when(col(srcCol) === s,
        lit(math.min(1.0, cap * w(s) / counts(s).toDouble))).otherwise(acc)
    }
    d.filter(hashBucket(col(idCol), "tmix") < fracCol * Buckets)
  }

  /** Sample each source down to a TOKEN budget: keep fraction
    * f_s = min(1, B·w_s / tokens_s), id-hash deterministic. The LLM
    * mixture operation is over tokens, not documents — for the same
    * weight, a source of long documents must contribute fewer surviving
    * documents — so the denominator is the source's token mass, not its
    * row count (contrast [[mixToWeights]]). Sources with fewer tokens
    * than their share keep everything (downsample-only, like the other
    * mixers); unlisted and NULL sources are dropped.
    *
    * The surviving token count matches B·w_s in expectation (documents
    * are admitted whole — the standard practice; exact-budget cuts are
    * [[graft.llm.Packing]]'s job downstream). Each f_s is one multiply
    * and divide on doubles, so SQL twins reproduce the admission
    * threshold bit-for-bit. Scale: one token-sum aggregation (driver
    * state = #sources), then a pure codegen'd filter over the scan.
    */
  def mixToTokenBudget(df: DataFrame, budgetTokens: Long,
      weights: Map[String, Double], srcCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    mixToTokenBudgetByCount(
      df.withColumn("__graft_nt",
        size(TextAnalysis.tokens(col(textCol))).cast("long")),
      budgetTokens, weights, "__graft_nt", srcCol, idCol)
      .drop("__graft_nt")

  /** [[mixToTokenBudget]] over a PRECOMPUTED token-count column — the
    * mid-pipeline form: a curation pipeline that already tokenized
    * upstream carries `n_tokens` forward instead of re-reading every
    * document's text to count it again (at 100 TB the text column is
    * ~1000× the count column). Admission rule and hash salt are
    * identical, so the two forms admit the same documents.
    */
  def mixToTokenBudgetByCount(df: DataFrame, budgetTokens: Long,
      weights: Map[String, Double], nTokensCol: String,
      srcCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val d = df.filter(col(srcCol).isNotNull)
    val toks = d.groupBy(srcCol)
      .agg(sum(col(nTokensCol).cast("long")).as("t"))
      .filter(col(srcCol).isin(weights.keys.toSeq: _*))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    if (toks.isEmpty) return df.filter(lit(false))
    val present = weights.filter { case (s, _) => toks.contains(s) }
    val fracCol = present.foldLeft(lit(-1.0)) { case (acc, (s, w)) =>
      when(col(srcCol) === s,
        lit(math.min(1.0, budgetTokens * w / toks(s).toDouble))).otherwise(acc)
    }
    d.filter(hashBucket(col(idCol), "tokbudget") < fracCol * Buckets)
  }
  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES): each row draws a uniform
    * u ∈ (0, 1] from 48 bits of the portable md5 hash and takes key
    * r = ln(u) / w; the k rows with the LARGEST keys are exactly a
    * weight-proportional without-replacement sample. Same determinism
    * contract as every operator here — no rand(), so the sample is
    * identical across runs, engines, retries, and repartitioning.
    *
    * Cross-engine key stability: u is an exact dyadic rational (48-bit
    * integer / 2^48 — exact in double on any engine); ln is the one
    * transcendental, so it is quantized at 1e-9 (the DSIR discipline)
    * before the exactly-rounded division by the weight — the ranking
    * key is then the same bit pattern in Spark and DuckDB.
    *
    * Scale shape: one codegen'd projection computes the key, and the
    * top-k runs as TakeOrdered — per-partition top-k, driver merges
    * O(k); the corpus is never globally sorted. Output: (idCol,
    * sample_key rounded to 6) ordered-set semantics (the oracle
    * compares sorted rows).
    */
  def weightedSample(df: DataFrame, k: Int, weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0)
    val h48 = conv(substring(
      md5(concat_ws(":", lit("wsample"), col(idCol).cast("string"))),
      21, 12), 16, 10).cast("long")
    val u = (h48 + lit(1L)).cast("double") / lit(281474976710656.0) // 2^48
    val key = graft.functions.roundDet(log(u), 9) /
      col(weightCol).cast("double")
    df.filter(col(weightCol) > 0)
      .select(col(idCol), key.as("_key"))
      .orderBy(col("_key").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol),
        graft.functions.roundDet(col("_key"), 6).as("sample_key"))
  }
}
