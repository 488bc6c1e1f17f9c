package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A composed end-to-end curation pass over a document corpus — the shape
  * of a production pretraining-data pipeline, built purely from the
  * engine's operators so the whole thing stays one Catalyst plan per
  * stage:
  *
  *   stats+quality (map) → language filter (map) → exact dedup
  *   (1 shuffle) → MinHash near-dup removal (bucket-join) → split
  *   assignment (map)
  *
  * Each stage is independently usable; `curate` wires the default order.
  */
object CurationPipeline {

  final case class Config(
      minQuality: Double = 0.3,
      keepLangs: Set[String] = Set.empty, // empty = keep all
      nearDupJaccard: Double = 0.8,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      // driver-local near-dup admission ceiling (see
      // Dedup.dropNearDupLosersBounded) — zero forces the distributed
      // composition, which the x_curation_pipeline_dist gate times so
      // the at-scale plan stays measured
      nearDupMaxRows: Long = 65536,
      nearDupMaxBytes: Long = 64L << 20)

  /** Returns the curated corpus with columns: original + n_tokens,
    * quality, predicted_lang, split.
    */
  def curate(docs: DataFrame, cfg: Config = Config(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // 1. per-doc signals (single projection)
    val scored = TextAnalysis.textStats(docs, textCol)
      .withColumn("quality",
        TextAnalysis.qualityScore(col("n_tokens"), col("stopword_ratio")))
      .withColumn("predicted_lang", TextAnalysis.langId(col(textCol)))
      .drop("char_count", "avg_token_len", "stopword_ratio")

    // 2. quality + language gates (pure filters — pushed to the scan)
    val gated = scored
      .filter(col("quality") >= cfg.minQuality)
      .filter(if (cfg.keepLangs.isEmpty) lit(true)
        else col("predicted_lang").isin(cfg.keepLangs.toSeq: _*))

    // 3. exact dedup (keep min id per content hash). Cached: the result
    // feeds candidate generation, pair verification, and the final
    // anti-join — uncached, the scan→stats→gates→dedup subtree would
    // re-execute ~4x. Callers may unpersist after materializing.
    val exact = Dedup.dropExactDuplicates(gated, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4. near-dup removal: MinHash candidates → exact per-pair verify →
    //    connected components → keep each cluster's minimum id (dropping
    //    per-pair id_b would over-keep when LSH misses a transitive pair).
    //    Shingle arrays + signatures are computed ONCE and shared by
    //    candidate generation and the verify re-attach (the nearDupPairs
    //    convenience would tokenize+shingle the corpus twice); persisted
    //    because three joins reference the state. Output is identical —
    //    this is the same (sigs, shingles) pair, derived once.
    val state = exact.select(col(idCol).as("id"),
        Dedup.shingles(TextAnalysis.tokens(col(textCol)), 3).as("arr"))
      .withColumn("sig", Dedup.minhashSignature(col("arr"), 32))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded-state corpora take the driver-local candidates → verify →
    // cluster → drop pass (one collect of the persisted state); larger
    // corpora run the unchanged distributed composition inside — see
    // Dedup.dropNearDupLosersBounded for the equivalence contract
    val deduped = Dedup.dropNearDupLosersBounded(
      exact, state, cfg.nearDupJaccard, idCol,
      maxRows = cfg.nearDupMaxRows, maxBytes = cfg.nearDupMaxBytes)

    // 5. deterministic split assignment
    Sampling.hashSplit(deduped, idCol, cfg.splits)
  }
}
