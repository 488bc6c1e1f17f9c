package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextAnalysis}

/** Streaming document-intake operators: the LLM-pipeline stages that run
  * on an unbounded crawl/delivery stream rather than a batch corpus.
  *
  * The content-hash dedup a production intake starts with
  * (`StreamingSpec`'s curation case) only suppresses EXACT re-deliveries.
  * Near-duplicate suppression keys the stream on the 64-bit SimHash of
  * the token multiset instead: near-identical documents — permutations,
  * whitespace/boilerplate reshuffles, small multiset-preserving edits —
  * vote the same signature bit pattern, so a later near-copy collides
  * with the admitted original's key and is dropped by the SAME
  * watermark-bounded stateful dedup machinery (state per signature, ~8
  * bytes + key overhead, evicted past the watermark — the bounded-state
  * contract a 24/7 intake needs; contrast MinHash-LSH, whose bucket-join
  * shape has no bounded-state streaming equivalent).
  */
object DocStream {

  /** The signature keying, shared verbatim by the streaming operator and
    * its batch-analog oracle gate (`st_simhash_dedup`) so the two cannot
    * diverge: one codegen'd projection, no shuffle.
    */
  def withSimHashKey(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("simhash",
      Dedup.simhash64(TextAnalysis.tokens(col(textCol))))

  /** Cross-batch near-duplicate suppression for a streaming document
    * frame carrying (`idCol`, `textCol`, `timeCol`): the first document
    * of each SimHash signature is admitted; any later arrival with the
    * same signature — exact duplicate OR multiset-preserving near-copy —
    * is dropped while its state lives (watermark-bounded, so a
    * re-delivery older than the watermark is dropped as late rather
    * than re-admitted).
    */
  def nearDupSuppress(docs: DataFrame, watermarkDelay: String = "10 minutes",
      textCol: String = "text", timeCol: String = "event_time"): DataFrame =
    withSimHashKey(docs, textCol)
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("simhash")

  /** Streaming twin of [[graft.llm.IncrementalDedup.addDelivery]]: each
    * micro-batch is deduped against the PERSISTED MinHash signature
    * index (not merely against in-flight stream state, which is all
    * [[nearDupSuppress]] can see) and its survivors are admitted to the
    * index — the production intake composition where a document is
    * rejected if it near-duplicates anything ever admitted, across
    * stream restarts and batch backfills alike, because batch and
    * streaming ingestion share ONE index.
    *
    * Exactly-once admission: the micro-batch id tags the index
    * generation ([[graft.sources.Warehouse.deltaAppendTagged]]), so a
    * replayed batch after recovery is a no-op instead of a double
    * admission — idempotence lives in the index manifest, not in
    * fragile sink-side state.
    *
    * Scale shape per trigger = [[graft.llm.IncrementalDedup]]'s per
    * delivery: the index side is a column-pruned map-side scan, never
    * shuffled; state grows with admitted survivors only. Pass
    * `layout = BandedIndex()` for the operating point this sink actually
    * targets — a small per-trigger batch against a huge accumulated
    * index — where the candidate lookup prunes to the batch's own band
    * partitions instead of re-scanning N signature rows every trigger.
    */
  def incrementalDedupSink(docs: DataFrame, indexRoot: String,
      checkpointDir: String, minJaccard: Double = 1.0,
      textCol: String = "text", idCol: String = "doc_id",
      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      requireMonotoneIds: Boolean = true,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      layout: graft.llm.IncrementalDedup.IndexLayout =
        graft.llm.IncrementalDedup.FlatIndex)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // no isEmpty pre-probe: addDelivery detects emptiness on the
        // one aggregate it runs anyway and returns without committing
        graft.llm.IncrementalDedup.addDelivery(batch, indexRoot,
          minJaccard, textCol, idCol, shingleN, bands, rowsPerBand,
          requireMonotoneIds, deliveryTag = Some(f"batch-$batchId%09d"),
          layout = layout)
        ()
      }
      .start()

  /** Streaming twin of [[graft.llm.Similarity.ivfAppendIndex]] — the
    * index-maintenance story [[incrementalDedupSink]] gives the dedup
    * index, for the ANN index: each micro-batch of (id, vector) rows is
    * assigned against the index's FROZEN quantizer and appended under
    * its live `cid=` cells, so the stream-maintained index serves
    * [[graft.llm.Similarity.ivfSearchIndex]] queries identically to a
    * full rebuild over everything ever delivered (the
    * `x_cosine_ann_ivf_append` twin contract, continuously).
    *
    * Exactly-once admission: the micro-batch id tags the append
    * ([[graft.llm.Similarity.ivfAppendIndexTagged]] — staged write,
    * move-list, ledger commit), so a replayed batch after recovery is a
    * no-op and a crashed attempt is reclaimed file-exactly before the
    * retry. Scale shape per trigger: O(batch) assignment against
    * broadcast centroids, one file per touched cell, resident cells
    * never read or rewritten — the maintenance cost a 24/7 embedding
    * intake against a 100 TB index can actually pay.
    */
  def ivfAppendSink(vecs: DataFrame,
      quantizer: graft.llm.IvfQuantizer, indexPath: String,
      checkpointDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Similarity.ivfAppendIndexTagged(batch, quantizer,
          indexPath, f"batch-$batchId%09d", idCol, vecCol)
        ()
      }
      .start()

  def ivfAppendSink(vecs: DataFrame, centroids: Seq[Seq[Double]],
      indexPath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ivfAppendSink(vecs, graft.llm.IvfQuantizer(centroids),
      indexPath, checkpointDir)

  /** [[ivfAppendSink]] for an IVF-PQ index: same exactly-once tagged
    * staged commit, with the PQ assignment (frozen coarse quantizer +
    * frozen codebooks) — completing stream-maintainability across both
    * ANN index variants.
    */
  def ivfPqAppendSink(vecs: DataFrame,
      quantizer: graft.llm.IvfQuantizer,
      codebooks: Seq[Seq[Seq[Double]]], indexPath: String,
      checkpointDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Similarity.ivfPqAppendIndexTagged(batch, quantizer,
          codebooks, indexPath, f"batch-$batchId%09d", idCol, vecCol)
        ()
      }
      .start()

  /** Drift-tolerant streaming intake over per-generation delivery
    * directories: one file stream per generation (each pinned to its
    * generation's physical schema — a streaming scan needs an explicit
    * schema and cannot infer per file), conformed to the canonical
    * schema and unioned. The streaming twin of
    * [[graft.ingest.SchemaDrift.readConformed]]: a backfill replaying
    * three years of deliveries through the intake hits every historical
    * schema generation, and the conform projection is stateless, so it
    * composes with watermarks/dedup downstream exactly like any map.
    */
  def conformedIntake(spark: org.apache.spark.sql.SparkSession,
      generations: Seq[(String, String)], // (path, that generation's DDL)
      canonical: org.apache.spark.sql.types.StructType): DataFrame = {
    require(generations.nonEmpty, "conformedIntake needs a generation")
    generations.map { case (path, ddl) =>
      graft.ingest.SchemaDrift.conformTo(
        spark.readStream.schema(ddl).parquet(path), canonical)
    }.reduce(_.unionByName(_))
  }
}
