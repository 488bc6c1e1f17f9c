package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking for LLM training-data preparation: split each
  * document's token stream into fixed-size chunks on a sliding window so
  * every token lands in at least one chunk and consecutive chunks overlap
  * by `chunkTokens - strideTokens` tokens (the standard long-document →
  * context-window preprocessing step).
  *
  * Scale design (100 TB): chunk starts are generated per row with
  * `sequence` + `posexplode` — a map-side Generate with no shuffle; the
  * fan-out per document is ceil(n_tokens / stride), bounded and
  * proportional to output size. Chunk text hashes (not bodies) are what
  * downstream dedup shuffles.
  */
object Chunking {

  /** One row per (document, chunk): 0-based `chunk_idx`, the token offset
    * `chunk_start`, the actual `n_chunk_tokens` (the final chunk may be
    * short), and `chunk_hash` (md5 of the space-joined chunk tokens — the
    * dedup/provenance key).
    *
    * Chunk starts are the multiples of `strideTokens` below the document
    * token count, so a document shorter than one chunk still yields its
    * single (possibly short) chunk.
    */
  def slidingChunks(df: DataFrame, chunkTokens: Int = 64,
      strideTokens: Int = 48, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      "strideTokens must be in [1, chunkTokens]")
    df.select(col(idCol), split(col(textCol), " ").as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .select(col(idCol), col("_toks"), col("_n"),
        posexplode(sequence(lit(0), greatest(col("_n") - 1, lit(0)),
          lit(strideTokens))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("chunk_start"),
        least(lit(chunkTokens), col("_n") - col("col")).cast("long")
          .as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("_toks"), col("col") + 1,
          lit(chunkTokens)))).as("chunk_hash"))
  }
}
