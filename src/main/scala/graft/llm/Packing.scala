package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences — the step between curation and tokenization in a
  * pretraining pipeline.
  *
  * Strategy is streaming first-fit in id order WITHIN each `byCol` group
  * (source/shard — the natural write partition): a running token total
  * per group, `seq_id = floor(exclusive-cumsum / budget)`. Deterministic,
  * one window over the group's natural partitioning — never a global
  * sort. At 100 TB `byCol` is the ingest shard, so the window's shuffle
  * is the same partitioning the data already has on disk (bucketed
  * layout makes it shuffle-free).
  */
object Packing {

  def packSequences(df: DataFrame, budgetTokens: Long,
      byCol: String = "source", idCol: String = "doc_id",
      nTokensCol: String = "n_tokens"): DataFrame = {
    // `div 0` would silently NULL every seq_id instead of failing
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val w = Window.partitionBy(byCol).orderBy(idCol)
    df.withColumn("cum_tokens", sum(col(nTokensCol)).over(w))
      // exclusive cumsum: a document starts the sequence its own tokens
      // begin in; `div` keeps the arithmetic integral end-to-end
      .withColumn("seq_id",
        expr(s"(cum_tokens - $nTokensCol) div ${budgetTokens}L"))
  }
}
