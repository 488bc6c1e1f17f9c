package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.roundDet

/** Corpus-level statistical language modeling for quality scoring: a
  * unigram LM fit on the corpus itself, scoring each document by its mean
  * token log-probability (the classic perplexity-proxy quality signal —
  * documents full of rare/garbage tokens score low, fluent text scores
  * high).
  *
  * Scale design (100 TB): two shuffles — one on `word` to build the
  * frequency table and score tokens (both sides partial-aggregate
  * map-side), one on the document id for the per-document mean. The
  * corpus-total token count is a one-row aggregate cross-joined in (a
  * broadcast of a single scalar, not a driver collect). At the extreme
  * scale the word join can be cut to a broadcast of the top-K vocabulary
  * with an out-of-vocabulary floor probability; that swap changes scores
  * only for tail tokens and keeps the whole scorer map-side.
  */
object LanguageModel {

  /** Per-document mean unigram log-probability (natural log), rounded to
    * 4 decimals: avg over token OCCURRENCES (repeats count) of
    * ln(count(word) / total_tokens) under the corpus's own empirical
    * unigram distribution.
    */
  def unigramLogProb(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("word"))
    val freq = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    toks.join(freq, Seq("word"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(roundDet(
        avg(log(col("cnt").cast("double") / col("total").cast("double"))), 4)
        .as("avg_logp"))
  }
}
