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

  /** Per-document mean BIGRAM log-probability with add-k smoothing — the
    * second-order LM quality signal (KenLM-style scoring reduced to its
    * simplest public form): for each in-document bigram (w1, w2),
    *   ln( (c(w1,w2) + k) / (c(w1·) + k·V) )
    * where c(w1,w2) and c(w1·) are corpus bigram/context occurrence
    * counts and V is the distinct-word vocabulary size — the textbook
    * add-k estimator. Documents with < 2 tokens emit no bigrams and are
    * absent from the output (they carry no second-order evidence).
    *
    * Scale design: the per-occurrence bigram stream — the only
    * corpus-sized relation — is shuffled exactly ONCE, into the
    * (doc, bigram, n) aggregation; everything downstream works on that
    * much smaller distinct table. Corpus bigram counts c(w1 w2) are
    * derived from it by a second (small) aggregation rather than
    * re-scanning the corpus, context counts c(w1 ·) roll up from the
    * bigram counts, and both are pre-joined into one model table keyed
    * by bigram so the document side joins the model a single time. The
    * per-document mean over occurrences is recovered exactly as
    * sum(n·lnp)/sum(n). V is a one-row aggregate broadcast in, like
    * unigramLogProb's total. At 100 TB the model join can swap to a
    * broadcast top-K + OOV floor exactly like the unigram path.
    */
  def bigramLogProb(df: DataFrame, k: Double = 1.0,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // occurrence bigrams (NOT Dedup.shingles, which is a distinct SET —
    // an LM needs every repeat to count), pre-aggregated per (doc,
    // bigram): map-side partials collapse within-document repeats before
    // the one corpus-sized shuffle
    val docBg = df
      .filter(size(split(col(textCol), " ")) >= 2)
      .withColumn("_toks", split(col(textCol), " "))
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(_toks) - 1), " +
          "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"))
        .as("bigram"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("n"))
    // corpus model: c(w1 w2) per bigram (derived from docBg — no second
    // corpus scan), c(w1 ·) rolled up from the bigram counts, pre-joined
    // into one table so the document side joins exactly once
    val bgCounts = docBg.groupBy("bigram").agg(sum(col("n")).as("c2"))
    val ctxCounts = bgCounts
      .select(substring_index(col("bigram"), " ", 1).as("w1"), col("c2"))
      .groupBy("w1").agg(sum(col("c2")).as("c1"))
    val model = bgCounts
      .join(ctxCounts, substring_index(col("bigram"), " ", 1) === col("w1"))
      .select(col("bigram"), col("c2"), col("c1"))
    val vocab = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .agg(countDistinct(col("word")).as("v"))
    docBg
      .join(model, Seq("bigram"))
      .crossJoin(broadcast(vocab))
      .withColumn("_lnp", log(
        (col("c2").cast("double") + lit(k)) /
          (col("c1").cast("double") + lit(k) * col("v").cast("double"))))
      .groupBy(col(idCol))
      .agg(roundDet(
        sum(col("_lnp") * col("n").cast("double")) / sum(col("n")).cast("double"),
        4).as("avg_bigram_logp"))
  }
}
