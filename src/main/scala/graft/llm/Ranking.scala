package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus keyword retrieval — BM25 (Robertson/Spärck Jones, the public
  * Okapi formula), the scoring a curation pipeline runs to pull
  * topical slices out of a crawl ("find the k docs most about X")
  * without an embedding index.
  *
  * Scale shape: per-doc lengths are a map-side projection (no
  * explode); the exploded token stream is filtered to the QUERY terms
  * BEFORE any aggregation, so the one tf shuffle carries only matching
  * (doc, term) rows — ∝ hits, not corpus; document frequencies reduce
  * to ≤|terms| driver-held rows (bounded config state, like the IVF
  * centroids); and the final cut is a TakeOrdered top-k — O(k) partial
  * state per task, never a global sort.
  *
  * Cross-engine determinism (the oracle hash-compares): the one
  * transcendental (idf's ln) is quantized to 1e-9 integer units on the
  * driver; every remaining factor is IEEE +,*,/ over identical inputs
  * (correctly-rounded in any engine), and the per-doc SUM over terms
  * is taken in integer micro-units — the protocol that keeps
  * order-dependent double addition out of compared results.
  */
object Ranking {

  /** Top `k` documents by BM25 over whitespace tokens for `queryTerms`.
    * Output: (doc_id, score_u) — score in integer micro-units,
    * descending, ties to the smaller id.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0)
    val lens = docs.select(col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("dl"))
    // N and total length: two driver longs, one aggregate
    val stats = lens.agg(count(lit(1)), sum(col("dl"))).head()
    val n = stats.getLong(0)
    require(n > 0, "empty corpus")
    val totalLen = stats.getLong(1)
    val avgdl = totalLen.toDouble / n.toDouble
    // tf over query terms only — the filter precedes the shuffle, and
    // dl rides the same projection (no corpus-wide join back to lens)
    val tf = docs.select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).cast("double").as("tf"))
    // df per term: ≤|terms| rows to the driver; idf quantized at 1e-9
    val dfByTerm = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfU = queryTerms.map { t =>
      val df = dfByTerm.getOrElse(t, 0L).toDouble
      t -> math.round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e9)
    }.toMap
    val idf = idfU.foldLeft(lit(null).cast("double")) { case (acc, (t, u)) =>
      when(col("tok") === t, lit(u.toDouble / 1e9)).otherwise(acc)
    }
    // per-(doc, term) partial score → integer micro-units → one
    // order-free BIGINT sum per doc
    val termScore = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl").cast("double") / lit(avgdl))))
    val scored = tf
      .withColumn("su", floor(termScore * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("doc_id").agg(sum(col("su")).as("score_u"))
    // global top-k: TakeOrderedAndProject (O(k) partials per task)
    scored.orderBy(col("score_u").desc, col("doc_id").asc).limit(k)
  }
}
