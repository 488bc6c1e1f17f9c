package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus keyword retrieval — BM25 (Robertson/Spärck Jones, the public
  * Okapi formula), the scoring a curation pipeline runs to pull
  * topical slices out of a crawl ("find the k docs most about X")
  * without an embedding index.
  *
  * Scale shape: per-doc lengths ride the explode projection (no
  * corpus-wide join); the exploded token stream is filtered to the
  * QUERY terms BEFORE any aggregation, so the one tf shuffle carries
  * only matching (doc, term) rows — ∝ hits, not corpus; corpus
  * statistics reduce to ≤|terms|+1 driver-held rows in ONE tagged-union
  * job (bounded offline-trainable state, the IVF-quantizer/DSIR-table
  * lifecycle — train once, score any number of passes); and the final
  * cut is a TakeOrdered top-k — O(k) partial state per task, never a
  * global sort.
  *
  * Cross-engine determinism (the oracle hash-compares): the one
  * transcendental (idf's ln) is quantized to 1e-9 integer units on the
  * driver; every remaining factor is IEEE +,*,/ over identical inputs
  * (correctly-rounded in any engine), and the per-doc SUM over terms
  * is taken in integer micro-units — the protocol that keeps
  * order-dependent double addition out of compared results.
  */
object Ranking {

  /** Offline-trainable BM25 corpus state for a fixed term set: document
    * count, average document length, and the 1e-9-quantized idf per
    * term. Bounded by |terms| — model state, not data.
    */
  final case class Bm25Stats(n: Long, avgdl: Double, idfU: Map[String, Long])

  /** Train [[Bm25Stats]] in ONE job: the corpus aggregate (N, Σdl) and
    * the per-term document frequencies travel as a tagged union into a
    * single collect of ≤|terms|+1 rows.
    */
  def bm25Train(docs: DataFrame, queryTerms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): Bm25Stats = {
    require(queryTerms.nonEmpty, "bm25Train needs at least one query term")
    val dl = size(TextAnalysis.tokens(col(textCol))).cast("long")
    val statsSide = docs.agg(count(lit(1)).cast("long").as("c1"),
        sum(dl).as("c2"))
      .select(lit(null).cast("string").as("tok"), col("c1"), col("c2"))
    val dfSide = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy("tok").agg(countDistinct(col("doc_id")).as("c1"))
      .select(col("tok"), col("c1"), lit(0L).as("c2"))
    val rows = statsSide.unionByName(dfSide).collect()
    val (nRow, dfRows) = rows.partition(_.isNullAt(0))
    val n = nRow.head.getLong(1)
    require(n > 0, "empty corpus")
    val totalLen = nRow.head.getLong(2)
    val dfByTerm = dfRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfU = queryTerms.distinct.map { t =>
      val df = dfByTerm.getOrElse(t, 0L).toDouble
      val raw = math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e9
      // Cross-engine safety for the one transcendental: JVM Math.log is
      // not correctly rounded and neither is every libm the oracle
      // engine links, so two lns can disagree by ~1 ulp (≲ 2e-6 units
      // at this scale). Quantizing is only engine-identical when the
      // value is not sitting ON a .5 rounding boundary — assert a
      // ≥ 1e-3-unit distance (500× the worst disagreement) at train
      // time so a pathological (n, df) pair fails loudly here instead
      // of flaking a downstream hash comparison.
      val frac = math.abs(raw - math.floor(raw) - 0.5)
      require(frac > 1e-3,
        s"idf(${t}) = $raw e-9 units lands within 1e-3 of a rounding " +
          "boundary; ln implementations may disagree across engines — " +
          "pick a different term set or widen the quantum")
      t -> math.round(raw)
    }.toMap
    Bm25Stats(n, totalLen.toDouble / n.toDouble, idfU)
  }

  /** Top `k` documents by BM25 over whitespace tokens for `queryTerms`.
    * Pass pretrained `stats` to score with zero training actions (the
    * production lifecycle); omitted, they are trained inline. Output:
    * (doc_id, score_u) — score in integer micro-units, descending,
    * ties to the smaller id.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      stats: Option[Bm25Stats] = None): DataFrame = {
    require(k > 0)
    val st = stats.getOrElse(bm25Train(docs, queryTerms, idCol, textCol))
    // mismatched pretrained stats would leave uncovered terms with a
    // NULL idf (the fold's seed) and surface NULL-scored rows — fail
    // fast instead
    val uncovered = queryTerms.filterNot(st.idfU.contains)
    require(uncovered.isEmpty,
      s"stats were not trained for terms: ${uncovered.mkString(", ")}")
    // tf over query terms only — the filter precedes the shuffle, and
    // dl rides the same projection (no corpus-wide join back)
    val tf = docs.select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = st.idfU.foldLeft(lit(null).cast("double")) { case (acc, (t, u)) =>
      when(col("tok") === t, lit(u.toDouble / 1e9)).otherwise(acc)
    }
    // per-(doc, term) partial score → integer micro-units → one
    // order-free BIGINT sum per doc
    val termScore = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl").cast("double") / lit(st.avgdl))))
    val scored = tf
      .withColumn("su", floor(termScore * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("doc_id").agg(sum(col("su")).as("score_u"))
    // global top-k: TakeOrderedAndProject (O(k) partials per task)
    scored.orderBy(col("score_u").desc, col("doc_id").asc).limit(k)
  }
}
