package graft.llm

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained quality classifier: distills the heuristic quality-signal
  * family (Gopher rules, stop-word density, compressibility) into one
  * smooth logistic score — the "quality classifier" stage of
  * large-scale curation pipelines (GPT-3 appendix A / LLaMA: fit a
  * linear model on weakly-labeled reference-vs-crawl text, keep
  * documents by predicted quality), on Spark ML instead of fastText.
  *
  * Scale design: featurization is one codegen'd projection (the same
  * expressions the heuristic gates use — no shuffle); training is
  * LBFGS logistic regression, one treeAggregate over the feature table
  * per iteration with driver state bounded by the coefficient vector;
  * scoring broadcasts those coefficients and is map-only. The
  * production lifecycle is train-offline-once, score-everywhere — the
  * gate memoizes the fitted model per corpus exactly like the IVF
  * quantizer. Deterministic: no sampling anywhere, and a fixed input
  * yields a fixed partitioning, so refits reproduce bit-identically.
  */
object QualityModel {

  /** Feature family: every signal is a codegen'd map expression. */
  val FeatureCols: Seq[String] = Seq("log_n_words", "mean_word_len",
    "symbol_ratio", "alpha_word_frac", "n_stop_hits", "stopword_ratio",
    "compression_ratio")

  /** Numeric feature table (single projection; no shuffle). */
  def featurize(df: DataFrame, textCol: String = "text"): DataFrame =
    TextAnalysis.gopherFlags(TextAnalysis.textStats(df, textCol), textCol)
      .withColumn("log_n_words", log1p(col("n_words").cast("double")))
      .withColumn("n_stop_hits", col("n_stop_hits").cast("double"))
      .withColumn("compression_ratio",
        TextAnalysis.compressionRatio(col(textCol)))

  private def assemble(features: DataFrame): DataFrame =
    new VectorAssembler().setInputCols(FeatureCols.toArray)
      .setOutputCol("features").transform(features)

  /** Fit on a weakly-labeled feature table (`labelCol` in {0.0, 1.0};
    * rows must already be [[featurize]]d). L2-regularized so blatant
    * linear separability cannot push coefficients to infinity.
    */
  def train(labeled: DataFrame, labelCol: String = "label",
      maxIter: Int = 25, reg: Double = 0.01): LogisticRegressionModel =
    new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(reg).setStandardization(true)
      .fit(assemble(labeled))

  /** Map-only scoring: appends `quality_prob` = P(quality = 1). */
  def score(model: LogisticRegressionModel, df: DataFrame,
      textCol: String = "text"): DataFrame =
    model.transform(assemble(featurize(df, textCol)))
      .withColumn("quality_prob",
        vector_to_array(col("probability")).getItem(1))
      .drop("features", "rawPrediction", "probability", "prediction")
}
