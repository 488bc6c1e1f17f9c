package graft

import org.apache.spark.sql.functions._
import graft.llm.QualityModel

/** Trained quality classifier: featurization, fit, and separation. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val prose = "the data we have with that and this system will " +
    "keep improving because the work is careful and honest over time"
  private val junk = ("## #### " * 12).trim

  private lazy val labeled = QualityModel.featurize(
    (0 until 30).map(i => (i.toLong, s"$prose v$i", 1.0)).toDF("doc_id", "text", "label")
      .union((0 until 30).map(i => (100L + i, s"$junk $i", 0.0))
        .toDF("doc_id", "text", "label")))

  test("featurize emits the full numeric signal family") {
    val row = QualityModel.featurize(Seq((1L, prose)).toDF("doc_id", "text"))
      .select(QualityModel.FeatureCols.map(col): _*).head()
    QualityModel.FeatureCols.indices.foreach(i => assert(!row.isNullAt(i)))
    assert(row.getAs[Double]("alpha_word_frac") == 1.0)
  }

  test("fitted model separates held-out junk from held-out prose") {
    val model = QualityModel.train(labeled)
    assert(model.coefficients.size == QualityModel.FeatureCols.size)
    val eval = Seq(
      (1000L, "%% !! %% !! %% !! %% !! %% !! %% !! %% !! %% !! 7"),
      (1001L, "we should note that the results of this honest analysis " +
        "will be read by the whole team because the work matters"))
      .toDF("doc_id", "text")
    val probs = QualityModel.score(model, eval).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_prob"))
      .toMap
    assert(probs(1000L) < 0.5, s"junk scored ${probs(1000L)}")
    assert(probs(1001L) > 0.5, s"prose scored ${probs(1001L)}")
  }

  test("scoring is map-only: no exchange in the physical plan") {
    val model = QualityModel.train(labeled)
    val plan = QualityModel.score(model,
      Seq((1L, prose)).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
