package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier, LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine fraud scorer (SURVEY.md §2.8/§3.4): the reference trains
  * XGBoost `binary:logistic` on `(fraud_label, amount, amt_ratio1,
  * amt_ratio2, count_ratio)` (`notebooks/3_train_and_deploy_model
  * .ipynb:145-188`) and serves it from an endpoint. Both MLlib analogs are
  * provided, trained and served inside the engine (no per-event RPC):
  *
  *   - [[trainGbt]] — `GBTClassifier`, the structural analog of the
  *     reference's gradient-boosted trees, with its published
  *     hyperparameters mapped onto MLlib's names (max_depth 5 ->
  *     maxDepth, eta 0.2 -> stepSize, subsample 0.7 -> subsamplingRate;
  *     the 100-round count is configurable, defaulting lower because an
  *     in-engine scorer retrains per pipeline run);
  *   - [[train]] — `LogisticRegression`, the deterministic fallback (LBFGS
  *     needs no seed), kept because the behavioral contract is testable
  *     without tree-ensemble variance.
  *
  * Both serve through the same [[score]] (threshold classifier F10).
  */
object FraudModel {

  val FeatureCols: Seq[String] = Seq("amount", "amt_ratio1", "amt_ratio2", "count_ratio")
  val LabelCol = "fraud_label"

  private def assembler = new VectorAssembler()
    .setInputCols(FeatureCols.toArray)
    .setOutputCol("features")

  def train(labeled: DataFrame): LogisticRegressionModel = {
    val lr = new LogisticRegression()
      .setLabelCol(LabelCol)
      .setFeaturesCol("features")
      .setMaxIter(50)
      .setRegParam(0.01)
    lr.fit(assembler.transform(labeled))
  }

  /** Gradient-boosted trees matching the reference's XGBoost role
    * (hyperparameter map in the class doc; seeded so runs are
    * reproducible).
    */
  def trainGbt(labeled: DataFrame, trees: Int = 25): GBTClassificationModel = {
    val gbt = new GBTClassifier()
      .setLabelCol(LabelCol)
      .setFeaturesCol("features")
      .setMaxDepth(5)
      .setStepSize(0.2)
      .setSubsamplingRate(0.7)
      .setMaxIter(trees)
      .setSeed(123L)
    gbt.fit(assembler.transform(labeled))
  }

  /** Adds `probability_fraud` and the thresholded label (F10). Works for
    * any probabilistic MLlib classifier over the same feature vector (LR
    * and GBT here). The probability extraction is the built-in
    * `vector_to_array` (codegen-friendly), not a Scala UDF — keeps the
    * scoring projection inside whole-stage codegen.
    */
  def score(model: Transformer, df: DataFrame, threshold: Double = 0.25): DataFrame = {
    model
      .transform(assembler.transform(df))
      .withColumn(
        "probability_fraud",
        org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1))
      .withColumn(
        "prediction_label",
        when(col("probability_fraud") > threshold, lit("FRAUD")).otherwise(lit("NOT FRAUD")))
      .drop("features", "rawPrediction", "probability", "prediction")
  }
}
