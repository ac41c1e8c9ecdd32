package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine fraud scorer (SURVEY.md §2.8/§3.4): the reference trains
  * XGBoost on `(fraud_label, amount, amt_ratio1, amt_ratio2, count_ratio)`
  * (`notebooks/3_train_and_deploy_model.ipynb:145-188`) and serves it from
  * an endpoint. BASELINE names MLlib as the Spark-native analog: a
  * VectorAssembler + LogisticRegression pipeline over the same feature
  * vector, trained and served inside the engine (no per-event RPC).
  *
  * LBFGS logistic regression is deterministic for a fixed dataset, so the
  * behavioral contract from the reference's smoke test (count_ratio 0.30
  * scores fraud-high vs 0.06 low) is testable without seeds.
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

  /** Adds `probability_fraud` and the thresholded label (F10). */
  def score(model: LogisticRegressionModel, df: DataFrame, threshold: Double = 0.25): DataFrame = {
    val probOf = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model
      .transform(assembler.transform(df))
      .withColumn("probability_fraud", probOf(col("probability")))
      .withColumn(
        "prediction_label",
        when(col("probability_fraud") > threshold, lit("FRAUD")).otherwise(lit("NOT FRAUD")))
      .drop("features", "rawPrediction", "probability", "prediction")
  }
}
