package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-path transforms (SURVEY.md §3.4, §2.2 P4/P5; reference
  * `notebooks/3_train_and_deploy_model.ipynb:105-161`): event-time
  * range split with warm-up discard, label-first projection, seeded
  * random split.
  */
object TrainingSplit {

  /** Reference P4: train = (lo, hi) exclusive both ends, holdout = >= hi.
    * Rows before `lo` are the window warm-up period and appear in neither.
    */
  def dateRangeSplit(
      df: DataFrame,
      ts: Column,
      lo: String,
      hi: String): (DataFrame, DataFrame) = {
    val loTs = lit(lo).cast("timestamp")
    val hiTs = lit(hi).cast("timestamp")
    (df.filter(ts > loTs && ts < hiTs), df.filter(ts >= hiTs))
  }

  /** Reference P5: drop identifiers/raw aggregates, label first. */
  def labelFirst(df: DataFrame, label: String, features: Seq[String]): DataFrame =
    df.select((label +: features).map(col): _*)

  /** Seeded 70/30 split (reference train_test_split). */
  def randomSplit70_30(df: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(a, b) = df.randomSplit(Array(0.7, 0.3), seed)
    (a, b)
  }
}
