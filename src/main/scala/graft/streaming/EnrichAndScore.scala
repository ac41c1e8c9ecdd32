package graft.streaming

import graft.operators.ServingJoin
import graft.store.OnlineFeatureStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online inference path (SURVEY.md §3.3; reference
  * `src/lambda/InvokeFraudEndpointLambda/lambda_function.py:44-329`):
  * per event, point-lookup the streaming (10 m) and batch (1 w) feature
  * groups, derive guarded ratios, score, threshold.
  *
  * The reference scores with an external XGBoost endpoint; in-engine we use
  * a deterministic rule scorer driven by count_ratio — the feature the
  * reference's own behavioral smoke test pivots on (0.30 flips fraud vs
  * 0.06, `notebooks/3_train_and_deploy_model.ipynb:286-301`).
  */
object EnrichAndScore {

  val FraudThreshold = 0.25 // reference template threshold
  val CutoffUs: Long = 600L * 1000000L // staleness gate, 600 s

  case class Features(
      amount: Double,
      amtRatio1: Double,
      amtRatio2: Double,
      countRatio: Double)

  case class Scored(userId: Long, ordUs: Long, probability: Double, label: String)

  /** Reference `lookup_features` + `get_ratios`: zero-fill on miss, zero
    * ratios when the streaming aggregate is older than the cutoff.
    */
  def lookupFeatures(
      streamStore: OnlineFeatureStore, // features: cnt_10m, avg_10m
      batchStore: OnlineFeatureStore, // features: cnt_1w, avg_1w
      userId: Long,
      amount: Double,
      nowUs: Long): Features = {
    val stream = streamStore.get(userId)
    val fresh = stream.exists { case (t, _) => nowUs - t <= CutoffUs }
    val batch = if (fresh) batchStore.get(userId) else None
    (stream, batch) match {
      case (Some((_, s)), Some((_, b))) if b(1) > 0 && b(0) > 0 =>
        Features(amount, s(1) / b(1), amount / b(1), s(0) / b(0))
      case _ => Features(amount, 0.0, 0.0, 0.0)
    }
  }

  /** Deterministic rule scorer standing in for the XGBoost endpoint. */
  def probability(f: Features): Double =
    math.min(1.0, f.countRatio * 2.5)

  def label(prob: Double): String =
    if (prob > FraudThreshold) "FRAUD" else "NOT FRAUD"

  /** Distributed form of the inference path (SURVEY §3.3 "our
    * lifecycle"): works identically on a batch frame or a streaming
    * DataFrame via a stream-static broadcast join against the store
    * snapshot — the whole enrichment+scoring runs as ONE Spark query
    * with no per-event RPC.
    *
    * @param events   frame with (key, valueCol) columns
    * @param snapshot latest-per-key features in ServingJoin's contract
    *                 (key, snap_ts_us, cnt_short/avg_short/cnt_long/avg_long)
    */
  def scoreFrame(
      events: DataFrame,
      snapshot: DataFrame,
      key: String,
      valueCol: String,
      nowUs: Column): DataFrame =
    ServingJoin
      .enrich(events, snapshot, key, valueCol, nowUs, CutoffSecs)
      .withColumn("probability", least(lit(1.0), col("count_ratio") * lit(2.5)))
      .withColumn("label", ServingJoin.thresholdLabel(col("probability"), FraudThreshold))

  val CutoffSecs: Long = 600L

  /** Score one event end-to-end (the lambda body). */
  def score(
      streamStore: OnlineFeatureStore,
      batchStore: OnlineFeatureStore,
      userId: Long,
      ordUs: Long,
      amount: Double,
      nowUs: Long): Option[Scored] =
    // reference skips the record entirely when the streaming aggregate is
    // missing (lambda_function.py:76-77)
    streamStore.get(userId).map { _ =>
      val f = lookupFeatures(streamStore, batchStore, userId, amount, nowUs)
      val p = probability(f)
      Scored(userId, ordUs, p, label(p))
    }
}
