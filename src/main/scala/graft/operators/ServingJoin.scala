package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-enrichment lookup join with staleness cutoff and zero-fill
  * (SURVEY.md §2.3 J1/J2; reference
  * `src/lambda/InvokeFraudEndpointLambda/lambda_function.py:110-227`).
  *
  * Semantics reproduced:
  *   - left-outer point lookup of the latest per-key feature snapshot;
  *   - a missing record zero-fills every derived feature;
  *   - a snapshot older than `cutoffSeconds` relative to `now` zeroes the
  *     ratio features (`eval_cutoff_window`, cutoff 600 s);
  *   - zero-denominator guard on the serving side only (SURVEY §2.6 F1).
  *
  * Scale: the snapshot side is latest-per-key (|keys| rows, small relative
  * to the event stream) — broadcast it so enrichment is shuffle-free on the
  * event side. For snapshots too large to broadcast, drop the hint and let
  * AQE pick a shuffled hash join keyed the same as upstream aggregation.
  */
object ServingJoin {

  /** Enrich events with a feature snapshot.
    *
    * @param events        rows to enrich; must contain `key` and `valueCol`
    * @param snapshot      latest-per-key features: key, snapTsUs,
    *                      cnt_short, avg_short, cnt_long, avg_long
    * @param nowUs         evaluation wall-clock in epoch micros (Column, so
    *                      callers can inject a deterministic clock — SURVEY
    *                      §7.4 risk 6)
    * @param cutoffSeconds staleness horizon (reference: 600)
    */
  def enrich(
      events: DataFrame,
      snapshot: DataFrame,
      key: String,
      valueCol: String,
      nowUs: Column,
      cutoffSeconds: Long,
      snapTsUs: String = "snap_ts_us",
      broadcastSnapshot: Boolean = true): DataFrame = {
    val snap = if (broadcastSnapshot) broadcast(snapshot) else snapshot
    val joined = events.join(snap, Seq(key), "left_outer")

    val fresh = nowUs - col(snapTsUs) <= lit(cutoffSeconds * 1000000L)
    val avgLong = col("avg_long")
    val guard = fresh && avgLong.isNotNull && avgLong > lit(0.0)

    joined
      .withColumn("num_recent", coalesce(col("cnt_short"), lit(0L)))
      .withColumn("avg_recent", coalesce(col("avg_short"), lit(0.0)))
      .withColumn("amt_ratio1", when(guard, col("avg_short") / avgLong).otherwise(lit(0.0)))
      .withColumn("amt_ratio2", when(guard, col(valueCol) / avgLong).otherwise(lit(0.0)))
      .withColumn(
        "count_ratio",
        when(fresh && col("cnt_long").isNotNull && col("cnt_long") > 0,
          col("cnt_short") / col("cnt_long")).otherwise(lit(0.0)))
      .drop("cnt_short", "avg_short", "cnt_long", "avg_long")
  }

  /** Threshold classifier (SURVEY §2.6 F10; reference threshold 0.25). */
  def thresholdLabel(prob: Column, threshold: Double = 0.25): Column =
    when(prob > lit(threshold), lit("FRAUD")).otherwise(lit("NOT FRAUD"))
}
