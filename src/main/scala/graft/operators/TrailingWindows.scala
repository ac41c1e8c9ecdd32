package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Trailing event-time RANGE window aggregates.
  *
  * Reproduces the reference's core batch computation (SURVEY.md §2.4 W1–W4;
  * reference `notebooks/2_batch_ingestion.ipynb:270-287`): per-key trailing
  * windows `[t - horizon, t]` evaluated at every row, where the frame is a
  * RANGE frame over event time — ties at the same timestamp are included,
  * and the current row always contributes (count >= 1).
  *
  * Scale notes:
  *   - All frames over the same (key, order) share ONE Exchange + Sort in
  *     Catalyst; adding more horizons is free of extra shuffles.
  *   - Event time is ordered on epoch MICROseconds (`unix_micros`) rather
  *     than a timestamp column: integer range frames behave identically
  *     across engines and avoid interval-literal dialect differences
  *     (SURVEY.md §7.4 risk 2).
  *   - Window functions stream within a sorted partition; memory is bounded
  *     by the frame width per key, not the partition size, so this holds at
  *     100 TB provided keys are not pathologically hot (then: pre-aggregate
  *     per (key, second) first, or salt).
  */
object TrailingWindows {

  /** Event-time ordering column: epoch microseconds. */
  def ordMicros(ts: Column): Column = unix_micros(ts)

  /** RANGE window [t - seconds, t] per key, ordered by epoch micros. */
  def trailing(key: Column, ordUs: Column, seconds: Long): WindowSpec =
    Window
      .partitionBy(key)
      .orderBy(ordUs)
      .rangeBetween(-seconds * 1000000L, Window.currentRow)

  /** Adds `cnt_<name>`, `sum_<name>`, `avg_<name>` per horizon.
    *
    * @param horizons (name, trailingSeconds) pairs, e.g. Seq(("10m", 600), ("1w", 604800))
    */
  def aggregates(
      df: DataFrame,
      key: String,
      ts: String,
      value: String,
      horizons: Seq[(String, Long)]): DataFrame = {
    // One select carrying every window expression: sequential withColumn
    // calls would mint a fresh ordering alias per aggregate and stack one
    // Window+Sort pair per column (4 sorts for 2 horizons). In a single
    // projection Catalyst groups identical (partition, order, frame) specs
    // into one Window node per frame over ONE shared sort.
    val withOrd = df.withColumn("__ord_us", ordMicros(col(ts)))
    val aggCols = horizons.flatMap { case (name, secs) =>
      val w = trailing(col(key), col("__ord_us"), secs)
      Seq(
        count(lit(1)).over(w).as(s"cnt_$name"),
        sum(col(value)).over(w).as(s"sum_$name"),
        avg(col(value)).over(w).as(s"avg_$name"))
    }
    withOrd.select(col("*") +: aggCols: _*).drop("__ord_us")
  }

  /** Ratio feature projection (SURVEY.md §2.2 P1, reference
    * `notebooks/2_batch_ingestion.ipynb:271-274`). Batch side has NO
    * zero-denominator guard by design: the trailing frame always includes
    * the current row, so counts >= 1 and averages > 0 for positive amounts
    * (SURVEY.md §2.6 F1). The serving-side guard lives in ServingJoin.
    */
  def ratioFeatures(
      df: DataFrame,
      value: String,
      shortAvg: String,
      longAvg: String,
      shortCnt: String,
      longCnt: String): DataFrame =
    df.withColumn("amt_ratio1", col(shortAvg) / col(longAvg))
      .withColumn("amt_ratio2", col(value) / col(longAvg))
      .withColumn("count_ratio", col(shortCnt) / col(longCnt))
}
