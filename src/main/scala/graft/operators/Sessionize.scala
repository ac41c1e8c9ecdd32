package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of a key belong to one
  * session while the inter-event gap stays <= `gapUs`; a larger gap starts
  * a new session. The classic training-data shape for behavioral features
  * (session length, spend-per-session) and for grouping documents/events
  * into context windows.
  *
  * Plan shape: two Window nodes — `lag` to flag session starts, then a
  * running `sum` of the flags to number sessions — over the SAME
  * (partitionBy key, orderBy ts) spec, so Catalyst plans ONE hash exchange
  * and ONE sort for both layers (same sharing the trailing-window operators
  * rely on). The optional rollup adds the usual hash aggregate. At cluster
  * scale this is exactly one shuffle of the events by key.
  *
  * Tie semantics: rows with equal (key, ts) always land in the same
  * session. Which tie row carries the `is_new` flag is engine-dependent,
  * but the running sum is identical at every tie row (the flag contributes
  * to all of them or none downstream of the tie group), so `session_idx`
  * per ROW is deterministic and the DuckDB oracle matches bit-for-bit.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key, in time order). */
  def sessionIndex(df: DataFrame, key: String, tsUs: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsUs))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsUs), 1).over(w)
    df.withColumn(
        "is_new",
        when(prev.isNull || col(tsUs) - prev > gapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_idx", sum(col("is_new")).over(run))
      .drop("is_new")
  }

  /** One row per (key, session): event count, start/end/span, and an exact
    * integer sum of `valueCol` (order-independent, hence oracle-safe).
    */
  def sessionRollup(
      df: DataFrame,
      key: String,
      tsUs: String,
      gapUs: Long,
      valueCol: String): DataFrame =
    sessionIndex(df, key, tsUs, gapUs)
      .groupBy(col(key), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUs)).as("start_us"),
        max(col(tsUs)).as("end_us"),
        (max(col(tsUs)) - min(col(tsUs))).as("span_us"),
        sum(col(valueCol)).as(s"sum_$valueCol"))
}
