package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — the tumbling/session rollups of
  * Structured Streaming, written once for BOTH planes: `withWatermark`
  * is a no-op on a batch frame, so the identical function serves the
  * batch gate (w8) and the streaming parity spec. In a stream, append
  * mode emits a window only after the watermark passes its end, and an
  * event later than the watermark is dropped — the standard bounded-state
  * contract (state held per open window, never per event).
  *
  * Window starts are emitted as epoch micros. For tumbling windows
  * `window(ts, w)` aligns to the epoch, so `win_start_us` equals the pure
  * integer `ord_us - ord_us % windowUs` — which is exactly how the DuckDB
  * oracle reproduces it (no timestamp types cross the gate boundary).
  */
object WindowedAgg {

  /** Tumbling per-(window, key) count/sum. Batch or streaming frame in;
    * (win_start_us, key, n_events, sum_<valueCol>) out.
    */
  def tumblingRollup(
      events: DataFrame,
      tsUsCol: String,
      keyCol: String,
      valueCol: String,
      windowSecs: Long,
      watermarkSecs: Long): DataFrame =
    events
      .withColumn("__ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("__ts", s"$watermarkSecs seconds")
      .groupBy(window(col("__ts"), s"$windowSecs seconds").as("__w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as(s"sum_$valueCol"))
      .select(
        unix_micros(col("__w.start")).as("win_start_us"),
        col(keyCol),
        col("n_events"),
        col(s"sum_$valueCol"))

  /** Sliding (hopping) per-(window, key) count/sum: windows of
    * `windowSecs` every `slideSecs`, epoch-aligned, so each event lands
    * in windowSecs/slideSecs windows. Same dual-plane contract as
    * [[tumblingRollup]]; the oracle reproduces membership with an
    * integer offset explode ((t div s - i) * s for i < w/s).
    */
  def slidingRollup(
      events: DataFrame,
      tsUsCol: String,
      keyCol: String,
      valueCol: String,
      windowSecs: Long,
      slideSecs: Long,
      watermarkSecs: Long): DataFrame =
    events
      .withColumn("__ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("__ts", s"$watermarkSecs seconds")
      .groupBy(
        window(col("__ts"), s"$windowSecs seconds", s"$slideSecs seconds").as("__w"),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as(s"sum_$valueCol"))
      .select(
        unix_micros(col("__w.start")).as("win_start_us"),
        col(keyCol),
        col("n_events"),
        col(s"sum_$valueCol"))

  /** Gap-based session windows via the native `session_window` grouping —
    * the streaming-capable twin of [[graft.operators.Sessionize]] (whose
    * window-function form is batch-only): per (key, session) count, span
    * and exact-integer sum, with watermark-bounded state in a stream.
    * The two forms are equivalence-tested in WindowedAggSpec; start/end
    * are emitted as epoch micros like every gate timestamp.
    *
    * One semantic note: `session_window`'s end is `last event + gap`
    * (the window extent); Sessionize reports the LAST EVENT time. The
    * output here subtracts the gap back out so both forms share one
    * contract (end_us = last event, span = last - first).
    */
  def sessionRollup(
      events: DataFrame,
      tsUsCol: String,
      keyCol: String,
      valueCol: String,
      gapSecs: Long,
      watermarkSecs: Long): DataFrame =
    events
      .withColumn("__ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("__ts", s"$watermarkSecs seconds")
      .groupBy(session_window(col("__ts"), s"$gapSecs seconds").as("__w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as(s"sum_$valueCol"))
      .select(
        col(keyCol),
        unix_micros(col("__w.start")).as("start_us"),
        (unix_micros(col("__w.end")) - gapSecs * 1000000L).as("end_us"),
        col("n_events"),
        col(s"sum_$valueCol"))
}
