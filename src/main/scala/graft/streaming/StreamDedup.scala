package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact deduplication on an unbounded stream — d1's streaming twin.
  *
  * Batch-exact dedup needs unbounded state on a stream; the tractable
  * contract is dedup-within-watermark: duplicate keys arriving inside the
  * watermark horizon are dropped, and key state older than the watermark
  * is evicted, so state size is bounded by the key arrival rate times the
  * horizon rather than the stream's lifetime. That eviction bound is what
  * lets the operator run indefinitely at ingest scale — the same at-least-
  * once producers (retries, replayed partitions) that make dedup necessary
  * re-deliver within minutes, not days, so a horizon-scoped guarantee is
  * the right trade.
  */
object StreamDedup {

  /** Drop rows whose `idCols` were already seen within the watermark on
    * `tsCol` (an event-time timestamp column; `delay` e.g. "10 minutes").
    */
  def withinWatermark(events: DataFrame, tsCol: String, delay: String, idCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)
}
