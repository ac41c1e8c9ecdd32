package graft.operators

import graft.sources.Csv
import graft.store.OnlineFeatureStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's batch aggregation job end-to-end (SURVEY.md §3.1;
  * `notebooks/2_batch_ingestion.ipynb:345-357`): scan -> trailing 10-min +
  * 1-week window aggregates + ratio features -> (a) training-set export,
  * (b) latest-per-key compaction upserted into the online store.
  *
  * Deliberate improvements over the reference (SURVEY §4):
  *   - the aggregate plan is cached once and feeds BOTH consumers (the
  *     reference recomputed the whole plan for the rank pass);
  *   - no driver `collect()` on the aggregate path; the store upsert is the
  *     single serving-boundary hop, fed by the already-compacted
  *     latest-per-key rows (|keys|, not |events|).
  */
object FeatureAggJob {

  case class Result(aggregates: DataFrame, snapshot: DataFrame)

  /** Run the pipeline over a typed events frame with columns
    * (key, ts, amount) where ts is TimestampType.
    */
  def run(
      events: DataFrame,
      key: String,
      ts: String,
      amount: String,
      store: OnlineFeatureStore,
      trainingCsvPath: Option[String] = None): Result = {
    val agg = TrailingWindows
      .ratioFeatures(
        TrailingWindows
          .aggregates(events, key, ts, amount, Seq("10m" -> 600L, "1w" -> 604800L))
          .withColumnRenamed("cnt_10m", "num_trans_last_10m")
          .withColumnRenamed("avg_10m", "avg_amt_last_10m")
          .withColumnRenamed("cnt_1w", "num_trans_last_1w")
          .withColumnRenamed("avg_1w", "avg_amt_last_1w"),
        amount,
        "avg_amt_last_10m",
        "avg_amt_last_1w",
        "num_trans_last_10m",
        "num_trans_last_1w")
      .cache()

    trainingCsvPath.foreach { p =>
      Csv.writeSingleFile(
        agg.select(
          col(key),
          col(amount),
          col("num_trans_last_10m"),
          col("avg_amt_last_10m"),
          col("num_trans_last_1w"),
          col("avg_amt_last_1w"),
          col("amt_ratio1"),
          col("amt_ratio2"),
          col("count_ratio")),
        p)
    }

    // P7: null-key guard before the store upsert (reference `if cc_num:`)
    val snapshot = LatestPerKey
      .denseRankLatest(agg.filter(col(key).isNotNull), col(key), TrailingWindows.ordMicros(col(ts)))
      .select(
        col(key).as("key"),
        TrailingWindows.ordMicros(col(ts)).as("event_time_us"),
        col("num_trans_last_1w").cast("double").as("cnt_1w"),
        col("avg_amt_last_1w").as("avg_1w"))
      .distinct()

    store.upsertBatch(snapshot)
    Result(agg, snapshot)
  }
}
