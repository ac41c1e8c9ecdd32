package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every table is a single parquet file per scale-factor directory; schemas
  * are fixed by the generator, so we read without inference or casts and let
  * Catalyst push projection/predicates into the scan. At cluster scale the
  * same loaders work over a directory of many parquet parts.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * sessions set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[Sessions]]) so it arrives as a nanosecond LongType. Normalize to
    * `ord_us` (epoch micros, exact integer floor-division — a double-based
    * conversion would lose precision above 2^53) plus a real TimestampType
    * `ts` for event-time operators. Matches DuckDB's `epoch_us(ts)` exactly.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTime(load(spark, sfDir, "events"))

  /** Shared ord_us/ts normalization for the two event loaders. */
  private def normalizeEventTime(raw: DataFrame): DataFrame = {
    val withOrd =
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ord_us", expr("ts div 1000"))
      else raw.withColumn("ord_us", unix_micros(col("ts")))
    withOrd.withColumn("ts", timestamp_micros(col("ord_us")))
  }
  /** Events restricted to `ord_us` in [loUs, hiUs), with the predicate
    * applied to the RAW `ts` column so it reaches the parquet scan as a
    * pushed filter (row-group pruning — the difference between skipping
    * and reading a 100 TB table for a narrow date range). A filter on the
    * derived `ord_us` cannot push past its own projection; the raw-column
    * range is exactly equivalent: for non-negative nanos,
    * ts div 1000 >= lo  <=>  ts >= lo*1000, and likewise for the upper
    * bound. PlanPostureSpec asserts the pushdown.
    */
  def eventsInRange(spark: SparkSession, sfDir: String, loUs: Long, hiUs: Long): DataFrame = {
    val raw = load(spark, sfDir, "events")
    // Bounds past Long.MaxValue/1000 cannot be converted to nanos without
    // overflow (a Long.MaxValue "no upper bound" sentinel would wrap
    // negative and match nothing); they are exactly "no events" below and
    // "no cutoff" above, so degenerate to constant predicates instead.
    val maxUs = Long.MaxValue / 1000L
    val restricted =
      if (raw.schema("ts").dataType == LongType) {
        val loPred = if (loUs > maxUs) lit(false) else col("ts") >= loUs * 1000L
        val hiPred = if (hiUs > maxUs) lit(true) else col("ts") < hiUs * 1000L
        raw.filter(loPred && hiPred)
      } else
        raw.filter(
          col("ts") >= timestamp_micros(lit(loUs)) && col("ts") < timestamp_micros(lit(hiUs)))
    normalizeEventTime(restricted)
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
