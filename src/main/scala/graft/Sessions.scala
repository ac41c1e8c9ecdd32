package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for the engine.
  *
  * Centralizes the settings every entrypoint (Verify, Bench, tests) needs:
  *   - `nanosAsLong`: the testdata `events.ts` column is parquet
  *     TIMESTAMP(NANOS), which Spark 4 otherwise refuses to read;
  *   - shuffle partitions sized to the local core count (not 200) — on a
  *     real cluster this would be executors × cores with AQE coalescing;
  *   - AQE on: runtime shuffle coalescing, skew-join splitting;
  *   - UTC session timezone for oracle parity.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The generator writes tz-naive parquet timestamps (isAdjustedToUTC =
      // false); Spark 4 would infer TIMESTAMP_NTZ, which unix_micros and
      // timestamp comparisons against LTZ literals reject. Read them as the
      // session-UTC TimestampType instead — identical instants to DuckDB's
      // naive reading because the session timezone is pinned to UTC above.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
