package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching (KMV — K Minimum Values).
  *
  * The KMV estimator (Bar-Yossef et al. 2002, "Counting distinct elements
  * in a data stream") keeps the k smallest hash values per group; if the
  * kth smallest normalized hash is U(k), the distinct count is ~ (k-1) /
  * U(k), with relative error ~ 1/sqrt(k). Unlike HyperLogLog register
  * layouts (engine-specific), KMV over md5 is exactly reproducible in any
  * engine, so the sketch itself — not just a tolerance band — is
  * oracle-gated bit-for-bit: m, the kth hash, and the integer-division
  * estimate all match DuckDB exactly.
  *
  * Scale posture: the plan is (1) map-side hash projection, (2) distinct
  * over (group, hash) — one shuffle, partial-aggregated map-side, (3) a
  * per-group sort that keeps only k rows via rank — spill-safe, never
  * materializes a group in memory (vs `collect_set` which would hold every
  * distinct member of a hot group). Groups smaller than k report their
  * exact count (m < k => est = m).
  */
object Sketches {

  /** Uniform 32-bit draw from an entity value: first 8 hex chars of
    * md5(seed|entity) read as an integer (exact in both engines — conv
    * here, CAST('0x'||h AS BIGINT) in DuckDB).
    */
  def hash32(seed: String, entity: Column): Column =
    conv(
      substring(md5(concat(lit(seed + "|"), entity.cast("string")).cast("binary")), 1, 8),
      16,
      10).cast("long")

  /** Per-group KMV distinct estimate. Output: groupCol, m (kept hashes,
    * <= k), hk (kth smallest hash), est_nd (exact m when the group is
    * smaller than k, else (k-1) * 2^32 div hk).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, entity: Column, k: Int, seed: String): DataFrame = {
    val pairs = df.select(col(groupCol), hash32(seed, entity).as("hv")).distinct()
    val ranked = pairs.withColumn(
      "r",
      row_number().over(Window.partitionBy(col(groupCol)).orderBy(col("hv"))))
    val scale = (k - 1).toLong * 4294967296L
    ranked
      .filter(col("r") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("m"), max(col("hv")).as("hk"))
      .withColumn(
        "est_nd",
        when(col("m") < k, col("m")).otherwise(expr(s"$scale div hk")))
  }
}
