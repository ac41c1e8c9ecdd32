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

  /** Count-Min sketch build (Cormode & Muthukrishnan 2005, "An improved
    * data stream summary: the count-min sketch and its applications"):
    * `depth` independent hash rows of `width` counters; every (key,
    * value) increments counter [j][hash_j(key) % width] for each row j.
    * Estimates ([[countMinEstimate]]) take the min over rows — NEVER an
    * underestimate, overestimate bounded by sum/width per row w.h.p.
    *
    * The hash rows are md5 draws ([[hash32]] with seed "seed0".."seedN"),
    * so the sketch — like KMV — is a pure function of the data,
    * reproducible in any engine and oracle-gated bit-for-bit, not within
    * a tolerance band.
    *
    * Scale posture: ONE explode to (j, bucket) and one aggregation — the
    * map side collapses every partition to <= depth * width partial rows
    * (the whole point of a sketch), so shuffle volume is bounded by
    * partitions * depth * width regardless of corpus size, and the
    * finished sketch (<= depth * width rows) broadcasts to probes.
    */
  def countMinSketch(
      df: DataFrame,
      key: Column,
      value: Column,
      depth: Int,
      width: Int,
      seed: String): DataFrame =
    df.select(explode(cmSlots(key, depth, width, seed)).as("s"), value.as("__v"))
      .select(col("s.j").as("j"), col("s.bucket").as("bucket"), col("__v"))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("__v")).as("c"))

  /** One (j, bucket) slot per hash row for a key. */
  private def cmSlots(key: Column, depth: Int, width: Int, seed: String): Column =
    array((0 until depth).map { j =>
      struct(
        lit(j).as("j"),
        pmod(hash32(s"$seed$j", key), lit(width.toLong)).as("bucket"))
    }: _*)

  /** Point-estimate each probe key against a built sketch: fan the key
    * out to its `depth` buckets, join the (bounded, broadcast) sketch,
    * min over rows. A key whose buckets were never touched estimates 0.
    * Output: keyName, cm_est.
    */
  def countMinEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      key: Column,
      keyName: String,
      depth: Int,
      width: Int,
      seed: String): DataFrame =
    probes
      .select(key.as(keyName), explode(cmSlots(key, depth, width, seed)).as("s"))
      .select(col(keyName), col("s.j").as("j"), col("s.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(keyName))
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))

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
