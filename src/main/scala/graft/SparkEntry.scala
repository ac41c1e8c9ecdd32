package graft

import graft.multimodal.{AudioFingerprint, AudioFixtures, AudioResample, ImagePhash, ImageQuality, ImageResample, MediaFixtures, VideoFixtures}
import graft.queries.{DocQueries, FeatureQueries, RelationalQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the TESTDATA.md parquet tables, with a formula-identical DuckDB
  * oracle in [[oracleSql]] where the semantics are SQL-expressible.
  */
object SparkEntry {

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (FeatureQueries.queries, FeatureQueries.oracle),
      (RelationalQueries.queries, RelationalQueries.oracle),
      (DocQueries.queries, DocQueries.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      // m1: the pixel-decode plane's fixture-hash gate — the oracle side
      // is a VALUES literal derived from the ground-truth pixel tuples,
      // so the decode path gets the same rows/schema/hash contract as
      // the SQL-expressible operators
      (MediaFixtures.queries, MediaFixtures.oracle),
      // m2: the audio twin — WAV PCM sample decode against ground-truth
      // sample tuples, same fixture-hash contract
      (AudioFixtures.queries, AudioFixtures.oracle),
      // m3: the video twin — MJPEG-in-AVI container walk + per-frame
      // JPEG decode against ground-truth per-frame pixel tuples
      (VideoFixtures.queries, VideoFixtures.oracle),
      // m5: perceptual-hash image near-dup — banded pairs over decoded
      // containers vs an all-pairs oracle on ground-truth-tuple hashes
      (ImagePhash.queries, ImagePhash.oracle),
      // m6: image quality features (extremes/grayscale/color-count/mode
      // flatness) over the same decoded-fixture plane
      (ImageQuality.queries, ImageQuality.oracle),
      // m7: audio near-dup via the energy-profile fingerprint (the m5
      // twin for the audio plane)
      (AudioFingerprint.queries, AudioFingerprint.oracle),
      // m10: the resize stage — nearest-neighbor thumbnails over the
      // decoded-fixture plane, hash-pinned against truth-tuple resamples
      (ImageResample.queries, ImageResample.oracle),
      // m11: the audio twin of m10 — integer frame decimation over the
      // decoded WAV plane, hash-pinned against truth-tuple decimations
      (AudioResample.queries, AudioResample.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    FeatureQueries.trailingAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Persist contract: a few gated queries persist shared frames
    * (d2/d2c/d3/d10's shingle + thresholded-pair frames, v3/v4/d9's
    * prepared vectors) so one materialization serves every consumer in a
    * batch. The harnesses (Verify, Bench) reclaim them by running inside
    * [[CacheScope.scoped]]; a DIRECT caller of these queries should do
    * the same — `CacheScope.scoped(spark) { ... }` around the batch —
    * or the frames stay cached until session end. Actions must stay
    * inside the scope (localCheckpoint-backed frames cannot
    * re-materialize after the scope drops them).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.iterator.flatMap(_._2).toMap
}
