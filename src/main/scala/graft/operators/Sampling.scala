package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data pipelines.
  *
  * Spark's built-in `df.sample(fraction, seed)` draws per-PARTITION
  * pseudo-random streams: the selected rows change whenever partitioning,
  * parallelism, or upstream order changes — a reproducibility trap at
  * 100 TB where splits/AQE shift constantly. Hash sampling decides each
  * row from its OWN id: uniform = first 8 hex chars of md5(seed|id),
  * kept iff lexicographically below a fixed-point hex threshold
  * (fixed-width lowercase hex compares exactly like the 32-bit integer it
  * spells, and md5 is identical in every engine, so the DuckDB oracle
  * reproduces the sample bit-for-bit). Rows keep or drop independently of
  * partitioning, cluster size, and engine — and the same row is sampled
  * consistently across runs AND across derived tables (join-stable
  * sampling, which per-partition RNG cannot give).
  *
  * Threshold hex for rate p: the first 8 hex digits of p * 16^8 (e.g.
  * 0.25 -> "40000000", 0.5 -> "80000000", 1/16 -> "10000000").
  */
object Sampling {

  /** Uniform-in-hex draw for a row id: 8 lowercase hex chars. */
  def hashUniformHex(seed: String, id: Column): Column =
    substring(md5(concat(lit(seed + "|"), id.cast("string")).cast("binary")), 1, 8)

  /** Bernoulli(rate) keyed by row id; `thresholdHex` = rate * 16^8 in hex. */
  def bernoulli(df: DataFrame, idCol: String, seed: String, thresholdHex: String): DataFrame =
    df.filter(hashUniformHex(seed, col(idCol)) < lit(thresholdHex))

  /** Deterministic train/val/test assignment: `cuts` are (label,
    * upperHexExclusive) in ascending threshold order; the first threshold
    * the row's draw falls under wins, and rows above every cut get
    * `default`. Because the draw is keyed on the row id, the split is
    * stable across runs, engines, repartitions, and derived tables — the
    * property that keeps eval rows from leaking into training when the
    * pipeline is re-run on re-partitioned data.
    */
  def splitLabel(seed: String, id: Column, cuts: Seq[(String, String)], default: String): Column = {
    val u = hashUniformHex(seed, id)
    cuts.foldRight(lit(default): Column) { case ((label, hi), acc) =>
      when(u < lit(hi), lit(label)).otherwise(acc)
    }
  }

  /** Per-stratum Bernoulli: `rates` maps stratum value -> threshold hex;
    * strata not listed are dropped entirely. One scan, no shuffle — the
    * filter is a pure row-local expression.
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      stratum: Column,
      seed: String,
      rates: Seq[(Long, String)]): DataFrame = {
    val u = hashUniformHex(seed, col(idCol))
    val keep = rates.foldLeft(lit(false)) { case (acc, (s, thr)) =>
      acc || (stratum === lit(s) && u < lit(thr))
    }
    df.filter(keep)
  }
}
