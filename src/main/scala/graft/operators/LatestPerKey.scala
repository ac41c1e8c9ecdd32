package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-per-key compaction (SURVEY.md §2.4 W5/A1; reference
  * `notebooks/2_batch_ingestion.ipynb:302-307`).
  *
  * Faithful to the reference this uses `dense_rank` over (key, order desc)
  * and keeps rank 1 — which retains ALL rows tied on the max ordering value
  * (a real multiplicity difference vs `row_number`; the reference's store
  * then collapses duplicates last-write-wins).
  *
  * Scale: one shuffle by key; rank + filter stream through the sorted
  * partition. For heavily-skewed keys prefer `maxByOrd` (hash aggregate with
  * map-side partials, no sort) — offered here as the scale path.
  */
object LatestPerKey {

  /** dense_rank == 1 on (key, ord desc): keeps ties, reference-faithful. */
  def denseRankLatest(df: DataFrame, key: Column, ord: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord.desc)
    df.withColumn("rank", dense_rank().over(w))
      .filter(col("rank") === 1)
      .drop("rank")
  }

  /** Aggregation form: single row per key via max_by(struct, ord) — partial
    * aggregation map-side, no sort, arbitrary tie survivor. Use when exact
    * tie multiplicity does not matter and the input is huge.
    */
  def maxByOrd(df: DataFrame, key: String, ord: String): DataFrame = {
    val payload = struct(df.columns.filter(_ != key).map(col).toIndexedSeq: _*)
    df.groupBy(col(key))
      .agg(max_by(payload, col(ord)).as("latest"))
      .select(col(key) +: df.columns.filter(_ != key).toIndexedSeq.map(c => col(s"latest.$c").as(c)): _*)
  }
}
