package graft.streaming

import graft.functions.KmvDistinctAgg
import org.apache.spark.sql.{Column, DataFrame}

/** Incrementally-maintained per-key KMV DISTINCT sketch — k8's native
  * aggregate lifted to the streaming plane with ZERO new operator code
  * (the [[StreamingSketch]] pattern): the KMV buffer is a bounded merge
  * LATTICE (k smallest distinct hashes; inserts and merges commutative,
  * associative, idempotent — property-tested in PropertySpec), so
  * running the SAME aggregation as a streaming query in complete mode
  * maintains, per key, a sketch BIT-IDENTICAL to a batch aggregate over
  * the rows seen so far, regardless of micro-batch boundaries or replay
  * overlap (StreamingKmvSpec proves parity after a chunked replay).
  *
  * Scale posture — the streaming cardinality monitor a 100 TB ingest
  * needs: exact streaming COUNT(DISTINCT entity) state is O(|entities|)
  * per key and grows forever; this state is O(k) longs per key, FLAT in
  * stream length, with no watermark required (nothing ever expires —
  * the sketch only tightens). The estimate column is the same
  * (k−1)·2³²/hk estimator the batch gate pins, exact below saturation.
  */
object StreamingKmv {

  /** Streaming form of the k8 aggregate — pass a STREAMING DataFrame;
    * write with outputMode("complete") (the sink is the standing
    * per-key sketch summary). Same struct(m, hk, est_nd) result as the
    * batch aggregate.
    */
  def kmvDistinctStream(
      stream: DataFrame,
      key: Column,
      entity: Column,
      k: Int,
      seed: String): DataFrame =
    stream
      .groupBy(key.as("key"))
      .agg(KmvDistinctAgg.kmvDistinct(entity, k, seed).as("kmv"))

  /** Streaming per-key QUANTILE monitor — [[graft.functions
    * .KmvSampleAgg]] (k9's bottom-k payload sample) run as a streaming
    * complete-mode aggregation: the (hash, value)-pair buffer is the
    * same bounded merge lattice, so the maintained per-key quartile
    * estimates are bit-identical to the batch aggregate over the rows
    * seen so far under any micro-batching or replay (the distribution
    *-drift dashboard a 100 TB ingest watches, at O(k) state per key,
    * no watermark needed).
    */
  def kmvQuantilesStream(
      stream: DataFrame,
      key: Column,
      id: Column,
      value: Column,
      k: Int,
      seed: String): DataFrame =
    stream
      .groupBy(key.as("key"))
      .agg(graft.functions.KmvSampleAgg.kmvSampleQuantiles(id, value, k, seed).as("s"))
}
