package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{Column, DataFrame}

/** Incrementally-maintained Count-Min sketch — k2's sketch lifted to the
  * streaming plane with ZERO new operator code: the build
  * ([[Sketches.countMinSketch]]) is an explode + keyed SUM, and counter
  * merges are commutative, so running the SAME plan as a streaming
  * aggregation (complete mode) maintains a sketch that is BIT-IDENTICAL
  * to a batch build over the rows seen so far, regardless of
  * micro-batch boundaries (StreamingSpec proves parity after a chunked
  * replay).
  *
  * Scale posture — this is the whole point of sketching a stream: the
  * aggregation state is the sketch itself, O(depth·width) counters
  * FLAT in stream length (no watermark needed, nothing grows), while
  * an exact streaming frequency table's state is O(|keys|). Point
  * estimates against the maintained sketch reuse the batch estimator
  * ([[Sketches.countMinEstimate]]) on the sink table — one bounded
  * broadcast join per probe batch.
  */
object StreamingSketch {

  /** Streaming form of [[Sketches.countMinSketch]] — pass a STREAMING
    * DataFrame; write with outputMode("complete") (the sink is the
    * standing sketch, depth·width rows). Same (j, bucket, c) schema as
    * the batch build.
    */
  def countMinStream(
      stream: DataFrame,
      key: Column,
      value: Column,
      depth: Int,
      width: Int,
      seed: String): DataFrame =
    Sketches.countMinSketch(stream, key, value, depth, width, seed)
}
