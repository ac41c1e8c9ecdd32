package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless interval-containment join (point IN [start, end)) without a
  * nested-loop plan.
  *
  * Spark plans a join whose only predicate is an inequality as a
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|events| *
  * |intervals|) compute and, at 100 TB, a broadcast of whatever side is
  * "small". The standard fix is binning: quantize time into fixed-width
  * buckets, explode each interval into every bucket it touches, tag each
  * point with its bucket, equi-join on the bucket id, and re-check the
  * exact predicate as a residual filter. The join becomes a shuffled (or
  * broadcast) HASH join on `_bin` — one shuffle, no quadratic pairing —
  * at the cost of interval rows replicated by ceil(span / binUs).
  * Pick `binUs` near the typical interval span so the replication factor
  * stays small while bucket populations stay bounded.
  *
  * All bin arithmetic is exact integer division — Spark's `div` truncates
  * toward zero, which equals floor-division on the non-negative
  * micro/nano timestamp domain this operator serves (and bin MEMBERSHIP
  * is preserved by monotonicity either way); the point is that it never
  * routes through doubles, which would mis-bin boundary timestamps above
  * 2^53. Support for negative times would need an explicit floor-div.
  */
object RangeJoin {

  /** Integral division by SQL name (`div` is Spark's truncating integer
    * division OPERATOR, so this never routes through doubles — `/` would
    * lose units above 2^53, i.e. on nanosecond timestamps). Truncation ==
    * floor for the non-negative inputs this operator accepts.
    */
  private def idivExpr(colName: String, offset: Long, d: Long): Column =
    expr(s"(`$colName` + ($offset)) div $d")

  /** Pairs (point row ++ interval row) where `points.tsCol` lies in
    * `[intervals.startCol, intervals.endCol)`. Column sets of the two
    * inputs must be disjoint. `binUs` must divide nothing in particular —
    * any positive width is correct; it only tunes replication.
    */
  def binnedContains(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binUs: Long): DataFrame = {
    // Empty/inverted intervals can't match anything, and Spark's
    // sequence(hi, lo) COUNTS DOWN rather than returning empty — drop
    // them before exploding so a degenerate interval can't fan out junk
    // bins.
    val binned = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn(
        "_bin",
        explode(sequence(idivExpr(startCol, 0L, binUs), idivExpr(endCol, -1L, binUs))))
    points
      .withColumn("_bin", idivExpr(tsCol, 0L, binUs))
      .join(binned, Seq("_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bin")
  }
}
