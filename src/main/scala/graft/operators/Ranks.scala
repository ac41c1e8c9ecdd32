package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass distributed cumulative sums / ranks over a sort column — the
  * scalable replacement for `Window.orderBy(...)` with no PARTITION BY,
  * which Spark executes by moving EVERY row into a single partition
  * (WindowExec with an empty partition spec): fine at gate scale, a
  * single-executor bottleneck at 100 TB. The round-8 audit flagged the
  * stats gates (a20/a21/a23/a24) for claiming "range-partitioned at
  * scale" over exactly that plan; this operator makes the claim literal.
  *
  * The classic two-pass scheme (Blelloch scan, lifted to the dataframe
  * layer):
  *
  *   1. range-partition the frame on the sort column (equal keys
  *      co-locate — RangePartitioner assigns by key, so ties never
  *      straddle a boundary);
  *   2. per-partition local cumulative sums via a window PARTITIONED by
  *      the physical partition id (parallel across the cluster);
  *   3. per-partition totals roll up to one row per partition — a frame
  *      bounded by the shuffle-partition COUNT, not the data — where the
  *      exclusive prefix (the only remaining unpartitioned window, over
  *      ≤ numPartitions rows) becomes each partition's offset;
  *   4. broadcast the offsets back and add.
  *
  * All sums stay in the input column types (integer discipline — the
  * offsets are exact), so results are bit-identical to the
  * single-partition window form the DuckDB oracles still use.
  */
object Ranks {

  /** `df` plus, for each column `c` in `sumCols`, `cum_c` = the inclusive
    * cumulative sum of `c` in `sortCol` order, and (when `withNext`)
    * `next_value` = the following row's `sortCol` (NULL on the last row).
    *
    * Rows must be DISTINCT on `sortCol` (the caller's frames are
    * `groupBy(value)` rollups): with unique keys, row-order and
    * value-order cumulation coincide, so no rangeBetween semantics are
    * needed in the local pass.
    */
  def cumulativeOverDistinct(
      df: DataFrame,
      sortCol: String,
      sumCols: Seq[String],
      withNext: Boolean = false,
      numParts: Int = 32): DataFrame = {
    val s = col(sortCol)
    // One shared range-shuffled child with the physical partition id
    // materialized as a column; both consumers below are built on the
    // SAME plan object so the exchange is reused, and RangePartitioner's
    // sampling is seeded per partition index, so even a recompute
    // reproduces identical boundaries.
    val ranged = df.repartitionByRange(numParts, s).withColumn("__pid", spark_partition_id())
    val wOrd = Window.partitionBy(col("__pid")).orderBy(s)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local0 = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"__loc_$c", sum(col(c)).over(wCum))
    }
    val local =
      if (withNext) local0.withColumn("__next_loc", lead(s, 1).over(wOrd)) else local0
    // Pass 2: one row per non-empty partition; the exclusive prefix sums
    // run over ≤ numParts rows — bounded by cluster parallelism, never by
    // data — which is the two-pass scheme's entire point.
    val totAggs = sumCols.map(c => sum(col(c)).as(s"__tot_$c")) :+ min(s).as("__first")
    val totals = ranged.groupBy(col("__pid")).agg(totAggs.head, totAggs.tail: _*)
    val wPid = Window.orderBy(col("__pid"))
    val wPrefix = wPid.rowsBetween(Window.unboundedPreceding, -1)
    val offCols: Seq[Column] = col("__pid") +:
      (sumCols.map(c => sum(col(s"__tot_$c")).over(wPrefix).as(s"__off_$c")) ++
        (if (withNext) Seq(lead(col("__first"), 1).over(wPid).as("__next_first")) else Nil))
    val offsets = totals.select(offCols: _*)
    val joined = local.join(broadcast(offsets), "__pid")
    val withCums = sumCols.foldLeft(joined) { (d, c) =>
      // null prefix on the first partition = zero offset
      d.withColumn(s"cum_$c", col(s"__loc_$c") + coalesce(col(s"__off_$c"), lit(0L)))
    }
    val withNextCol =
      if (withNext)
        withCums.withColumn("next_value", coalesce(col("__next_loc"), col("__next_first")))
      else withCums
    val internal = Seq("__pid", "__next_loc", "__next_first", "__first") ++
      sumCols.flatMap(c => Seq(s"__loc_$c", s"__off_$c", s"__tot_$c"))
    withNextCol.drop(internal: _*)
  }

  /** Doubled average ranks over a DISTINCT-value count frame: given
    * (`valueCol`, `cntCol` = how many raw rows carry that value), returns
    * the frame plus `r2` = 2·rank_min + ties − 1 = 2·cum − cnt + 1 — the
    * exact-integer encoding of the textbook average rank (a20/a21's tie
    * handling), computed without ever ranking the raw rows: the rank pass
    * runs on the |distinct values| rollup and joins back by value.
    */
  def doubledRanks(dv: DataFrame, valueCol: String, cntCol: String): DataFrame =
    cumulativeOverDistinct(dv, valueCol, Seq(cntCol))
      .withColumn("r2", col(s"cum_$cntCol") * 2L - col(cntCol) + 1L)
      .drop(s"cum_$cntCol")
}
