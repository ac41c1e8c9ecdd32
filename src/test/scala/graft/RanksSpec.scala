package graft

import graft.operators.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-pass range-partitioned cumulative scan must be bit-identical
  * to the single-partition global window it replaces (the DuckDB oracles
  * still compute the naive form), including across partition boundaries
  * and with many distinct values per partition.
  */
class RanksSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local()

  test("two-pass cumulative sums and lead match the global-window form") {
    import spark.implicits._
    // 500 distinct keys spread over many range partitions; irregular gaps
    // and value sizes so boundary rows are exercised
    val dv = (0 until 500)
      .map(i => (i.toLong * 7 + (i % 3), (i % 11).toLong + 1, (i % 5).toLong))
      .toDF("v", "d1", "d2")
    val fast = Ranks
      .cumulativeOverDistinct(dv, "v", Seq("d1", "d2"), withNext = true, numParts = 8)
      .select("v", "cum_d1", "cum_d2", "next_value")
    val wc = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slow = dv.select(
      col("v"),
      sum(col("d1")).over(wc).as("cum_d1"),
      sum(col("d2")).over(wc).as("cum_d2"),
      lead(col("v"), 1).over(Window.orderBy(col("v"))).as("next_value"))
    assert(fast.orderBy("v").collect().toSeq == slow.orderBy("v").collect().toSeq)
  }

  test("doubled ranks reproduce 2*rank_min + ties - 1 with ties straddling boundaries") {
    import spark.implicits._
    // raw rows with heavy ties (each value repeated value%7+1 times)
    val raw = (0 until 200).flatMap(i => Seq.fill(i % 7 + 1)(i.toLong / 3)).toDF("v")
    val dv = raw.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val fast = Ranks.doubledRanks(dv, "v", "cnt").select("v", "r2")
    val slow = raw
      .withColumn(
        "r2",
        rank().over(Window.orderBy(col("v"))) * 2L +
          count(lit(1)).over(Window.partitionBy(col("v"))) - 1L)
      .select("v", "r2")
      .distinct()
    assert(fast.orderBy("v").collect().toSeq == slow.orderBy("v").collect().toSeq)
  }

  test("the DISTINCT-on-sortCol precondition is real: duplicate keys break cumulation") {
    import spark.implicits._
    // cumulativeOverDistinct documents that rows must be DISTINCT on the
    // sort column (every current caller feeds a groupBy(value) rollup).
    // This test PINS why: with duplicate keys, the local pass cumulates in
    // arbitrary intra-key row order, so per-row results are not the
    // value-ordered prefix sums a caller would expect — the TOTAL is still
    // right, but per-duplicate rows disagree with the naive window's
    // rangeBetween semantics. A new caller must pre-aggregate, not pass
    // raw rows. (Guard recipe: df.count() == df.select(sortCol).distinct().count().)
    val dup = Seq((1L, 10L), (1L, 5L), (2L, 1L)).toDF("v", "d")
    val out = Ranks
      .cumulativeOverDistinct(dup, "v", Seq("d"), numParts = 2)
      .select("v", "cum_d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val v1 = out.filter(_._1 == 1L).map(_._2).sorted
    // RANGE-frame semantics would give BOTH v=1 rows cum_d = 15 (all ties
    // in frame); row cumulation gives two DIFFERENT prefixes whose max is
    // the key total — the documented divergence. v=2's cum is 16 either
    // way (totals are order-independent).
    assert(v1.distinct.size == 2 && v1.last == 15L,
      s"duplicate keys should produce divergent per-row prefixes, got $out")
    assert(out.contains((2L, 16L)), s"downstream totals must still be exact, got $out")
  }

  test("no unpartitioned WindowExec over the data frame survives in the physical plan") {
    import spark.implicits._
    val dv = (0 until 100).map(i => (i.toLong, 1L)).toDF("v", "cnt")
    val plan = Ranks
      .doubledRanks(dv, "v", "cnt")
      .queryExecution
      .executedPlan
    // the only empty-partition-spec window allowed is the per-partition
    // offsets rollup, whose input is the ≤ numParts-row totals aggregate
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    windows.foreach { w =>
      val overAgg = w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.nonEmpty =>
          a
      }
      assert(
        overAgg.nonEmpty,
        s"unpartitioned window not over the bounded totals rollup:\n$w")
    }
  }
}
