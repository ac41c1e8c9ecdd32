package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must surface query failures, not time them as ~0 and
  * move on (round-2 audit finding: a silently-caught Throwable could hide
  * a regression across rounds), and must repeat measurements — round-3
  * audit: single-shot timings swung 2-3x on unchanged code, making
  * per-query deltas ungradeable.
  */
class BenchSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  test("timeQueries repeats healthy queries, records an error and stops repeating a throwing one") {
    val results = Bench.timeQueries(
      spark,
      "/root/testdata/sf0.001",
      Map(
        "ok_query" -> ((s, _) => s.range(10).toDF("id").withColumn("x", col("id") * 2)),
        "broken_query" -> ((s, dir) => s.read.parquet(s"$dir/no_such_table.parquet"))),
      reps = 3)
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("ok_query").err.isEmpty)
    assert(byName("ok_query").runs.size == 3, "healthy queries are measured reps times")
    assert(byName("ok_query").runs.forall(_ > 0.0))
    val broken = byName("broken_query")
    assert(broken.err.isDefined, "a throwing query must carry its error")
    assert(broken.err.get.nonEmpty)
    assert(broken.runs.isEmpty, "a failed attempt's elapsed is not a measurement")
    assert(results.map(_.name) == results.map(_.name).sorted, "stable ordering for diffable output")
  }

  test("median is a real measurement: middle of odd runs, lower-middle of even") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(5.0)) == 5.0)
    assert(Bench.median(Seq(4.0, 1.0, 3.0, 2.0)) == 2.0)
    assert(Bench.Timing("q", Nil, Some("boom")).med == 0.0)
  }

  test("reported median drops the warm-up rep but keeps it in the runs array") {
    // rep 1 (9.0) is warm-up — round-5 audit: it absorbs codegen compile +
    // cache materialization and misreported a 6x "regression" on an
    // unchanged stateless projection; the median covers reps 2..n only
    val t = Bench.Timing("q", Seq(9.0, 1.0, 5.0, 2.0, 1.5), None)
    assert(t.med == 1.5, s"median of reps 2..n, got ${t.med}")
    assert(t.runs.head == 9.0, "warm-up rep stays visible in the JSON runs")
    // a single completed rep is still a measurement, not a zero
    assert(Bench.Timing("q", Seq(4.0), None).med == 4.0)
    // workload headlines share the discipline: rep 1 out of the median
    assert(Bench.steadyMedian(Seq(100.0, 900.0, 800.0, 850.0)) == 850.0)
    assert(Bench.steadyMedian(Seq(7.0)) == 7.0)
  }

  test("headline median drops contended reps when enough quiet ones remain") {
    // the r10 dip scenario: reps measured at load 8-12 read slower with
    // no way to exclude them; now a rep's rate only counts when its load
    // stamp was at or under the ceiling (6.0) — given >= 2 quiet reps
    val rates = Seq(100.0, 900.0, 600.0, 650.0, 880.0)
    val loads = Seq(0.5, 1.0, 9.0, 11.5, 2.0)
    assert(Bench.filteredSteadyMedian(rates, loads) == 880.0,
      "the two contended reps (600/650 at load 9/11.5) must not drag the median")
    // rep 1 stays excluded even when quiet (the steady-median convention)
    assert(Bench.filteredSteadyMedian(Seq(100.0, 700.0, 900.0, 800.0), Seq(1.0, 1.0, 1.0, 1.0))
      == 800.0)
    // fewer than 2 quiet reps: fall back to the plain steady median — a
    // fully contended run reports its honest, visibly-stamped number
    assert(Bench.filteredSteadyMedian(Seq(100.0, 500.0, 520.0), Seq(9.0, 9.0, 9.0)) == 500.0)
    assert(Bench.filteredSteadyMedian(Seq(-1.0), Seq(-1.0)) == -1.0,
      "the failure sentinel passes through")
  }
}
