package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must surface query failures, not time them as ~0 and
  * move on (round-2 audit finding: a silently-caught Throwable could hide
  * a regression across rounds).
  */
class BenchSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  test("timeQueries records an error for a throwing query and times the healthy one") {
    val results = Bench.timeQueries(
      spark,
      "/root/testdata/sf0.001",
      Map(
        "ok_query" -> ((s, _) => s.range(10).toDF("id").withColumn("x", col("id") * 2)),
        "broken_query" -> ((s, dir) => s.read.parquet(s"$dir/no_such_table.parquet"))))
    val byName = results.map(r => r._1 -> r).toMap
    assert(byName("ok_query")._3.isEmpty)
    val err = byName("broken_query")._3
    assert(err.isDefined, "a throwing query must carry its error")
    assert(err.get.nonEmpty)
    assert(results.map(_._1) == results.map(_._1).sorted, "stable ordering for diffable output")
  }
}
