package graft

import graft.queries.RelationalQueries
import org.scalatest.funsuite.AnyFunSuite

/** Sanity + physical-plan posture for the relational suite: results exist,
  * filters reach the parquet scan, small sides broadcast. Correctness vs
  * DuckDB is covered by the Verify/oracle gate (tools/verify_check.sh).
  */
class RelationalQueriesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 pricing agg: 6 groups, shipdate filter pushed to parquet scan") {
    val df = RelationalQueries.pricingAgg(spark, sf)
    assert(df.count() == 6)
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), s"no pushdown in:\n$p")
  }

  test("q3 top-k: joins broadcast the filtered dim side") {
    val df = RelationalQueries.shippingTopK(spark, sf)
    assert(df.count() <= 10 && df.count() > 0)
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("region rollup: dims broadcast, 5 regions") {
    val df = RelationalQueries.regionRollup(spark, sf)
    assert(df.count() == 5)
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("json props: 5 event types, k extracted non-null") {
    val rows = RelationalQueries.jsonProps(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getLong(r.fieldIndex("n")) > 0))
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("sum_k"))))
  }

  test("scalar pack: md5 ids unique per event, bands consistent") {
    val df = RelationalQueries.scalarPack(spark, sf)
    assert(df.count() == 1000)
    assert(df.select("tid").distinct().count() == 1000)
  }

  test("running windows: rn dense from 1, running sum monotone per user") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = RelationalQueries.runningWindows(spark, sf)
    val perUser = df.groupBy($"user_id")
      .agg(min($"rn").as("mn"), max($"rn").as("mx"), count(lit(1)).as("n"))
      .collect()
    perUser.foreach { r =>
      assert(r.getLong(r.fieldIndex("mn")) == 1L)
      assert(r.getLong(r.fieldIndex("mx")) == r.getLong(r.fieldIndex("n")))
    }
  }

  test("g19 MIS: the output is an independent set of the co-occurrence graph") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val winners = RelationalQueries.queries("g19_mis")(spark, sf)
    val ids = winners.select("node").as[Long].collect().toSet
    assert(ids.nonEmpty, "MIS must adopt at least one node")
    assert(winners.count() == ids.size, "a node must be adopted in exactly one round")
    // rebuild the same co-occurrence edges and assert NO edge joins two
    // adopted nodes — the defining invariant, independent of rounds
    val li = Tables
      .lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val violations = li
      .as("x")
      .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .filter(col("a").isin(ids.toSeq: _*) && col("b").isin(ids.toSeq: _*))
      .count()
    assert(violations == 0L, s"$violations edges connect two MIS members")
  }
}
