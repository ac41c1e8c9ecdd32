package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-paid shuffle: co-bucketed tables must join and
  * aggregate with ZERO exchanges, while the identical unbucketed plan
  * shuffles — both directions asserted so the exchange-free claim can't
  * pass vacuously.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed join and per-key aggregation plan zero exchanges; unbucketed shuffles") {
    val ev = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select("event_id", "user_id", "ord_us", "cents")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))

    Bucketed.write(ev, "ev_bucketed", "user_id", 8)
    Bucketed.write(dim, "dim_bucketed", "user_id", 8)
    val evB = Bucketed.read(spark, "ev_bucketed")
    val dimB = Bucketed.read(spark, "dim_bucketed")

    withNoBroadcast {
      val joined = evB.join(dimB, Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() == ev.count(), "join result must cover every event")

      val agg = evB.groupBy("user_id").agg(sum(col("cents")).as("s"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed aggregation must not shuffle:\n$aggPlan")

      // the contrast case: same join off raw (unbucketed) frames shuffles
      val rawPlan = ev.join(dim, Seq("user_id")).queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"), s"unbucketed control should shuffle:\n$rawPlan")
    }
  }
}
