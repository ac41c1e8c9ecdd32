package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §7.4 risk 2 closure: the reference wrote its batch
  * aggregation as a SQL string with named WINDOW specs and
  * `RANGE INTERVAL ... PRECEDING` frames
  * (`notebooks/2_batch_ingestion.ipynb:270-287`, Spark 2.4). Verify the
  * same SQL shape parses in Spark 4 and produces EXACTLY the engine's
  * DSL results (micros-ordering form).
  */
class SqlFormSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  test("reference-shaped SQL (named windows, RANGE INTERVAL frames) == DSL plan") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    Tables.events(spark, sf).createOrReplaceTempView("transactions_df")

    // the reference query, transposed to the events analog (cc_num ->
    // user_id, datetime -> ts, amount -> value); avg over raw doubles here
    // because both sides run in THIS engine (no cross-engine float risk)
    val sqlForm = spark.sql(
      """SELECT event_id, user_id, value,
        |  count(*) OVER w1 AS num_trans_last_10m,
        |  avg(value) OVER w1 AS avg_amt_last_10m,
        |  count(*) OVER w2 AS num_trans_last_1w,
        |  avg(value) OVER w2 AS avg_amt_last_1w
        |FROM transactions_df
        |WINDOW
        |  w1 AS (PARTITION BY user_id ORDER BY CAST(ts AS timestamp)
        |         RANGE INTERVAL 10 MINUTES PRECEDING),
        |  w2 AS (PARTITION BY user_id ORDER BY CAST(ts AS timestamp)
        |         RANGE INTERVAL 1 WEEK PRECEDING)""".stripMargin)

    val dsl = graft.operators.TrailingWindows
      .aggregates(Tables.events(spark, sf), "user_id", "ts", "value",
        Seq("10m" -> 600L, "1w" -> 604800L))
      .select(
        col("event_id"), col("user_id"), col("value"),
        col("cnt_10m").as("num_trans_last_10m"),
        col("avg_10m").as("avg_amt_last_10m"),
        col("cnt_1w").as("num_trans_last_1w"),
        col("avg_1w").as("avg_amt_last_1w"))

    val a = sqlForm.orderBy("event_id").collect()
    val b = dsl.orderBy("event_id").collect()
    assert(a.length == b.length && a.length == 1000)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"SQL vs DSL: $x != $y") }
  }
}
