package graft

import graft.streaming.StreamingAgg.StreamEvent
import graft.streaming.WindowedAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The windowed-aggregation contract across both planes: the batch form
  * equals plain integer window arithmetic (that leg is also oracle-gated
  * as w8), the STREAMING form finalizes the identical rows in append
  * mode, an event older than the watermark is dropped from an already-
  * finalized window (bounded state, the documented streaming trade), and
  * the native session_window form agrees with the batch sessionizer.
  */
class WindowedAggSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  private def us(s: Long): Long = s * 1000000L

  test("streaming tumbling windows finalize exactly the batch rows; late events drop") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[StreamEvent]
    val q = WindowedAgg
      .tumblingRollup(source.toDF(), "ordUs", "userId", "cents", windowSecs = 60L, watermarkSecs = 10L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("w8_stream")
      .start()
    try {
      // batch 1: two events in window [960,1020) and one at 2000s — after
      // this batch the watermark is 2000-10=1990s, so [960,1020) finalizes
      source.addData(
        StreamEvent(1L, us(1000), 500L),
        StreamEvent(1L, us(1010), 300L),
        StreamEvent(1L, us(2000), 700L))
      q.processAllAvailable()
      // batch 2: a LATE event for the finalized window — must be dropped
      source.addData(StreamEvent(1L, us(1005), 999L))
      q.processAllAvailable()
      // batch 3: flush far ahead so the 2000s window finalizes too
      source.addData(StreamEvent(1L, us(9000), 1L))
      q.processAllAvailable()

      val got = spark.table("w8_stream")
        .select("win_start_us", "userId", "n_events", "sum_cents")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.contains((us(960), 1L, 2L, 800L)),
        s"window [960,1020) must hold exactly the two on-time events, got $got")
      assert(!got.exists { case (w, _, _, s) => w == us(960) && s != 800L },
        "the late 999-cent event must NOT be re-aggregated")
      assert(got.contains((us(1980), 1L, 1L, 700L)), s"second window finalized, got $got")
    } finally q.stop()
  }

  test("batch tumbling rollup equals integer window arithmetic on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val viaOp = WindowedAgg
      .tumblingRollup(ev, "ord_us", "event_type", "cents", 3600L, 0L)
      .select("win_start_us", "event_type", "n_events", "sum_cents")
      .as[(Long, String, Long, Long)].collect().toSet
    val direct = ev
      .groupBy(
        (col("ord_us") - pmod(col("ord_us"), lit(3600000000L))).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(viaOp == direct, "window() start must equal the epoch-aligned integer floor")
  }

  test("streaming session windows finalize after the gap closes, matching batch") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[StreamEvent]
    val q = WindowedAgg
      .sessionRollup(source.toDF(), "ordUs", "userId", "cents", gapSecs = 60L, watermarkSecs = 10L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("w9_stream")
      .start()
    try {
      // one session of three events (gaps < 60s), then silence: the next
      // batch's far-future event moves the watermark past session end +
      // gap, which finalizes and emits it
      source.addData(
        StreamEvent(5L, us(100), 10L),
        StreamEvent(5L, us(130), 20L),
        StreamEvent(5L, us(170), 30L))
      q.processAllAvailable()
      source.addData(StreamEvent(6L, us(5000), 1L))
      q.processAllAvailable()
      val got = spark.table("w9_stream")
        .select("userId", "start_us", "end_us", "n_events", "sum_cents")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got.contains((5L, us(100), us(170), 3L, 60L)),
        s"merged session must finalize with last-event end time, got $got")
    } finally q.stop()
  }

  test("session_window rollup agrees with the batch sessionizer") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select("user_id", "ord_us", "cents")
    val native = WindowedAgg
      .sessionRollup(ev, "ord_us", "user_id", "cents", gapSecs = 3600L, watermarkSecs = 0L)
      .select("user_id", "start_us", "end_us", "n_events", "sum_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val viaWindows = graft.operators.Sessionize
      .sessionRollup(ev, "user_id", "ord_us", 3600L * 1000000L, "cents")
      .select(
        col("user_id"), col("start_us"), col("end_us"), col("n_events"), col("sum_cents"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(native == viaWindows,
      s"session_window and the window-function sessionizer must agree " +
        s"(native ${native.size} vs windows ${viaWindows.size} sessions)")
  }
}
