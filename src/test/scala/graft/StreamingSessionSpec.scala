package graft

import graft.operators.Sessionize
import graft.streaming.{SessionEmit, SessionProcessor, SessionTimerProcessor}
import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming gap sessionizer must emit, across arbitrary micro-batch
  * boundaries, exactly the batch [[Sessionize.sessionRollup]] rows — the
  * w7 operator run where it belongs, with O(1) state per key.
  */
class StreamingSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private val GapUs = 3600L * 1000000L

  test("streaming sessions == batch rollup over a chunked replay (flush closes finals)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    // distinct (user, ordUs): the in-batch sort and the batch window then
    // share one total order (same tie discipline as the CUSUM spec)
    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id").as("userId"), col("ord_us").as("ordUs"), col("cents"))
      .as[StreamEvent]
      .collect()
      .groupBy(e => (e.userId, e.ordUs))
      .map(_._2.head)
      .toSeq
      .sortBy(e => (e.ordUs, e.userId))

    val source = MemoryStream[StreamEvent]
    val sink = s"sess_out_${System.nanoTime()}"
    val q = SessionProcessor
      .sessions(source.toDS(), GapUs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val streamed =
      try {
        // 7 uneven chunks: the open session must carry across micro-batches
        events.grouped(math.max(1, events.size / 7)).foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
        // a session only closes when a later event proves the gap — close
        // every final session with one far-future flush event per key (the
        // flush itself opens a session that is never emitted)
        val flushTs = events.map(_.ordUs).max + 100L * GapUs
        source.addData(events.map(_.userId).distinct.map(u => StreamEvent(u, flushTs, 0L)))
        q.processAllAvailable()
        spark.table(sink).as[SessionEmit].collect().toSet
      } finally q.stop()

    val batch = Sessionize
      .sessionRollup(events.toDF(), "userId", "ordUs", GapUs, "cents")
      .select("userId", "session_idx", "n_events", "start_us", "end_us", "span_us", "sum_cents")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(t => SessionEmit(t._1, t._2, t._3, t._4, t._5, t._6, t._7))
      .toSet

    assert(streamed.nonEmpty && streamed == batch,
      s"streaming sessions diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("timer form: the watermark closes final sessions — full parity, NO flush events") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id").as("userId"), col("ord_us").as("ordUs"), col("cents"))
      .as[StreamEvent]
      .collect()
      .groupBy(e => (e.userId, e.ordUs))
      .map(_._2.head)
      .toSeq
      .sortBy(e => (e.ordUs, e.userId))

    val source = MemoryStream[StreamEvent]
    val sink = s"sess_timer_${System.nanoTime()}"
    val q = SessionTimerProcessor
      .sessions(source.toDS(), GapUs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val streamed =
      try {
        events.grouped(math.max(1, events.size / 7)).foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
        // one watermark-only nudge: a single event for ONE synthetic key
        // far in the future advances the GLOBAL watermark past every real
        // key's gap deadline, so the per-key TIMERS (not data) close all
        // final sessions — this is precisely what the flush-per-key form
        // cannot do
        val nudgeTs = events.map(_.ordUs).max + 100L * GapUs
        source.addData(StreamEvent(-1L, nudgeTs, 0L))
        q.processAllAvailable()
        q.processAllAvailable() // the no-data batch that fires the timers
        spark.table(sink).as[SessionEmit].collect().toSet
      } finally q.stop()

    val batch = Sessionize
      .sessionRollup(events.toDF(), "userId", "ordUs", GapUs, "cents")
      .select("userId", "session_idx", "n_events", "start_us", "end_us", "span_us", "sum_cents")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(t => SessionEmit(t._1, t._2, t._3, t._4, t._5, t._6, t._7))
      .toSet

    // the nudge key's own (still-open) session never emits; every real
    // key's FULL history — final sessions included — must match batch
    val real = streamed.filterNot(_.userId == -1L)
    assert(real.nonEmpty && real == batch,
      s"timer-closed sessions diverged: ${real.diff(batch).take(3)} vs ${batch.diff(real).take(3)}")
  }

  test("open-session state survives a query restart from checkpoint") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sess_recovery").toString
    val srcDir = s"$root/events"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    val emissions = new java.util.concurrent.ConcurrentLinkedQueue[SessionEmit]()
    def startQuery() = spark.readStream
      .schema("userId LONG, ordUs LONG, cents LONG")
      .parquet(srcDir)
      .as[StreamEvent]
      .transform(SessionProcessor.sessions(_, gapUs = 1000L))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[SessionEmit], _: Long) =>
        ds.collect().foreach(emissions.add)
      }
      .start()

    // phase 1: two events 500 apart — one open session, nothing emitted
    Seq(StreamEvent(7L, 1000L, 5L), StreamEvent(7L, 1500L, 6L))
      .toDS().write.parquet(s"$srcDir/chunk=1")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // phase 2: RESTART; an event past the gap closes the session — with
    // n = 2 and sum = 11 ONLY if the open-session state was recovered (a
    // fresh state would emit nothing)
    Seq(StreamEvent(7L, 9000L, 1L)).toDS().write.parquet(s"$srcDir/chunk=2")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val got = {
      val it = emissions.iterator(); val b = Seq.newBuilder[SessionEmit]
      while (it.hasNext) b += it.next(); b.result().toSet
    }
    assert(got == Set(SessionEmit(7L, 1L, 2L, 1000L, 1500L, 500L, 11L)),
      s"open session lost across restart: $got")
  }

  test("cross-batch late event is dropped, not mis-sessioned") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[StreamEvent]
    val sink = s"sess_late_${System.nanoTime()}"
    val q = SessionProcessor
      .sessions(source.toDS(), gapUs = 1000L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val got =
      try {
        // batch 1: session A = {1000, 1800}
        source.addData(StreamEvent(7L, 1000L, 5L), StreamEvent(7L, 1800L, 6L))
        q.processAllAvailable()
        // batch 2: a LATE event (1200 < 1800) must be dropped — folding it
        // in would inflate session A; then 5000 closes A
        source.addData(StreamEvent(7L, 1200L, 999L), StreamEvent(7L, 5000L, 1L))
        q.processAllAvailable()
        spark.table(sink).as[SessionEmit].collect().toSet
      } finally q.stop()
    assert(got == Set(SessionEmit(7L, 1L, 2L, 1000L, 1800L, 800L, 11L)),
      s"late event corrupted the session: $got")
  }
}
