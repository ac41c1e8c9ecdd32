package graft

import graft.operators.TrailingWindows
import graft.store.OnlineFeatureStore
import graft.streaming.{EnrichAndScore, JsonIngest, StreamingAgg}
import graft.streaming.StreamingAgg.{AggEmit, StreamEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-plane tests (SURVEY.md §5.3/5.4): batch≡stream parity of the
  * per-event trailing window, store last-write-wins, and the end-to-end
  * burst scenario from the reference's notebook 4 smoke test.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  private def runStream(chunks: Seq[Seq[StreamEvent]]): Seq[AggEmit] = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[StreamEvent]
    val sinkName = s"agg_out_${System.nanoTime()}"
    val q = StreamingAgg
      .trailingAgg(source.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkName)
      .start()
    try {
      chunks.foreach { c =>
        source.addData(c)
        q.processAllAvailable()
      }
      spark.table(sinkName).as[AggEmit].collect().toSeq
    } finally q.stop()
  }

  test("stream per-event trailing agg == batch RANGE window on replayed sf0.001 events") {
    import spark.implicits._
    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id").as("userId"), col("ord_us").as("ordUs"), col("cents"))
      .as[StreamEvent]
      .collect()
      .sortBy(_.ordUs)
      .toSeq

    // replay in 4 event-time-ordered chunks (cross-microbatch state carry)
    val emits = runStream(events.grouped((events.size / 4) + 1).toSeq)
    assert(emits.size == events.size, "one emission per input event")

    val batch = TrailingWindows
      .aggregates(
        Tables
          .events(spark, "/root/testdata/sf0.001")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "user_id", "ts", "cents", Seq("10m" -> 600L))
      .select(
        col("user_id"),
        col("ord_us"),
        col("cnt_10m"),
        col("sum_10m"))
      .as[(Long, Long, Long, Long)]
      .collect()
      .map { case (k, t, c, s) => (k, t) -> ((c, s)) }
      .toMap

    emits.foreach { e =>
      val (bc, bs) = batch((e.userId, e.ordUs))
      assert(bc == e.cnt, s"count mismatch for (${e.userId}, ${e.ordUs})")
      assert(bs == e.sumCents, s"sum mismatch for (${e.userId}, ${e.ordUs})")
    }
  }

  test("late event within horizon still aggregates as-of itself") {
    val emits = runStream(Seq(
      Seq(StreamEvent(1, 1000L * 1000000L, 100)),
      Seq(StreamEvent(1, 1500L * 1000000L, 200)),
      Seq(StreamEvent(1, 1200L * 1000000L, 300)) // late, inside 600 s of both
    ))
    val byTs = emits.map(e => e.ordUs / 1000000L -> ((e.cnt, e.sumCents))).toMap
    assert(byTs(1000L) == ((1L, 100L)))
    assert(byTs(1500L) == ((2L, 300L))) // 1000 within [900, 1500]
    assert(byTs(1200L) == ((2L, 400L))) // as-of 1200: events 1000 + 1200
  }

  test("arrival-time parity mode (KDA ROWTIME) diverges from event-time mode exactly on a late event") {
    import spark.implicits._
    // One payload replay, one card, horizon 600 s. The third event is
    // STALE: its trans_ts is 900 s old, but it arrives last.
    //            trans_ts   arrival
    //   e1         1000       1000
    //   e2         1100       1100
    //   e3 (late)   100       1200
    val payloads = Seq(
      (4003L, "m1", 1.00, "z", 1000.0, 1000L),
      (4003L, "m2", 2.00, "z", 1100.0, 1100L),
      (4003L, "m3", 4.00, "z", 100.0, 1200L))
      .toDF("cc_num", "merchant", "amount", "zip_code", "trans_ts", "arrival_s")
    def emitsOf(events: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      StreamingAgg
        .trailingAgg(events.as[StreamEvent])
        .collect()
        .map(e => e.sumCents -> ((e.ordUs / 1000000L, e.cnt)))
        .toMap // keyed by running sum (unique per emission here)

    val eventMode = emitsOf(JsonIngest.toStreamEvents(payloads))
    val arrivalMode = emitsOf(
      JsonIngest.toStreamEventsArrival(payloads, col("arrival_s") * 1000000L))

    // In-order events agree in both modes (arrival == event time for them)
    assert(eventMode(100L) == ((1000L, 1L)))
    assert(arrivalMode(100L) == ((1000L, 1L)))
    assert(eventMode(300L) == ((1100L, 2L)))
    assert(arrivalMode(300L) == ((1100L, 2L)))
    // The late event is where the modes diverge, exactly:
    //   event time: windowed back at trans_ts=100 -> frame holds only itself
    assert(eventMode(400L) == ((100L, 1L)))
    //   ROWTIME: windowed at arrival=1200 -> frame holds all three arrivals
    assert(arrivalMode(700L) == ((1200L, 3L)))
  }

  test("streaming exact dedup drops watermark-window duplicates across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[StreamEvent]
    val deduped = graft.streaming.StreamDedup.withinWatermark(
      source.toDS().withColumn("ts", timestamp_micros(col("ordUs"))),
      tsCol = "ts",
      delay = "10 minutes",
      idCols = Seq("userId", "ordUs"))
    val sinkName = s"dedup_out_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append").format("memory").queryName(sinkName).start()
    try {
      val t0 = 1700000000L * 1000000L
      // batch 1: two originals + an in-batch duplicate
      source.addData(Seq(
        StreamEvent(1L, t0, 100L),
        StreamEvent(1L, t0, 100L),
        StreamEvent(2L, t0 + 1000000L, 200L)))
      q.processAllAvailable()
      // batch 2: a replayed duplicate (within watermark) + one new event
      source.addData(Seq(
        StreamEvent(1L, t0, 100L),
        StreamEvent(3L, t0 + 2000000L, 300L)))
      q.processAllAvailable()
      val got = spark.table(sinkName).select("userId", "ordUs").as[(Long, Long)].collect().toSeq
      assert(got.size == 3, s"duplicates must be dropped, got $got")
      assert(got.toSet == Set((1L, t0), (2L, t0 + 1000000L), (3L, t0 + 2000000L)))
    } finally q.stop()
  }

  test("online store: last-write-wins by event time, string codec, snapshot round-trip") {
    val store = new OnlineFeatureStore(Seq("cnt_10m", "avg_10m"))
    store.put(7L, 100L, Array(2.0, 50.0))
    store.put(7L, 90L, Array(9.0, 9.0)) // older: ignored
    assert(store.get(7L).get._2.toSeq == Seq(2.0, 50.0))
    store.put(7L, 100L, Array(3.0, 60.0)) // equal time: latest put wins
    assert(store.get(7L).get._2.toSeq == Seq(3.0, 60.0))
    assert(store.getFeature(7L, "avg_10m").contains(60.0))
    assert(store.recordAsStrings(7L).get("cnt_10m") == "3.0")

    val dir = java.nio.file.Files.createTempDirectory("store").toString
    store.save(spark, s"$dir/snap")
    val restored = new OnlineFeatureStore(Seq("cnt_10m", "avg_10m"))
    restored.load(spark, s"$dir/snap")
    assert(restored.get(7L).get._2.toSeq == Seq(3.0, 60.0))
  }

  test("burst scenario: 10-event burst flips NOT FRAUD -> FRAUD after warmup") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val batchStore = new OnlineFeatureStore(Seq("cnt_1w", "avg_1w"))
    batchStore.put(99L, 0L, Array(20.0, 50.0)) // card history: 20 txns/week
    val streamStore = new OnlineFeatureStore(Seq("cnt_10m", "avg_10m"))

    val source = MemoryStream[StreamEvent]
    val q = StreamingAgg
      .trailingAgg(source.toDS())
      .writeStream
      .outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[AggEmit], _: Long) =>
        streamStore.upsertBatch(
          ds.toDF().select(
            col("userId").as("key"),
            col("ordUs").as("event_time_us"),
            col("cnt").cast("double").as("cnt_10m"),
            col("avgAmount").as("avg_10m")))
      }
      .start()
    try {
      val base = 5000L * 1000000L
      // notebook-4 scenario part 1: single transactions on three DISTINCT
      // cards with ordinary history score NOT FRAUD
      (101L to 103L).foreach { card =>
        batchStore.put(card, 0L, Array(20.0, 50.0))
        val ts = base + card * 1000L
        source.addData(StreamEvent(card, ts, 5000))
        q.processAllAvailable()
        val scored = EnrichAndScore.score(streamStore, batchStore, card, ts, 50.0, nowUs = ts)
        assert(scored.map(_.label).contains("NOT FRAUD"), s"normal txn on $card mislabeled")
      }
      // part 2: a 10-transaction burst on ONE card flips to FRAUD after warmup
      val labels = (1 to 10).map { k =>
        val ts = base + k * 1500000L // 1.5 s apart
        source.addData(StreamEvent(99L, ts, 10000))
        q.processAllAvailable()
        val scored = EnrichAndScore.score(streamStore, batchStore, 99L, ts, 100.0, nowUs = ts)
        assert(scored.nonEmpty)
        scored.get.label
      }
      assert(labels.take(2).forall(_ == "NOT FRAUD"), s"warmup mislabeled: $labels")
      assert(labels.drop(2).forall(_ == "FRAUD"), s"burst not flagged: $labels")
    } finally q.stop()
  }

  test("staleness gate: stale streaming aggregate zeroes ratios but still scores") {
    val batchStore = new OnlineFeatureStore(Seq("cnt_1w", "avg_1w"))
    batchStore.put(1L, 0L, Array(10.0, 40.0))
    val streamStore = new OnlineFeatureStore(Seq("cnt_10m", "avg_10m"))
    streamStore.put(1L, 1000L * 1000000L, Array(5.0, 80.0))

    val fresh = EnrichAndScore.lookupFeatures(streamStore, batchStore, 1L, 100.0,
      nowUs = 1500L * 1000000L)
    assert(fresh.countRatio == 0.5 && fresh.amtRatio1 == 2.0 && fresh.amtRatio2 == 2.5)

    val stale = EnrichAndScore.lookupFeatures(streamStore, batchStore, 1L, 100.0,
      nowUs = 1700L * 1000000L) // 700 s later > 600 s cutoff
    assert(stale == EnrichAndScore.Features(100.0, 0.0, 0.0, 0.0))

    // missing streaming record: event skipped entirely (reference :76-77)
    assert(EnrichAndScore.score(streamStore, batchStore, 42L, 0L, 1.0, 0L).isEmpty)
  }

  test("streaming count-min sketch: maintained counters bit-equal the batch build") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id").as("userId"), col("ord_us").as("ordUs"), col("cents"))
      .as[StreamEvent]
      .collect()
      .toSeq
    val source = MemoryStream[StreamEvent]
    val sinkName = s"cm_out_${System.nanoTime()}"
    val q = graft.streaming.StreamingSketch
      .countMinStream(source.toDS().toDF(), col("userId"), col("cents"), 3, 64, "cmstream")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .start()
    try {
      // chunked replay: counter merges are commutative, so micro-batch
      // boundaries must not be observable in the final sketch
      events.grouped((events.size / 3) + 1).foreach { c =>
        source.addData(c)
        q.processAllAvailable()
      }
      val streamed = spark.table(sinkName)
      val batch = graft.operators.Sketches.countMinSketch(
        events.toDF(), col("userId"), col("cents"), 3, 64, "cmstream")
      assert(streamed.count() > 0 && streamed.count() <= 3L * 64L,
        "sketch state must stay depth*width bounded")
      assert(
        streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "maintained sketch must bit-equal the batch build")
      // and the point estimates read identically off either sketch
      val probes = events.toDF().select(col("userId")).distinct()
      val estS = graft.operators.Sketches
        .countMinEstimate(streamed, probes, col("userId"), "userId", 3, 64, "cmstream")
      val estB = graft.operators.Sketches
        .countMinEstimate(batch, probes, col("userId"), "userId", 3, 64, "cmstream")
      assert(estS.exceptAll(estB).isEmpty && estB.exceptAll(estS).isEmpty)
    } finally q.stop()
  }
}
