package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.streaming.StreamingAgg
import graft.streaming.StreamingAgg.{AggEmit, StreamEvent}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T5 fault tolerance: the per-event trailing window's keyed state
  * survives a full query restart from the checkpoint — emissions after
  * recovery still see the pre-restart buffer. Uses a file source (replay-
  * able, unlike MemoryStream) + a real checkpoint directory.
  */
class RecoverySpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  test("streaming trailing agg resumes from checkpoint with state intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("recovery").toString
    val srcDir = s"$root/events"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    val emissions = new java.util.concurrent.ConcurrentLinkedQueue[AggEmit]()
    def startQuery() = spark.readStream
      .schema("userId LONG, ordUs LONG, cents LONG")
      .parquet(srcDir)
      .as[StreamEvent]
      .transform(StreamingAgg.trailingAgg(_))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[AggEmit], _: Long) =>
        ds.collect().foreach(emissions.add)
      }
      .start()

    // phase 1: two events on key 7 inside one 10-min window
    Seq(StreamEvent(7L, 1000L * 1000000L, 100L), StreamEvent(7L, 1100L * 1000000L, 200L))
      .toDS().write.parquet(s"$srcDir/chunk=1")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(emissions.size() == 2)
    assert(emissions.asScala().map(e => (e.ordUs / 1000000L, e.cnt)).toSet ==
      Set((1000L, 1L), (1100L, 2L)))

    // phase 2: RESTART from checkpoint, then a third event still within
    // 600 s of the first two — count must include the recovered buffer
    Seq(StreamEvent(7L, 1300L * 1000000L, 400L))
      .toDS().write.parquet(s"$srcDir/chunk=2")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val third = emissions.asScala().find(_.ordUs == 1300L * 1000000L)
    assert(third.nonEmpty, "post-restart event not processed")
    assert(third.get.cnt == 3L && third.get.sumCents == 700L,
      s"state lost across restart: ${third.get}")
  }

  private implicit class QueueOps[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala(): Seq[A] = {
      val it = q.iterator()
      val b = Seq.newBuilder[A]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  test("scoreFrame runs as a streaming query via stream-static broadcast join") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val snapshot = Seq(
      (1L, 900L * 1000000L, 8L, 90.0, 10L, 80.0), // bursty -> FRAUD
      (2L, 900L * 1000000L, 1L, 50.0, 20L, 60.0) // quiet -> NOT FRAUD
    ).toDF("user_id", "snap_ts_us", "cnt_short", "avg_short", "cnt_long", "avg_long")

    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val sink = s"score_out_${System.nanoTime()}"
    val q = graft.streaming.EnrichAndScore
      .scoreFrame(
        source.toDS().toDF("user_id", "amount"),
        snapshot, "user_id", "amount", lit(1000L * 1000000L))
      .select($"user_id", $"label")
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      source.addData((1L, 100.0), (2L, 100.0))
      q.processAllAvailable()
      val out = spark.table(sink).as[(Long, String)].collect().toMap
      assert(out == Map(1L -> "FRAUD", 2L -> "NOT FRAUD"))
    } finally q.stop()
  }

  test("hot-shingle cap bounds the jaccard join while keeping signal pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common alpha beta gamma delta"),
      (2L, "common common common alpha beta gamma delta"), // near-dup of 1
      (3L, "common common common zeta eta theta iota")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleSet(docs, "doc_id", "text", 2)
    val capped = Dedup.dropHotShingles(sh, maxDf = 2)
    // the df=3 shingle ("common common") is gone; discriminative ones stay
    assert(capped.filter($"shingle" === "common common").count() == 0)
    val pairs = Dedup.jaccardPairs(capped)
      .filter($"jaccard" >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
