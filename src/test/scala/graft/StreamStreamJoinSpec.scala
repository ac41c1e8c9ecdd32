package graft

import graft.streaming.StreamStreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: the STREAMING run (two watermarked
  * MemoryStream sources, state-bounded inner interval join, replayed in
  * event-time-ordered chunks across micro-batches) must equal the BATCH
  * run of the SAME function bit-for-bit — the dual-plane contract that
  * lets the batch j6 oracle gate pin what the stream emits.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  private val sf = "/root/testdata/sf0.001"
  private val WindowUs = 600L * 1000000L

  private def typed(tpe: String) =
    Tables
      .events(spark, sf)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"), col("ord_us"))

  test("streaming interval join == batch interval join on replayed sf0.001 events") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batch = StreamStreamJoin
      .intervalJoin(typed("purchase"), typed("click"),
        "user_id", "ord_us", "event_id", WindowUs, watermarkSecs = 600L)
      .select("key", "l_id", "r_id", "gap_us")
      .as[(Long, Long, Long, Long)]
      .collect()
      .sorted
      .toSeq
    assert(batch.nonEmpty, "the parity corpus must exercise the join")

    val purchases = typed("purchase").as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    val clicks = typed("click").as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    val pSrc = MemoryStream[(Long, Long, Long)]
    val cSrc = MemoryStream[(Long, Long, Long)]
    val joined = StreamStreamJoin.intervalJoin(
      pSrc.toDS().toDF("user_id", "event_id", "ord_us"),
      cSrc.toDS().toDF("user_id", "event_id", "ord_us"),
      "user_id", "ord_us", "event_id", WindowUs, watermarkSecs = 600L)
    val sink = s"ssj_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      // event-time-ordered chunks on BOTH sides so pairs span micro-batches
      val pChunks = purchases.grouped((purchases.size / 3) + 1).toSeq
      val cChunks = clicks.grouped((clicks.size / 3) + 1).toSeq
      pChunks.zipAll(cChunks, Seq.empty[(Long, Long, Long)], Seq.empty[(Long, Long, Long)]).foreach {
        case (p, c) =>
          if (p.nonEmpty) pSrc.addData(p)
          if (c.nonEmpty) cSrc.addData(c)
          q.processAllAvailable()
      }
      val streamed = spark
        .table(sink)
        .select("key", "l_id", "r_id", "gap_us")
        .as[(Long, Long, Long, Long)]
        .collect()
        .sorted
        .toSeq
      assert(streamed == batch, s"stream (${streamed.size}) != batch (${batch.size})")
    } finally q.stop()
  }
}
