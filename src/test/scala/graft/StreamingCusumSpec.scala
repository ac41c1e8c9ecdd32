package graft

import graft.streaming.CusumProcessor
import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CUSUM processor must be bit-identical to the batch
  * closed form S_t = P_t − min(0, min P_i) over the same per-key
  * event-time replay, across micro-batch boundaries (the a26 operator
  * on the stream; O(1) state per key).
  */
class StreamingCusumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("streaming CUSUM == batch closed form over a chunked replay") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    // distinct (user, ordUs) keeps the order-sensitive scan tie-free —
    // the processor's in-batch sort and the batch window then share one
    // total order
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
    val mu0 = events.map(_.cents).sum / events.size
    val slack = mu0 / 10

    val source = MemoryStream[StreamEvent]
    val sink = s"cusum_out_${System.nanoTime()}"
    val q = CusumProcessor
      .cusum(source.toDS(), mu0, slack)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val streamed =
      try {
        // 7 uneven chunks: state must carry p/minP across micro-batches
        events.grouped(math.max(1, events.size / 7)).foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
        spark.table(sink).as[(Long, Long, Long)].collect().toSet
      } finally q.stop()

    val batch = {
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy(col("userId"))
        .orderBy(col("ordUs"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events
        .toDF()
        .withColumn("p", sum(col("cents") - mu0 - slack).over(w))
        .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
        .select(col("userId"), col("ordUs"), col("s"))
        .as[(Long, Long, Long)]
        .collect()
        .toSet
    }

    assert(streamed.nonEmpty && streamed == batch,
      s"streaming CUSUM diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("CUSUM state (p, minP) survives a query restart from checkpoint") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cusum_recovery").toString
    val srcDir = s"$root/events"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    val emissions = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    def startQuery() = spark.readStream
      .schema("userId LONG, ordUs LONG, cents LONG")
      .parquet(srcDir)
      .as[StreamEvent]
      .transform(CusumProcessor.cusum(_, mu0 = 100L, slack = 10L))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[graft.streaming.CusumEmit], _: Long) =>
        ds.collect().foreach(e => emissions.add((e.userId, e.ordUs, e.s)))
      }
      .start()

    // phase 1: d = +90 then −60 → p = 30, minP = 0, s emissions 90 then 30
    Seq(StreamEvent(7L, 1000L, 200L), StreamEvent(7L, 2000L, 50L))
      .toDS().write.parquet(s"$srcDir/chunk=1")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // phase 2: RESTART; d = +190 → s = 220 ONLY if p = 30 was recovered
    // (a fresh state would emit 190)
    Seq(StreamEvent(7L, 3000L, 300L)).toDS().write.parquet(s"$srcDir/chunk=2")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val got = {
      val it = emissions.iterator(); val b = Seq.newBuilder[(Long, Long, Long)]
      while (it.hasNext) b += it.next(); b.result().toSet
    }
    assert(got == Set((7L, 1000L, 90L), (7L, 2000L, 30L), (7L, 3000L, 220L)),
      s"CUSUM state lost across restart: $got")
  }

  test("cross-batch late event is dropped, not folded into the statistic") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val source = MemoryStream[StreamEvent]
    val sink = s"cusum_late_${System.nanoTime()}"
    // mu0=100, slack=10 → d = cents − 110
    val q = CusumProcessor
      .cusum(source.toDS(), mu0 = 100L, slack = 10L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val got =
      try {
        // batch 1 advances lastOrd to 3000
        source.addData(StreamEvent(7L, 1000L, 200L), StreamEvent(7L, 3000L, 50L))
        q.processAllAvailable()
        // batch 2 carries a LATE event (2000 < 3000) plus an in-order one;
        // the late row must emit nothing and leave p/minP untouched
        source.addData(StreamEvent(7L, 2000L, 999L), StreamEvent(7L, 4000L, 300L))
        q.processAllAvailable()
        spark.table(sink).as[(Long, Long, Long)].collect().toSet
      } finally q.stop()
    // in-order replay [200, 50, 300]: d = +90, −60, +190 → p = 90, 30, 220;
    // minP = 0 throughout → s = 90, 30, 220. A folded-in late 999 event
    // would shift every subsequent p by +889.
    assert(
      got == Set((7L, 1000L, 90L), (7L, 3000L, 30L), (7L, 4000L, 220L)),
      s"late event corrupted or was emitted: $got")
  }
}
