package graft

import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming KMV distinct monitor's parity contract: the maintained
  * per-key sketch is bit-identical to the batch k8 aggregate over the
  * same rows, no matter how the stream was chunked into micro-batches —
  * the merge-lattice property (commutative, associative, idempotent)
  * made observable at the query level. Also pins the duplicate-delivery
  * case the lattice makes free: replaying an entire chunk changes
  * nothing (idempotence is what an at-least-once source needs).
  */
class StreamingKmvSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")

  test("streaming per-key KMV sketch bit-equals the batch aggregate; replays are no-ops") {
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
    val sinkName = s"kmv_out_${System.nanoTime()}"
    // key: userId mod 8 (a handful of groups, each with many entities);
    // entity: the event's cents value
    val q = graft.streaming.StreamingKmv
      .kmvDistinctStream(
        source.toDS().toDF(), pmod(col("userId"), lit(8L)), col("cents"), 32, "kmvstream")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .start()
    try {
      val chunks = events.grouped((events.size / 3) + 1).toSeq
      chunks.foreach { c =>
        source.addData(c)
        q.processAllAvailable()
      }
      // at-least-once delivery: replay the whole middle chunk — the
      // lattice is idempotent, the sketch must not move
      source.addData(chunks(1))
      q.processAllAvailable()

      def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] = df
        .select(col("key"), col("kmv.m"), col("kmv.hk"), col("kmv.est_nd"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val streamed = rows(spark.table(sinkName))
      val batch = rows(
        events.toDF()
          .groupBy(pmod(col("userId"), lit(8L)).as("key"))
          .agg(graft.functions.KmvDistinctAgg.kmvDistinct(col("cents"), 32, "kmvstream").as("kmv")))
      assert(streamed == batch,
        "maintained per-key sketch must bit-equal the batch aggregate after chunked+replayed delivery")
      // state posture: the sink is |keys| rows; every sketch is <= k hashes
      assert(streamed.size == 8 && streamed.forall(_._2 <= 32L))
    } finally q.stop()
  }

  test("streaming per-key quantile monitor bit-equals the batch k9 aggregate; replays are no-ops") {
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
    val sinkName = s"kq_out_${System.nanoTime()}"
    // id: the event's (userId, ordUs) — unique per row; value: cents
    def withId(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rid", concat(col("userId"), lit(":"), col("ordUs")))
    val q = graft.streaming.StreamingKmv
      .kmvQuantilesStream(
        withId(source.toDS().toDF()),
        pmod(col("userId"), lit(8L)), col("rid"), col("cents"), 32, "kqstream")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .start()
    try {
      val chunks = events.grouped((events.size / 3) + 1).toSeq
      chunks.foreach { c =>
        source.addData(c)
        q.processAllAvailable()
      }
      source.addData(chunks(1)) // at-least-once replay: the lattice shrugs
      q.processAllAvailable()

      def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] = df
        .select(col("key"), col("s.m"), col("s.q25"), col("s.q50"), col("s.q75"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val streamed = rows(spark.table(sinkName))
      val batch = rows(
        withId(events.toDF())
          .groupBy(pmod(col("userId"), lit(8L)).as("key"))
          .agg(graft.functions.KmvSampleAgg
            .kmvSampleQuantiles(col("rid"), col("cents"), 32, "kqstream").as("s")))
      assert(streamed == batch,
        "maintained per-key quartiles must bit-equal the batch sample aggregate")
      assert(streamed.size == 8 && streamed.forall(_._2 <= 32L))
      // quartile sanity: ordered within every key's sample
      assert(streamed.forall(r => r._3 <= r._4 && r._4 <= r._5))
    } finally q.stop()
  }
}
