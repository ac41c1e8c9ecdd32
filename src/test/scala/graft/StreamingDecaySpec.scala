package graft

import graft.streaming.DecayProcessor
import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming EWMA (decayed spend) processor must match the per-key
  * batch closed form bit-exactly — under ANY arrival order and chunking,
  * because the statistic is a commutative function of the (day, cents)
  * multiset (the order-insensitivity contrast to CUSUM's enforced
  * ordering). State stays bounded at ≤ shift+1 day buckets per key.
  */
class StreamingDecaySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private val DayUs = 86400000000L

  /** w13's closed form per key: weights 2^(shift−age) from the key's own
    * max day, ages beyond shift contribute 0.
    */
  private def batchDecayed(events: Seq[StreamEvent], shift: Int): Map[Long, (Long, Long)] =
    events.groupBy(_.userId).map { case (u, es) =>
      val daily = es.groupBy(e => Math.floorDiv(e.ordUs, DayUs))
        .view.mapValues(_.map(_.cents).sum).toMap
      val maxDay = daily.keys.max
      val live = daily.filter { case (d, _) => maxDay - d <= shift }
      val dec = live.iterator.map { case (d, c) => c << (shift - (maxDay - d)).toInt }.sum
      u -> (dec, live.size.toLong)
    }

  test("streaming decayed spend == per-key closed form under shuffled, chunked arrival") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // distinct (user, ordUs) makes every emission uniquely addressable
    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id").as("userId"), col("ord_us").as("ordUs"), col("cents"))
      .as[StreamEvent]
      .collect()
      .groupBy(e => (e.userId, e.ordUs))
      .map(_._2.head)
      .toSeq
    // deterministic SHUFFLE: decay is order-insensitive, so a scrambled
    // replay must still land bit-exactly (md5-keyed order)
    val scrambled = events.sortBy(e =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"${e.userId}|${e.ordUs}".getBytes("UTF-8")).toSeq.toString)
    // the emission carrying each key's FINAL state is its last-arrived
    // event's (unique) row — known by construction from the replay order
    val lastArrival: Map[Long, Long] =
      scrambled.zipWithIndex.groupBy(_._1.userId)
        .map { case (u, es) => u -> es.maxBy(_._2)._1.ordUs }

    val source = MemoryStream[StreamEvent]
    val sink = s"decay_out_${System.nanoTime()}"
    val q = DecayProcessor
      .decay(source.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val streamed =
      try {
        scrambled.grouped(math.max(1, scrambled.size / 5)).foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
        spark.table(sink).as[(Long, Long, Long, Long, Long)].collect()
      } finally q.stop()
    assert(streamed.length == events.size, "one emission per event")
    val finalByKey = streamed
      .filter { case (u, ordUs, _, _, _) => lastArrival(u) == ordUs }
      .map(r => r._1 -> r)
      .toMap
    val expected = batchDecayed(events, DecayProcessor.Shift)
    assert(finalByKey.keySet == expected.keySet)
    expected.foreach { case (u, (dec, nLive)) =>
      val (_, _, _, gotDec, gotLive) = finalByKey(u)
      assert(gotDec == dec, s"user $u decayed: got $gotDec expected $dec")
      assert(gotLive == nLive, s"user $u live days: got $gotLive expected $nLive")
      assert(gotLive <= DecayProcessor.Shift + 1L, "state must stay window-bounded")
    }
  }

  test("an event older than the live window is a weight-0 no-op on arrival") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val shift = 2 // tiny window: weights 4, 2, 1 then 0
    val u = 1L
    val ev = Seq(
      StreamEvent(u, 10L * DayUs, 100L), // day 10 -> maxDay 10
      StreamEvent(u, 12L * DayUs, 50L), // day 12 -> prune day < 10
      StreamEvent(u, 3L * DayUs, 999L) // day 3: aged out, must not change the value
    )
    val source = MemoryStream[StreamEvent]
    val sink = s"decay_old_${System.nanoTime()}"
    val q = DecayProcessor
      .decay(source.toDS(), shift)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val rows =
      try {
        ev.foreach { e => source.addData(e); q.processAllAvailable() }
        spark.table(sink).as[(Long, Long, Long, Long, Long)].collect().toSeq
      } finally q.stop()
    // day 10: 100<<2 = 400; day 12: 100<<0 + 50<<2 = 300; day 3: unchanged 300
    assert(rows.map(_._4) == Seq(400L, 300L, 300L), rows.toString)
    assert(rows.last._3 == 12L, "asof day must stay at the key's max day")
  }
}
