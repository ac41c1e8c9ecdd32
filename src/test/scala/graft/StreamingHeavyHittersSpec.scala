package graft

import graft.streaming.StreamingAgg.StreamEvent
import graft.streaming.HeavyHittersProcessor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Misra–Gries monitor's two contracts, observed at the
  * query level:
  *
  *   1. DETERMINISM ACROSS CHUNKINGS: the maintained per-shard counters
  *      bit-equal a sequential MG fold over the same arrival order (each
  *      chunk sorted by (ordUs, cents), chunks in order) — micro-batch
  *      boundaries never change the state, only when snapshots emit.
  *   2. THE PRUNING GUARANTEE: a planted heavy item (>1/capacity of its
  *      shard) is alive in the final summary under EVERY chunking tried,
  *      and an exact recount of the final candidates reproduces the true
  *      heavy set — the k6 split (sketch prunes, recount is exact) with
  *      the sketch half running on the stream.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = {
    // transformWithState requires the RocksDB state store provider
    val s = Sessions.local("4")
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private val Shards = 4L
  private val Capacity = 8

  /** Reference fold: plain sequential Misra–Gries over the given order. */
  private def mgFold(events: Seq[StreamEvent]): Map[Long, Map[Long, Long]] = {
    val st = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.LinkedHashMap[Long, Long]]
    events.foreach { e =>
      val counters = st.getOrElseUpdate(
        math.floorMod(e.userId, Shards), scala.collection.mutable.LinkedHashMap.empty)
      counters.get(e.cents) match {
        case Some(c) => counters.update(e.cents, c + 1L)
        case None if counters.size < Capacity => counters.update(e.cents, 1L)
        case None =>
          counters.filterInPlace((_, c) => c > 1L)
          counters.mapValuesInPlace((_, c) => c - 1L)
      }
    }
    st.view.mapValues(_.toMap).toMap
  }

  test("chunked streaming MG bit-equals the sequential fold; planted heavy always survives") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // item = 7777 for every cents%5==0 event (~20% of the stream — far
    // over the 1/8 threshold), else a long-tail item id
    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("c0", round(col("value") * 100).cast("long"))
      .select(
        col("user_id").as("userId"),
        col("ord_us").as("ordUs"),
        when(pmod(col("c0"), lit(5L)) === 0L, 7777L).otherwise(pmod(col("c0"), lit(1000L)))
          .as("cents"))
      .as[StreamEvent]
      .collect()
      .toSeq
    val n = events.size.toLong
    val trueHeavy = events
      .groupBy(_.cents)
      .collect { case (item, es) if es.size.toLong * Capacity > n => item }
      .toSet
    assert(trueHeavy.contains(7777L), "fixture must contain the planted heavy item")

    for (nChunks <- Seq(1, 3, 7)) {
      val source = MemoryStream[StreamEvent]
      val sinkName = s"hh_out_${System.nanoTime()}"
      val q = HeavyHittersProcessor
        .monitor(source.toDS(), Shards, Capacity)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(sinkName)
        .start()
      try {
        val chunks = events.grouped((events.size / nChunks) + 1).toSeq
        chunks.foreach { c => source.addData(c); q.processAllAvailable() }
        val emitted = spark.table(sinkName)
          .select(col("shard"), col("seq"), col("item"), col("cnt"))
          .as[(Long, Long, Long, Long)].collect()
        // current summary per shard = the rows of its highest-seq snapshot
        val streamed = emitted.groupBy(_._1).view.mapValues { rows =>
          val lastSeq = rows.map(_._2).max
          rows.collect { case (_, s, item, cnt) if s == lastSeq => item -> cnt }.toMap
        }.toMap
        // the reference order is exactly what the processor saw: each
        // chunk sorted by (ordUs, cents), chunks in arrival order
        val ref = mgFold(chunks.flatMap(_.sortBy(e => (e.ordUs, e.cents))))
        assert(streamed == ref,
          s"streaming MG state must equal the sequential fold at $nChunks chunks")
        // state bound: never more than `capacity` counters per shard
        assert(streamed.values.forall(_.size <= Capacity))
        // pruning guarantee: every true heavy item is alive in some shard
        val candidates = streamed.values.flatMap(_.keys).toSet
        assert(trueHeavy.subsetOf(candidates),
          s"true heavies $trueHeavy must survive the summary at $nChunks chunks")
        // the k6 split completed: exact recount of candidates == truth
        val recounted = events
          .groupBy(_.cents)
          .collect { case (item, es) if candidates(item) && es.size.toLong * Capacity > n => item }
          .toSet
        assert(recounted == trueHeavy)
      } finally q.stop()
    }
  }
}
