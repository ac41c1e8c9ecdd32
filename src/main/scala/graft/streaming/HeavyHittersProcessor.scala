package graft.streaming

import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming Misra–Gries heavy-hitter monitor — the candidate half of
  * k6's two-phase exact heavy hitters run where a 100 TB ingest needs it:
  * per-event on the live stream, with O(capacity) state per shard
  * regardless of stream length or item-universe size (an exact streaming
  * top-k would hold every distinct item's count forever).
  *
  * Same contract split as the batch operator
  * ([[graft.operators.HeavyHitters]]): the summary only PRUNES — any item
  * whose true shard count exceeds n_shard/capacity is guaranteed alive in
  * that shard's counters (the MG invariant: each decrement-all step
  * consumes capacity+1 occurrences, so an item's counter underestimates
  * its true count by at most n/(capacity+1) < n/capacity), and by
  * pigeonhole every GLOBAL item over N/capacity is over the local bound
  * in at least one shard — so the union of shard summaries is a superset
  * of the true heavy set, and an exact recount (batch side, or the k6
  * gate) makes the final answer exact. StreamingHeavyHittersSpec pins
  * both halves: the maintained counters bit-equal a sequential MG fold
  * over the same arrival order no matter how the stream was chunked into
  * micro-batches, and the planted heavy item survives every chunking.
  *
  * Ordering contract (the CUSUM discipline): MG state does not rewind,
  * so rows sort by (ordUs, cents) within each micro-batch and a
  * cross-batch STRICTLY-late event is dropped and counted in `nLate`
  * rather than silently reordering the fold.
  *
  * Emission: one summary snapshot per (shard, micro-batch) tagged with a
  * per-shard monotone `seq`, so an append-mode sink holds the full
  * monitor history and `max(seq)` per shard is the current summary.
  */
final case class HhEmit(shard: Long, seq: Long, item: Long, cnt: Long, nTotal: Long, nLate: Long)

/** (items, counts, lastOrdUs, nTotal, nLate, seq) — items kept sorted so
  * the persisted state is canonical (array order never depends on hash
  * iteration).
  */
final case class MgState(
    items: Array[Long],
    counts: Array[Long],
    lastOrd: Long,
    n: Long,
    nLate: Long,
    seq: Long)

class HeavyHittersProcessor(capacity: Int)
    extends StatefulProcessor[Long, StreamEvent, HhEmit] {

  @transient private var st: ValueState[MgState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[MgState]("mg_state", Encoders.product[MgState], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[HhEmit] = {
    val prev =
      if (st.exists()) st.get()
      else MgState(Array.empty, Array.empty, Long.MinValue, 0L, 0L, 0L)
    val counters = scala.collection.mutable.LinkedHashMap.from(prev.items.zip(prev.counts))
    var (lastOrd, n, nLate) = (prev.lastOrd, prev.n, prev.nLate)
    rows.toSeq.sortBy(e => (e.ordUs, e.cents)).foreach { e =>
      if (e.ordUs < lastOrd) nLate += 1L
      else {
        lastOrd = e.ordUs
        n += 1L
        val item = e.cents
        counters.get(item) match {
          case Some(c) => counters.update(item, c + 1L)
          case None if counters.size < capacity => counters.update(item, 1L)
          case None =>
            // decrement-all: every counter drops one, zeros evicted
            counters.filterInPlace((_, c) => c > 1L)
            counters.mapValuesInPlace((_, c) => c - 1L)
        }
      }
    }
    val sorted = counters.toArray.sortBy(_._1)
    val next = MgState(sorted.map(_._1), sorted.map(_._2), lastOrd, n, nLate, prev.seq + 1L)
    st.update(next)
    sorted.iterator.map { case (item, cnt) => HhEmit(key, next.seq, item, cnt, n, nLate) }
  }
}

object HeavyHittersProcessor {

  /** Wire the monitor onto a keyed stream: shard = userId mod `shards`,
    * item = the event's cents value (map the item into `cents` upstream).
    */
  def monitor(events: Dataset[StreamEvent], shards: Long, capacity: Int): Dataset[HhEmit] = {
    implicit val enc: org.apache.spark.sql.Encoder[HhEmit] = Encoders.product[HhEmit]
    events
      .groupByKey(e => math.floorMod(e.userId, shards))(Encoders.scalaLong)
      .transformWithState(new HeavyHittersProcessor(capacity), TimeMode.None(), OutputMode.Append())
  }
}
