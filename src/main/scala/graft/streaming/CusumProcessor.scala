package graft.streaming

import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming form of the a26 CUSUM drift monitor — the operator the
  * batch gate simulates, run where it actually belongs: per-event on
  * the live stream. State per key is O(1) — exactly two Longs, the
  * drift prefix sum `p` and its running minimum (0-seeded) — against
  * the batch form's full-partition sort; the closed form
  * S_t = P_t − min(0, min_{i≤t} P_i) means each event updates state
  * with two additions and a compare, and the emitted statistic is
  * BIT-IDENTICAL to the batch window computation over the same
  * prefix regardless of micro-batch boundaries
  * (StreamingCusumSpec replays chunked and compares exactly).
  *
  * Ordering contract: CUSUM is order-sensitive and its state does not
  * rewind, so events must arrive per-key in event-time order (rows
  * within one micro-batch are sorted here; cross-batch ordering is the
  * T1/T4 late-data policy's job upstream — the same contract as the
  * reference's per-event trailing windows). The contract is ENFORCED,
  * not just documented: state carries the last-processed ordUs per key,
  * and a cross-batch late event (ordUs below it) is DROPPED — emitting
  * nothing, leaving the statistic untouched — and counted in the per-key
  * `nLate` state field, so an upstream ordering bug surfaces as missing
  * emissions plus a nonzero late counter in the state store instead of
  * silently corrupting every subsequent S_t.
  */
final case class CusumEmit(userId: Long, ordUs: Long, s: Long)

class CusumProcessor(mu0: Long, slack: Long)
    extends StatefulProcessor[Long, StreamEvent, CusumEmit] {

  /** (p, minP, lastOrdUs, nLate) — still O(1) per key. */
  @transient private var st: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long)](
      "cusum_state",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[CusumEmit] = {
    var (p, minP, lastOrd, nLate) =
      if (st.exists()) st.get() else (0L, 0L, Long.MinValue, 0L)
    val out = rows.toSeq.sortBy(_.ordUs).flatMap { e =>
      if (e.ordUs < lastOrd) {
        // cross-batch late arrival: equal timestamps are in-order (the
        // in-batch sort already defines their relative order), strictly
        // older ones would rewind an unrewindable statistic
        nLate += 1L
        None
      } else {
        lastOrd = e.ordUs
        p += e.cents - mu0 - slack
        if (p < minP) minP = p
        Some(CusumEmit(key, e.ordUs, p - minP))
      }
    }
    st.update((p, minP, lastOrd, nLate))
    out.iterator
  }
}

object CusumProcessor {

  /** Wire the monitor onto a keyed stream (RocksDB-backed sessions). */
  def cusum(events: Dataset[StreamEvent], mu0: Long, slack: Long): Dataset[CusumEmit] = {
    implicit val enc: org.apache.spark.sql.Encoder[CusumEmit] = Encoders.product[CusumEmit]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new CusumProcessor(mu0, slack), TimeMode.None(), OutputMode.Append())
  }
}
