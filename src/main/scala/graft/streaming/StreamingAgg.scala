package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-event trailing-window streaming aggregation (SURVEY.md §2.4 W6,
  * §2.7; reference KDA continuous query `notebooks/1_setup.ipynb:466-478`).
  *
  * Semantics: for every input event, emit that key's COUNT/AVG over the
  * trailing `[t - horizon, t]` event-time window — one output row per
  * input event (KDA pump semantics, T3), keyed state pruned on append.
  * The reference windows over ARRIVAL time (T1); we window over true event
  * time — a documented semantic upgrade. Events are processed in event-time
  * order within each (key, micro-batch); an event older than the key's
  * newest buffered event minus the horizon contributes nothing and emits
  * the aggregate as-of itself (late-data policy matching the reference's
  * 600 s discard, T4). Same-timestamp ties are processed sequentially, so
  * the FIRST tied event's emission sees a partial frame while the batch
  * RANGE window includes all ties — the same per-arrival semantics as the
  * reference's continuous query; the final emission per (key, ts) always
  * agrees with the batch operator.
  *
  * Implementation: `flatMapGroupsWithState` with ProcessingTimeTimeout for
  * idle-key state expiry. The buffer holds (tsUs, cents) pairs inside the
  * horizon — integer cents so streamed aggregates are bit-identical to the
  * batch TrailingWindows operator (the batch≡stream parity gate, SURVEY
  * §5.3). State size per key is bounded by events-per-horizon; at 100 TB
  * scale hot keys should pre-aggregate per (key, second) upstream.
  */
object StreamingAgg {

  /** Input event (cents = exact integer money, ordUs = event-time micros). */
  case class StreamEvent(userId: Long, ordUs: Long, cents: Long)

  /** Per-event emission: trailing count/avg as of this event. */
  case class AggEmit(
      userId: Long,
      ordUs: Long,
      cnt: Long,
      sumCents: Long,
      avgAmount: Double)

  /** Keyed state: trailing buffer sorted ascending by ordUs. */
  case class Buffer(events: List[(Long, Long)])

  val HorizonUs: Long = 600L * 1000000L // 10 minutes, reference w1

  private def process(horizonUs: Long, idleTimeoutMs: Option[Long])(
      key: Long,
      events: Iterator[StreamEvent],
      state: GroupState[Buffer]): Iterator[AggEmit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var buf = state.getOption.map(_.events).getOrElse(Nil)
      val out = events.toSeq.sortBy(_.ordUs).map { e =>
        buf = ((e.ordUs, e.cents) :: buf.filter(_._1 >= e.ordUs - horizonUs))
          .sortBy(_._1)
        val inWindow = buf.filter(t => t._1 >= e.ordUs - horizonUs && t._1 <= e.ordUs)
        val cnt = inWindow.size.toLong
        val sum = inWindow.map(_._2).sum
        AggEmit(key, e.ordUs, cnt, sum, sum.toDouble / cnt / 100.0)
      }
      state.update(Buffer(buf))
      idleTimeoutMs.foreach(state.setTimeoutDuration)
      out.iterator
    }
  }

  /** Wire the operator onto a stream (or batch Dataset — same code path,
    * which is what the parity tests exploit).
    *
    * @param idleTimeoutMs when set, keys silent for this long have their
    *   state dropped (ProcessingTimeTimeout). Leave None unless needed:
    *   registered timeouts make the engine schedule continuous empty
    *   micro-batches to check them, which is pure overhead for bounded
    *   replays and busy streams.
    */
  def trailingAgg(
      events: Dataset[StreamEvent],
      horizonUs: Long = HorizonUs,
      idleTimeoutMs: Option[Long] = None): Dataset[AggEmit] = {
    implicit val bufEnc: Encoder[Buffer] = Encoders.product[Buffer]
    implicit val outEnc: Encoder[AggEmit] = Encoders.product[AggEmit]
    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        process(horizonUs, idleTimeoutMs))
  }
}
