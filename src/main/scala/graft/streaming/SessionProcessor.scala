package graft.streaming

import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming form of the w7 gap sessionization ([[graft.operators.Sessionize]])
  * — sessions close ON the stream, the moment the closing evidence
  * arrives (the first event more than `gapUs` after its predecessor),
  * instead of at batch close. State per key is O(1) — the OPEN session's
  * (idx, start, last, n, sum) plus the late counter — never a buffer of
  * events: each arrival either extends the open session (three adds) or
  * emits it and opens the next, so a key with a million events through a
  * month of sessions still holds six Longs of state.
  *
  * Emission contract: a session row is emitted when a LATER event proves
  * the gap, so the per-key final session stays open (unemittable without
  * a time authority — that is the watermark/timer policy's job upstream,
  * same T1/T4 seam as the trailing windows; StreamingSessionSpec closes
  * it with a far-future flush event and pins full bit-parity with the
  * batch [[graft.operators.Sessionize.sessionRollup]] across micro-batch
  * boundary placements). Emitted fields equal the batch rollup's exactly
  * (1-based session_idx in time order, inclusive start/end, exact
  * integer sum).
  *
  * Ordering contract: enforced like [[CusumProcessor]] — rows within a
  * micro-batch are sorted by event time here; a cross-batch late event
  * (older than the open session's last timestamp) cannot be re-sessioned
  * once its session MAY already have been emitted, so it is DROPPED and
  * counted in the per-key `nLate` state field rather than silently
  * appended to the wrong session.
  */
final case class SessionEmit(
    userId: Long,
    sessionIdx: Long,
    nEvents: Long,
    startUs: Long,
    endUs: Long,
    spanUs: Long,
    sumCents: Long)

/** The open session only — six Longs per key, whatever the event volume. */
final case class SessionState(
    idx: Long,
    start: Long,
    last: Long,
    n: Long,
    sum: Long,
    nLate: Long)

class SessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, StreamEvent, SessionEmit] {

  @transient private var st: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SessionState](
      "session_state",
      Encoders.product[SessionState],
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[SessionEmit] = {
    val s0 =
      if (st.exists()) st.get() else SessionState(0L, 0L, Long.MinValue, 0L, 0L, 0L)
    var (idx, start, last, n, sum, nLate) = (s0.idx, s0.start, s0.last, s0.n, s0.sum, s0.nLate)
    val out = rows.toSeq.sortBy(_.ordUs).flatMap { e =>
      if (e.ordUs < last) {
        // cross-batch late arrival (equal timestamps are in-order): its
        // session may already be emitted — count, never mis-session
        nLate += 1L
        None
      } else if (n == 0L) {
        // first event ever seen for this key
        idx = 1L; start = e.ordUs; last = e.ordUs; n = 1L; sum = e.cents
        None
      } else if (e.ordUs - last > gapUs) {
        // gap proven: the open session is complete — emit it, open next
        val closed = SessionEmit(key, idx, n, start, last, last - start, sum)
        idx += 1L; start = e.ordUs; last = e.ordUs; n = 1L; sum = e.cents
        Some(closed)
      } else {
        last = e.ordUs; n += 1L; sum += e.cents
        None
      }
    }
    st.update(SessionState(idx, start, last, n, sum, nLate))
    out.iterator
  }
}

object SessionProcessor {

  /** Wire gap sessionization onto a keyed stream (RocksDB-backed state). */
  def sessions(events: Dataset[StreamEvent], gapUs: Long): Dataset[SessionEmit] = {
    implicit val enc: org.apache.spark.sql.Encoder[SessionEmit] = Encoders.product[SessionEmit]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapUs), TimeMode.None(), OutputMode.Append())
  }
}

/** [[StreamEvent]] plus the watermark column the event-time mode needs. */
final case class TsEvent(userId: Long, ordUs: Long, cents: Long, ts: java.sql.Timestamp)

/** The PRODUCTION form of [[SessionProcessor]]: the watermark is the time
  * authority that closes a key's FINAL session — an event-time timer is
  * (re)armed at `last + gap` whenever the open session extends, and when
  * the watermark passes it, [[handleExpiredTimer]] emits the session with
  * no later event needed (the seam the TimeMode.None form documents away
  * is closed here). A stale timer (the session extended after it was
  * armed) is guarded by recomputing the CURRENT deadline from state — and
  * normally never fires at all: each extension deletes the previous
  * deadline before arming the new one, so a key holds at most ONE live
  * timer (O(1) timer state per key, matching the O(1) value state).
  * Emission contract: identical rows to the batch rollup, now INCLUDING
  * each key's final session once the watermark passes its gap —
  * StreamingSessionSpec pins full bit-parity with NO flush events.
  */
class SessionTimerProcessor(gapUs: Long)
    extends StatefulProcessor[Long, TsEvent, SessionEmit] {

  @transient private var st: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SessionState](
      "session_state",
      Encoders.product[SessionState],
      TTLConfig.NONE)

  private def deadlineMs(lastUs: Long): Long = (lastUs + gapUs) / 1000L + 1L

  override def handleInputRows(
      key: Long,
      rows: Iterator[TsEvent],
      timerValues: TimerValues): Iterator[SessionEmit] = {
    val s0 =
      if (st.exists()) st.get() else SessionState(0L, 0L, Long.MinValue, 0L, 0L, 0L)
    val armed = if (s0.n > 0L) Some(deadlineMs(s0.last)) else None
    var (idx, start, last, n, sum, nLate) = (s0.idx, s0.start, s0.last, s0.n, s0.sum, s0.nLate)
    val out = rows.toSeq.sortBy(_.ordUs).flatMap { e =>
      if (e.ordUs < last) {
        nLate += 1L
        None
      } else if (n == 0L) {
        idx += 1L; start = e.ordUs; last = e.ordUs; n = 1L; sum = e.cents
        None
      } else if (e.ordUs - last > gapUs) {
        val closed = SessionEmit(key, idx, n, start, last, last - start, sum)
        idx += 1L; start = e.ordUs; last = e.ordUs; n = 1L; sum = e.cents
        Some(closed)
      } else {
        last = e.ordUs; n += 1L; sum += e.cents
        None
      }
    }
    st.update(SessionState(idx, start, last, n, sum, nLate))
    if (n > 0L) {
      val dl = deadlineMs(last)
      if (!armed.contains(dl)) {
        armed.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(dl)
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionEmit] = {
    if (!st.exists()) Iterator.empty
    else {
      val s = st.get()
      // guard: only the CURRENT deadline may close (a stale timer from
      // before an extension must not cut the session short)
      if (s.n > 0L && expiredTimerInfo.getExpiryTimeInMs >= deadlineMs(s.last)) {
        // keep idx (numbering continues) and last (the ordering guard)
        st.update(SessionState(s.idx, 0L, s.last, 0L, 0L, s.nLate))
        Iterator.single(SessionEmit(key, s.idx, s.n, s.start, s.last, s.last - s.start, s.sum))
      } else Iterator.empty
    }
  }
}

object SessionTimerProcessor {

  /** Watermark-closed gap sessions: `delay` is the lateness allowance
    * (the T1/T4 policy knob — events older than the watermark are dropped
    * by the operator itself in event-time mode).
    */
  def sessions(
      events: Dataset[StreamEvent],
      gapUs: Long,
      delay: String = "0 seconds"): Dataset[SessionEmit] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    implicit val encIn: org.apache.spark.sql.Encoder[TsEvent] = Encoders.product[TsEvent]
    implicit val encOut: org.apache.spark.sql.Encoder[SessionEmit] = Encoders.product[SessionEmit]
    events
      .toDF()
      .withColumn("ts", timestamp_micros(col("ordUs")))
      .withWatermark("ts", delay)
      .as[TsEvent]
      .groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new SessionTimerProcessor(gapUs), TimeMode.EventTime(), OutputMode.Append())
  }
}
