package graft.streaming

import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming form of the w13 exponential-decay (EWMA) recency feature —
  * per-key decayed spend maintained ON the stream with O(window) state:
  * the per-day cents buckets within [[DecayProcessor.Shift]] days of the
  * key's OWN latest day (older days carry weight 2^(shift−age) = 0
  * forever, so pruning them is semantically lossless, which is what
  * bounds the state absolutely — ≤ shift+1 (day, cents) pairs per key,
  * no late-data counter needed).
  *
  * Unlike CUSUM ([[CusumProcessor]]'s enforced ordering contract), the
  * decayed sum is a COMMUTATIVE function of the (day, cents) multiset:
  * an out-of-order event inside the live window lands in its day bucket
  * and yields the identical statistic, an event older than the window
  * contributes exactly 0 at every future evaluation and is dropped on
  * arrival — so batch parity holds under ANY arrival order and any
  * micro-batch chunking (StreamingDecaySpec shuffles arrivals and
  * compares bit-exactly against the per-key closed form). Weights are
  * exact integer shifts (w13's discipline): decayed_scaled =
  * Σ day_cents · 2^(shift − (asof_day − day)).
  */
final case class DecayEmit(
    userId: Long,
    ordUs: Long,
    asofDay: Long,
    decayedScaled: Long,
    nLiveDays: Long)

final case class DecayState(days: Seq[(Long, Long)])

class DecayProcessor(shift: Int)
    extends StatefulProcessor[Long, StreamEvent, DecayEmit] {

  private val DayUs = 86400000000L

  @transient private var st: ValueState[DecayState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[DecayState](
      "decay_state",
      Encoders.product[DecayState],
      TTLConfig.NONE)

  private def decayed(days: Map[Long, Long], maxDay: Long): Long =
    days.iterator.map { case (d, c) => c << (shift - (maxDay - d)).toInt }.sum

  override def handleInputRows(
      key: Long,
      rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[DecayEmit] = {
    var days: Map[Long, Long] =
      if (st.exists()) st.get().days.toMap else Map.empty
    var maxDay = if (days.isEmpty) Long.MinValue else days.keys.max
    val out = rows.map { e =>
      val d = Math.floorDiv(e.ordUs, DayUs)
      if (maxDay != Long.MinValue && d < maxDay - shift) {
        // aged out on arrival: weight 0 at this and every future asof day
        DecayEmit(key, e.ordUs, maxDay, decayed(days, maxDay), days.size.toLong)
      } else {
        if (d > maxDay) {
          maxDay = d
          days = days.filter { case (dd, _) => dd >= maxDay - shift }
        }
        days = days.updated(d, days.getOrElse(d, 0L) + e.cents)
        DecayEmit(key, e.ordUs, maxDay, decayed(days, maxDay), days.size.toLong)
      }
    }.toVector
    st.update(DecayState(days.toSeq.sortBy(_._1)))
    out.iterator
  }
}

object DecayProcessor {

  /** w13's half-life shift: weight 2^(Shift − age) for age ≤ Shift. */
  val Shift = 29

  /** Wire the decayed-spend feature onto a keyed stream. */
  def decay(events: Dataset[StreamEvent], shift: Int = Shift): Dataset[DecayEmit] = {
    implicit val enc: org.apache.spark.sql.Encoder[DecayEmit] = Encoders.product[DecayEmit]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new DecayProcessor(shift), TimeMode.None(), OutputMode.Append())
  }
}
