package graft.streaming

import graft.streaming.StreamingAgg.{AggEmit, StreamEvent}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Spark-4-native form of the per-event trailing-window operator
  * (SURVEY.md §2.8): a `StatefulProcessor` driven by `transformWithState`,
  * holding the trailing buffer in engine-managed `ListState` instead of a
  * monolithic case-class value — the state store sees individual list
  * elements, which with the RocksDB provider means append is O(1) and the
  * buffer never round-trips wholesale per event.
  *
  * Semantics are identical to [[StreamingAgg.trailingAgg]] (the
  * flatMapGroupsWithState form, which remains the default-state-store
  * fallback); the parity test drives both over the same replay.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` on the session.
  */
class TrailingAggProcessor(horizonUs: Long)
    extends StatefulProcessor[Long, StreamEvent, AggEmit] {

  @transient private var buffer: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buffer = getHandle.getListState[(Long, Long)](
      "trailing_buffer",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[AggEmit] = {
    val prior = if (buffer.exists()) buffer.get().toList else Nil
    var buf = prior
    val newEvents = rows.toSeq.sortBy(_.ordUs)
    val out = newEvents.map { e =>
      buf = ((e.ordUs, e.cents) :: buf.filter(_._1 >= e.ordUs - horizonUs)).sortBy(_._1)
      val inWindow = buf.filter(t => t._1 >= e.ordUs - horizonUs && t._1 <= e.ordUs)
      val cnt = inWindow.size.toLong
      val sum = inWindow.map(_._2).sum
      AggEmit(key, e.ordUs, cnt, sum, sum.toDouble / cnt / 100.0)
    }
    // RocksDB-friendly write: when nothing aged out, append only the new
    // elements instead of rewriting the whole list (append is O(1) per
    // element in the RocksDB ListState; full put rewrites the value)
    if (buf.size == prior.size + newEvents.size && buf.startsWith(prior))
      buffer.appendList(newEvents.map(e => (e.ordUs, e.cents)).toArray)
    else
      buffer.put(buf.toArray)
    out.iterator
  }
}

object TrailingAggProcessor {

  /** Wire the operator onto a keyed stream (RocksDB-backed sessions). */
  def trailingAgg(
      events: Dataset[StreamEvent],
      horizonUs: Long = StreamingAgg.HorizonUs): Dataset[AggEmit] = {
    implicit val outEnc: org.apache.spark.sql.Encoder[AggEmit] = Encoders.product[AggEmit]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(
        new TrailingAggProcessor(horizonUs),
        TimeMode.None(),
        OutputMode.Append())
  }
}
