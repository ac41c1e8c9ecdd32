package graft

import graft.streaming.{StreamingAgg, TrailingAggProcessor}
import graft.streaming.StreamingAgg.{AggEmit, StreamEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState (Spark 4 StatefulProcessor + RocksDB state store)
  * must agree exactly with the flatMapGroupsWithState operator and the
  * batch RANGE window on the same replay.
  */
class TransformWithStateSpec extends AnyFunSuite {

  /** transformWithState requires the RocksDB state store provider. The
    * suites share one JVM-wide session (getOrCreate), so set it as a
    * runtime SQL conf — it only affects streaming queries started after.
    */
  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("transformWithState trailing agg == flatMapGroupsWithState == batch window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id").as("userId"), col("ord_us").as("ordUs"), col("cents"))
      .as[StreamEvent]
      .collect()
      .sortBy(_.ordUs)
      .toSeq

    val source = MemoryStream[StreamEvent]
    val sink = s"tws_out_${System.nanoTime()}"
    val q = TrailingAggProcessor
      .trailingAgg(source.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    val tws =
      try {
        events.grouped((events.size / 3) + 1).foreach { c =>
          source.addData(c)
          q.processAllAvailable()
        }
        spark.table(sink).as[AggEmit].collect().toSeq
      } finally q.stop()

    assert(tws.size == events.size)

    // bit-exact agreement with the fMGWS operator run over the same chunks
    val source2 = MemoryStream[StreamEvent]
    val sink2 = s"fmgws_out_${System.nanoTime()}"
    val q2 = StreamingAgg
      .trailingAgg(source2.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink2)
      .start()
    val fmgws =
      try {
        events.grouped((events.size / 3) + 1).foreach { c =>
          source2.addData(c)
          q2.processAllAvailable()
        }
        spark.table(sink2).as[AggEmit].collect().toSeq
      } finally q2.stop()

    val key = (e: AggEmit) => (e.userId, e.ordUs)
    assert(tws.map(key).toSet == fmgws.map(key).toSet)
    val fm = fmgws.map(e => key(e) -> e).toMap
    tws.foreach { e =>
      val o = fm(key(e))
      assert(e.cnt == o.cnt && e.sumCents == o.sumCents,
        s"operator divergence at ${key(e)}: $e vs $o")
    }
  }
}
