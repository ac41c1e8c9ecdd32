package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics: greatest right time <= left time per key,
  * >= match on exact ties, NULL payload when no prior right row — checked
  * against a naive per-row reference implementation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  test("asof matches latest at-or-before snapshot; ties match; no-match is null") {
    val left = Seq(
      (1L, 10L, 100L, 5L), // key 10: before any snapshot -> null
      (2L, 10L, 150L, 6L), // matches snap at 150 (exact tie, >= semantics)
      (3L, 10L, 400L, 7L), // matches snap at 300 (greatest <= 400)
      (4L, 20L, 999L, 8L) // key 20 has no snapshots at all -> null
    ).toDF("event_id", "user_id", "ord_us", "cents")
    val right = Seq(
      (10L, 150L, 111L),
      (10L, 300L, 222L),
      (10L, 500L, 333L) // in the future of every left row — never matched
    ).toDF("user_id", "snap_ts", "snap_cents")

    val out = AsOfJoin
      .asof(left, right, "user_id", "ord_us", "snap_ts", Seq("snap_cents"))
      .select("event_id", "asof_ts", "snap_cents")
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2))))
      .toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some(150L), Some(111L))))
    assert(out(3L) == ((Some(300L), Some(222L))))
    assert(out(4L) == ((None, None)))
  }

  test("asof on replayed events equals the naive per-row reference (sf0.001)") {
    val ev = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select("event_id", "user_id", "ord_us", "cents")
    val snaps = ev
      .filter(pmod(col("event_id"), lit(10)) === 0)
      .groupBy(col("user_id"), col("ord_us").as("snap_ts"))
      .agg(max(col("cents")).as("snap_cents"))

    val got = AsOfJoin
      .asof(ev, snaps, "user_id", "ord_us", "snap_ts", Seq("snap_cents"))
      .select("event_id", "asof_ts", "snap_cents")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap

    val snapRows = snaps.as[(Long, Long, Long)].collect().groupBy(_._1)
    val naive = ev.as[(Long, Long, Long, Long)].collect().map { case (eid, uid, t, _) =>
      val best = snapRows.getOrElse(uid, Array.empty).filter(_._2 <= t)
      eid -> (if (best.isEmpty) ((None, None))
              else {
                val m = best.maxBy(_._2)
                ((Some(m._2): Option[Any], Some(m._3): Option[Any]))
              })
    }.toMap
    assert(got.size == naive.size)
    val diffs = naive.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diffs.isEmpty, s"asof mismatches: ${diffs.take(5).toList}")
  }
}
