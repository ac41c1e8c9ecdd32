package graft

import graft.operators.{LatestPerKey, ServingJoin, TrailingWindows}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit oracle tests for the reference-parity operators (SURVEY.md §5.1/5.2):
  * trailing RANGE windows vs a brute-force O(n^2) oracle (including
  * same-timestamp ties and the count>=1 invariant), dense_rank tie
  * multiplicity, and the serving join's staleness/zero-fill policy.
  */
class TrailingWindowsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  // (key, tsMicros, amount) — includes exact ties on (key=1, t=2_000_000)
  private val fixture = Seq(
    (1L, 1000000L, 10.0),
    (1L, 2000000L, 20.0),
    (1L, 2000000L, 30.0), // tie: same key, same timestamp
    (1L, 700000000L, 40.0), // outside 600s of the first three
    (2L, 1000000L, 5.0),
    (2L, 500000000L, 7.0), // inside 600s of the first
    (3L, 42L, 1.0) // lone row
  )

  private def df = fixture.toDF("user_id", "ord_us", "amount")
    .withColumn("ts", timestamp_micros($"ord_us"))

  private def brute(horizonSecs: Long): Map[(Long, Long, Double), (Long, Double)] =
    fixture.map { case (k, t, a) =>
      val in = fixture.filter { case (k2, t2, _) =>
        k2 == k && t2 <= t && t2 >= t - horizonSecs * 1000000L
      }
      (k, t, a) -> (in.size.toLong, in.map(_._3).sum / in.size)
    }.toMap

  test("trailing RANGE window count/avg matches brute force, ties included, count >= 1") {
    val got = TrailingWindows
      .aggregates(df, "user_id", "ts", "amount", Seq("600s" -> 600L))
      .select($"user_id", $"ord_us", $"amount", $"cnt_600s", $"avg_600s")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getDouble(2)), (r.getLong(3), r.getDouble(4))))
    val expect = brute(600L)
    assert(got.length == fixture.size)
    got.foreach { case (rowKey, (cnt, avg)) =>
      val (ecnt, eavg) = expect(rowKey)
      assert(cnt == ecnt, s"count mismatch at $rowKey")
      assert(math.abs(avg - eavg) < 1e-12, s"avg mismatch at $rowKey")
      assert(cnt >= 1)
    }
    // the tie rows share one frame: both 2_000_000 rows see count=3 (10,20,30)
    val tieCnt = got.collect { case ((1L, 2000000L, _), (c, _)) => c }
    assert(tieCnt.toSeq == Seq(3L, 3L))
  }

  test("dense_rank latest-per-key keeps ALL rows tied on the max ordering value") {
    val tied = Seq((1L, 5L, "a"), (1L, 5L, "b"), (1L, 3L, "c"), (2L, 9L, "d"))
      .toDF("k", "ord", "tag")
    val kept = LatestPerKey.denseRankLatest(tied, col("k"), col("ord"))
      .select($"k", $"tag").as[(Long, String)].collect().toSet
    assert(kept == Set((1L, "a"), (1L, "b"), (2L, "d")))
    // aggregation form keeps exactly one row per key
    val one = LatestPerKey.maxByOrd(tied, "k", "ord")
    assert(one.count() == 2)
    assert(one.filter($"k" === 1 && $"ord" === 5).count() == 1)
  }

  test("serving join: staleness cutoff zeroes ratios, missing snapshot zero-fills") {
    val events = Seq((1L, 100.0), (2L, 50.0), (9L, 10.0)).toDF("user_id", "amount")
    val snapshot = Seq(
      // fresh: now(=1000s) - 700s <= 600s
      (1L, 700L * 1000000L, 3L, 30.0, 12L, 60.0),
      // stale: now - 100s > 600s
      (2L, 100L * 1000000L, 2L, 20.0, 10L, 40.0)
    ).toDF("user_id", "snap_ts_us", "cnt_short", "avg_short", "cnt_long", "avg_long")

    val out = ServingJoin
      .enrich(events, snapshot, "user_id", "amount", lit(1000L * 1000000L), 600L)
      .select($"user_id", $"num_recent", $"avg_recent", $"amt_ratio1", $"amt_ratio2", $"count_ratio")
      .as[(Long, Long, Double, Double, Double, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap

    assert(out(1L) == ((1L, 3L, 30.0, 0.5, 100.0 / 60.0, 0.25))) // fresh: real ratios
    assert(out(2L) == ((2L, 2L, 20.0, 0.0, 0.0, 0.0))) // stale: ratios zeroed, raw kept
    assert(out(9L) == ((9L, 0L, 0.0, 0.0, 0.0, 0.0))) // miss: all zero-filled
  }

  test("threshold classifier labels above-threshold probabilities FRAUD") {
    val got = Seq(0.1, 0.25, 0.26).toDF("p")
      .select(ServingJoin.thresholdLabel($"p").as("l")).as[String].collect()
    assert(got.toSeq == Seq("NOT FRAUD", "NOT FRAUD", "FRAUD"))
  }

  test("sf0.001 queries return rows with the declared columns") {
    val sf = "/root/testdata/sf0.001"
    val t = queries.FeatureQueries.trailingAgg(spark, sf)
    assert(t.count() == 1000)
    assert(t.columns.contains("amt_ratio1"))
    assert(queries.FeatureQueries.latestPerKey(spark, sf).count() == 15)
    assert(queries.FeatureQueries.enrichStaleness(spark, sf).count() > 0)
  }
}
