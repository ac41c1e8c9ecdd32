package graft

import graft.datagen.TransactionGen
import graft.streaming.EnrichAndScore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generator invariants from the reference's notebook 0 (SURVEY.md §5
  * "generator invariants") plus the distributed scoring frame.
  */
class DatagenSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  private val params = TransactionGen.Params(nCards = 100, nTxns = 20000L)
  private lazy val txns = TransactionGen.transactions(spark, params).cache()

  test("row count, fraud fraction, card cardinality, 16-digit cards") {
    val total = txns.count()
    val fraud = txns.filter($"fraud_label" === 1).count()
    assert(total == 20000L + fraud)
    assert(fraud == math.round(20000 * 0.0025)) // exactly 0.25% of base rows
    val cards = txns.select("cc_num").distinct().count()
    assert(cards <= 100 && cards > 80)
    assert(txns.filter(length($"cc_num".cast("string")) =!= 16).count() == 0)
  }

  test("amount buckets roughly match the reference distribution") {
    val n = txns.count().toDouble
    def frac(lo: Double, hi: Double): Double =
      txns.filter($"amount" >= lo && $"amount" < hi).count() / n
    assert(math.abs(frac(0.0, 1.0) - 0.05) < 0.02)
    assert(math.abs(frac(10.0, 100.0) - 0.525) < 0.03)
    assert(math.abs(frac(1000.0, 10001.0) - 0.10) < 0.02)
    assert(txns.filter($"amount" < 0.01 || $"amount" > 10000).count() == 0)
  }

  test("fraud chains: 3-10 txns per card cluster, consecutive gaps 30-120 s") {
    val fraud = txns.filter($"fraud_label" === 1)
      .select($"cc_num", unix_timestamp($"datetime").as("ts"))
      .orderBy($"cc_num", $"ts")
      .as[(Long, Long)]
      .collect()
    val byCard = fraud.groupBy(_._1).values
    // within a card, consecutive fraud events <= 120 s apart belong to one
    // chain; verify gaps inside chains stay in [30, 120]
    val gaps = byCard.flatMap { rows =>
      rows.map(_._2).sorted.toList.sliding(2).collect {
        case a :: b :: Nil if b - a <= 120 => b - a
      }
    }.toList
    assert(gaps.nonEmpty)
    assert(gaps.forall(g => g >= 30 && g <= 120), s"bad gaps: ${gaps.filter(g => g < 30 || g > 120).take(5).toSeq}")
  }

  test("payload completeness: deterministic merchant and zip_code in the reference shape") {
    assert(txns.columns.toSeq ==
      Seq("tid", "datetime", "cc_num", "merchant", "amount", "zip_code", "fraud_label"))
    assert(txns.filter($"merchant".isNull || $"zip_code".isNull).count() == 0)
    assert(txns.filter(!$"merchant".rlike("^merchant-[0-9]{4}$")).count() == 0)
    assert(txns.filter(!$"zip_code".rlike("^[0-9]{5}$")).count() == 0)
    assert(txns.select("merchant").distinct().count() > 100) // hashed, not constant
    val again = TransactionGen.transactions(spark, params)
    assert(again.select("tid", "merchant", "zip_code")
      .except(txns.select("tid", "merchant", "zip_code")).count() == 0)
  }

  test("deterministic: same params give identical tids; timestamps ascending") {
    val again = TransactionGen.transactions(spark, params)
    assert(again.select("tid").except(txns.select("tid")).count() == 0)
    val ts = txns.select(unix_timestamp($"datetime")).as[Long].collect()
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
  }

  test("distributed scoring frame labels a hot key FRAUD against its snapshot") {
    val events = Seq((1L, 100.0), (2L, 100.0)).toDF("user_id", "amount")
    val snapshot = Seq(
      // fresh + bursty: count_ratio 8/10 = 0.8 -> prob 1.0 -> FRAUD
      (1L, 900L * 1000000L, 8L, 90.0, 10L, 80.0),
      // fresh + quiet: count_ratio 1/20 = 0.05 -> prob 0.125 -> NOT FRAUD
      (2L, 900L * 1000000L, 1L, 50.0, 20L, 60.0)
    ).toDF("user_id", "snap_ts_us", "cnt_short", "avg_short", "cnt_long", "avg_long")
    val out = EnrichAndScore
      .scoreFrame(events, snapshot, "user_id", "amount", lit(1000L * 1000000L))
      .select($"user_id", $"label").as[(Long, String)].collect().toMap
    assert(out(1L) == "FRAUD" && out(2L) == "NOT FRAUD")
  }
}
