package graft

import graft.operators.{HeavyHitters, Triangles, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operator semantics: degree-oriented triangle counting,
  * Misra–Gries exact heavy hitters (partitioning invariance — the whole
  * point of the two-phase contract), and Morton interleave vs a driver
  * reference.
  */
class GraphLayoutSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  test("triangles: K4 minus an edge — exact participation counts") {
    // K4 on {1,2,3,4} without (3,4): triangles (1,2,3) and (1,2,4)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    val got = Triangles
      .perNode(edges)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("triangles: triangle-free bipartite graph counts nothing") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("a", "b")
    assert(Triangles.perNode(edges).count() == 0L)
  }

  test("heavy hitters: exact under ANY partitioning, equals groupBy truth") {
    // Zipf-ish: token i appears 1000/i times, i in 1..200, capacity 20
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))
    val df = rows.toDF("token")
    val truth = {
      val n = rows.size.toLong
      rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter { case (_, c) => c * 20L > n }
    }
    for (parts <- Seq(1, 3, 16)) {
      val got = HeavyHitters
        .exactOverThreshold(df.repartition(parts), 20)
        .select(col("item"), col("cnt"))
        .as[(String, Long)]
        .collect()
        .toMap
      assert(got == truth, s"at $parts partitions")
    }
  }

  test("heavy hitters: candidate phase never loses a true heavy hitter") {
    val rows = (1 to 50).flatMap(i => Seq.fill(200 / i)(s"t$i"))
    val df = rows.toDF("token").repartition(7)
    val n = rows.size.toLong
    val heavies = rows.groupBy(identity).collect {
      case (k, v) if v.size.toLong * 10L > n => k
    }.toSet
    val cands = HeavyHitters
      .exactOverThreshold(df, 10)
      .select("item")
      .as[String]
      .collect()
      .toSet
    assert(heavies.subsetOf(cands))
  }

  test("morton interleave matches a driver-side bit-loop reference") {
    def ref(x: Long, y: Long): Long =
      (0 until ZOrder.Bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (10L, 6L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (43690L, 21845L))
    val got = pairs
      .toDF("x", "y")
      .select(ZOrder.interleaveCol(col("x"), col("y")).as("z"))
      .as[Long]
      .collect()
      .toSeq
    assert(got == pairs.map { case (x, y) => ref(x, y) })
  }

  test("heavy hitters plan: corpus recount side joins via broadcast") {
    val df = (1 to 500).map(i => s"w${i % 7}").toDF("token")
    val plan = HeavyHitters
      .exactOverThreshold(df, 10)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
