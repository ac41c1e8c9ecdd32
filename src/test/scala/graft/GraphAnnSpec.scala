package graft

import graft.operators.Similarity
import graft.queries.VectorQueries
import org.scalatest.funsuite.AnyFunSuite

/** v17 graph-ANN contract: the beam search must RECOVER neighbors the LSH
  * seed buckets missed (otherwise the graph rounds are dead weight and
  * the operator is just d6 blocking with extra steps), and its output
  * must be a well-formed per-query top-k. Recall floors are pinned at
  * values measured on this fixture — a regression in the graph build or
  * the beam fold shows up as a floor breach, not a silent drift.
  */
class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val nQueries = 32

  private def top1Hits(df: org.apache.spark.sql.DataFrame): Int = {
    val exact = Similarity
      .bruteForceTopK(
        Tables.embeddings(spark, sf), "vec_id", "embedding",
        org.apache.spark.sql.functions.col("vec_id") < nQueries, 1)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    df.filter("rnk = 1")
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect()
      .count { case (q, v) => exact.get(q).contains(v) }
  }

  test("graph rounds add recall over the seed-only baseline; floors hold") {
    val seedOnly = top1Hits(VectorQueries.graphAnnRounds(spark, sf, 0))
    val full = top1Hits(VectorQueries.graphAnnRounds(spark, sf, 2))
    assert(full > seedOnly,
      s"beam rounds must recover neighbors LSH missed (seed-only $seedOnly, full $full of $nQueries)")
    // measured on this fixture: seed-only 17/32, full 25/32 (sf0.01:
    // 18/32 -> 25/32) — floor a few below so an unrelated tie-break
    // change doesn't flap the suite
    assert(full >= 21, s"recall@1 floor: $full/$nQueries < 21")
  }

  test("beam rounds only improve: per-query top-1 cosine is non-decreasing in rounds") {
    def top1(rounds: Int): Map[Long, Double] = VectorQueries
      .graphAnnRounds(spark, sf, rounds)
      .filter("rnk = 1")
      .select("query_id", "cosine")
      .as[(Long, Double)].collect().toMap
    val byRound = Seq(top1(0), top1(1), top1(2))
    byRound.sliding(2).foreach { case Seq(prev, next) =>
      prev.keySet.foreach { q =>
        assert(next(q) >= prev(q),
          s"query $q regressed: the scored set only grows, so top-1 cannot fall")
      }
    }
  }

  test("persisted graph index probes bit-identically to the in-memory search") {
    val inMemory = VectorQueries.graphAnn(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaIndex = VectorQueries.graphIndexProbe(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaIndex == inMemory,
      "reloaded-index beam search must be bit-identical to the from-scratch run")
  }

  test("persisted append+delete lifecycle probes bit-identically to the maintained math") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    // build on the base slice, append the delta, tombstone the dead slice
    // — the v22 lifecycle, against CATALOG tables
    VectorQueries.buildGraphIndexOf(emb.filter(pmod(col("vec_id"), lit(5)) =!= 4), "gann_mnt")
    VectorQueries.graphIndexAppend(
      spark, "gann_mnt", emb.filter(pmod(col("vec_id"), lit(5)) === 4), "vec_id", "embedding")
    VectorQueries.graphIndexDelete(
      spark, "gann_mnt", emb.filter(pmod(col("vec_id"), lit(11)) === 7), "vec_id")
    val viaTables = VectorQueries.graphIndexProbeLive(spark, "gann_mnt")
      .as[(Long, Long, Long, Double)].collect().toSet
    val inMemory = VectorQueries.gannIncremental(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaTables == inMemory,
      "catalog-table append+tombstone probe must be bit-identical to the maintained frames")
    // no tombstoned id anywhere in the result, either side of the probe
    assert(viaTables.forall { case (q, _, v, _) => q % 11 != 7 && v % 11 != 7 })
  }

  test("maintained index holds recall: appends searchable, deletes == rebuild-without-ids") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val maintained = VectorQueries.gannIncremental(spark, sf)
      .filter("rnk = 1").select("query_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    // exact top-1 over the LIVE corpus (the ground truth a v6-style
    // monitor would compute)
    val live = emb.filter(pmod(col("vec_id"), lit(11)) =!= 7)
    val exact = Similarity
      .bruteForceTopK(live, "vec_id", "embedding", col("vec_id") < nQueries, 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val hits = maintained.count { case (q, v) => exact.get(q).contains(v) }
    // measured on this fixture: maintained 23/29, full rebuild 24/29 —
    // floors a few below so a tie-break change doesn't flap the suite
    info(s"maintained recall@1: $hits/${exact.size}")
    assert(maintained.size == exact.size,
      s"every live query must answer (${maintained.size} vs ${exact.size})")
    assert(hits >= 20, s"maintained-index recall@1 floor: $hits/${exact.size} < 20")
    // the maintained index must not trail a FULL REBUILD on the live
    // corpus by more than a couple of queries — the operational bound
    // that decides when the rebuild is actually necessary
    val rebuilt = VectorQueries.graphAnnRoundsOf(live, 2)
      .filter("rnk = 1").select("query_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    val rebuiltHits = rebuilt.count { case (q, v) => exact.get(q).contains(v) }
    info(s"full-rebuild recall@1: $rebuiltHits/${exact.size}")
    assert(hits >= rebuiltHits - 2,
      s"maintained recall $hits trails full-rebuild recall $rebuiltHits by more than 2")
  }

  test("output is a well-formed per-query top-k: 5 rows each, cosine non-increasing") {
    val out = VectorQueries.graphAnnRounds(spark, sf, 2)
      .select("query_id", "rnk", "vec_id", "cosine")
      .as[(Long, Long, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.size == nQueries && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        "cosine must be non-increasing in rnk")
      assert(sorted.map(_._2).toSeq == (1L to 5L), "ranks must be 1..5")
    }
  }
}
