package graft

import graft.queries.DocQueries
import org.scalatest.funsuite.AnyFunSuite

/** The BPE trainer's driver round-trip contract (t26): each merge round
  * collects exactly ONE argmax row, and the round count — which equals
  * the driver-job count — stays a small constant. A future "just train a
  * real vocabulary" edit that bumps the rounds constant would turn the
  * trainer into a driver loop over thousands of jobs; the right scale
  * path is batching compatible merges per round (see the doc comment),
  * so that edit must consciously remove this pin.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  private val sf = "/root/testdata/sf0.001"

  test("merge rounds are a small constant (driver jobs, not a data loop)") {
    assert(
      DocQueries.BpeMergeRounds <= 64,
      "BpeMergeRounds is a DRIVER round-trip count; batch merges instead of raising it")
  }

  test("trainer emits at most one merge per round, ranks dense from 1") {
    val merges = DocQueries.bpeTrainer(spark, sf).collect()
    assert(merges.nonEmpty && merges.length <= DocQueries.BpeMergeRounds)
    val ranks = merges.map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to merges.length.toLong), s"ranks not dense: $ranks")
    // deterministic argmax: counts non-increasing with rank (ties broken
    // lexicographically inside a round, never across rounds)
    val counts = merges.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
    assert(
      counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"merge counts must be non-increasing across rounds: $counts")
  }
}
