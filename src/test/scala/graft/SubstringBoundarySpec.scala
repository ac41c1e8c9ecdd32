package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** d11's EXACTNESS CONTRACT, pinned at its boundary (the round-10 advice
  * asked for the detection bound to be stated and spec'd, not implied by
  * the operator's name): [[Dedup.substringOverlapPairs]] shingles with a
  * STRIDE-1 sliding window over whitespace tokens, so two documents pair
  * exactly when they share an identical run of >= k whole tokens —
  * a shared run of L >= k tokens contributes L-k+1 shared k-grams (every
  * window over the run matches verbatim), and a run of k-1 tokens
  * contributes none. The bound is therefore the exact >= k of Lee et
  * al.'s substring family AT TOKEN GRANULARITY — not the >= 2k-1 a
  * chunked (non-overlapping, k-aligned) gram scheme would give — with
  * two documented trade-offs this spec also pins: the detection unit is
  * the whitespace token (a verbatim CHARACTER overlap whose edge token
  * is corrupted only counts its whole shared tokens), and the df cap
  * deliberately forfeits runs whose every gram is boilerplate-hot
  * (the 100 TB knob: capping bounds the pair join; d2c pins the same
  * contract for the Jaccard plane).
  */
class SubstringBoundarySpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")
  private val K = 4

  private def pairsOf(docs: Seq[(Long, String)], maxDf: Long = 100L): Map[(Long, Long), Long] = {
    import spark.implicits._
    Dedup
      .substringOverlapPairs(docs.toDF("doc_id", "text"), "doc_id", "text", K, maxDf)
      .select("doc_a", "doc_b", "n_shared")
      .as[(Long, Long, Long)]
      .collect()
      .map { case (a, b, n) => (a, b) -> n }
      .toMap
  }

  test("a shared run of exactly k tokens is detected; k-1 is not") {
    val pairs = pairsOf(Seq(
      1L -> "a1 a2 a3 S1 S2 S3 S4 a4 a5 a6",
      2L -> "b1 b2 S1 S2 S3 S4 b3 b4",
      3L -> "c1 c2 S1 S2 S3 c3 c4 c5"))
    assert(pairs.get((1L, 2L)).contains(1L),
      "an exactly-k shared token run must pair, with exactly one shared k-gram")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "a k-1 token run is BELOW the detection bound: stride-1 windows leave no shared gram")
  }

  test("a shared run of k+j tokens contributes exactly j+1 shared k-grams") {
    val pairs = pairsOf(Seq(
      1L -> "a1 T1 T2 T3 T4 T5 T6 a2",
      2L -> "b1 b2 T1 T2 T3 T4 T5 T6"))
    assert(pairs((1L, 2L)) == 3L,
      "a 6-token run under k=4 must share exactly 6-4+1 = 3 grams (the stride-1 invariant " +
        "n_shared = L-k+1 that makes n_shared a run-length witness, not just a flag)")
  }

  test("detection unit is the whitespace token: a corrupted edge token drops below the bound") {
    // docs 1 and 2 share the verbatim CHARACTER suffix "cd ef gh" plus a
    // partially matching first token — but only 3 WHOLE tokens align, so
    // under k=4 no pair appears (the honest boundary of re-expressing the
    // suffix-array family as token shingles)
    val pairs = pairsOf(Seq(
      1L -> "ab cd ef gh",
      2L -> "xab cd ef gh"))
    assert(pairs.isEmpty,
      "character-level overlap off the token boundary must NOT pair: the contract is " +
        ">= k whole shared tokens, not >= k tokens' worth of shared characters")
  }

  test("the df cap forfeits runs whose every shared gram is boilerplate-hot") {
    // the same 4-token run in THREE docs with maxDf = 2: its only shared
    // gram exceeds the cap and is dropped, so all three pairs vanish —
    // the deliberate recall trade that bounds the pair join at scale
    val docs = Seq(
      1L -> "a1 H1 H2 H3 H4 a2",
      2L -> "b1 H1 H2 H3 H4 b2",
      3L -> "c1 H1 H2 H3 H4 c2")
    assert(pairsOf(docs, maxDf = 2L).isEmpty,
      "grams shared by more than maxDf docs are dropped BEFORE pairing")
    assert(pairsOf(docs, maxDf = 3L).keySet
      == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "raising the cap past the run's df restores every pair")
  }
}
