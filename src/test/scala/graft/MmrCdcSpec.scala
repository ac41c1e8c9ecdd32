package graft

import graft.operators.Similarity
import graft.queries.DocQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Library-level contracts for the r7 additions: MMR diversified top-k
  * (selection semantics the oracle hash alone doesn't explain) and
  * content-defined chunking (the shift-robustness property that motivates
  * CDC over fixed-width chunking).
  */
class MmrCdcSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  // Hand-built embeddings: q=0 is the query; 1 and 2 are near-identical
  // highly-relevant vectors (sim(1,2) ≈ 0.999, so 2's MMR margin
  // rel − maxsim ≈ −0.14); 3 is less relevant (rel 0.5) but nearly
  // orthogonal to 1 (sim ≈ 0.20, margin ≈ +0.30). Plain top-2 returns
  // {1, 2}; MMR must pick 1 then diversify to 3.
  private def mmrFixture = Seq(
    (0L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.3f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.25f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("mmr first pick is argmax relevance; second pick trades relevance for diversity") {
    val out = Similarity
      .mmrTopK(mmrFixture, "vec_id", "embedding", col("vec_id") === 0L, candK = 3, selectK = 2)
      .orderBy("rnk")
      .collect()
    assert(out.length == 2)
    val first = out(0)
    val second = out(1)
    // rnk 1: plain relevance argmax (vec 1 or 2 — tie broken by id => 1)
    assert(first.getLong(1) == 1L && first.getLong(2) == 1L)
    assert(first.isNullAt(4)) // maxsim NULL at rnk 1
    // rnk 2: NOT the near-duplicate 2 (rel higher, but maxsim ~1.0
    // cancels it); the orthogonal 3 wins on rel - maxsim
    assert(second.getLong(2) == 3L)
    assert(!second.isNullAt(4) && second.getDouble(4) < 0.9)
  }

  test("mmr emits selectK distinct rows per query with rnk 1..k") {
    val out = Similarity
      .mmrTopK(mmrFixture, "vec_id", "embedding", col("vec_id") === 0L, candK = 3, selectK = 3)
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(2)).distinct.length == 3)
  }

  // CDC property: inserting a prefix shifts every absolute position, but
  // chunk boundaries are content-defined, so the original doc's interior
  // chunk hashes survive in the prefixed twin and the pair is found.
  // (Fixed-width chunking at the same granularity finds nothing.)
  test("cdc chunking links a doc to its prefix-shifted near-duplicate") {
    val base =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val shifted = "inserted words here " + base
    val docs = Seq((1L, base), (2L, shifted), (3L, "completely different content entirely unrelated text"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("cdc_docs")
    // drive the same chunker the gate uses, over a temp doc frame: reuse
    // the query body by writing the docs where the gate reads them is
    // overkill — call the operator logic through a local copy of the plan
    val out = DocQueries.cdcChunkDedupOn(docs).collect()
    val pair = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, s"expected (1,2) pair, got ${out.mkString(";")}")
    assert(pair.get.getLong(2) >= 2L) // shares >= 2 interior chunks
    assert(!out.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }
}
