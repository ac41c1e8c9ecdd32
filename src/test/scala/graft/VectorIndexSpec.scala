package graft

import graft.operators.{Similarity, VectorIndex}
import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index contract: a probe against the reloaded bucketed
  * index must be bit-identical to the from-scratch IVF run, and the index
  * side of the probe join must read its buckets without an exchange
  * (asserted against an unbucketed control so the claim can't pass
  * vacuously — the Bucketed spec pattern).
  */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("index probe == from-scratch IVF; bucketed index side joins exchange-free") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    VectorIndex.build(emb, "vec_id", "embedding", "ivf_idx", 16, 65536, 2)

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Double)] =
      df.select("query_id", "vec_id", "cell", "rnk", "cosine")
        .as[(Long, Long, Long, Long, Double)].collect().toSet

    val viaIndex =
      VectorIndex.topK(spark, "ivf_idx", emb, "vec_id", "embedding", 1, excludeSelf = true)
    val fresh = Similarity.ivfTopKAuto(emb, "vec_id", "embedding", 16, 65536, 1, 2)
    assert(rows(viaIndex) == rows(fresh),
      "reloaded-index probe must be bit-identical to the from-scratch IVF")

    // plan posture: the bucketed index side needs no exchange; the same
    // probe against an unbucketed copy of the assignment pays one more
    withNoBroadcast {
      Bucketed.writePlain(spark.table("ivf_idx"), "ivf_idx_plain")
      val centroids = spark.table("ivf_idx_centroids")
      def exchanges(assignedTable: String): Int = {
        val plan = VectorIndex
          .probeFrames(
            spark.table(assignedTable), centroids, emb, "vec_id", "embedding", 1,
            excludeSelf = true)
          .queryExecution.executedPlan.toString
        "Exchange hashpartitioning".r.findAllIn(plan).length
      }
      val bucketed = exchanges("ivf_idx")
      val plain = exchanges("ivf_idx_plain")
      assert(plain == bucketed + 1,
        s"unbucketed control must pay exactly one more exchange ($plain vs $bucketed)")
    }
  }

  test("incremental append: new vectors findable, layout still exchange-free, quantizer untouched") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    VectorIndex.build(base, "vec_id", "embedding", "ivf_idx_incr", 16, 65536, 2)
    val centBefore = spark.table("ivf_idx_incr_centroids").collect().toSet
    val baseRows = spark.table("ivf_idx_incr").count()
    def probeExchanges(): Int = withNoBroadcast {
      val plan = VectorIndex
        .probeFrames(
          spark.table("ivf_idx_incr"), spark.table("ivf_idx_incr_centroids"),
          emb, "vec_id", "embedding", 1, excludeSelf = true)
        .queryExecution.executedPlan.toString
      "Exchange hashpartitioning".r.findAllIn(plan).length
    }
    val exchangesBefore = probeExchanges()

    VectorIndex.append(spark, "ivf_idx_incr", delta, "vec_id", "embedding")

    // the append must not perturb the quantizer or lose rows
    assert(spark.table("ivf_idx_incr_centroids").collect().toSet == centBefore,
      "append must leave the centroid table untouched")
    assert(spark.table("ivf_idx_incr").count() == baseRows + delta.count(),
      "every appended row must land in the assignment table")

    // every appended vector is findable as its own exact-match neighbor
    val found = VectorIndex
      .topK(spark, "ivf_idx_incr", delta, "vec_id", "embedding", 1)
      .filter(col("query_id") === col("vec_id") && col("cosine") > 0.999)
      .count()
    assert(found == delta.count(),
      "each appended vector must come back as its own top-1 after append")

    // bucket layout survives the append: the probe plan pays exactly the
    // exchanges it paid before the append (the unbucketed control in the
    // build test pins what losing the layout would cost)
    assert(probeExchanges() == exchangesBefore,
      "post-append probe must pay no additional exchange")
  }

  test("external query batch keeps an id-colliding index vector as a neighbor") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    VectorIndex.build(emb, "vec_id", "embedding", "ivf_idx_ext", 16, 65536, 2)
    // an "external" batch REUSING a stored id with the stored vector: by
    // default (excludeSelf = false) the identical index vector must come
    // back as the top-1 neighbor (cosine 1.0), not be silently dropped
    val one = emb.filter(col("vec_id") === 7).cache()
    assert(one.count() == 1, "fixture id 7 must exist")
    val top = VectorIndex
      .topK(spark, "ivf_idx_ext", one, "vec_id", "embedding", 1)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(top.length == 1 && top(0)._1 == 7L && top(0)._2 == 7L && top(0)._3 > 0.999,
      s"external probe must keep the colliding id as its own neighbor, got ${top.toSeq}")
    val excluded = VectorIndex
      .topK(spark, "ivf_idx_ext", one, "vec_id", "embedding", 1, excludeSelf = true)
      .select("vec_id").as[Long].collect()
    assert(!excluded.contains(7L), "self-probe flag must drop the identical vector")
    one.unpersist()
    ()
  }

  test("tombstoned delete: dead vectors vanish both ways; probe stays exchange-free; vacuum folds") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    VectorIndex.build(emb, "vec_id", "embedding", "ivf_tomb_spec", 16, 65536, 2)
    val dead = emb.filter(pmod(col("vec_id"), lit(5)) === 2L)
    val deadIds = dead.select("vec_id").as[Long].collect().toSet
    VectorIndex.delete(spark, "ivf_tomb_spec", dead, "vec_id")
    val liveQueries = emb.filter(pmod(col("vec_id"), lit(5)) =!= 2L)
    val probed = VectorIndex
      .topKLive(spark, "ivf_tomb_spec", liveQueries, "vec_id", "embedding", 3, 1,
        excludeSelf = true)
    val got = probed.select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    // both directions: no dead query, and — the filter-after-topk bug —
    // no dead vector surfaces as anyone's neighbor
    assert(got.forall { case (q, v) => !deadIds.contains(q) && !deadIds.contains(v) })
    // a dead former neighbor yields its rank: every live query still has
    // neighbors if its cell has >= 2 live members (spot check: the probe
    // returns rank-1 rows for live queries)
    assert(probed.filter(col("rnk") === 1).count() > 0)
    // plan posture: the tombstone anti-join is a broadcast ABOVE the
    // bucketed scan (explicit hint — it survives autoBroadcast=-1), so
    // the live probe pays no more exchanges than the plain probe. The
    // comparison runs with auto-broadcast off (the suite's pattern):
    // otherwise AQE broadcasts the tiny sf0.001 index side and the two
    // plans differ for reasons unrelated to the claim.
    withNoBroadcast {
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      val live = exchanges(VectorIndex
        .topKLive(spark, "ivf_tomb_spec", liveQueries, "vec_id", "embedding", 3, 1,
          excludeSelf = true))
      val plain = exchanges(VectorIndex
        .topK(spark, "ivf_tomb_spec", liveQueries, "vec_id", "embedding", 3, 1,
          excludeSelf = true))
      assert(live == plain, s"tombstone filtering must not add an exchange ($live vs $plain)")
    }
    // vacuum: folds the tombstones into the layout; the probe result is
    // unchanged and the tombstone table is gone
    val before = got.toSet
    VectorIndex.vacuumDeletes(spark, "ivf_tomb_spec")
    assert(!spark.catalog.tableExists("ivf_tomb_spec_tombstones"))
    val after = VectorIndex
      .topKLive(spark, "ivf_tomb_spec", liveQueries, "vec_id", "embedding", 3, 1,
        excludeSelf = true)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(after == before, "vacuumed index must probe identically to the tombstoned one")
  }

  test("vacuumDeletes keeps the index's OWN bucket spec and never drops rows mid-rewrite") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    // build with a NON-default bucket count: the old buckets=32 default
    // parameter would silently re-bucket this on vacuum, breaking the
    // exchange-free probe layout — the count must come from the catalog
    VectorIndex.build(emb, "vec_id", "embedding", "ivf_tomb_b8", 16, 65536, 2, buckets = 8)
    assert(graft.sources.Bucketed.bucketCount(spark, "ivf_tomb_b8").contains(8))
    val liveBefore = spark.table("ivf_tomb_b8").count()
    val dead = emb.filter(pmod(col("vec_id"), lit(7)) === 1L)
    VectorIndex.delete(spark, "ivf_tomb_b8", dead, "vec_id")
    val deadInIndex = spark.table("ivf_tomb_b8")
      .join(dead.select(col("vec_id")), Seq("vec_id"), "left_semi").count()
    VectorIndex.vacuumDeletes(spark, "ivf_tomb_b8")
    assert(graft.sources.Bucketed.bucketCount(spark, "ivf_tomb_b8").contains(8),
      "vacuum must rewrite under the table's own bucket spec, not a default")
    assert(spark.table("ivf_tomb_b8").count() == liveBefore - deadInIndex,
      "the swap-rewrite must carry every live row")
    // the swap left no debris tables behind
    assert(!spark.catalog.tableExists("ivf_tomb_b8__compact"))
    assert(!spark.catalog.tableExists("ivf_tomb_b8__old"))
    // an unbucketed table refuses (it is not an index)
    graft.sources.Bucketed.writePlain(
      emb.limit(10).select(col("vec_id")), "ivf_tomb_plain")
    intercept[IllegalArgumentException](VectorIndex.vacuumDeletes(spark, "ivf_tomb_plain"))
  }
}
