package graft

import org.scalatest.funsuite.AnyFunSuite

/** The persist-lifetime contract: a scoped batch keeps its intra-batch
  * cache sharing, frees every block it materialized on exit (error path
  * included), leaves the caller's own cached frames alone, and a re-run
  * after the scope still computes the identical result (the evicted
  * cache transparently re-materializes).
  */
class CacheScopeSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("scoped gate batch frees its shared frames; caller caches survive") {
    val sf = "/root/testdata/sf0.001"
    val mine = spark.range(100).toDF("id").cache()
    mine.count()
    val before = persistentIds
    // d2 + d10 share the persisted shingle AND pair frames inside the scope
    val (d2Rows, d10Rows) = CacheScope.scoped(spark) {
      val d2 = queries.DocQueries.jaccardNearDup(spark, sf).count()
      val d10 = queries.DocQueries.dedupClusters(spark, sf).count()
      assert(persistentIds.size > before.size, "the batch must actually persist frames")
      (d2, d10)
    }
    assert(persistentIds == before,
      s"scope exit must free exactly the batch's blocks: $persistentIds vs $before")
    assert(spark.sparkContext.getPersistentRDDs.keySet.contains(
      mine.rdd.id) || mine.storageLevel.useMemory,
      "caller's own cache untouched")
    // evicted-cache semantics: the same query re-materializes and agrees
    val again = CacheScope.scoped(spark)(queries.DocQueries.jaccardNearDup(spark, sf).count())
    assert(again == d2Rows && d10Rows > 0)
    mine.unpersist()
    ()
  }

  test("blocks are freed on the error path too") {
    val before = persistentIds
    intercept[RuntimeException] {
      CacheScope.scoped(spark) {
        val df = spark.range(1000).toDF("x").persist()
        df.count()
        throw new RuntimeException("boom")
      }
    }
    assert(persistentIds == before, "error path must still unpersist")
  }
}
