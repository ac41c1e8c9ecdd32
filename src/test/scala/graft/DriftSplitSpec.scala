package graft

import graft.queries.{DocQueries, FeatureQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral properties of the round-10 training-pipeline gates — the
  * invariants that make each operator worth shipping, asserted directly
  * (the oracle gates pin the values; these pin the CONTRACTS):
  *
  *   - s14: the split is leakage-safe — no near-dup pair straddles
  *     train/test, and every cluster is wholly on one side;
  *   - j11: point-in-time — no feature value from a label's future, and
  *     the daily rollup never exposes the label's own (open) day;
  *   - t30: counts reconcile and untouched documents round-trip
  *     bit-identically (clean_md5 == md5(original text));
  *   - a27: the TVD statistic respects its mathematical bounds and the
  *     bin histogram accounts for every event exactly once.
  */
class DriftSplitSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")
  private val sf = "/root/testdata/sf0.001"

  test("s14: no near-duplicate pair straddles the train/test boundary") {
    val split = DocQueries.clusterSplit(spark, sf).select("doc_id", "cluster_id", "split")
    val pairs = DocQueries.jaccardNearDup(spark, sf).select("doc_a", "doc_b")
    val straddling = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0, "a near-dup pair split across train/test is test-set leakage")
    val mixedClusters = split
      .groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("nsplits"))
      .filter(col("nsplits") > 1)
      .count()
    assert(mixedClusters == 0, "every cluster must land wholly on one side")
    // both sides populated at the fixture corpus (the draw does split)
    assert(split.select("split").distinct().count() == 2)
  }

  test("j11: no feature from the future; the label's own day stays closed") {
    val ds = FeatureQueries.trainingDataset(spark, sf).cache()
    val dayUs = 86400000000L
    assert(ds.count() > 0)
    val futureDaily = ds
      .filter(col("daily_asof_us") =!= -1L && col("daily_asof_us") > col("ord_us"))
      .count()
    val futureProfile = ds
      .filter(col("profile_asof_us") =!= -1L && col("profile_asof_us") > col("ord_us"))
      .count()
    assert(futureDaily == 0 && futureProfile == 0,
      "an as-of feature later than the label timestamp is train-time leakage")
    // the daily rollup joined AS OF ord_us covers day (avail/dayUs - 1),
    // which must be strictly before the label's own day: a mid-day label
    // must see yesterday's snapshot, never its own partial day
    val openDay = ds
      .filter(col("daily_asof_us") =!= -1L)
      .filter(expr(s"daily_asof_us div ${dayUs}L") - 1L >= expr(s"ord_us div ${dayUs}L"))
      .count()
    assert(openDay == 0, "the label's own (still-open) day must never be visible")
    ds.unpersist()
    ()
  }

  test("t30: counts reconcile; untouched documents round-trip bit-identically") {
    val out = DocQueries.lineDedup(spark, sf).cache()
    assert(out.filter(col("n_kept") + col("n_removed") =!= col("n_chunks")).count() == 0)
    // the first-occurrence key encodes (doc_id * 2^20 + chunk_idx): the
    // documented precondition is chunk_idx < 2^20 (docs under ~8.4M
    // tokens); guard it the way RanksSpec guards its distinct-key
    // precondition, so a future corpus change cannot silently alias keys
    assert(out.agg(max("n_chunks")).head.getLong(0) < 1048576L,
      "t30's doc_id*2^20+chunk_idx encoding requires chunk_idx < 2^20")
    assert(out.agg(sum("n_removed")).head.getLong(0) > 0, "the gate must do real removal work")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), md5(col("text")).as("orig_md5"))
    val broken = out
      .filter(col("n_removed") === 0)
      .join(docs, Seq("doc_id"))
      .filter(col("clean_md5") =!= col("orig_md5"))
      .count()
    assert(broken == 0, "a document with nothing removed must reassemble to its original text")
    out.unpersist()
    ()
  }

  test("a27: TVD bounds hold and the histogram accounts for every event once") {
    val out = FeatureQueries.tvdDrift(spark, sf).cache()
    val head = out.select("t_ref", "t_cur", "tvd_scaled").head
    val (tRef, tCur, tvd) = (head.getLong(0), head.getLong(1), head.getLong(2))
    // 0 <= TVD <= 1 ⟺ 0 <= tvd_scaled <= 2 * t_ref * t_cur
    assert(tvd >= 0 && tvd <= 2 * tRef * tCur, s"TVD out of [0,1]: $tvd vs ${2 * tRef * tCur}")
    val sums = out.agg(sum("n_ref").as("r"), sum("n_cur").as("c")).head
    assert(sums.getLong(0) == tRef && sums.getLong(1) == tCur,
      "bin counts must sum to the window totals")
    val nEvents = Tables.events(spark, sf).count()
    assert(tRef + tCur == nEvents, "every event must fall in exactly one window and bin")
    out.unpersist()
    ()
  }
}
