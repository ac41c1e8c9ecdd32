package graft

import org.apache.spark.sql.SparkSession

/** Empirical scale check for the heavy text/vector/join gates: run each
  * on two [[graft.datagen.ScaleGen]] corpora — sf0.1-equivalent and sf1
  * (10x rows) — from the SAME generator, and report the runtime ratio.
  * The 100 TB posture of these operators is plan-asserted everywhere
  * (banded/blocked/capped similarity, one-shuffle aggregations,
  * exchange-free bucketed sides); this harness is the execution-side
  * evidence: a gate whose ratio is super-linear beyond shuffle overhead
  * names its blowup.
  *
  * Timing discipline matches [[Bench]]: reps interleaved round-robin
  * across (gate, scale) cells, rep 1 excluded from the median, loadavg
  * sentinel per rep, one JSON line out.
  */
object ScaleBench {

  /** The gates worth scaling (the ones whose cost is data-shaped: pair
    * generation, LSH banding, components, substring grams, token stats,
    * range join, IVF train/assign/probe).
    */
  val HeavyGates: Seq[String] = Seq(
    "d2c_jaccard_capped",
    "d3_minhash_lsh",
    "d10_dedup_clusters",
    "d11_substring_dedup",
    "d12_incremental_dedup",
    "d13_tfidf_neardup",
    "t10_term_importance",
    "t13_bigram_topk",
    "j4_range_join",
    "j6_click_attribution",
    "v3_ann_ivf",
    "v4_ann_ivf_multiprobe",
    "v12_ivfpq_topk",
    "t23_lm_familiarity",
    "d18_incremental_neardup",
    "v5_ivf_index_probe",
    "v10_pq_topk",
    // r7 additions: the graph plane (edge gen + oriented wedge join +
    // frontier BFS) and the new shingle-set consumers
    "g4_triangles",
    "g5_khop_reach",
    "g6_edge_jaccard",
    "t19_containment_dedup",
    // t19's capped twin — the linear-scale containment path (t19 itself
    // measured 11.2x for 10x data in SCALE_r07: expected pair blow-up of
    // the exact form; the cap is the 100 TB answer, keep both measured)
    "t19c_containment_capped",
    // content-defined chunking: linear chunker + df-capped share join
    "d17_cdc_chunks",
    "d15_minhash_estimate",
    // r8 additions: the support-thresholded wedge join (g9), RAKE's
    // explode + segmentation + re-score join chain (t24), and the
    // two-agg vocabulary curve (t25) — all lineitem/documents-only so
    // they run on the ScaleGen corpora
    "g9_link_prediction",
    "t24_rake_keywords",
    "t25_vocab_growth",
    // d18's wide-recall twin — width-1 banding, the t19-style disclosed
    // anchor: even band-capped, its candidate set grows with corpus
    // density (measured ~5x at 10x data), which is exactly why d18's
    // declared scale path is the width-2 banding measured next to it
    "d18w_wide_recall")

  /** args: smallDir largeDir [reps]. Emits one JSON line with per-gate
    * medians at both scales and large/small ratios.
    */
  def main(args: Array[String]): Unit = {
    val smallDir = args(0)
    val largeDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark: SparkSession = Sessions.local()
    val gates = SparkEntry.queries.filter { case (k, _) => HeavyGates.contains(k) }
    // one warm pass at the small scale so codegen/parquet-reader init is
    // in nobody's rep 1 more than necessary
    CacheScope.scoped(spark) {
      Bench.timeQueries(spark, smallDir, gates, reps = 1)
    }
    spark.catalog.clearCache()
    val small = CacheScope.scoped(spark) {
      Bench.timeQueries(spark, smallDir, gates, reps)
    }
    spark.catalog.clearCache()
    val large = CacheScope.scoped(spark) {
      Bench.timeQueries(spark, largeDir, gates, reps)
    }
    val byName = small.map(t => t.name -> t).toMap
    val cells = large.sortBy(_.name).map { lg =>
      val sm = byName(lg.name)
      val ratio =
        if (sm.err.isEmpty && lg.err.isEmpty && sm.med > 0) lg.med / sm.med else -1.0
      val err = (sm.err.toSeq ++ lg.err.toSeq).headOption
        .map(e => s""","err":"${e.replace("\"", "'")}"""")
        .getOrElse("")
      s""""${lg.name}":{"small_sec":${sm.med},"large_sec":${lg.med},""" +
        s""""ratio":$ratio,"small_runs":${sm.runs.mkString("[", ",", "]")},""" +
        s""""large_runs":${lg.runs.mkString("[", ",", "]")}$err}"""
    }
    val line =
      s"""{"metric":"scale_ratio_10x","small":"$smallDir","large":"$largeDir",""" +
        s""""reps":$reps,"load_avg_end":${Bench.loadAvg()},""" +
        s""""gates":${cells.mkString("{", ",", "}")}}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/SCALE_r08.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
