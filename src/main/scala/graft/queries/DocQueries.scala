package graft.queries

import graft.Tables
import graft.operators.{Components, Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text-pipeline queries over the `documents` table: exact
  * dedup, n-gram Jaccard near-dup, MinHash-LSH near-dup, SimHash, token
  * stats, quality scoring, language-ID, fingerprinting. Every query has a
  * formula-identical DuckDB oracle (md5 hashing + integer arithmetic make
  * results engine-exact).
  */
object DocQueries {

  private val JaccardThreshold = 0.5
  private val ShingleN = 3
  private val MinhashK = 6

  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup
      .exactGroups(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(orderedOutput(_, col("text_hash")))

  /** The shingle set feeds several subplans per query (join sides, sizes,
    * signatures) — persist it so the WordShingles explode runs ONCE per
    * corpus instead of once per subplan (the CacheManager dedups the
    * identical plan across d2/d2c/d3, so they share one spill-able
    * materialization; same pattern as the vector plane's prepared frame).
    * Reclaimed by the consuming harness's [[graft.CacheScope]] batch.
    */
  private def materializedShingles(docs: DataFrame): DataFrame =
    Dedup
      .shingleSet(docs, "doc_id", "text", ShingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The thresholded Jaccard pair frame is BOTH d2's output and d10's
    * edge list — persist it the way [[materializedShingles]] is shared so
    * the shared-shingle self-join + pair aggregation (the most expensive
    * text-plane subplan) runs once per corpus, not once per consumer (the
    * CacheManager dedups the identical plan across d2 and d10).
    */
  private def thresholdedPairs(docs: DataFrame): DataFrame =
    Dedup
      .jaccardPairs(materializedShingles(docs))
      .filter(col("jaccard") >= JaccardThreshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  def jaccardNearDup(spark: SparkSession, sfDir: String): DataFrame =
    thresholdedPairs(Tables.documents(spark, sfDir))
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))

  /** d2c: the capped-Jaccard 100 TB path — identical to d2 except shingles
    * with document frequency > maxDf are dropped BEFORE pairing and sizes,
    * bounding the shared-shingle join at O(shingles * maxDf^2)
    * ([[Dedup.dropHotShingles]]). The cap changes results (a pair whose
    * every common shingle is hot is lost, and Jaccard is computed over the
    * filtered sets) — which is exactly why it is oracle-gated: the gate
    * pins the approximate contract bit-for-bit. maxDf=2 bites at the gate
    * corpus (df reaches 7 at sf0.01): 23 pairs vs d2's 25.
    */
  private val JaccardMaxDf = 2L

  def jaccardNearDupCapped(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.dropHotShingles(
      materializedShingles(Tables.documents(spark, sfDir)),
      JaccardMaxDf)
    Dedup
      .jaccardPairs(sh)
      .filter(col("jaccard") >= JaccardThreshold)
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))
  }

  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val sh = materializedShingles(docs)
    val cands = Dedup.minhashBandCandidatesFromShingles(sh, MinhashK)
    // verify ONLY the banded candidates (same rows as verifying against the
    // full pair space, at a fraction of the join cost)
    val jac = Dedup.jaccardForCandidates(cands, sh)
    cands
      .join(jac, Seq("doc_a", "doc_b"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select("doc_a", "doc_b", "n_shared_bands", "jaccard")
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))
  }

  /** d19: threshold-driven LSH banding AUTOTUNE — pick (bands b, rows r),
    * b·r = [[MinhashK]], whose S-curve threshold t* = (1/b)^(1/r) is the
    * LARGEST that stays ≤ the dedup threshold (the conservative,
    * recall-side rule: banding must not start missing pairs ABOVE the
    * threshold the verify stage keeps), then run the banding at the
    * chosen shape and verify exactly. All selection arithmetic is EXACT
    * INTEGERS, no float pow anywhere: with t = p/q, t* ≤ t ⟺ q^r ≤ b·p^r
    * (cross-multiplied), and t* ORDERING uses the common-exponent key
    * b^(L/r) with L = lcm of the candidate r's (t*_i > t*_j ⟺ key_i <
    * key_j) — so both engines derive feasibility AND the argmax from
    * integer comparisons (the SQL side's power() calls stay below 2^53,
    * where doubles are exact). At t = 1/2 over a 6-hash budget the tuner
    * picks width-1 banding (t* = 1/6) — looser than d3's fixed width-2
    * (whose t* ≈ 0.577 sits ABOVE the threshold, i.e. d3's default
    * banding can drop true pairs just over 0.5; the selection table
    * shows exactly why). Output: the full selection table plus the
    * chosen shape's candidate/verified-pair counts.
    */
  private val AutoCombos = Seq((6, 1), (3, 2), (2, 3), (1, 6))

  /** (b, r, q^r, b·p^r, feasible, sel_key, chosen) at t = 1/2, L = 6. */
  private def autoSelection: Seq[(Int, Int, Long, Long, Long, Long, Long)] = {
    val rows = AutoCombos.map { case (b, r) =>
      val qr = BigInt(2).pow(r).toLong
      val bpr = b.toLong * BigInt(1).pow(r).toLong
      val feasible = if (qr <= bpr) 1L else 0L
      val key = BigInt(b).pow(6 / r).toLong
      (b, r, qr, bpr, feasible, key)
    }
    val chosenKey = rows.filter(_._5 == 1L).map(_._6).min
    rows.map { case (b, r, qr, bpr, feas, key) =>
      (b, r, qr, bpr, feas, key, if (feas == 1L && key == chosenKey) 1L else 0L)
    }
  }

  def lshAutotune(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sh = materializedShingles(Tables.documents(spark, sfDir))
    // the chosen shape at this (budget, threshold): width-1 banding
    val bands = Dedup.minhashBands1(sh, MinhashK)
    val cands = bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
    val verified = cands
      .join(Dedup.jaccardForCandidates(cands, sh), Seq("doc_a", "doc_b"))
      .filter(col("jaccard") >= JaccardThreshold)
    val counts = cands
      .agg(count(lit(1)).as("nc"))
      .crossJoin(verified.agg(count(lit(1)).as("np")))
    autoSelection
      .toDF("bands", "rows_per_band", "q_pow_r", "b_p_pow_r", "feasible", "sel_key", "chosen")
      .crossJoin(broadcast(counts))
      .select(
        col("bands").cast("long").as("bands"),
        col("rows_per_band").cast("long").as("rows_per_band"),
        col("q_pow_r"), col("b_p_pow_r"), col("feasible"), col("sel_key"), col("chosen"),
        when(col("chosen") === 1L, col("nc")).otherwise(0L).as("n_candidates"),
        when(col("chosen") === 1L, col("np")).otherwise(0L).as("n_pairs"))
      .transform(orderedOutput(_, col("bands").desc))
  }

  /** t6: benchmark decontamination ([[Dedup.contaminationCounts]]) — every
    * 17th document plays the held-out eval set; each remaining corpus doc
    * reports how many of its distinct 3-gram shingles appear anywhere in
    * that set. The benchmark shingle vocabulary broadcasts, so the corpus
    * never shuffles for the match — the standard shape for scrubbing eval
    * overlap out of a 100 TB training corpus.
    */
  private val BenchMod = 17L

  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val sh = materializedShingles(docs)
    val benchSh = sh.filter(pmod(col("doc_id"), lit(BenchMod)) === 0)
    val corpusSh = sh.filter(pmod(col("doc_id"), lit(BenchMod)) =!= 0)
    val sizes = corpusSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = Dedup.contaminationCounts(corpusSh, benchSh)
    docs
      .filter(pmod(col("doc_id"), lit(BenchMod)) =!= 0)
      .select(col("doc_id"))
      .join(sizes, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0,
          coalesce(col("n_hits"), lit(0L)) / col("n_shingles"))
          .otherwise(lit(0.0)).as("contamination"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, lit(1L)).otherwise(lit(0L)).as("contaminated"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** d10: dedup cluster formation ([[Components.connectedComponentsAuto]])
    * — the d2 near-dup PAIRS resolved into GROUPS: every doc labeled with
    * the min doc id reachable through the jaccard>=0.5 similarity graph,
    * so deduplication is `filter(is_dup = 0)`. The Spark side dispatches
    * on edge count: small graphs take min-label propagation (rounds =
    * diameter, near-zero per-round overhead), large ones the
    * diameter-INDEPENDENT large-star/small-star contraction (O(log^2 n)
    * rounds on any graph shape — templated/boilerplate corpora produce
    * long transitive chains that would cost propagation one round per
    * hop); a small-but-deep graph that exhausts propagation's round
    * budget falls back to star. The oracle is a DuckDB RECURSIVE CTE
    * transitive closure — independent fixpoint algorithms gated to
    * identical labels whichever path runs.
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = thresholdedPairs(docs)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    Components
      .connectedComponentsAuto(docs.select(col("doc_id").as("id")), pairs)
      .select(
        col("id").as("doc_id"),
        col("label").as("canonical_id"),
        when(col("id") =!= col("label"), lit(1L)).otherwise(lit(0L)).as("is_dup"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** s14: leakage-safe cluster-aware train/test split — the
    * contamination guard random splits cannot give (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": near-
    * duplicate train/test pairs inflate eval): the split unit is d10's
    * near-dup CLUSTER, not the document, so every jaccard>=0.5 relation
    * lands wholly in train or wholly in test and no test document has a
    * near-duplicate in train by construction. The draw is the repo's
    * deterministic md5 hash on the CLUSTER label (20% test via mod 5),
    * so membership is reproducible and oracle-checkable; `n_cluster`
    * rides along as the audit column (singleton docs split i.i.d., big
    * boilerplate clusters move as blocks — the visible cost of safety).
    * Scale: the expensive subplan is d10's pair frame, shared through
    * the same persisted [[thresholdedPairs]]; on top of it one
    * label agg + one cluster-keyed size join — linear.
    */
  def clusterSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = thresholdedPairs(docs)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val lab = Components
      .connectedComponentsAuto(docs.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val sz = lab.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_cluster"))
    lab
      .join(sz, Seq("cluster_id"))
      .withColumn(
        "split",
        when(
          pmod(graft.operators.Sketches.hash32("split", col("cluster_id")), lit(5L)) === 0L,
          lit("test"))
          .otherwise(lit("train")))
      .select(col("doc_id"), col("cluster_id"), col("n_cluster"), col("split"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** d11: exact long-substring overlap ([[Dedup.substringOverlapPairs]],
    * k=15) — the Lee et al. 2022 "verbatim copy" detector next to d2's
    * bag-of-shingles Jaccard: a pair appears iff the two docs share an
    * identical 15-token run. md5-hashed grams keep the shuffle narrow;
    * the df cap bounds boilerplate blowup (doesn't bite at the gate —
    * d2c pins the cap-bites contract for the text plane).
    */
  private val SubstrN = 15
  private val SubstrMaxDf = 256L

  def substringDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup
      .substringOverlapPairs(
        Tables.documents(spark, sfDir), "doc_id", "text", SubstrN, SubstrMaxDf)
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))

  /** t9: Gopher-style repetition filters (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * table A1): the fraction of the doc covered by its most frequent
    * 2-gram and the duplicate-3-gram ratio — the standard "remove
    * degenerate repetitive text" stage. The top-2-gram rank is a
    * (count desc, gram) row_number so ties are deterministic in both
    * engines; every ratio is integer/integer division.
    */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("g3", TextAnalysis.shingles(col("w"), 3))
      .withColumn("n_3grams", size(col("g3")).cast("long"))
      .withColumn("n_distinct_3grams", size(array_distinct(col("g3"))).cast("long"))
    val bigramCounts = docs
      .select(col("doc_id"), explode(TextAnalysis.shingles(col("w"), 2)).as("g2"))
      .groupBy(col("doc_id"), col("g2"))
      .agg(count(lit(1)).as("c"))
    val wTop = Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("g2"))
    val top = bigramCounts
      .withColumn("r", row_number().over(wTop))
      .filter(col("r") === 1)
      .select(col("doc_id"), col("g2").as("top_2gram"), col("c").as("top2_cnt"))
    docs
      .select("doc_id", "n_tokens", "n_3grams", "n_distinct_3grams")
      .join(top, Seq("doc_id"))
      .withColumn("top2_frac", col("top2_cnt") / (col("n_tokens") - 1))
      // guarded: a 2-token doc has a bigram (so it survives the `top` join)
      // but zero 3-grams — unguarded 0/0 is null in Spark but NaN under
      // DuckDB's IEEE float division, a latent engine divergence; the
      // explicit CASE (mirrored in the oracle) makes both engines null
      .withColumn(
        "dup3_ratio",
        when(col("n_3grams") > 0, lit(1.0) - col("n_distinct_3grams") / col("n_3grams")))
      .select("doc_id", "n_tokens", "top_2gram", "top2_cnt", "top2_frac", "dup3_ratio")
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** d12: incremental exact dedup against a BUCKETED corpus hash index
    * ([[Dedup.incrementalExact]]) — the shape of appending a fresh crawl
    * batch to a 100 TB corpus: the corpus's (id, text_hash) index is laid
    * out bucketed-by-hash on disk once ([[graft.sources.Bucketed]], the
    * VectorIndex pattern on the text plane), and each arriving increment
    * shuffles only ITSELF to match. The gate replays every 13th document
    * as a "re-crawled" arrival under a shifted id: all of them must
    * resolve to their original canonical id. BucketedJoinSpec's pattern
    * asserts the corpus side joins exchange-free; the oracle reproduces
    * the match relationally (bucketing changes layout, not results).
    */
  private val IncrMod = 13L
  private val IncrIdShift = 1000000L
  private val HashIndexTable = "graft_doc_hashes"

  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    graft.sources.Bucketed.write(
      docs.select(col("doc_id").as("corpus_id"), md5(col("text").cast("binary")).as("text_hash")),
      HashIndexTable,
      "text_hash",
      32)
    val increment = docs
      .filter(pmod(col("doc_id"), lit(IncrMod)) === 0)
      .select((col("doc_id") + IncrIdShift).as("new_id"), col("text"))
    Dedup
      .incrementalExact(increment, spark.table(HashIndexTable), "new_id", "text")
      .transform(orderedOutput(_, col("new_id")))
  }

  /** d18: incremental NEAR-dup against a persisted MinHash band index —
    * d12's maintenance shape lifted from exact hashes to near-duplicates,
    * which is how a 100 TB crawl corpus is ACTUALLY maintained: the
    * standing corpus is summarized once as its LSH band table (k·|corpus|
    * narrow rows, bucketed ON DISK by the band key), and each new crawl
    * batch computes only ITS OWN bands, probes the index with an
    * exchange-free join on the corpus side, then exact-verifies Jaccard
    * for just the banded candidates. The band key folds the band index
    * into the hash (md5(idx|band_hash)) so the probe is a single-column
    * equi-join riding the bucket layout. Neither the corpus text nor its
    * shingles are rescanned at probe time beyond the candidates'
    * verification rows. Output: every banded candidate with its verified
    * exact Jaccard and the d2/d3-threshold decision flag — exact-duplicate
    * replays surface at jaccard 1.0, near-dups above the threshold flag 1,
    * band-collision false candidates are kept (flag 0) so the measured
    * LSH precision is part of the gated surface (verified by
    * [[Dedup.jaccardForAllCandidates]], which keeps zero-overlap pairs —
    * an intersection-join verify would silently drop a pair whose shingle
    * sets are disjoint, while the oracle's list_intersect keeps it).
    *
    * Two gated operating points, the t19/t19c convention:
    *   - d18 (THE declared scale path): width-2 banding — a candidate
    *     needs a 40-bit agreement, so the false-candidate rate stays
    *     near zero as the corpus densifies (measured ~2-3× at 10× data);
    *   - d18w (wide-recall twin): width-1 banding, the loosest operating
    *     point — maximal recall and a deliberately non-trivial
    *     false-candidate rate, which is what populates the gated
    *     precision surface (~170 candidates at sf0.01 incl. zero-overlap
    *     component collisions, sub-threshold flag-0 pairs, and
    *     multi-band agreements). Width-1 postings grow with corpus
    *     density (a popular min-shingle collides its documents into one
    *     band), so the wide index stores no band key with more than
    *     [[BandCap]] corpus documents (the d2c df-cap convention lifted
    *     to the LSH index; invisible at gate scale where the largest
    *     posting is 5) — and even capped, its measured 10×-data ratio
    *     (~5×, SCALE_r08) is the disclosed cost of the wide operating
    *     point, next to d18's linear path on the same corpus.
    */
  private val BandIndexTable = "graft_doc_bands"
  private val WideBandIndexTable = "graft_doc_bands_wide"
  private val NearIncrMod = 7L
  private val BandCap = 64L

  private def bandKey(idx: org.apache.spark.sql.Column, hash: org.apache.spark.sql.Column) =
    md5(concat(idx.cast("string"), lit("|"), hash).cast("binary"))

  private def incrementalNearDupWith(
      spark: SparkSession,
      sfDir: String,
      bander: (DataFrame, Int) => DataFrame,
      table: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val sh = materializedShingles(docs)
    val corpusBandsAll = bander(sh.filter(pmod(col("doc_id"), lit(NearIncrMod)) =!= 0), MinhashK)
      .select(
        col("doc_id").as("corpus_id"),
        bandKey(col("band_idx"), col("band_hash")).as("band_key"))
    val keepKeys = corpusBandsAll
      .groupBy(col("band_key"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") <= BandCap)
      .select("band_key")
    graft.sources.Bucketed.write(corpusBandsAll.join(keepKeys, "band_key"), table, "band_key", 32)
    val incrBands = bander(sh.filter(pmod(col("doc_id"), lit(NearIncrMod)) === 0), MinhashK)
      .select(
        (col("doc_id") + IncrIdShift).as("new_id"),
        col("doc_id").as("orig_id"),
        bandKey(col("band_idx"), col("band_hash")).as("band_key"))
    val cands = incrBands
      .join(spark.table(table), "band_key")
      .groupBy(col("new_id"), col("orig_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
    // exact verify over the shared shingle frame, candidates-only — the
    // keep-all form, so a zero-overlap band collision stays a row
    val jac = Dedup.jaccardForAllCandidates(
      cands.select(col("orig_id").as("doc_a"), col("corpus_id").as("doc_b")),
      sh)
    cands
      .join(
        jac,
        cands("orig_id") === jac("doc_a") && cands("corpus_id") === jac("doc_b"))
      .select(
        col("new_id"),
        col("corpus_id"),
        col("n_shared_bands"),
        col("n_common"),
        col("n_union"),
        col("jaccard"),
        when(col("jaccard") >= JaccardThreshold, 1L).otherwise(0L).as("is_neardup"))
      .transform(orderedOutput(_, col("new_id"), col("corpus_id")))
  }

  def incrementalNearDup(spark: SparkSession, sfDir: String): DataFrame =
    incrementalNearDupWith(spark, sfDir, Dedup.minhashBands, BandIndexTable)

  def incrementalNearDupWide(spark: SparkSession, sfDir: String): DataFrame =
    incrementalNearDupWith(spark, sfDir, Dedup.minhashBands1, WideBandIndexTable)

  /** Shared oracle body for d18/d18w — identical pipeline, only the
    * banding arm differs.
    */
  private def incrNearDupSql(bandSelects: String): String = {
    val sigCols = (0 until MinhashK)
      .map(i => s"list_min(list_transform(sh_set, s -> substr(md5('0|' || s), ${i * 5 + 1}, 5))) AS m$i")
      .mkString(",\n    ")
    s"""WITH t AS (SELECT doc_id, list_distinct($shingles3) AS sh_set
       |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM t),
       |bands AS (
       |  $bandSelects),
       |cb AS (SELECT doc_id, band_key FROM bands WHERE doc_id % $NearIncrMod != 0),
       |keep AS (SELECT band_key FROM cb GROUP BY 1 HAVING count(*) <= $BandCap),
       |cand AS (
       |  SELECT i.doc_id + $IncrIdShift AS new_id, i.doc_id AS orig_id, c.doc_id AS corpus_id,
       |    count(*) AS n_shared_bands
       |  FROM bands i JOIN cb c ON i.band_key = c.band_key
       |                JOIN keep k ON k.band_key = i.band_key
       |  WHERE i.doc_id % $NearIncrMod = 0
       |  GROUP BY 1, 2, 3),
       |jac AS (
       |  SELECT cd.new_id, cd.corpus_id, cd.n_shared_bands,
       |    CAST(len(list_intersect(a.sh_set, b.sh_set)) AS BIGINT) AS n_common,
       |    CAST(len(a.sh_set) + len(b.sh_set) - len(list_intersect(a.sh_set, b.sh_set)) AS BIGINT)
       |      AS n_union
       |  FROM cand cd JOIN t a ON a.doc_id = cd.orig_id JOIN t b ON b.doc_id = cd.corpus_id)
       |SELECT new_id, corpus_id, n_shared_bands, n_common, n_union,
       |  CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard,
       |  CAST(CASE WHEN CAST(n_common AS DOUBLE) / CAST(n_union AS DOUBLE) >= $JaccardThreshold
       |       THEN 1 ELSE 0 END AS BIGINT) AS is_neardup
       |FROM jac ORDER BY new_id, corpus_id""".stripMargin
  }

  /** t10: TF-IDF-shaped term importance — each doc's top 3 terms by
    * tf * (N - df), the exact-INTEGER rarity weighting (a float idf log
    * is the one place engines may differ in ulp, so the gate's weight is
    * the rational surrogate with the same ordering intent: high term
    * frequency, low document frequency). df is computed over the exploded
    * token stream with one token-keyed shuffle; the per-doc rank is a
    * window over <= |doc vocabulary| rows. Ties break on token so the cut
    * is deterministic in both engines.
    */
  private val TermTopK = 3

  def termImportance(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    // N the t8/s6 way (one parquet-metadata count, no in-plan barrier)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df IS tf's per-token row count (tf holds exactly one row per
    // (doc, token)), expressed as an unbounded window count over the tf
    // frame — so the corpus is scanned and exploded exactly ONCE (the r6
    // version re-aggregated the exploded stream, a full wasted pass at
    // 100 TB), and the whole query is one linear pipeline: explode ->
    // tf agg -> token-window df -> doc-window rank. No join, no broadcast
    // barrier (an earlier attempt derived df via tf self-join under AQE
    // stage reuse — correct, but the reused-stage barrier + broadcast
    // serialized the plan and cost more latency than the explode saved).
    // PlanPostureSpec pins the single-Generate posture.
    val wTok = Window.partitionBy(col("token"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tf.withColumn("df", count(lit(1)).over(wTok))
      .withColumn("score", col("tf") * (lit(n) - col("df")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TermTopK)
      .select("doc_id", "rnk", "token", "tf", "df", "score")
      .transform(orderedOutput(_, col("doc_id"), col("rnk")))
  }

  /** t11: document chunking — split each doc into fixed-token training
    * chunks with overlap (the context-window packing precursor: long docs
    * become size-20 windows every 15 tokens, so consecutive chunks share
    * 5 tokens of context). Chunk starts are a pure integer sequence, the
    * chunk text a clamped array slice, the identity an md5 of the joined
    * tokens — all row-local (explode + expressions, NO shuffle at all:
    * the one stage a 100 TB corpus chunks in is embarrassingly parallel),
    * and every piece reproducible in DuckDB, so the gate pins chunk
    * boundaries, counts, and hashes bit-for-bit.
    */
  private val ChunkSize = 20
  private val ChunkStride = 15

  def docChunks(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("w"),
        explode(sequence(lit(0L), col("n_tokens") - 1, lit(ChunkStride.toLong)))
          .as("start_tok"))
      .withColumn("chunk_idx", (col("start_tok") / ChunkStride).cast("long"))
      .withColumn(
        "chunk",
        slice(col("w"), (col("start_tok") + 1).cast("int"), lit(ChunkSize)))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("start_tok"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_hash"))
      .transform(orderedOutput(_, col("doc_id"), col("chunk_idx")))

  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup
      .simhash16(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(orderedOutput(_, col("doc_id")))

  /** t14: fuzzy vocabulary matching — all distinct-token pairs within
    * Levenshtein distance 2, the typo/variant merge step of corpus
    * cleaning (fold "colour" into "color" before counting). The pair
    * space is the VOCABULARY squared, not the corpus squared: tokens
    * distinct first (bounded by the language, not the data), then a
    * bounded broadcast self-join scores edit distance — both engines
    * implement the same textbook DP, so the integer distances gate
    * exactly.
    */
  private val FuzzyMaxDist = 2

  def fuzzyVocabPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = Tables
      .documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .distinct()
    vocab
      .select(col("token").as("tok_a"))
      .join(broadcast(vocab.select(col("token").as("tok_b"))), col("tok_a") < col("tok_b"))
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")).cast("long"))
      .filter(col("dist") <= FuzzyMaxDist)
      .transform(orderedOutput(_, col("tok_a"), col("tok_b")))
  }

  /** k3: Bloom-filter membership — the approximate-membership complement
    * to d12's exact bucketed index: the corpus (every doc off the d12
    * increment residue) is summarized as k=3 md5-derived bit positions
    * in an m=4096 table; a probe is "present" iff ALL its positions are
    * set. The filter is the ROW SET of distinct (j, bucket) — at most
    * k*m rows regardless of corpus size — so it broadcasts, and the
    * probe side never shuffles: the membership pre-screen a 100 TB
    * incremental dedup runs before touching the exact index. md5 hashes
    * make the filter a pure function of the data, so the gate pins
    * exact bits INCLUDING the false positives (in_filter=1,
    * in_corpus=0 rows are the measured FP set), alongside the exact
    * ground truth derived independently by hash join.
    */
  private val BloomM = 4096L
  private val BloomK = 3

  def bloomMembership(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sketches
    val hashes = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val corpus = hashes.filter(pmod(col("doc_id"), lit(IncrMod)) =!= 0L)
    val slots = array((0 until BloomK).map { j =>
      struct(
        lit(j).as("j"),
        pmod(Sketches.hash32(s"bloom$j", col("h")), lit(BloomM)).as("bucket"))
    }: _*)
    val bits = corpus
      .select(explode(slots).as("s"))
      .select(col("s.j").as("j"), col("s.bucket").as("bucket"))
      .distinct()
      .withColumn("hit", lit(1L))
    val inFilter = hashes
      .select(col("doc_id"), explode(slots).as("s"))
      .select(col("doc_id"), col("s.j").as("j"), col("s.bucket").as("bucket"))
      .join(broadcast(bits), Seq("j", "bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(min(coalesce(col("hit"), lit(0L))).as("in_filter"))
    val inCorpus = hashes
      .join(
        broadcast(corpus.select(col("h")).distinct().withColumn("present", lit(1L))),
        Seq("h"),
        "left")
      .select(col("doc_id"), coalesce(col("present"), lit(0L)).as("in_corpus"))
    inFilter
      .join(inCorpus, Seq("doc_id"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** t12: Simpson repetition index — the ENTROPY-style quality filter
    * with an exact-integer surrogate: Shannon entropy needs log2 doubles
    * (the one place libm implementations may differ in ulp across
    * engines), while the Simpson pair-collision index sum(tf*(tf-1)) /
    * (n*(n-1)) carries the same "how repetitive is this doc" ordering as
    * exact integers (numerator and denominator gate separately; no
    * division crosses the boundary). A doc is flagged repetitive when its
    * collision rate exceeds 2x the uniform-vocabulary expectation 1/31 —
    * the Gopher-style cut re-expressed rationally. One explode + two
    * hash aggregations, all row-or-key-local.
    */
  private val VocabSize = 31L

  def simpsonRepetition(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("tf") * (col("tf") - 1L)).as("rep_num"))
      .withColumn("rep_den", col("n_tokens") * (col("n_tokens") - 1L))
      .withColumn(
        "is_repetitive",
        when(col("rep_num") * VocabSize > col("rep_den") * 2L, 1L).otherwise(0L))
      .select("doc_id", "n_tokens", "n_distinct", "rep_num", "rep_den", "is_repetitive")
      .transform(orderedOutput(_, col("doc_id")))

  /** t13: corpus bigram statistics — adjacent-token pair counts WITH
    * multiplicity (t7's unigram twin one order up; the n-gram LM /
    * tokenizer-training precursor). The pair list is a row-local
    * generator over the token array; the count is one hash aggregation;
    * the cut is TakeOrderedAndProject like t7. df (distinct docs) rides
    * along so hot collocations are distinguishable from one doc's chant.
    */
  private val BigramTopK = 20

  def bigramTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      // guard: Spark's sequence(1, n) DESCENDS when n < 1, so a 1-token
      // doc would fabricate indices — filter instead (explode of an empty
      // list would drop the row anyway, matching generate_series's empty)
      .filter(size(col("w")) >= 2)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "), element_at(col("w"), i + 1))))
          .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(BigramTopK)

  /** d13: TF-IDF-weighted cosine near-dup — d2's set-Jaccard re-scored
    * as a WEIGHTED vector similarity: each doc is its integer
    * tf * (N - df) vector over 3-gram shingles (t10's exact-integer
    * rarity weighting, so no float idf crosses the gate), hot shingles
    * (df > maxDf) dropped BEFORE norms and pairing exactly as d2c — the
    * same O(shingles * maxDf^2) bound on candidate generation, the same
    * declared-approximation contract. The cosine is the vector plane's
    * discipline: exact-integer dot and norms, one double division at the
    * end. Catches near-dups Jaccard undercounts (repeated rare shingles)
    * and ranks pairs by how much RARE material they share.
    */
  private val TfidfMaxDf = 4L
  private val TfidfThreshold = 0.5

  def tfidfNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // N the t8/s6/t10 way — one parquet-metadata count; an in-plan
    // broadcast scalar would put a BNLJ barrier in the pair pipeline
    val nDocs = docs.count()
    val tf = docs
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .filter(size(col("w")) >= 3) // same descending-sequence guard as t13
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(1), size(col("w")) - 2),
            i => concat_ws(
              " ",
              element_at(col("w"), i),
              element_at(col("w"), i + 1),
              element_at(col("w"), i + 2))))
          .as("shingle"))
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("tf"))
    // df from tf (one explode total — the t10 lesson), then the d2c cap
    val df = tf
      .groupBy(col("shingle"))
      .agg(count(when(col("tf") >= 1, 1)).as("df"))
      .filter(col("df") <= TfidfMaxDf)
    val wgt = tf
      .join(df, Seq("shingle"))
      .select(col("shingle"), col("doc_id"), (col("tf") * (lit(nDocs) - col("df"))).as("wgt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = wgt.groupBy(col("doc_id")).agg(sum(col("wgt") * col("wgt")).as("nrm"))
    val dots = wgt
      .as("a")
      .join(wgt.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.wgt") * col("b.wgt")).as("dot"))
    dots
      .join(norms.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nrm", "na"), Seq("doc_a"))
      .join(norms.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nrm", "nb"), Seq("doc_b"))
      .withColumn(
        "cosine",
        col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("cosine") >= TfidfThreshold)
      .select("doc_a", "doc_b", "dot", "cosine")
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))
  }

  /** d14: sorted-neighborhood dedup — the third classic blocking family
    * after hash-bucketing (d3's LSH) and all-pairs-by-shingle (d2): sort
    * the corpus by a blocking key, slide a fixed window down the sorted
    * order, and verify only docs within [[SnmWindow]] positions of each
    * other. Here block = first token (the partition — no global sort at
    * scale), order = (text, doc_id) within block, candidates = lead(1..w)
    * neighbors, verification = exact shingle Jaccard computed ROW-LOCALLY
    * on the paired arrays (array_intersect — no shuffle-by-shingle at
    * all, the method's selling point; its known blind spot, pairs whose
    * sort keys land far apart, is the declared approximation and the gate
    * pins it). One exchange + one sort, then row-local verify.
    */
  private val SnmWindow = 3

  def sortedNeighborhood(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("block")).orderBy(col("text"), col("doc_id"))
    val docs = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("text"),
        element_at(TextAnalysis.tokens(col("text")), 1).as("block"),
        array_distinct(graft.functions.WordShingles.wordShingles(col("text"), ShingleN))
          .as("sh"))
    val cand = docs
      .withColumn(
        "nbrs",
        array((1 to SnmWindow).map { i =>
          struct(
            lead(col("doc_id"), i).over(win).as("nbr_id"),
            lead(col("sh"), i).over(win).as("nbr_sh"))
        }: _*))
      .select(col("doc_id"), col("sh"), explode(col("nbrs")).as("nb"))
      .filter(col("nb.nbr_id").isNotNull)
    cand
      .select(
        least(col("doc_id"), col("nb.nbr_id")).as("doc_a"),
        greatest(col("doc_id"), col("nb.nbr_id")).as("doc_b"),
        size(array_intersect(col("sh"), col("nb.nbr_sh"))).cast("long").as("n_common"),
        (size(col("sh")) + size(col("nb.nbr_sh"))
          - size(array_intersect(col("sh"), col("nb.nbr_sh")))).cast("long").as("n_union"))
      .filter(col("n_union") > 0L && col("n_common") * 2L >= col("n_union"))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))
  }

  /** d16: blocked edit-distance linkage — d14's sorted-neighborhood
    * blocking (block = first token, slide [[SnmWindow]] positions down
    * the (text, doc_id) order) but verified with full-text Levenshtein
    * instead of shingle Jaccard: the classic record-linkage verifier for
    * small in-place edits (typos, token swaps) that set-based similarity
    * under-counts. A pair survives when lev·5 ≤ max(len_a, len_b), i.e.
    * edit distance within 20% of the longer text. Levenshtein is
    * integer-exact and identically defined in Spark and DuckDB, so the
    * gate crosses no floats. The O(len²) dynamic program runs only on
    * the ≤ w·n blocked candidates — never all pairs — and the window
    * partitions by block, so the sort scales with executors.
    */
  /** Levenshtein band: must satisfy band·5 ≥ max text length so no pair
    * the 20% filter could keep is ever cut by the band (generator texts
    * are ≤ ~553 chars; 120·5 = 600).
    */
  private val EditLevBand = 120

  def editDistanceLinkage(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("block")).orderBy(col("text"), col("doc_id"))
    val docs = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("text"),
        element_at(TextAnalysis.tokens(col("text")), 1).as("block"))
    val cand = docs
      .withColumn(
        "nbrs",
        array((1 to SnmWindow).map { i =>
          struct(
            lead(col("doc_id"), i).over(win).as("nbr_id"),
            lead(col("text"), i).over(win).as("nbr_text"))
        }: _*))
      .select(col("doc_id"), col("text"), explode(col("nbrs")).as("nb"))
      .filter(col("nb.nbr_id").isNotNull)
    // Two result-preserving cuts before/inside the O(len²) DP: (1) a pair
    // whose length gap alone exceeds max_len/5 can never pass (lev ≥
    // |len_a − len_b|), so it skips the DP entirely; (2) the DP runs
    // BANDED (threshold variant, O(k·len) instead of O(len²)) — any
    // distance beyond the threshold returns −1, and those rows are
    // exactly the ones the lev·5 ≤ max_len filter discards, since
    // corpus texts are bounded (≤ ~550 chars) below threshold·5. The
    // unbanded r7 form measured 11.2 s at sf0.1; this is the same gate
    // rows at a fraction of the DP cost.
    cand
      .select(
        least(col("doc_id"), col("nb.nbr_id")).as("doc_a"),
        greatest(col("doc_id"), col("nb.nbr_id")).as("doc_b"),
        col("text"),
        col("nb.nbr_text").as("nbr_text"),
        greatest(length(col("text")), length(col("nb.nbr_text"))).cast("long").as("max_len"))
      .filter(
        abs(length(col("text")) - length(col("nbr_text"))).cast("long") * 5L <= col("max_len"))
      .withColumn(
        "lev",
        levenshtein(col("text"), col("nbr_text"), EditLevBand).cast("long"))
      .filter(col("lev") >= 0L && col("lev") * 5L <= col("max_len"))
      .select("doc_a", "doc_b", "lev", "max_len")
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))
  }

  /** t15: within-document co-occurrence statistics — which token pairs
    * appear together in the same document more than their marginals
    * predict (the PMI/lift collocation signal behind phrase mining and
    * tokenizer-vocabulary induction). The pair space is generated ROW-
    * LOCALLY from each doc's sorted distinct-token array (a triangular
    * nested transform — never a corpus self-join; per-doc cost is bounded
    * by per-doc vocabulary², the corpus cost is linear), counted in one
    * hash agg, and joined to the tiny per-token marginal frame
    * (broadcasts). Lift crosses the gate as an exact integer ratio
    * (n_ab·N vs n_a·n_b) — no float log PMI.
    */
  private val CoocTopK = 25

  def cooccurrenceTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count() // parquet-metadata count, the d13/t8 way
    val arr = array_sort(array_distinct(TextAnalysis.tokens(col("text"))))
    val pairs = docs
      .select(col("doc_id"), arr.as("toks"))
      .select(
        explode(
          flatten(
            transform(
              col("toks"),
              (x, i) =>
                transform(
                  slice(col("toks"), i + lit(2), size(col("toks"))),
                  y => struct(x.as("tok_a"), y.as("tok_b"))))))
          .as("pr"))
      .select(col("pr.tok_a"), col("pr.tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
    val marginals = docs
      .select(explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    pairs
      .join(marginals.select(col("token").as("tok_a"), col("df").as("n_a")), Seq("tok_a"))
      .join(marginals.select(col("token").as("tok_b"), col("df").as("n_b")), Seq("tok_b"))
      .select(
        col("tok_a"),
        col("tok_b"),
        col("n_ab"),
        col("n_a"),
        col("n_b"),
        (col("n_ab") * lit(nDocs)).as("lift_num"),
        (col("n_a") * col("n_b")).as("lift_den"))
      .orderBy(col("n_ab").desc, col("tok_a"), col("tok_b"))
      .limit(CoocTopK)
  }

  /** t16: inverted-index construction — the search/retrieval side of the
    * corpus: per token, its document frequency and a deterministic capped
    * posting list (numerically sorted doc_ids, first [[PostingsCap]],
    * exported as a comma-joined string — the q9 array-determinism
    * discipline applied to the retrieval shape). One distinct pass + one
    * token-keyed hash agg; posting lists are capped so no single hot
    * token materializes an unbounded array (the full list lives sharded
    * at 100 TB — the cap is the gate's declared contract, not a silent
    * truncation).
    */
  private val PostingsCap = 20

  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        slice(array_sort(collect_set(col("doc_id"))), 1, PostingsCap).as("post"))
      .select(
        col("token"),
        col("df"),
        least(col("df"), lit(PostingsCap.toLong)).as("n_listed"),
        array_join(transform(col("post"), _.cast("string")), ",").as("postings"))
      .transform(orderedOutput(_, col("token")))

  /** t17: trigram language-model table — per bigram prefix, its total
    * continuation mass, distinct continuation count, and top-3 next
    * tokens by count (the count table behind n-gram LM probabilities,
    * Kneser-Ney style smoothing inputs, and autocomplete). Trigrams are
    * generated ROW-LOCALLY (t13's machinery one order up), counted in
    * one hash agg; the rank and both prefix marginals are window layers
    * over the SAME prefix partitioning — one exchange, one sort.
    * Probabilities stay downstream divisions: only exact integer counts
    * cross the gate.
    */
  private val LmTopK = 3

  def trigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(col("prefix")).orderBy(col("n").desc, col("nxt"))
    val wPrefix = Window.partitionBy(col("prefix"))
    Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .filter(size(col("w")) >= 3) // sequence(1, 0) would count DOWN
      .select(
        explode(
          transform(
            sequence(lit(1), size(col("w")) - 2),
            i =>
              struct(
                concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))
                  .as("prefix"),
                element_at(col("w"), i + 2).as("nxt"))))
          .as("t"))
      .select(col("t.prefix"), col("t.nxt"))
      .groupBy(col("prefix"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("prefix_total", sum(col("n")).over(wPrefix))
      .withColumn("n_continuations", count(lit(1)).over(wPrefix))
      .filter(col("rank") <= LmTopK)
      .select("prefix", "rank", "nxt", "n", "prefix_total", "n_continuations")
      .transform(orderedOutput(_, col("prefix"), col("rank")))
  }

  /** t23: language-model familiarity scoring — t17 builds the trigram
    * model TABLE; this gate APPLIES it back to every document, the
    * CCNet-style "perplexity filter" shape (score each doc by how probable
    * its n-grams are under a corpus LM, drop the tail). Log-probabilities
    * are doubles, so the score is re-expressed with exact integers that
    * carry the same ordering: familiarity = Σ corpus-count of each of the
    * doc's trigram occurrences, min_tri_count = the rarest trigram's
    * corpus count (1 ⇒ the doc holds a corpus-unique trigram), and the
    * unfamiliar flag cuts docs whose MEAN trigram corpus count is < 2 —
    * rationally, familiarity < 2·n_trigrams. Plan: ONE explode persisted
    * and shared between model build and scoring (the model is an
    * aggregation of the same frame that probes it); the model — bounded by
    * distinct trigrams, i.e. the language, not the corpus — broadcasts
    * into the scoring join, so the corpus side never shuffles on the
    * trigram key. Reclaimed by the consuming harness's
    * [[graft.CacheScope]] batch.
    */
  def lmFamiliarity(spark: SparkSession, sfDir: String): DataFrame = {
    val tri = Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(1), size(col("w")) - 2),
            i =>
              concat_ws(
                " ",
                element_at(col("w"), i),
                element_at(col("w"), i + 1),
                element_at(col("w"), i + 2)))).as("tri"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = tri.groupBy(col("tri")).agg(count(lit(1)).as("n"))
    tri
      .join(broadcast(model), Seq("tri"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(col("n")).as("familiarity"),
        min(col("n")).as("min_tri_count"))
      .withColumn(
        "is_unfamiliar",
        when(col("familiarity") < lit(2L) * col("n_trigrams"), 1L).otherwise(0L))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** f14: the hashing trick (HashingVectorizer / Vowpal-Wabbit feature
    * hashing) — tokens projected into a FIXED 64-dimension index space by
    * md5, with the collision profile that decides whether the dimension
    * budget is adequate: per hashed bucket, its total occurrence mass,
    * how many distinct tokens collided into it, and a deterministic
    * example member. The projection needs NO vocabulary pass — row-local
    * hashing then one hash agg bounded by the dimension count, which is
    * why the trick is the standard featurizer when the true vocabulary
    * is unbounded (URLs, user agents, n-grams) at 100 TB.
    */
  private val HashDim = 64L

  def featureHashing(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sketches
    Tables
      .documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .withColumn("bucket", pmod(Sketches.hash32("fh", col("token")), lit(HashDim)))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("token")).as("n_distinct_tokens"),
        min(col("token")).as("example_token"))
      .transform(orderedOutput(_, col("bucket")))
  }

  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        TextAnalysis.sumTokenLength(col("w")).as("sum_token_len"),
        (TextAnalysis.sumTokenLength(col("w")) / size(col("w"))).as("mean_token_len"),
        regexp_count(col("text"), lit("[a-z]+")).cast("long").as("n_alpha_tokens"))
      .transform(orderedOutput(_, col("doc_id")))

  /** t5: BPE-style token counting — the GPT-2 pre-tokenizer shape
    * (contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs), simplified to the character classes this corpus
    * contains and to syntax Java regex and RE2 evaluate identically (no
    * lookaround, no backrefs). This is the LLM-budgeting token count;
    * t1's whitespace count stays the linguistic one.
    */
  private[queries] val BpePattern = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"

  /** [[BpePattern]] with the apostrophe doubled for SQL string literals. */
  private val BpePatternSql = BpePattern.replace("'", "''")

  def bpeTokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(BpePattern)).cast("long").as("n_bpe_tokens"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"))
      .withColumn("tokens_per_word", col("n_bpe_tokens") / col("n_ws_tokens"))
      .transform(orderedOutput(_, col("doc_id")))

  /** t7: vocabulary building — global term frequency + document frequency
    * per token, top 50 by tf (token tie-break keeps the cut deterministic
    * in both engines). One shuffle by token with map-side partial
    * aggregation; the top-k is TakeOrderedAndProject — per-partition
    * heaps, never a global sort.
    */
  def vocabTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      // a GLOBAL sort under limit is what Catalyst rewrites to
      // TakeOrderedAndProject — orderedOutput's single-partition sort
      // would instead drag the whole vocabulary onto one task
      .orderBy(col("tf").desc, col("token"))
      .limit(50)

  /** t8: sequence packing — lay documents contiguously into fixed
    * token-budget training sequences (GPT-style packed pretraining with
    * document spillover): each doc's pack id and intra-pack offset fall
    * out of a prefix sum of token counts. Packing is per SHARD
    * (doc_id mod 8) so the cumsum is a partitioned window — the global
    * single-sequence variant would serialize the corpus through one
    * partition, which is exactly what sharded packing exists to avoid at
    * 100 TB (shards map to parallel writer tasks).
    */
  private val PackBudget = 2048L

  /** Shard count DERIVED from corpus size — `max(8, ceil(n / target))`,
    * the autoBits/autoCells pattern: a CONSTANT shard count is a
    * parallelism ceiling (8 fixed shards at 100 TB means ~12.5 TB of
    * cumsum per task), while ceil-division keeps every shard's prefix sum
    * at ~`PackTargetPerShard` docs regardless of corpus size. Exact
    * integer math, so both oracles reproduce the derivation verbatim from
    * `count(*)` (`greatest(8, (count(*) + target - 1) // target)`); the
    * gate corpus (500 docs) derives 8, the pre-derivation value.
    */
  private[graft] val PackTargetPerShard = 100000L
  private[graft] def packShards(n: Long): Long =
    math.max(8L, (n + PackTargetPerShard - 1L) / PackTargetPerShard)

  /** SQL twin of [[packShards]] (DuckDB dialect). */
  private val packShardsSql =
    s"(SELECT greatest(8, (count(*) + ${PackTargetPerShard - 1}) // $PackTargetPerShard) AS ns FROM documents)"

  def sequencePacking(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val docs = Tables.documents(spark, sfDir)
    val shards = packShards(docs.count())
    docs
      .select(
        col("doc_id"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("cum_tokens") - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_tok div $PackBudget"))
      .withColumn("pack_off", pmod(col("start_tok"), lit(PackBudget)))
      .select("doc_id", "shard", "n_tokens", "cum_tokens", "pack_id", "pack_off")
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** s6: deterministic epoch shuffle — the training-order stage that
    * precedes packing: each epoch's order is a rank over md5(seed|doc_id)
    * within a shard, so the "random" order is reproducible across runs,
    * engines, and partitionings (an RNG-based shuffle is none of these),
    * and changing the seed string re-shuffles. Shard-local ranks keep the
    * sort partitioned ([[packShards]] sizes the shard count from the
    * corpus); the tie-break on doc_id pins md5-collision order.
    */
  def epochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u8 = graft.operators.Sampling.hashUniformHex("epoch0", col("doc_id"))
    val docs = Tables.documents(spark, sfDir)
    val shards = packShards(docs.count())
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards)).as("shard"), u8.as("u8"))
      .withColumn(
        "shuffle_pos",
        row_number()
          .over(Window.partitionBy(col("shard")).orderBy(col("u8"), col("doc_id")))
          .cast("long"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** s13: epoch-based domain mixture with repeat factors — the
    * training-mix composition step (the shape of public LLM data
    * recipes: per-domain mixture weights over a token budget, small
    * domains repeated for multiple epochs): each source gets quota =
    * (weight·budget) div Σweights out of a 2×-corpus budget; a domain
    * whose quota exceeds its doc count is UPSAMPLED by full epochs plus
    * a deterministic md5-ranked remainder, a heavy domain downsampled
    * the same way. Exact integers throughout, and the remainder
    * MEMBERSHIP is pinned through char totals (total_chars =
    * epochs·Σchars + Σ remainder chars). Weights derive from the source
    * id (1 + src# mod 5) so the gate reshapes with the corpus, not a
    * fixture.
    *
    * Scale: two grouped aggs, one broadcast 1-row budget frame (the q31
    * shape), one broadcast domain-quota join, one per-source rank
    * window (partitioned — cardinality is the domain catalog, not the
    * corpus).
    */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("source"),
        col("n_chars"),
        md5(concat(lit("mix|"), col("doc_id").cast("string"))).as("draw"),
        (lit(1L) + pmod(substring(col("source"), 4, 10).cast("long"), lit(5L))).as("weight"))
    val per = docs
      .groupBy(col("source"), col("weight"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val tot = per.agg((sum(col("n_docs")) * 2L).as("budget"), sum(col("weight")).as("sum_w"))
    val quotas = per
      .crossJoin(broadcast(tot))
      // Spark `div` (truncate) == DuckDB `//` (floor) because every
      // operand here is non-negative (weights 1..5, counts, budget);
      // signed inputs would diverge the two engines at these lines
      .withColumn("quota", expr("(weight * budget) div sum_w"))
      .withColumn("full_epochs", expr("quota div n_docs"))
      .withColumn("n_extra", expr("quota % n_docs"))
    val w = Window.partitionBy(col("source")).orderBy(col("draw"), col("doc_id"))
    val extra = docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas.select(col("source"), col("n_extra"))), Seq("source"))
      .filter(col("rk") <= col("n_extra"))
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("extra_chars"))
    quotas
      .join(extra, Seq("source"), "left")
      .withColumn(
        "total_chars",
        col("full_epochs") * col("sum_chars") + coalesce(col("extra_chars"), lit(0L)))
      .select(
        "source", "weight", "n_docs", "sum_chars", "quota",
        "full_epochs", "n_extra", "total_chars")
      .transform(orderedOutput(_, col("source")))
  }

  /** s15: UNIGRAM-TEMPERATURE domain mixture (α = 0.5) — s13's quota
    * machinery with the weights derived from the EMPIRICAL distribution
    * instead of a fixed recipe: each domain's sampling weight is
    * n_docs^α, the exponentiated-smoothing rule multilingual/multi-domain
    * LLM recipes use (XLM-R's temperature sampling; Conneau et al. 2020)
    * to lift rare domains without letting the head domains starve them.
    * α = 0.5 makes the exponent a SQRT — the one float op, correctly
    * rounded per IEEE-754 on both engines — and the weight quantizes to
    * an integer (floor(sqrt(n)·1000)) before any cross-domain sum, so no
    * order-dependent double accumulation exists anywhere (Σ√n as a raw
    * double sum would diverge between engines). Budget = 1× corpus: the
    * temperature REDISTRIBUTES the epoch, it doesn't grow it. Quota
    * arithmetic headroom: weight ≤ 1000·√n, so weight·budget ≤ 1000·n^1.5
    * — inside int64 past n = 10⁹ docs (~100 TB of 100 KB docs). Same
    * epochs+md5-ranked-remainder resolution as s13; same scale posture
    * (two grouped aggs, broadcast 1-row totals, one domain-catalog-sized
    * window).
    */
  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("source"),
        col("n_chars"),
        md5(concat(lit("tmix|"), col("doc_id").cast("string"))).as("draw"))
    val per = docs
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn(
        "weight",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000.0)).cast("long"))
    val tot = per.agg(sum(col("n_docs")).as("budget"), sum(col("weight")).as("sum_w"))
    val quotas = per
      .crossJoin(broadcast(tot))
      // non-negative operands: Spark `div` (truncate) == DuckDB `//` (floor)
      .withColumn("quota", expr("(weight * budget) div sum_w"))
      .withColumn("full_epochs", expr("quota div n_docs"))
      .withColumn("n_extra", expr("quota % n_docs"))
    val w = Window.partitionBy(col("source")).orderBy(col("draw"), col("doc_id"))
    val extra = docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas.select(col("source"), col("n_extra"))), Seq("source"))
      .filter(col("rk") <= col("n_extra"))
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("extra_chars"))
    quotas
      .join(extra, Seq("source"), "left")
      .withColumn(
        "total_chars",
        col("full_epochs") * col("sum_chars") + coalesce(col("extra_chars"), lit(0L)))
      .select(
        "source", "weight", "n_docs", "sum_chars", "quota",
        "full_epochs", "n_extra", "total_chars")
      .transform(orderedOutput(_, col("source")))
  }

  /** t28: PII detection + redaction — the scrub pass a training-data
    * pipeline runs before release: count and mask emails, phone numbers
    * and IPv4 addresses. The synthetic corpus carries no PII, so the
    * gate first AUGMENTS it deterministically (docs at doc_id ≡ 0 mod
    * 7/11/13 get a derived email / 555-phone / 192.168 address appended
    * — both engines build the identical string from doc_id arithmetic),
    * then detects on the raw text and masks in a fixed order
    * (email → phone → IP). Counts are non-overlapping left-to-right
    * matches (identical in Java regex and RE2 for these anchored-shape
    * patterns — no alternation, no backtracking divergence), and the
    * redacted text is pinned through md5, so a single masking divergence
    * fails the gate. Row-local work only — the scan is the whole plan.
    */
  private val EmailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
  private val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"
  private val IpRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def piiRedaction(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .withColumn(
        "aug",
        concat(
          col("text"),
          when(
            pmod(col("doc_id"), lit(7L)) === 0L,
            concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com now")))
            .otherwise(lit("")),
          when(
            pmod(col("doc_id"), lit(11L)) === 0L,
            concat(
              lit(" call 555-"),
              lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
              lit("-"),
              lpad(pmod(col("doc_id") * 3L, lit(10000L)).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(
            pmod(col("doc_id"), lit(13L)) === 0L,
            concat(
              lit(" from 192.168."),
              pmod(col("doc_id"), lit(256L)).cast("string"),
              lit("."),
              pmod(col("doc_id") * 7L, lit(256L)).cast("string")))
            .otherwise(lit(""))))
      .withColumn("n_emails", regexp_count(col("aug"), lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col("aug"), lit(PhoneRe)).cast("long"))
      .withColumn("n_ips", regexp_count(col("aug"), lit(IpRe)).cast("long"))
      .filter(col("n_emails") + col("n_phones") + col("n_ips") > 0L)
      .withColumn(
        "clean_hash",
        md5(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
              PhoneRe,
              "<PHONE>"),
            IpRe,
            "<IP>")))
      .select("doc_id", "n_emails", "n_phones", "n_ips", "clean_hash")
      .transform(orderedOutput(_, col("doc_id")))

  /** t31: HTML text extraction — the boilerplate-stripping stage every
    * web-scrape training pipeline runs first (WARC/HTML → clean text;
    * the trafilatura/jusText problem shape re-expressed as codegen'd
    * Column algebra). Each document is wrapped in DETERMINISTIC
    * synthetic HTML (title, style+script blocks carrying text-derived
    * junk, nav/footer chrome, entity-encoded punctuation, a doc-derived
    * link set — the t28 augmentation convention, so both engines build
    * the identical page), then extracted: script/style blocks dropped
    * ((?s) non-greedy spans), tags stripped, entities decoded (&amp;
    * LAST — decoding it first would corrupt double-encoded entities),
    * whitespace collapsed (explicit [ \\t\\n\\r] class — Java and RE2
    * disagree on \\s's vertical-tab membership). Emits the title, link
    * count, extracted length, and the md5-pinned extracted text — a
    * character lost or boilerplate leaked anywhere diverges the hash.
    * Row-local end to end: no shuffle before the output sort.
    */
  def htmlExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val withHtml = Tables
      .documents(spark, sfDir)
      .withColumn(
        "html",
        concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style>body{margin:0}</style><script>var k=\""),
          md5(col("text")),
          lit("\";</script></head><body><nav>Home | About | <a href=\"/\">Index</a></nav><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><p>"), col("text"),
          lit(" &amp; more &lt;tags&gt; &quot;quoted&quot;&nbsp;end</p><a href=\"/d/"),
          pmod(col("doc_id") * 31L, lit(997L)).cast("string"),
          lit("\">next</a>"),
          when(
            pmod(col("doc_id"), lit(3L)) === 0L,
            concat(
              lit("<a href=\"/d/"),
              pmod(col("doc_id") * 17L, lit(997L)).cast("string"),
              lit("\">rel</a>")))
            .otherwise(lit("")),
          lit("<footer>(c) corp</footer></body></html>")))
    val noBlocks = regexp_replace(
      regexp_replace(col("html"), "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>",
      " ")
    val unTagged = regexp_replace(noBlocks, "<[^>]+>", " ")
    val clean = trim(
      regexp_replace(
        replace(
          replace(
            replace(
              replace(
                replace(unTagged, lit("&lt;"), lit("<")),
                lit("&gt;"), lit(">")),
              lit("&quot;"), lit("\"")),
            lit("&nbsp;"), lit(" ")),
          lit("&amp;"), lit("&")),
        "[ \\t\\n\\r]+",
        " "))
    withHtml
      .select(
        col("doc_id"),
        regexp_extract(col("html"), "<title>([^<]*)</title>", 1).as("title"),
        ((length(col("html")) - length(replace(col("html"), lit("<a href="), lit("")))) / 8L)
          .cast("long").as("n_links"),
        length(clean).cast("long").as("extracted_len"),
        md5(clean).as("extract_hash"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** t32's canonicalization table, applied AFTER lowercasing (so only
    * lowercase accent forms need rows) and BEFORE whitespace collapse
    * (so the NBSP→space mapping feeds the collapse): typographic
    * punctuation → ASCII, zero-width marks stripped, the common Latin-1
    * accents folded. Literal (non-regex) replaces on both engines, in
    * this exact order.
    */
  private val NormPairs: Seq[(String, String)] = Seq(
    "’" -> "'", "‘" -> "'", "“" -> "\"", "”" -> "\"",
    "—" -> "-", "–" -> "-", " " -> " ",
    "​" -> "", "﻿" -> "",
    "é" -> "e", "è" -> "e", "ê" -> "e", "à" -> "a",
    "â" -> "a", "ü" -> "u", "ö" -> "o", "ñ" -> "n",
    "ç" -> "c", "ï" -> "i")

  /** The three deterministic dirt strings t32 injects (mod 3/5/7 of the
    * doc id): typographic punctuation + accents, zero-width marks +
    * whitespace runs, mixed ASCII case + an ASCII apostrophe. Lowercase
    * accents only — uppercase accent folding depends on each engine's
    * Unicode case tables, which is exactly the dependency the gate
    * avoids (ASCII case is the portable part of lower()).
    */
  private val DirtA = " Café—Zürich’s “naïve” test case"
  private val DirtB = " ZERO​WIDTH﻿mark  and \t multiple   spaces "
  private val DirtC = " MIXED Case c'est déjà vu – OK"

  /** t32: text normalization/canonicalization — the cleaning stage every
    * corpus pipeline runs before dedup and tokenization (the CCNet/
    * fastText preprocessing shape): typographic punctuation to ASCII,
    * zero-width marks stripped, NBSP to space, common accents folded,
    * ASCII lowercased, whitespace runs collapsed. Documents are
    * deterministically DIRTIED first (the t28/t31 augmentation
    * convention) so the stage provably has work to do on every matched
    * row; the normalized text is md5-pinned, so one wrong mapping or a
    * collapse that ate a real character diverges the gate. All literal
    * replaces + one anchored regex — row-local, codegen'd, shuffle-free.
    */
  def textNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    val aug = Tables
      .documents(spark, sfDir)
      .withColumn(
        "aug",
        concat(
          col("text"),
          when(pmod(col("doc_id"), lit(3L)) === 0L, lit(DirtA)).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5L)) === 0L, lit(DirtB)).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7L)) === 0L, lit(DirtC)).otherwise(lit(""))))
    val folded = NormPairs.foldLeft(lower(col("aug"))) {
      case (c, (from, to)) => replace(c, lit(from), lit(to))
    }
    val norm = trim(regexp_replace(folded, "[ \t\n\r]+", " "))
    aug
      .select(
        col("doc_id"),
        length(col("aug")).cast("long").as("n_raw"),
        length(norm).cast("long").as("n_norm"),
        (col("aug") =!= norm).cast("long").as("changed"),
        md5(norm).as("norm_md5"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** t29: length-bucketed dynamic batching — the batch-composition step
    * a training loader runs so sequences of similar length share a batch
    * and padding waste stays low (the t8 sequence-packing companion:
    * packing concatenates, batching groups). Docs shard by id (shard
    * count sized from the corpus via [[packShards]], so parallelism
    * grows with data), bucket into 32-char length bands, draw a
    * deterministic md5 shuffle order within (shard, band), and chunk
    * into batches of [[BatchDocs]]. The gate pins per-batch composition
    * through exact integers: count, max length, length sum, and
    * padding_waste = n·max − Σlen (what a padded tensor allocates minus
    * what it uses). One (shard, band)-partitioned rank window — key
    * cardinality scales with the corpus, never a global sort.
    */
  private val BatchDocs = 8L

  def lengthBatching(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars"))
    val shards = packShards(docs.count())
    val w = Window.partitionBy(col("shard"), col("band")).orderBy(col("draw"), col("doc_id"))
    docs
      .withColumn("shard", pmod(col("doc_id"), lit(shards)))
      .withColumn("band", least(lit(15L), expr("n_chars div 32")))
      .withColumn("draw", md5(concat(lit("lb|"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("batch", expr(s"(rk - 1) div $BatchDocs"))
      .groupBy(col("shard"), col("band"), col("batch"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("n_chars")).as("max_len"),
        sum(col("n_chars")).as("sum_len"))
      .withColumn("padding_waste", col("n_docs") * col("max_len") - col("sum_len"))
      .transform(orderedOutput(_, col("shard"), col("band"), col("batch")))
  }

  /** t30: sub-document (line-level) dedup with keep-first semantics — the
    * CCNet/RefinedWeb boilerplate-removal stage (Wenzek et al. 2020;
    * Penedo et al. 2023): where the d-family FLAGS whole near-duplicate
    * documents, this REWRITES each document, deleting repeated spans.
    * Documents are segmented into fixed [[LineW]]-token chunks (the
    * corpus has no newlines, so the chunk grid plays the line role); a
    * chunk occurrence survives iff its text is corpus-unique (df ≤ 1) OR
    * it is the FIRST occurrence — min (doc_id, chunk_idx) — so exactly
    * one copy of every repeated span remains in the corpus (CCNet keeps
    * the first-seen paragraph; removing all copies would delete the
    * content itself). The cleaned document is reassembled from surviving
    * chunks in chunk order via sorted-struct assembly (the q16
    * partitioning-independent idiom) and pinned by md5.
    *
    * Scale: one row-local explode, two hash aggs (by chunk hash, by doc)
    * and one chunk-hash-keyed join — linear, shuffles carry md5 keys not
    * text twice. First-occurrence = min over the ENCODED key
    * `doc_id·2^20 + chunk_idx` (exact in both engines; chunk_idx < 2^20
    * ⇔ docs under ~8.4M tokens — any real corpus document; the encoding
    * is documented rather than struct-min because DuckDB's struct
    * ordering is not part of the oracle discipline).
    */
  private val LineW = 8
  private val LineMaxDf = 1L
  private val ChunkShift = 1048576L // 2^20: first-occurrence encoding bound

  def lineDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val chunks = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("chunk_idx", expr(s"pos div $LineW").cast("long"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            s => s.getField("w")),
          " ").as("chunk_text"))
      .withColumn("h", md5(col("chunk_text")))
    val stats = chunks
      .groupBy(col("h"))
      .agg(
        countDistinct(col("doc_id")).as("df"),
        min(col("doc_id") * lit(ChunkShift) + col("chunk_idx")).as("canon"))
    val kept = chunks
      .join(stats, Seq("h"))
      .withColumn(
        "keep",
        col("df") <= LineMaxDf ||
          col("canon") === col("doc_id") * lit(ChunkShift) + col("chunk_idx"))
    kept
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("chunk_idx"), col("chunk_text"))))),
            s => s.getField("chunk_text")),
          " ").as("clean_text"))
      .select(
        col("doc_id"),
        col("n_chunks"),
        col("n_kept"),
        col("n_removed"),
        length(col("clean_text")).cast("long").as("clean_chars"),
        md5(col("clean_text")).as("clean_md5"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  def qualityScore(spark: SparkSession, sfDir: String): DataFrame =
    scoredDocs(spark, sfDir)
      .select("doc_id", "n_tokens", "stop_ratio", "rep_ratio", "quality_score", "quality_band")
      .transform(orderedOutput(_, col("doc_id")))

  /** Shared t2 scoring frame (no gate-output sort) — feeds t2 and s7. */
  private def scoredDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("long"))
      .withColumn("stop_cnt", TextAnalysis.profileScore(col("w"), TextAnalysis.qualityStopwords))
      .withColumn("stop_ratio", col("stop_cnt") / col("n_tokens"))
      .withColumn("rep_ratio", lit(1.0) - col("n_distinct") / col("n_tokens"))
      .withColumn(
        "quality_score",
        col("stop_ratio") * lit(0.3)
          + least(TextAnalysis.sumTokenLength(col("w")) / size(col("w")) / lit(10.0), lit(1.0)) * lit(0.3)
          + (col("n_distinct") / col("n_tokens")) * lit(0.4))
      .withColumn(
        "quality_band",
        when(col("quality_score") >= 0.5, lit("good")).otherwise(lit("low")))

  /** s7: quality-weighted importance sampling — each document survives
    * with probability equal to its t2 quality score (the Common-Crawl-
    * style "sample good text more" stage), decided deterministically:
    * keep iff hash32(seed|doc_id) < floor(score * 2^32). Same
    * reproducibility contract as s4/s5 (partitioning/engine/re-run
    * stable); the weight formula and the draw are both in the output so
    * the gate pins the decision, not just the survivors.
    */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val h = graft.operators.Sketches.hash32("wsmp", col("doc_id"))
    // selects from the UNSORTED scoring frame — qualityScore applies the
    // gate-only single-partition sort, which s7 would pay redundantly
    // before its own filter + orderedOutput
    scoredDocs(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("draw", h)
      .withColumn("cut", floor(col("quality_score") * lit(4294967296.0)))
      .filter(col("draw") < col("cut"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** e1: the END-TO-END corpus-prep pipeline — the composition every
    * training-data run actually executes, as ONE oracle-gated query:
    * exact dedup (d1's canonical-survivor rule) → quality filter (t2's
    * score ≥ 0.5 band) → language filter (t3's n-gram profile, keep
    * 'en') → deterministic train/val split (s5's md5 draw). Each stage
    * is individually gated elsewhere; THIS gate pins that the stages
    * compose bit-exactly — filter ordering, join keying, and the
    * survivor set all cross engines intact. Plan posture: every stage
    * is one doc_id-keyed pass or semi-join over the corpus (the three
    * token computations share one scan via the CacheManager's identical-
    * subplan dedup); nothing here is new machinery, which is the point —
    * a 100 TB curation run is exactly this chain with bigger inputs.
    */
  def corpusPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val canon = docs
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val kept = docs
      .join(canon, Seq("doc_id"), "left_semi")
      .join(
        scoredDocs(spark, sfDir).select(col("doc_id"), col("n_tokens"), col("quality_band")),
        Seq("doc_id"))
      .filter(col("quality_band") === "good")
      .join(langId(spark, sfDir).select(col("doc_id"), col("lang_pred")), Seq("doc_id"))
      .filter(col("lang_pred") === "en")
    kept
      .select(
        col("doc_id"),
        col("n_tokens"),
        graft.operators.Sampling.hashUniformHex("corpus", col("doc_id")).as("u8"),
        graft.operators.Sampling
          .splitLabel("corpus", col("doc_id"), Seq("train" -> "e6000000"), default = "val")
          .as("split"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val profiles = TextAnalysis.langProfiles
    val scored = Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
    val withScores = profiles.foldLeft(scored) { case (df, (langName, words)) =>
      df.withColumn(s"score_$langName", TextAnalysis.profileScore(col("w"), words))
    }
    withScores
      .withColumn(
        "lang_pred",
        when(
          col("score_en") >= col("score_es") && col("score_en") >= col("score_de")
            && col("score_en") >= col("score_fr"), lit("en"))
          .when(col("score_es") >= col("score_de") && col("score_es") >= col("score_fr"), lit("es"))
          .when(col("score_de") >= col("score_fr"), lit("de"))
          .otherwise(lit("fr")))
      .select("doc_id", "score_en", "score_es", "score_de", "score_fr", "lang_pred")
      .transform(orderedOutput(_, col("doc_id")))
  }

  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"),
        md5(array_join(slice(col("w"), 1, 3), " ").cast("binary")).as("head_hash"))
      .transform(orderedOutput(_, col("doc_id")))

  /** k6: exact corpus heavy hitters through a Misra–Gries candidate pass —
    * tokens with frequency > N/[[HhCapacity]], exact counts. The sketch
    * only PRUNES (per-partition O(capacity) state, candidates broadcast
    * back over the corpus for an exact recount), so the output is
    * bit-identical under any partitioning and gates against the plain
    * GROUP BY / HAVING oracle — unlike t7's top-k this never shuffles the
    * full vocabulary.
    */
  private val HhCapacity = 50

  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.HeavyHitters
      .exactOverThreshold(
        Tables
          .documents(spark, sfDir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("token")),
        HhCapacity)
      .withColumnRenamed("item", "token")
      .transform(orderedOutput(_, col("token")))

  /** t18: positional phrase search — exact multi-token phrase matching
    * via the positional-postings join every search engine runs: each
    * phrase term's postings are filtered FIRST (the join inputs are the
    * phrase terms' occurrences only, never the corpus), shifted by the
    * term's offset in the phrase, and equi-joined on (doc_id, start
    * position). k-term phrases are k−1 co-keyed equi-joins over
    * already-tiny posting frames; at 100 TB the postings come out of
    * t16's index instead of a scan, and the join shape is unchanged.
    * Positions are 0-based token offsets.
    */
  private val PhraseTerms = Seq("slow", "hash")

  def phraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val pos = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
      .withColumnRenamed("col", "token")
    val parts = PhraseTerms.zipWithIndex.map { case (t, i) =>
      pos
        .filter(col("token") === t)
        .select(col("doc_id"), (col("pos") - i).as("start_pos"))
    }
    parts
      .reduce((a, b) => a.join(b, Seq("doc_id", "start_pos")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_matches"),
        min(col("start_pos")).cast("long").as("first_pos"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** t19: containment near-dup ([[Dedup.containmentPairs]] ≥ 0.8 from
    * either side) — catches subset duplication (a doc pasted inside a
    * longer one) that d2's Jaccard structurally misses. Fed the same
    * persisted shingle frame as d2/d3, so the intersect join cost is
    * shared with the Jaccard plane, not a second corpus pass.
    */
  private val ContainmentThreshold = 0.8

  def containmentDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup
      .containmentPairs(materializedShingles(Tables.documents(spark, sfDir)))
      .filter(greatest(col("cont_a"), col("cont_b")) >= ContainmentThreshold)
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))

  /** t19c: the capped-containment 100 TB path — t19 with d2c's hot-shingle
    * df cap ([[Dedup.dropHotShingles]], maxDf=[[JaccardMaxDf]]) applied
    * before pairing AND sizes. t19's uncapped shared-shingle join is
    * O(shingles·df²), and the r7 sf0.1→sf1 scale run measured it at 11.2×
    * for 10× data (pair blow-up, the expected superlinearity of the exact
    * form); the cap bounds the join at O(shingles·maxDf²) — linear in the
    * corpus — at the declared cost that pairs whose every common shingle
    * is hot are lost and containment is computed over the filtered sets.
    * The gate pins that approximate contract bit-for-bit, exactly like
    * d2c pins capped Jaccard.
    */
  def containmentDedupCapped(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.dropHotShingles(
      materializedShingles(Tables.documents(spark, sfDir)),
      JaccardMaxDf)
    Dedup
      .containmentPairs(sh)
      .filter(greatest(col("cont_a"), col("cont_b")) >= ContainmentThreshold)
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))
  }

  /** t19b: BANDED containment — the r7 audit's asked-for third operating
    * point between t19 (exact, superlinear pair space) and t19c (capped,
    * linear but lossy on hot-shingle pairs): candidates come from d3's
    * width-2 MinHash banding over the SAME shared shingle frame, and
    * exact containment ([[Dedup.containmentForCandidates]]) is computed
    * ONLY on those candidates — cost O(bands + candidates·set), linear
    * in the corpus with NO shingle dropped from the sets themselves.
    * The declared loss is recall on asymmetric pairs (a small doc inside
    * a big one has high containment but LOW Jaccard, which banding
    * under-samples); t19r pins that recall as a measured value against
    * t19's exact output, the v6 convention.
    */
  def containmentDedupBanded(spark: SparkSession, sfDir: String): DataFrame =
    containmentBandedPairs(spark, sfDir)
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))

  private def containmentBandedPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = materializedShingles(Tables.documents(spark, sfDir))
    val cands = Dedup.minhashBandCandidatesFromShingles(sh, MinhashK)
    Dedup
      .containmentForCandidates(cands, sh)
      .filter(greatest(col("cont_a"), col("cont_b")) >= ContainmentThreshold)
  }

  /** t19r: the recall monitor for t19b (v6's shape) — exact containment
    * pairs LEFT JOIN the banded pairs, one summary row. The pinned value
    * is whatever the banding actually achieves on the gate corpus, not a
    * vacuous 1.0 by construction.
    */
  def containmentBandedRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = Dedup
      .containmentPairs(materializedShingles(Tables.documents(spark, sfDir)))
      .filter(greatest(col("cont_a"), col("cont_b")) >= ContainmentThreshold)
      .select(col("doc_a"), col("doc_b"))
    val banded = containmentBandedPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("found"))
    exact
      .join(banded, Seq("doc_a", "doc_b"), "left")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(coalesce(col("found"), lit(0L))).as("n_found"))
      .withColumn("recall", col("n_found").cast("double") / col("n_pairs").cast("double"))
  }

  /** d17: content-defined chunking dedup — the storage-dedup family
    * (LBFS/rsync lineage) applied to text: chunk boundaries are declared
    * at words whose md5 lands in the low quarter of hash space (p=1/4 →
    * expected 4-word chunks), so boundaries are CONTENT-defined and
    * survive insertions/deletions that shift absolute positions — the
    * failure mode of fixed-width chunking. Docs sharing ≥2 distinct
    * chunk hashes are partial-duplicate candidates. The chunker is one
    * explode + one per-doc running sum + one per-chunk hash agg (all
    * linear); the share join is df-capped (hot boilerplate chunks
    * dropped) so pair cost is O(chunks·maxDf²), never n².
    */
  private val CdcMaxDf = 8L
  private val CdcMinShared = 2L

  def cdcChunkDedup(spark: SparkSession, sfDir: String): DataFrame =
    cdcChunkDedupOn(Tables.documents(spark, sfDir))
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))

  /** The d17 chunk-and-share plan over any (doc_id, text) frame — split
    * out so specs can drive it on hand-built corpora (shift-robustness).
    */
  def cdcChunkDedupOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
      .toDF("doc_id", "pos", "word")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val seg = toks
      .withColumn(
        "bnd",
        when(substring(md5(concat(lit("cdc|"), col("word"))), 1, 1) < "4", 1L).otherwise(0L))
      .withColumn("seg", sum(col("bnd")).over(wDoc))
    val chunks = seg
      .groupBy(col("doc_id"), col("seg"))
      .agg(
        expr("md5(array_join(transform(array_sort(collect_list(struct(pos, word))), s -> s.word), ' '))")
          .as("chunk_hash"))
      .select("doc_id", "chunk_hash")
      .distinct()
    val capped = chunks
      .withColumn(
        "__df",
        count(lit(1)).over(Window.partitionBy(col("chunk_hash"))))
      .filter(col("__df") <= CdcMaxDf)
      .drop("__df")
    capped
      .as("a")
      .join(
        capped.as("b"),
        col("a.chunk_hash") === col("b.chunk_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= CdcMinShared)
  }

  /** t20: BM25-shape ranked retrieval for a fixed query — per-term
    * saturation tf·(k1+1)/(tf+K), K = k1·(1−b+b·dl/avgdl) with k1=1.2,
    * b=0.75, and t10's integer surrogate idf (N−df). EVERY intermediate
    * is exact integer arithmetic (ratios pre-scaled ×1000, floor
    * division — Spark `div` ≡ DuckDB `//` on non-negatives), so the
    * per-doc score is an integer sum — order-independent, bit-exact —
    * where float BM25 would make the gate partitioning-dependent. One
    * explode filtered to the query terms (postings-sized, not
    * corpus-sized), df as a window count over the tf frame (t10's
    * one-explode discipline), corpus totals via one broadcast row, then
    * a global top-k.
    */
  private val Bm25QueryTerms = Seq("join", "scan", "window")
  private[queries] val Bm25TopK = 10

  /** t20's oracle lifecycle (DuckDB dialect) through the ranked relation
    * `bm25 (rnk, doc_id, score, n_hit_terms)` — shared by the t20 gate
    * and v23's hybrid fusion, which reuses the text ranking verbatim.
    */
  private[queries] lazy val bm25Ctes: String = {
    val termList = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""d AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |         unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |c AS (SELECT count(*) AS n FROM documents),
       |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_total
       |        FROM documents),
       |tf AS (
       |  SELECT doc_id, dl, token, count(*) AS tf
       |  FROM d WHERE token IN ($termList)
       |  GROUP BY 1, 2, 3),
       |s AS (
       |  SELECT doc_id, token, tf,
       |    count(*) OVER (PARTITION BY token) AS df,
       |    (dl * n * 1000) // t_total AS ratio_x1000,
       |    n
       |  FROM tf CROSS JOIN c CROSS JOIN tot),
       |s2 AS (
       |  SELECT doc_id, tf, df, n,
       |    (1200 * (250 + (750 * ratio_x1000) // 1000)) // 1000 AS k_x1000
       |  FROM s),
       |s3 AS (
       |  SELECT doc_id,
       |    (n - df) * ((tf * 2200 * 1000) // (tf * 1000 + k_x1000)) AS score_t
       |  FROM s2),
       |agg AS (
       |  SELECT doc_id, CAST(sum(score_t) AS BIGINT) AS score,
       |         count(*) AS n_hit_terms
       |  FROM s3 GROUP BY 1),
       |bm25 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
       |         doc_id, score, n_hit_terms
       |  FROM agg
       |  QUALIFY rnk <= $Bm25TopK)""".stripMargin
  }

  def bm25Rank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count() // parquet-metadata count, the t8/s6 pattern
    val totals = broadcast(
      docs.agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long")).as("t_total")))
    val tf = docs
      .select(
        col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(col("token").isInCollection(Bm25QueryTerms))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val wTok = Window.partitionBy(col("token"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(wTok))
      .crossJoin(totals)
      .withColumn("ratio_x1000", expr(s"(dl * ${n}L * 1000L) div t_total"))
      .withColumn(
        "k_x1000",
        expr("(1200L * (250L + (750L * ratio_x1000) div 1000L)) div 1000L"))
      .withColumn("sat_x1000", expr("(tf * 2200L * 1000L) div (tf * 1000L + k_x1000)"))
      .withColumn("score_t", (lit(n) - col("df")) * col("sat_x1000"))
    // global sort under limit → TakeOrderedAndProject (distributed
    // top-k, the t7 pattern); the rank is minted on the 10 surviving rows
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    scored
      .groupBy(col("doc_id"))
      .agg(sum(col("score_t")).as("score"), count(lit(1)).as("n_hit_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
      .repartition(1)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("score"), col("n_hit_terms"))
      .transform(orderedOutput(_, col("rnk")))
  }

  /** t21: per-doc novelty score — the fraction of a doc's shingles whose
    * FIRST corpus occurrence (minimum doc_id) is this doc: the
    * memorization/novelty signal dedup pipelines rank training docs by
    * (a doc of all-first-seen shingles is fresh content; all-seen-before
    * is a rehash). One shingle-keyed min-agg over the shared persisted
    * shingle frame + a co-keyed join back; the ratio is the single final
    * division.
    */
  def noveltyScore(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = materializedShingles(Tables.documents(spark, sfDir))
    val firstSeen = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, "shingle")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", col("n_novel") / col("n_shingles"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** d15: minhash Jaccard ESTIMATION — the banded candidates' similarity
    * estimated purely from signature component agreement (n_agree/k, the
    * Broder estimator) next to the exact shingle-join Jaccard, gated
    * together so the estimator's bias is pinned, not assumed. At 100 TB
    * this is the operator that answers "how similar" from k·5 bytes per
    * doc without touching shingle sets: signatures join co-keyed on the
    * candidate pair, exact verification stays candidates-only.
    */
  def minhashEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = materializedShingles(Tables.documents(spark, sfDir))
    val sig = Dedup.minhashSignatures(sh, MinhashK)
    val cands = Dedup
      .minhashBandCandidatesFromShingles(sh, MinhashK)
      .select(col("doc_a"), col("doc_b"))
    val sigA = sig.toDF("doc_a" +: (0 until MinhashK).map(i => s"a$i"): _*)
    val sigB = sig.toDF("doc_b" +: (0 until MinhashK).map(i => s"b$i"): _*)
    val agree = (0 until MinhashK)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cands
      .join(sigA, "doc_a")
      .join(sigB, "doc_b")
      .withColumn("n_agree", agree)
      .join(Dedup.jaccardForCandidates(cands, sh).select(col("doc_a"), col("doc_b"), col("jaccard")), Seq("doc_a", "doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("n_agree"),
        (col("n_agree") / lit(MinhashK)).as("est_jaccard"),
        col("jaccard"))
      .transform(orderedOutput(_, col("doc_a"), col("doc_b")))
  }

  /** t22: dedup survivorship — after d10's cluster formation, pick WHICH
    * copy to keep: the longest doc (n_chars, ties to the lowest doc_id)
    * per near-dup cluster, every member mapped to its keeper. This is
    * the step that turns cluster labels into a drop list; keep-longest
    * is the usual corpus policy (the longest variant subsumes its
    * truncations). One window rank over the |docs|-row label frame — the
    * expensive work is d10's, shared through the persisted pair frame.
    */
  def canonicalDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val pairs = thresholdedPairs(docs)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = graft.operators.Components
      .connectedComponentsAuto(docs.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    val w = Window.partitionBy(col("cluster")).orderBy(col("n_chars").desc, col("doc_id"))
    labels
      .withColumn("keep_doc", first(col("doc_id")).over(w))
      .select(
        col("doc_id"),
        col("cluster"),
        col("keep_doc"),
        when(col("doc_id") === col("keep_doc"), 1L).otherwise(0L).as("is_kept"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  /** t24: RAKE keyword extraction (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents") — candidate phrases are the
    * maximal stopword-free token runs; each word scores degree/freq
    * (degree = Σ length of phrases containing it, freq = occurrences)
    * and a phrase scores the sum of its words' scores. Kept exact as
    * scaled integers: wscore = (1000·degree) div freq floors identically
    * in both engines, and phrase scores sum order-independently. Plan
    * shape: ONE posexplode of the corpus feeds phrase segmentation (a
    * doc-keyed window running-sum — one exchange + one sort), the word
    * table (token-keyed hash agg), and the phrase re-score join; nothing
    * is ever corpus × corpus. Top-[[RakeTopK]] distinct phrases under a
    * total (score, phrase) order.
    */
  private val RakeTopK = 20

  def rakeKeywords(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = graft.operators.TextAnalysis.qualityStopwords
    val toks = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = toks
      .withColumn("is_stop", col("tok").isin(stop: _*))
      .withColumn("grp", sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
    val phraseToks = marked.filter(!col("is_stop")).select("doc_id", "grp", "pos", "tok")
    val phrases = phraseToks
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            _.getField("tok")),
          " ").as("phrase"),
        count(lit(1)).as("phrase_len"))
    val wordScores = phraseToks
      .join(phrases.select(col("doc_id"), col("grp"), col("phrase_len")), Seq("doc_id", "grp"))
      .groupBy(col("tok"))
      .agg(sum(col("phrase_len")).as("degree"), count(lit(1)).as("freq"))
      .withColumn("wscore", expr("(1000L * degree) div freq"))
    val phraseScores = phraseToks
      .join(wordScores.select(col("tok"), col("wscore")), "tok")
      .groupBy(col("doc_id"), col("grp"))
      .agg(sum(col("wscore")).as("score_x1000"))
    phrases
      .join(phraseScores, Seq("doc_id", "grp"))
      .groupBy(col("phrase"))
      .agg(
        count(lit(1)).as("n_occur"),
        max(col("phrase_len")).as("phrase_len"),
        max(col("score_x1000")).as("score_x1000"))
      .orderBy(col("score_x1000").desc, col("phrase"))
      .limit(RakeTopK)
      .transform(orderedOutput(_, col("score_x1000").desc, col("phrase")))
  }

  /** t25: vocabulary growth curve (Heaps' law profile) — distinct token
    * types vs cumulative token occurrences across [[VocabBuckets]]
    * corpus deciles, the curve that sizes tokenizer vocabularies and
    * detects corpus drift (a flattening curve means the crawl stopped
    * finding new language). "New types per decile" is a min-bucket
    * aggregation per token — two hash aggs over ONE corpus explode, no
    * per-decile rescans; the cumulative layer is a window over the
    * 10-row rollup. Exact integers throughout.
    */
  private val VocabBuckets = 10L

  def vocabGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val maxDoc = docs.agg(max(col("doc_id")).as("max_id"))
    val tb = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .crossJoin(broadcast(maxDoc))
      .withColumn(
        "bucket",
        least(lit(VocabBuckets - 1L), expr(s"(doc_id * $VocabBuckets) div (max_id + 1)")))
    val occ = tb.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val firstSeen = tb
      .groupBy(col("tok"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    occ
      .join(firstSeen, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_types", sum(col("new_types")).over(w))
      .select("bucket", "n_tokens", "new_types", "cum_tokens", "cum_types")
      .transform(orderedOutput(_, col("bucket")))
  }

  /** t26: BPE tokenizer TRAINER — the one first-class LLM-pipeline
    * operator the r7/r8 audits listed as absent: learn the first
    * [[BpeMergeRounds]] byte-pair merges from the corpus (Sennrich et
    * al. 2016, the algorithm behind GPT-2/SentencePiece vocabularies).
    * The production shape: ONE distributed pass rolls the corpus up to
    * the word-frequency dict (the only data-sized stage — a hash agg
    * over exploded tokens), and the merge loop then runs on that
    * vocabulary-sized frame, exactly how real trainers scale to 100 TB
    * (HF/SentencePiece train on word counts, never raw text).
    *
    * Per round: adjacent-symbol pairs weighted by word count → argmax
    * (count desc, then lexicographic — fully deterministic) → GREEDY
    * left-to-right non-overlapping merge application. Words are encoded
    * as `|s1||s2||...|`, so one literal `replace(enc, '|a||b|',
    * '|ab|')` IS the greedy merge: each match consumes the shared
    * delimiter, both engines' replace scans left-to-right without
    * re-matching inside a replacement (the `a a a a → (aa)(aa)` and
    * `a a a → (aa)a` cases), and no float or UDF appears anywhere —
    * the whole trainer is codegen'd Column algebra, argmax staying
    * in-plan via a broadcast 1-row cross join. Output: the learned
    * merge table (rank, pair, weighted count).
    */
  /** Merge-round count == DRIVER ROUND-TRIPS: each round launches one
    * distributed pair-count job whose 1-row argmax is collected (see
    * [[bpeTrained]]'s doc). 8 rounds ≈ 8 × ~100 ms of driver latency —
    * negligible. A REAL vocabulary build is 10k–50k merges, where this
    * loop becomes rounds-dominated regardless of cluster size; the scale
    * path there is batching compatible (non-overlapping-symbol) merges
    * per round, not raising this constant. BpeSpec pins the bound so a
    * casual bump cannot silently turn the trainer into a driver loop
    * over thousands of jobs.
    */
  private[graft] val BpeMergeRounds = 8

  /** The shared trainer chain: word-frequency dict (ONE corpus pass,
    * word kept alongside its encoding), [[BpeMergeRounds]] merge rounds,
    * returning (final dict, learned merge rows). Both t26 (the merge
    * table) and t27 (corpus tokenization through the learned vocab)
    * consume it.
    *
    * The per-round argmax is a DRIVER-collected single row (the Lloyd-
    * iteration pattern the IVF plane uses): the pair-count aggregation
    * is distributed, its 1-row top result comes back to the driver, and
    * the chosen pair is inlined as merge LITERALS into the next round's
    * plan. The earlier fully-in-plan form (argmax as a broadcast 1-row
    * cross join) made round k's plan contain round k−1 TWICE (once
    * under pairCounts, once under the join), i.e. 2^rounds copies of
    * the dict scan — 33 s of planner/codegen work at the gate corpus
    * for what is an 8×31-row computation. Driver iteration keeps every
    * round's plan LINEAR in k.
    */
  private def bpeTrained(
      spark: SparkSession,
      sfDir: String): (DataFrame, Seq[(Long, String, String, Long)]) = {
    val dict0 = Tables
      .documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("word"),
        concat(lit("|"), array_join(split(col("word"), ""), "||"), lit("|")).as("enc"),
        col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairCounts(d: DataFrame): DataFrame = d
      .select(col("cnt"), split(expr("substring(enc, 2, length(enc) - 2)"), "\\|\\|").as("s"))
      .select(
        col("cnt"),
        explode(zip_with(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
    var d = dict0
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var k = 1
    var dry = false
    while (k <= BpeMergeRounds && !dry) {
      val top = pairCounts(d).orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) dry = true // no adjacent pairs left anywhere
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += ((k.toLong, l, r, top(0).getLong(2)))
        d = d.withColumn(
          "enc",
          org.apache.spark.sql.functions
            .replace(col("enc"), lit("|" + l + "||" + r + "|"), lit("|" + l + r + "|")))
        k += 1
      }
    }
    (d, merges.result())
  }

  def bpeTrainer(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bpeTrained(spark, sfDir)._2
      .toDF("merge_rank", "sym_l", "sym_r", "pair_count")
      .transform(orderedOutput(_, col("merge_rank")))
  }

  /** t27: BPE tokenizer APPLICATION at corpus scale — tokenize every
    * document through the t26-learned vocabulary and report the numbers
    * a tokenizer rollout actually monitors: per-doc word/BPE-token/char
    * counts and the chars-per-token compression ratio (integer ×1000).
    * The scale shape mirrors production: the trained word→token-count
    * map is VOCABULARY-sized and broadcasts; the corpus pass is one
    * explode + broadcast join + hash agg — no shuffle of the corpus
    * beyond the per-doc rollup, and re-tokenization never touches the
    * merge loop.
    */
  def bpeTokenize(spark: SparkSession, sfDir: String): DataFrame = {
    val dict = bpeTrained(spark, sfDir)._1
    val wordTokens = dict.select(
      col("word"),
      size(split(expr("substring(enc, 2, length(enc) - 2)"), "\\|\\|")).cast("long").as("n_tok"))
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(wordTokens), "word")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_bpe_tokens"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      // div == DuckDB `//` here because chars/tokens are positive counts
      // (truncate-vs-floor diverges only on negative operands)
      .withColumn("compression_x1000", expr("(n_chars * 1000) div n_bpe_tokens"))
      .transform(orderedOutput(_, col("doc_id")))
  }

  // ---- ScaleBench work-size probes -----------------------------------------

  /** Pre-threshold candidate frames for the scale harness's work-size
    * counters: a runtime ratio alone cannot separate "the operator
    * scales" from "the workload changed shape" (the round-8 run measured
    * d13 at 0.30× for 10× data — the df cap prunes harder on a denser
    * corpus, which looks like a speedup until the candidate count is
    * next to it). Each probe REBUILDS the gate's candidate stage from
    * the same in-file constants — no persists, no index writes — so a
    * probe run never mutates what the timed gate reads; the harness
    * counts its rows at both scales and publishes them beside the
    * timing ratio.
    */
  private def probeShingles(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.shingleSet(Tables.documents(spark, sfDir), "doc_id", "text", ShingleN)

  /** Distinct doc pairs sharing ≥1 shingle — the verify-stage input of
    * the shared-shingle family (t19/t19c/d2c/d13 modulo each gate's df
    * cap, applied by the caller).
    */
  private def sharedShinglePairs(sh: DataFrame): DataFrame =
    sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))

  /** d16's blocked sorted-neighborhood candidates before the length-gap
    * cut — the pair count entering (or skipping) the banded DP.
    */
  private def d16Candidates(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("block")).orderBy(col("text"), col("doc_id"))
    Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("text"),
        element_at(TextAnalysis.tokens(col("text")), 1).as("block"))
      .withColumn("nbrs", array((1 to SnmWindow).map(i => lead(col("doc_id"), i).over(win)): _*))
      .select(col("doc_id"), explode(col("nbrs")).as("nbr"))
      .filter(col("nbr").isNotNull)
  }

  /** d18/d18w's candidate pairs (increment bands probed against the
    * band-capped corpus postings) without materializing the on-disk
    * index the timed gate maintains.
    */
  private def incrCandidates(
      spark: SparkSession,
      sfDir: String,
      bander: (DataFrame, Int) => DataFrame): DataFrame = {
    val sh = probeShingles(spark, sfDir)
    val corpus = bander(sh.filter(pmod(col("doc_id"), lit(NearIncrMod)) =!= 0), MinhashK)
      .select(
        col("doc_id").as("corpus_id"),
        bandKey(col("band_idx"), col("band_hash")).as("band_key"))
    val keep = corpus
      .groupBy(col("band_key"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") <= BandCap)
      .select("band_key")
    val incr = bander(sh.filter(pmod(col("doc_id"), lit(NearIncrMod)) === 0), MinhashK)
      .select(
        col("doc_id").as("orig_id"),
        bandKey(col("band_idx"), col("band_hash")).as("band_key"))
    incr
      .join(corpus.join(keep, "band_key"), "band_key")
      .groupBy(col("orig_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  val scaleProbes: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t19_containment_dedup" -> ((s, d) => sharedShinglePairs(probeShingles(s, d))),
    "t19c_containment_capped" ->
      ((s, d) => sharedShinglePairs(Dedup.dropHotShingles(probeShingles(s, d), JaccardMaxDf))),
    "d2c_jaccard_capped" ->
      ((s, d) => sharedShinglePairs(Dedup.dropHotShingles(probeShingles(s, d), JaccardMaxDf))),
    // d13's pair SPACE is the same distinct (doc, shingle) frame under
    // its own (looser) df cap — the tf weights change scores, not pairs
    "d13_tfidf_neardup" ->
      ((s, d) => sharedShinglePairs(Dedup.dropHotShingles(probeShingles(s, d), TfidfMaxDf))),
    "d3_minhash_lsh" ->
      ((s, d) => Dedup.minhashBandCandidatesFromShingles(probeShingles(s, d), MinhashK)),
    "t19b_containment_banded" ->
      ((s, d) => Dedup.minhashBandCandidatesFromShingles(probeShingles(s, d), MinhashK)),
    "d16_edit_distance" -> (d16Candidates(_, _)),
    "d18_incremental_neardup" -> ((s, d) => incrCandidates(s, d, Dedup.minhashBands)),
    "d18w_wide_recall" -> ((s, d) => incrCandidates(s, d, Dedup.minhashBands1)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t24_rake_keywords" -> (rakeKeywords(_, _)),
    "t25_vocab_growth" -> (vocabGrowth(_, _)),
    "k6_heavy_hitters" -> (heavyHitters(_, _)),
    "t22_canonical_docs" -> (canonicalDocs(_, _)),
    "t21_novelty_score" -> (noveltyScore(_, _)),
    "d15_minhash_estimate" -> (minhashEstimate(_, _)),
    "t18_phrase_search" -> (phraseSearch(_, _)),
    "t19_containment_dedup" -> (containmentDedup(_, _)),
    "t19c_containment_capped" -> (containmentDedupCapped(_, _)),
    "t19b_containment_banded" -> (containmentDedupBanded(_, _)),
    "t19r_containment_recall" -> (containmentBandedRecall(_, _)),
    "t26_bpe_trainer" -> (bpeTrainer(_, _)),
    "t27_bpe_tokenize" -> (bpeTokenize(_, _)),
    "t20_bm25_rank" -> (bm25Rank(_, _)),
    "d1_exact_dedup" -> (exactDedup(_, _)),
    "d2_jaccard_neardup" -> (jaccardNearDup(_, _)),
    "d2c_jaccard_capped" -> (jaccardNearDupCapped(_, _)),
    "d3_minhash_lsh" -> (minhashLsh(_, _)),
    "d19_lsh_autotune" -> (lshAutotune(_, _)),
    "d4_simhash" -> (simhash(_, _)),
    "d10_dedup_clusters" -> (dedupClusters(_, _)),
    "s14_cluster_split" -> (clusterSplit(_, _)),
    "d11_substring_dedup" -> (substringDedup(_, _)),
    "d12_incremental_dedup" -> (incrementalDedup(_, _)),
    "d18_incremental_neardup" -> (incrementalNearDup(_, _)),
    "d18w_wide_recall" -> (incrementalNearDupWide(_, _)),
    "f14_feature_hashing" -> (featureHashing(_, _)),
    "t10_term_importance" -> (termImportance(_, _)),
    "t11_doc_chunks" -> (docChunks(_, _)),
    "t9_repetition" -> (repetitionStats(_, _)),
    "t1_token_stats" -> (tokenStats(_, _)),
    "t5_bpe_tokens" -> (bpeTokenStats(_, _)),
    "t2_quality_score" -> (qualityScore(_, _)),
    "t6_decontaminate" -> (decontaminate(_, _)),
    "t7_vocab_topk" -> (vocabTopK(_, _)),
    "t8_sequence_packing" -> (sequencePacking(_, _)),
    "s6_epoch_shuffle" -> (epochShuffle(_, _)),
    "s7_weighted_sample" -> (weightedSample(_, _)),
    "s13_domain_mix" -> (domainMix(_, _)),
    "s15_temperature_mix" -> (temperatureMix(_, _)),
    "t28_pii_redaction" -> (piiRedaction(_, _)),
    "t31_html_extract" -> (htmlExtract(_, _)),
    "t32_text_normalize" -> (textNormalize(_, _)),
    "t29_length_batching" -> (lengthBatching(_, _)),
    "t30_line_dedup" -> (lineDedup(_, _)),
    "t3_lang_id" -> (langId(_, _)),
    "e1_corpus_pipeline" -> (corpusPipeline(_, _)),
    "t12_simpson_repetition" -> (simpsonRepetition(_, _)),
    "t13_bigram_topk" -> (bigramTopK(_, _)),
    "d13_tfidf_neardup" -> (tfidfNearDup(_, _)),
    "k3_bloom_membership" -> (bloomMembership(_, _)),
    "t14_fuzzy_vocab" -> (fuzzyVocabPairs(_, _)),
    "d14_sorted_neighborhood" -> (sortedNeighborhood(_, _)),
    "d16_edit_distance" -> (editDistanceLinkage(_, _)),
    "d17_cdc_chunks" -> (cdcChunkDedup(_, _)),
    "t15_cooccurrence" -> (cooccurrenceTopK(_, _)),
    "t16_inverted_index" -> (invertedIndex(_, _)),
    "t17_trigram_lm" -> (trigramLm(_, _)),
    "t23_lm_familiarity" -> (lmFamiliarity(_, _)),
    "t4_fingerprint" -> (docFingerprint(_, _)))

  // ---- DuckDB oracle SQL ---------------------------------------------------

  /** 3-gram shingle list over the split words `w` (DuckDB dialect). */
  private val shingles3 =
    "CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' ')) ELSE [] END"

  private val shinglePairs =
    s"""sh AS (
       |  SELECT doc_id, unnest(list_distinct($shingles3)) AS shingle
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT doc_a, doc_b, n_common, sa.sz + sb.sz - n_common AS n_union,
       |         n_common / (sa.sz + sb.sz - n_common) AS jaccard
       |  FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id)""".stripMargin

  /** CTE chain for t19b/t19r: shingle sets → k-component signatures →
    * width-2 bands → candidate pairs → exact containment on candidates
    * (thresholded), mirroring the Spark plan formula-for-formula.
    */
  private def bandedContSql: String = {
    val sigCols = (0 until MinhashK)
      .map(i =>
        s"list_min(list_transform(sh_set, s -> substr(md5('0|' || s), ${i * 5 + 1}, 5))) AS m$i")
      .mkString(",\n    ")
    val bandSelects = (0 until MinhashK / 2)
      .map(b =>
        s"SELECT doc_id, $b AS band_idx, md5(m${2 * b} || '|' || m${2 * b + 1}) AS band_hash FROM sig")
      .mkString("\n  UNION ALL ")
    s"""t AS (SELECT doc_id, list_distinct($shingles3) AS sh_set
       |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM t),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a
       |  JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |              AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |bc AS (
       |  SELECT cd.doc_a, cd.doc_b,
       |    CAST(len(list_intersect(a.sh_set, b.sh_set)) AS BIGINT) AS n_common,
       |    CAST(len(a.sh_set) AS BIGINT) AS sz_a,
       |    CAST(len(b.sh_set) AS BIGINT) AS sz_b
       |  FROM cand cd JOIN t a ON a.doc_id = cd.doc_a JOIN t b ON b.doc_id = cd.doc_b
       |  WHERE greatest(len(list_intersect(a.sh_set, b.sh_set)) / len(a.sh_set),
       |                 len(list_intersect(a.sh_set, b.sh_set)) / len(b.sh_set))
       |          >= $ContainmentThreshold)""".stripMargin
  }

  private val simhashV16 = {
    val nib = (i: Int) => s"(instr('0123456789abcdef', substring(md5(tok), ${i + 1}, 1)) - 1)"
    s"(((${nib(0)} * 16 + ${nib(1)}) * 16 + ${nib(2)}) * 16 + ${nib(3)})"
  }

  val oracle: Map[String, String] = Map(
    "t25_vocab_growth" ->
      s"""WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tb AS (SELECT least(${VocabBuckets - 1L}, (doc_id * $VocabBuckets) // (max_id + 1)) AS bucket, tok
         |       FROM toks CROSS JOIN mx),
         |occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens FROM tb GROUP BY 1),
         |fs AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_types FROM (
         |         SELECT tok, min(bucket) AS bucket FROM tb GROUP BY 1) GROUP BY 1)
         |SELECT o.bucket, o.n_tokens,
         |  CAST(coalesce(f.new_types, 0) AS BIGINT) AS new_types,
         |  CAST(sum(o.n_tokens) OVER (ORDER BY o.bucket) AS BIGINT) AS cum_tokens,
         |  CAST(sum(coalesce(f.new_types, 0)) OVER (ORDER BY o.bucket) AS BIGINT) AS cum_types
         |FROM occ o LEFT JOIN fs f USING (bucket)
         |ORDER BY o.bucket""".stripMargin,
    "t24_rake_keywords" -> {
      val stopList = graft.operators.TextAnalysis.qualityStopwords
        .map(s => s"'$s'")
        .mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, pos, w[pos] AS tok FROM (
         |    SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos
         |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
         |m AS (SELECT doc_id, pos, tok,
         |    CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END AS is_stop FROM toks),
         |g AS (SELECT *, sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m),
         |pt AS (SELECT doc_id, grp, pos, tok FROM g WHERE is_stop = 0),
         |ph AS (SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         |         CAST(count(*) AS BIGINT) AS phrase_len
         |       FROM pt GROUP BY 1, 2),
         |ws AS (SELECT tok,
         |         (1000 * CAST(sum(ph.phrase_len) AS BIGINT)) // CAST(count(*) AS BIGINT) AS wscore
         |       FROM pt JOIN ph USING (doc_id, grp) GROUP BY 1),
         |ps AS (SELECT doc_id, grp, CAST(sum(ws.wscore) AS BIGINT) AS score_x1000
         |       FROM pt JOIN ws USING (tok) GROUP BY 1, 2)
         |SELECT ph.phrase, CAST(count(*) AS BIGINT) AS n_occur,
         |  max(ph.phrase_len) AS phrase_len, max(ps.score_x1000) AS score_x1000
         |FROM ph JOIN ps USING (doc_id, grp)
         |GROUP BY 1
         |QUALIFY row_number() OVER (ORDER BY max(ps.score_x1000) DESC, phrase) <= $RakeTopK
         |ORDER BY score_x1000 DESC, phrase""".stripMargin
    },
    "k6_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |n AS (SELECT count(*) AS n_total FROM tok)
         |SELECT token, count(*) AS cnt, n_total
         |FROM tok CROSS JOIN n
         |GROUP BY token, n_total
         |HAVING count(*) * $HhCapacity > n_total
         |ORDER BY token""".stripMargin,
    "d14_sorted_neighborhood" ->
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
         |s AS (SELECT doc_id, text, w[1] AS block,
         |        list_distinct($shingles3) AS sh
         |      FROM d),
         |n AS (SELECT doc_id, sh,
         |        lead(doc_id, 1) OVER win AS id1, lead(sh, 1) OVER win AS sh1,
         |        lead(doc_id, 2) OVER win AS id2, lead(sh, 2) OVER win AS sh2,
         |        lead(doc_id, 3) OVER win AS id3, lead(sh, 3) OVER win AS sh3
         |      FROM s WINDOW win AS (PARTITION BY block ORDER BY text, doc_id)),
         |p AS (
         |  SELECT doc_id, sh, id1 AS nbr, sh1 AS nsh FROM n WHERE id1 IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, sh, id2, sh2 FROM n WHERE id2 IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, sh, id3, sh3 FROM n WHERE id3 IS NOT NULL),
         |j AS (
         |  SELECT least(doc_id, nbr) AS doc_a, greatest(doc_id, nbr) AS doc_b,
         |    CAST(len(list_intersect(sh, nsh)) AS BIGINT) AS n_common,
         |    CAST(len(sh) + len(nsh) - len(list_intersect(sh, nsh)) AS BIGINT) AS n_union
         |  FROM p)
         |SELECT doc_a, doc_b, n_common, n_union, n_common / n_union AS jaccard
         |FROM j WHERE n_union > 0 AND n_common * 2 >= n_union
         |ORDER BY doc_a, doc_b""".stripMargin,
    // content-defined chunking: md5-low-quarter word boundaries, running
    // segment sum, per-chunk hash, df-capped share join
    "d17_cdc_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(w)), i -> {'pos': i, 'word': w[i]})) AS t
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |s AS (
         |  SELECT doc_id, t.pos AS pos, t.word AS word,
         |    CASE WHEN substr(md5('cdc|' || t.word), 1, 1) < '4' THEN 1 ELSE 0 END AS bnd
         |  FROM toks),
         |seg AS (
         |  SELECT doc_id, pos, word,
         |    sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos) AS seg
         |  FROM s),
         |ch AS (
         |  SELECT doc_id, seg, md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
         |  FROM seg GROUP BY 1, 2),
         |dch AS (SELECT DISTINCT doc_id, chunk_hash FROM ch),
         |capped AS (
         |  SELECT * FROM dch
         |  QUALIFY count(*) OVER (PARTITION BY chunk_hash) <= $CdcMaxDf)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM capped a JOIN capped b ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $CdcMinShared
         |ORDER BY doc_a, doc_b""".stripMargin,
    // d14's blocking, Levenshtein verification (integer-exact both engines)
    "d16_edit_distance" ->
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
         |s AS (SELECT doc_id, text, w[1] AS block FROM d),
         |n AS (SELECT doc_id, text,
         |        lead(doc_id, 1) OVER win AS id1, lead(text, 1) OVER win AS tx1,
         |        lead(doc_id, 2) OVER win AS id2, lead(text, 2) OVER win AS tx2,
         |        lead(doc_id, 3) OVER win AS id3, lead(text, 3) OVER win AS tx3
         |      FROM s WINDOW win AS (PARTITION BY block ORDER BY text, doc_id)),
         |p AS (
         |  SELECT doc_id, text, id1 AS nbr, tx1 AS ntext FROM n WHERE id1 IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, text, id2, tx2 FROM n WHERE id2 IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, text, id3, tx3 FROM n WHERE id3 IS NOT NULL),
         |j AS (
         |  SELECT least(doc_id, nbr) AS doc_a, greatest(doc_id, nbr) AS doc_b,
         |    CAST(levenshtein(text, ntext) AS BIGINT) AS lev,
         |    CAST(greatest(length(text), length(ntext)) AS BIGINT) AS max_len
         |  FROM p)
         |SELECT doc_a, doc_b, lev, max_len
         |FROM j WHERE lev * 5 <= max_len
         |ORDER BY doc_a, doc_b""".stripMargin,
    "t15_cooccurrence" ->
      s"""WITH dt AS (SELECT DISTINCT doc_id, token FROM
         |  (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)),
         |pc AS (
         |  SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS n_ab
         |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
         |  GROUP BY 1, 2),
         |m AS (SELECT token, count(*) AS df FROM dt GROUP BY 1),
         |nd AS (SELECT count(*) AS n FROM documents)
         |SELECT tok_a, tok_b, n_ab, ma.df AS n_a, mb.df AS n_b,
         |  n_ab * nd.n AS lift_num, ma.df * mb.df AS lift_den
         |FROM pc JOIN m ma ON tok_a = ma.token JOIN m mb ON tok_b = mb.token
         |CROSS JOIN nd
         |ORDER BY n_ab DESC, tok_a, tok_b LIMIT $CoocTopK""".stripMargin,
    "t16_inverted_index" ->
      s"""WITH dt AS (SELECT DISTINCT doc_id, token FROM
         |  (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents))
         |SELECT token, count(*) AS df,
         |  CAST(least(count(*), $PostingsCap) AS BIGINT) AS n_listed,
         |  array_to_string(list_sort(list(doc_id))[1:$PostingsCap], ',') AS postings
         |FROM dt GROUP BY token ORDER BY token""".stripMargin,
    "t17_trigram_lm" ->
      s"""WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
         |tl AS (SELECT unnest(CASE WHEN len(w) >= 3
         |         THEN list_transform(generate_series(1, len(w) - 2),
         |                             i -> array_to_string(w[i:i+2], ' '))
         |         ELSE [] END) AS tri FROM d),
         |tr AS (SELECT string_split(tri, ' ') AS p FROM tl),
         |c AS (SELECT array_to_string(p[1:2], ' ') AS prefix, p[3] AS nxt, count(*) AS n
         |      FROM tr GROUP BY 1, 2),
         |r AS (SELECT *,
         |        CAST(row_number() OVER (PARTITION BY prefix ORDER BY n DESC, nxt) AS BIGINT)
         |          AS rank,
         |        CAST(sum(n) OVER (PARTITION BY prefix) AS BIGINT) AS prefix_total,
         |        count(*) OVER (PARTITION BY prefix) AS n_continuations
         |      FROM c)
         |SELECT prefix, rank, nxt, n, prefix_total, n_continuations
         |FROM r WHERE rank <= $LmTopK ORDER BY prefix, rank""".stripMargin,
    "t23_lm_familiarity" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tl AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(w) - 2),
        |                               i -> array_to_string(w[i:i+2], ' '))) AS tri
        |       FROM d WHERE len(w) >= 3),
        |m AS (SELECT tri, count(*) AS n FROM tl GROUP BY 1)
        |SELECT tl.doc_id,
        |  count(*) AS n_trigrams,
        |  CAST(sum(m.n) AS BIGINT) AS familiarity,
        |  CAST(min(m.n) AS BIGINT) AS min_tri_count,
        |  CAST(CASE WHEN sum(m.n) < 2 * count(*) THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_unfamiliar
        |FROM tl JOIN m USING (tri)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "f14_feature_hashing" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |b AS (SELECT token,
         |        CAST(('0x' || substr(md5('fh|' || token), 1, 8)) AS BIGINT) % $HashDim AS bucket
         |      FROM toks)
         |SELECT bucket, count(*) AS n_occurrences,
         |  count(DISTINCT token) AS n_distinct_tokens,
         |  min(token) AS example_token
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "t12_simpson_repetition" ->
      s"""WITH tf AS (
         |  SELECT doc_id, token, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         |  GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  count(*) AS n_distinct,
         |  CAST(sum(tf * (tf - 1)) AS BIGINT) AS rep_num,
         |  CAST(sum(tf) * (sum(tf) - 1) AS BIGINT) AS rep_den,
         |  CAST(CASE WHEN sum(tf * (tf - 1)) * ${VocabSize} > sum(tf) * (sum(tf) - 1) * 2
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_repetitive
         |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t14_fuzzy_vocab" ->
      s"""WITH v AS (
         |  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents)
         |SELECT a.token AS tok_a, b.token AS tok_b,
         |  CAST(levenshtein(a.token, b.token) AS BIGINT) AS dist
         |FROM v a JOIN v b ON a.token < b.token
         |WHERE levenshtein(a.token, b.token) <= $FuzzyMaxDist
         |ORDER BY tok_a, tok_b""".stripMargin,
    "k3_bloom_membership" ->
      s"""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
         |c AS (SELECT h FROM h WHERE doc_id % $IncrMod != 0),
         |js AS (SELECT unnest(generate_series(0, ${BloomK - 1})) AS j),
         |bits AS (
         |  SELECT DISTINCT j,
         |    CAST(('0x' || substr(md5('bloom' || CAST(j AS VARCHAR) || '|' || h), 1, 8)) AS BIGINT)
         |      % $BloomM AS bucket
         |  FROM c CROSS JOIN js),
         |pr AS (
         |  SELECT doc_id, j,
         |    CAST(('0x' || substr(md5('bloom' || CAST(j AS VARCHAR) || '|' || h), 1, 8)) AS BIGINT)
         |      % $BloomM AS bucket
         |  FROM h CROSS JOIN js),
         |inf AS (
         |  SELECT doc_id,
         |    CAST(min(CASE WHEN b.bucket IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS in_filter
         |  FROM pr LEFT JOIN bits b USING (j, bucket) GROUP BY doc_id),
         |ic AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN h IN (SELECT h FROM c) THEN 1 ELSE 0 END AS BIGINT) AS in_corpus
         |  FROM h)
         |SELECT i.doc_id, i.in_filter, ic.in_corpus
         |FROM inf i JOIN ic ON i.doc_id = ic.doc_id
         |ORDER BY i.doc_id""".stripMargin,
    "t13_bigram_topk" ->
      s"""WITH bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]))
         |      AS bigram
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
         |SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS df
         |FROM bg GROUP BY bigram
         |ORDER BY n DESC, bigram LIMIT ${BigramTopK}""".stripMargin,
    "d13_tfidf_neardup" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(w) - 2), i -> array_to_string(w[i:i+2], ' ')))
         |      AS shingle
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |tfc AS (SELECT doc_id, shingle, count(*) AS tf FROM raw GROUP BY 1, 2),
         |dfc AS (SELECT shingle, count(*) AS df FROM tfc GROUP BY 1 HAVING count(*) <= ${TfidfMaxDf}),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |wgt AS (
         |  SELECT t.shingle, t.doc_id, CAST(t.tf * (n.n_docs - d.df) AS BIGINT) AS wgt
         |  FROM tfc t JOIN dfc d USING (shingle) CROSS JOIN n),
         |nrm AS (SELECT doc_id, CAST(sum(wgt * wgt) AS BIGINT) AS nrm FROM wgt GROUP BY 1),
         |dots AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(sum(a.wgt * b.wgt) AS BIGINT) AS dot
         |  FROM wgt a JOIN wgt b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT doc_a, doc_b, dot,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
         |      AS cosine
         |  FROM dots JOIN nrm na ON doc_a = na.doc_id JOIN nrm nb ON doc_b = nb.doc_id)
         |SELECT doc_a, doc_b, dot, cosine FROM scored
         |WHERE cosine >= ${TfidfThreshold}
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d2_jaccard_neardup" ->
      s"""WITH $shinglePairs
         |SELECT doc_a, doc_b, n_common, n_union, jaccard
         |FROM jac WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "t18_phrase_search" -> {
      val conds = PhraseTerms.zipWithIndex
        .map { case (t, i) => s"w[i + $i] = '$t'" }
        .mkString(" AND ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM t),
         |m AS (SELECT doc_id, i - 1 AS start_pos FROM p WHERE $conds)
         |SELECT doc_id, count(*) AS n_matches,
         |  CAST(min(start_pos) AS BIGINT) AS first_pos
         |FROM m GROUP BY 1 ORDER BY doc_id""".stripMargin
    },
    "t22_canonical_docs" ->
      s"""WITH RECURSIVE $shinglePairs,
         |e AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
         |lab AS (SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a),
         |j AS (SELECT lab.doc_id, lab.cluster, d.n_chars
         |      FROM lab JOIN documents d ON d.doc_id = lab.doc_id)
         |SELECT doc_id, cluster,
         |  first_value(doc_id) OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS keep_doc,
         |  CAST(CASE WHEN doc_id = first_value(doc_id) OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id)
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_kept
         |FROM j ORDER BY doc_id""".stripMargin,
    "t21_novelty_score" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct($shingles3)) AS shingle
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |fs AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
         |SELECT sh.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) / count(*) AS novelty
         |FROM sh JOIN fs USING (shingle)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "d15_minhash_estimate" -> {
      val sigCols = (0 until MinhashK)
        .map(i => s"list_min(list_transform(sh_set, s -> substr(md5('0|' || s), ${i * 5 + 1}, 5))) AS m$i")
        .mkString(",\n    ")
      val bandSelects = (0 until MinhashK / 2)
        .map(b => s"SELECT doc_id, $b AS band_idx, md5(m${2 * b} || '|' || m${2 * b + 1}) AS band_hash FROM sig")
        .mkString("\n  UNION ALL ")
      val agreeExpr = (0 until MinhashK)
        .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $shinglePairs,
         |t AS (SELECT doc_id, list_distinct($shingles3) AS sh_set
         |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM t),
         |bands AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |              AND a.doc_id < b.doc_id)
         |SELECT c.doc_a, c.doc_b,
         |  CAST($agreeExpr AS BIGINT) AS n_agree,
         |  ($agreeExpr) / $MinhashK AS est_jaccard,
         |  j.jaccard
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.doc_a
         |JOIN sig sb ON sb.doc_id = c.doc_b
         |JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |ORDER BY c.doc_a, c.doc_b""".stripMargin
    },
    "t19_containment_dedup" ->
      s"""WITH $shinglePairs
         |SELECT doc_a, doc_b, n_common, sa.sz AS sz_a, sb.sz AS sz_b,
         |  n_common / sa.sz AS cont_a, n_common / sb.sz AS cont_b
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE greatest(n_common / sa.sz, n_common / sb.sz) >= $ContainmentThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,
    // BPE trainer: unrolled merge rounds over the word-frequency dict,
    // greedy merges as delimiter-encoded literal replace (formula-
    // identical to the Spark plan; see bpeTrainer's Scaladoc)
    "t26_bpe_trainer" -> {
      val rounds = (1 to BpeMergeRounds).map { k =>
        s"""p$k AS (
           |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
           |    SELECT cnt, s[i] AS l, s[i + 1] AS r FROM (
           |      SELECT cnt, s, unnest(generate_series(1, len(s) - 1)) AS i FROM (
           |        SELECT cnt, string_split(enc[2:len(enc) - 1], '||') AS s FROM d${k - 1})))
           |  GROUP BY 1, 2),
           |b$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
           |d$k AS (
           |  SELECT replace(enc, '|' || l || '||' || r || '|', '|' || l || r || '|') AS enc, cnt
           |  FROM d${k - 1} CROSS JOIN b$k)""".stripMargin
      }.mkString(",\n")
      val arms = (1 to BpeMergeRounds)
        .map(k =>
          s"SELECT CAST($k AS BIGINT) AS merge_rank, l AS sym_l, r AS sym_r, c AS pair_count FROM b$k")
        .mkString("\n  UNION ALL ")
      s"""WITH d0 AS (
         |  SELECT '|' || array_to_string(string_split(word, ''), '||') || '|' AS enc,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  GROUP BY 1),
         |$rounds
         |$arms
         |ORDER BY merge_rank""".stripMargin
    },
    // BPE application: the t26 chain with the word carried through, then
    // one corpus tokenization pass through the learned word→token map
    "t27_bpe_tokenize" -> {
      val rounds = (1 to BpeMergeRounds).map { k =>
        s"""p$k AS (
           |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
           |    SELECT cnt, s[i] AS l, s[i + 1] AS r FROM (
           |      SELECT cnt, s, unnest(generate_series(1, len(s) - 1)) AS i FROM (
           |        SELECT cnt, string_split(enc[2:len(enc) - 1], '||') AS s FROM d${k - 1})))
           |  GROUP BY 1, 2),
           |b$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
           |d$k AS (
           |  SELECT word, replace(enc, '|' || l || '||' || r || '|', '|' || l || r || '|') AS enc,
           |    cnt
           |  FROM d${k - 1} CROSS JOIN b$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH d0 AS (
         |  SELECT word, '|' || array_to_string(string_split(word, ''), '||') || '|' AS enc,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  GROUP BY 1),
         |$rounds,
         |wt AS (SELECT word,
         |    CAST(len(string_split(enc[2:len(enc) - 1], '||')) AS BIGINT) AS n_tok
         |  FROM d$BpeMergeRounds),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
         |  (CAST(sum(len(word)) AS BIGINT) * 1000) // CAST(sum(n_tok) AS BIGINT)
         |    AS compression_x1000
         |FROM tok JOIN wt USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // banded containment: d3's width-2 band candidates, exact containment
    // verified on candidates only, same threshold as t19
    "t19b_containment_banded" ->
      s"""WITH $bandedContSql
         |SELECT doc_a, doc_b, n_common, sz_a, sz_b,
         |  n_common / sz_a AS cont_a, n_common / sz_b AS cont_b
         |FROM bc ORDER BY doc_a, doc_b""".stripMargin,
    // t19b's recall against t19's exact pair set, one summary row
    "t19r_containment_recall" ->
      s"""WITH $shinglePairs,
         |exact AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE greatest(n_common / sa.sz, n_common / sb.sz) >= $ContainmentThreshold),
         |$bandedContSql
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN b.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
         |  CAST(sum(CASE WHEN b.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS recall
         |FROM exact e LEFT JOIN bc b ON e.doc_a = b.doc_a AND e.doc_b = b.doc_b""".stripMargin,
    // t19 with the d2c hot-shingle df cap applied before pairing AND sizes
    "t19c_containment_capped" ->
      s"""WITH sh0 AS (
         |  SELECT doc_id, unnest(list_distinct($shingles3)) AS shingle
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |sh AS (
         |  SELECT * FROM sh0
         |  QUALIFY count(*) OVER (PARTITION BY shingle) <= $JaccardMaxDf),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common, sa.sz AS sz_a, sb.sz AS sz_b,
         |  n_common / sa.sz AS cont_a, n_common / sb.sz AS cont_b
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE greatest(n_common / sa.sz, n_common / sb.sz) >= $ContainmentThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,
    "t20_bm25_rank" ->
      s"""WITH $bm25Ctes
         |SELECT rnk, doc_id, score, n_hit_terms FROM bm25 ORDER BY rnk""".stripMargin,
    // d2 with the hot-shingle df cap applied before pairing AND sizes —
    // the QUALIFY mirrors Dedup.dropHotShingles exactly
    "d2c_jaccard_capped" ->
      s"""WITH sh0 AS (
         |  SELECT doc_id, unnest(list_distinct($shingles3)) AS shingle
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |sh AS (
         |  SELECT * FROM sh0
         |  QUALIFY count(*) OVER (PARTITION BY shingle) <= $JaccardMaxDf),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jac AS (
         |  SELECT doc_a, doc_b, n_common, sa.sz + sb.sz - n_common AS n_union,
         |         n_common / (sa.sz + sb.sz - n_common) AS jaccard
         |  FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, n_common, n_union, jaccard
         |FROM jac WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "d3_minhash_lsh" -> {
      val sigCols = (0 until MinhashK)
        .map(i => s"list_min(list_transform(sh_set, s -> substr(md5('0|' || s), ${i * 5 + 1}, 5))) AS m$i")
        .mkString(",\n    ")
      val bandSelects = (0 until MinhashK / 2)
        .map(b => s"SELECT doc_id, $b AS band_idx, md5(m${2 * b} || '|' || m${2 * b + 1}) AS band_hash FROM sig")
        .mkString("\n  UNION ALL ")
      s"""WITH $shinglePairs,
         |t AS (SELECT doc_id, list_distinct($shingles3) AS sh_set
         |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM t),
         |bands AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
         |  FROM bands a
         |  JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |              AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT c.doc_a, c.doc_b, c.n_shared_bands, j.jaccard
         |FROM cand c JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
         |WHERE j.jaccard >= 0.5 ORDER BY c.doc_a, c.doc_b""".stripMargin
    },
    // d19: the SQL side derives feasibility (q^r <= b*p^r) and the
    // argmax key (b^(6/r)) independently via power() — exact below 2^53
    "d19_lsh_autotune" -> {
      val sigCols = (0 until MinhashK)
        .map(i => s"list_min(list_transform(sh_set, s -> substr(md5('0|' || s), ${i * 5 + 1}, 5))) AS m$i")
        .mkString(",\n    ")
      val bandSelects = (0 until MinhashK)
        .map(i => s"SELECT doc_id, $i AS band_idx, m$i AS band_hash FROM sig")
        .mkString("\n  UNION ALL ")
      s"""WITH $shinglePairs,
         |t AS (SELECT doc_id, list_distinct($shingles3) AS sh_set
         |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM t),
         |bands AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
         |  FROM bands a
         |  JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |              AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |counts AS (SELECT
         |  (SELECT count(*) FROM cand) AS nc,
         |  (SELECT count(*) FROM cand c JOIN jac j
         |     ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b AND j.jaccard >= 0.5) AS np),
         |combos(b, r) AS (VALUES (6, 1), (3, 2), (2, 3), (1, 6)),
         |sel AS (
         |  SELECT b, r,
         |    CAST(power(2, r) AS BIGINT) AS q_pow_r,
         |    CAST(b * power(1, r) AS BIGINT) AS b_p_pow_r,
         |    CASE WHEN CAST(power(2, r) AS BIGINT) <= b * CAST(power(1, r) AS BIGINT)
         |         THEN 1 ELSE 0 END AS feasible,
         |    CAST(power(b, 6 // r) AS BIGINT) AS sel_key
         |  FROM combos),
         |ch AS (SELECT min(sel_key) AS ck FROM sel WHERE feasible = 1)
         |SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
         |  q_pow_r, b_p_pow_r, CAST(feasible AS BIGINT) AS feasible, sel_key,
         |  CAST(CASE WHEN feasible = 1 AND sel_key = ch.ck THEN 1 ELSE 0 END AS BIGINT) AS chosen,
         |  CAST(CASE WHEN feasible = 1 AND sel_key = ch.ck THEN counts.nc ELSE 0 END AS BIGINT)
         |    AS n_candidates,
         |  CAST(CASE WHEN feasible = 1 AND sel_key = ch.ck THEN counts.np ELSE 0 END AS BIGINT)
         |    AS n_pairs
         |FROM sel CROSS JOIN ch CROSS JOIN counts
         |ORDER BY bands DESC""".stripMargin
    },
    "d18_incremental_neardup" -> incrNearDupSql(
      (0 until MinhashK / 2)
        .map(b =>
          s"SELECT doc_id, md5('$b' || '|' || md5(m${2 * b} || '|' || m${2 * b + 1})) AS band_key FROM sig")
        .mkString("\n  UNION ALL ")),
    "d18w_wide_recall" -> incrNearDupSql(
      (0 until MinhashK)
        .map(b => s"SELECT doc_id, md5('$b' || '|' || m$b) AS band_key FROM sig")
        .mkString("\n  UNION ALL ")),
    "d4_simhash" -> {
      val sums = (0 until 16).map { j =>
        val m = 1 << (16 - j)
        val h = 1 << (15 - j)
        s"sum(CASE WHEN (v16 % $m) >= $h THEN 1 ELSE -1 END) AS s$j"
      }.mkString(",\n    ")
      val bits = (0 until 16)
        .map(j => s"CASE WHEN s$j > 0 THEN ${1L << (15 - j)} ELSE 0 END")
        .mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |v AS (SELECT doc_id, $simhashV16 AS v16 FROM toks),
         |c AS (SELECT doc_id,
         |    $sums
         |  FROM v GROUP BY doc_id)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash16 FROM c ORDER BY doc_id""".stripMargin
    },
    "t1_token_stats" ->
      """SELECT doc_id,
        |  len(w) AS n_tokens,
        |  len(list_distinct(w)) AS n_distinct,
        |  CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS sum_token_len,
        |  CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) / len(w) AS mean_token_len,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t5_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$BpePatternSql')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$BpePatternSql')) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS tokens_per_word
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "t2_quality_score" ->
      """SELECT doc_id, n_tokens,
        |  stop_cnt / n_tokens AS stop_ratio,
        |  1.0 - n_distinct / n_tokens AS rep_ratio,
        |  (stop_cnt / n_tokens) * 0.3
        |    + least(sum_len / n_tokens / 10.0, 1.0) * 0.3
        |    + (n_distinct / n_tokens) * 0.4 AS quality_score,
        |  CASE WHEN (stop_cnt / n_tokens) * 0.3
        |    + least(sum_len / n_tokens / 10.0, 1.0) * 0.3
        |    + (n_distinct / n_tokens) * 0.4 >= 0.5 THEN 'good' ELSE 'low' END AS quality_band
        |FROM (
        |  SELECT doc_id,
        |    len(w) AS n_tokens,
        |    len(list_distinct(w)) AS n_distinct,
        |    len(list_filter(w, t -> t IN ('the','a','of','and','to','in'))) AS stop_cnt,
        |    CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS sum_len
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // e1: the d1/t2/t3/s5 oracle snippets composed in one WITH chain —
    // any drift in a stage's survivor set diverges the hash
    "e1_corpus_pipeline" -> {
      val scoreCols = TextAnalysis.langProfiles.map { case (langName, words) =>
        val inList = words.map(w => s"'$w'").mkString(",")
        s"len(list_filter(w, t -> t IN ($inList))) AS score_$langName"
      }.mkString(",\n    ")
      """WITH canon AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |sc AS (
        |  SELECT doc_id, len(w) AS n_tokens,
        |    (len(list_filter(w, t -> t IN ('the','a','of','and','to','in'))) / len(w)) * 0.3
        |      + least(CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) / len(w) / 10.0, 1.0) * 0.3
        |      + (len(list_distinct(w)) / len(w)) * 0.4 AS q
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |lang AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
        |      WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
        |      WHEN score_de >= score_fr THEN 'de'
        |      ELSE 'fr' END AS lang_pred
        |  FROM (
        |    SELECT doc_id,
        |      SCORECOLS
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
        |kept AS (
        |  SELECT c.doc_id, s.n_tokens
        |  FROM canon c JOIN sc s USING (doc_id) JOIN lang l USING (doc_id)
        |  WHERE s.q >= 0.5 AND l.lang_pred = 'en')
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  substr(md5('corpus|' || CAST(doc_id AS VARCHAR)), 1, 8) AS u8,
        |  CASE WHEN substr(md5('corpus|' || CAST(doc_id AS VARCHAR)), 1, 8) < 'e6000000'
        |    THEN 'train' ELSE 'val' END AS split
        |FROM kept ORDER BY doc_id""".stripMargin.replace("SCORECOLS", scoreCols)
    },
    "t3_lang_id" -> {
      val scoreCols = TextAnalysis.langProfiles.map { case (langName, words) =>
        val inList = words.map(w => s"'$w'").mkString(",")
        s"len(list_filter(w, t -> t IN ($inList))) AS score_$langName"
      }.mkString(",\n    ")
      s"""SELECT doc_id, score_en, score_es, score_de, score_fr,
         |  CASE
         |    WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
         |    WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
         |    WHEN score_de >= score_fr THEN 'de'
         |    ELSE 'fr' END AS lang_pred
         |FROM (
         |  SELECT doc_id,
         |    $scoreCols
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
         |ORDER BY doc_id""".stripMargin
    },
    "d10_dedup_clusters" ->
      s"""WITH RECURSIVE $shinglePairs,
         |e AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src)
         |SELECT a AS doc_id, min(b) AS canonical_id,
         |  CAST(CASE WHEN min(b) <> a THEN 1 ELSE 0 END AS BIGINT) AS is_dup
         |FROM reach GROUP BY a ORDER BY a""".stripMargin,
    "s14_cluster_split" ->
      s"""WITH RECURSIVE $shinglePairs,
         |e AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
         |lab AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
         |sz AS (SELECT cluster_id, count(*) AS n_cluster FROM lab GROUP BY 1)
         |SELECT l.doc_id, l.cluster_id, s.n_cluster,
         |  CASE WHEN CAST(('0x' || substr(md5('split|' || CAST(l.cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0
         |    THEN 'test' ELSE 'train' END AS split
         |FROM lab l JOIN sz s USING (cluster_id)
         |ORDER BY l.doc_id""".stripMargin,
    "d11_substring_dedup" -> {
      val kg = SubstrN
      s"""WITH sh AS (
         |  SELECT doc_id, md5(g) AS gh FROM (
         |    SELECT doc_id, unnest(list_distinct(
         |      CASE WHEN len(w) >= $kg THEN list_transform(generate_series(1, len(w)-${kg - 1}),
         |        i -> array_to_string(w[i:i+${kg - 1}], ' ')) ELSE [] END)) AS g
         |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
         |cool AS (
         |  SELECT * FROM sh QUALIFY count(*) OVER (PARTITION BY gh) <= $SubstrMaxDf),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM cool GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |  FROM cool a JOIN cool b ON a.gh = b.gh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT i.doc_a, i.doc_b, i.n_shared,
         |  i.n_shared / least(sa.sz, sb.sz) AS containment
         |FROM inter i
         |JOIN sizes sa ON i.doc_a = sa.doc_id
         |JOIN sizes sb ON i.doc_b = sb.doc_id
         |ORDER BY i.doc_a, i.doc_b""".stripMargin
    },
    "d12_incremental_dedup" ->
      s"""WITH canon AS (
         |  SELECT md5(text) AS text_hash, min(doc_id) AS corpus_canonical
         |  FROM documents GROUP BY 1),
         |incr AS (
         |  SELECT doc_id + $IncrIdShift AS new_id, md5(text) AS text_hash
         |  FROM documents WHERE doc_id % $IncrMod = 0)
         |SELECT i.new_id, i.text_hash,
         |  coalesce(c.corpus_canonical, -1) AS canonical_id,
         |  CAST(CASE WHEN c.corpus_canonical IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_known
         |FROM incr i LEFT JOIN canon c ON i.text_hash = c.text_hash
         |ORDER BY i.new_id""".stripMargin,
    "t10_term_importance" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT doc_id, token, tf, df, tf * (n.n - df) AS score
         |  FROM tf JOIN df USING (token) CROSS JOIN n)
         |SELECT doc_id, rnk, token, tf, df, score FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= $TermTopK ORDER BY doc_id, rnk""".stripMargin,
    "t11_doc_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n
         |  FROM documents),
         |starts AS (
         |  SELECT doc_id, n, w, unnest(generate_series(0, n - 1, $ChunkStride)) AS start_tok
         |  FROM t)
         |SELECT doc_id,
         |  start_tok // $ChunkStride AS chunk_idx,
         |  CAST(start_tok AS BIGINT) AS start_tok,
         |  len(w[start_tok + 1 : start_tok + $ChunkSize]) AS n_chunk_tokens,
         |  md5(array_to_string(w[start_tok + 1 : start_tok + $ChunkSize], ' ')) AS chunk_hash
         |FROM starts
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "t9_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |base AS (
        |  SELECT doc_id, len(w) AS n_tokens,
        |    CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2),
        |      i -> array_to_string(w[i:i+2], ' ')) ELSE [] END AS g3
        |  FROM t),
        |b2 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
        |    i -> array_to_string(w[i:i+1], ' '))) AS g2
        |  FROM t),
        |c2 AS (SELECT doc_id, g2, count(*) AS c FROM b2 GROUP BY 1, 2),
        |top AS (
        |  SELECT doc_id, g2 AS top_2gram, c AS top2_cnt FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g2) AS r
        |    FROM c2)
        |  WHERE r = 1)
        |SELECT s.doc_id, s.n_tokens, top_2gram, top2_cnt,
        |  top2_cnt / (s.n_tokens - 1) AS top2_frac,
        |  CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3)) / len(g3) END AS dup3_ratio
        |FROM base s JOIN top USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,
    "t6_decontaminate" ->
      s"""WITH sh0 AS (
         |  SELECT doc_id, unnest(list_distinct($shingles3)) AS shingle
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         |bench AS (SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 17 = 0),
         |corpus AS (SELECT * FROM sh0 WHERE doc_id % 17 <> 0),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
         |hits AS (
         |  SELECT c.doc_id, count(*) AS n_hits
         |  FROM corpus c JOIN bench b ON c.shingle = b.shingle GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(s.n_shingles, 0) AS n_shingles,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  CASE WHEN coalesce(s.n_shingles, 0) > 0
         |       THEN coalesce(h.n_hits, 0) / s.n_shingles ELSE 0.0 END AS contamination,
         |  CAST(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM documents d
         |LEFT JOIN sizes s ON d.doc_id = s.doc_id
         |LEFT JOIN hits h ON d.doc_id = h.doc_id
         |WHERE d.doc_id % 17 <> 0
         |ORDER BY d.doc_id""".stripMargin,
    "t7_vocab_topk" ->
      """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY tf DESC, token LIMIT 50""".stripMargin,
    "s7_weighted_sample" ->
      """SELECT doc_id, quality_score, draw,
        |  CAST(floor(quality_score * 4294967296.0) AS BIGINT) AS cut
        |FROM (
        |  SELECT doc_id,
        |    (stop_cnt / n_tokens) * 0.3
        |      + least(sum_len / n_tokens / 10.0, 1.0) * 0.3
        |      + (n_distinct / n_tokens) * 0.4 AS quality_score,
        |    CAST(('0x' || substr(md5('wsmp|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS draw
        |  FROM (
        |    SELECT doc_id,
        |      len(w) AS n_tokens,
        |      len(list_distinct(w)) AS n_distinct,
        |      len(list_filter(w, t -> t IN ('the','a','of','and','to','in'))) AS stop_cnt,
        |      CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS sum_len
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)))
        |WHERE draw < CAST(floor(quality_score * 4294967296.0) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    "t29_length_batching" ->
      s"""SELECT shard, band, batch, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(n_chars) AS BIGINT) AS max_len,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_len,
         |  CAST(count(*) * max(n_chars) - sum(n_chars) AS BIGINT) AS padding_waste
         |FROM (
         |  SELECT shard, band, n_chars,
         |    (row_number() OVER (PARTITION BY shard, band ORDER BY draw, doc_id) - 1) // $BatchDocs
         |      AS batch
         |  FROM (
         |    SELECT doc_id, n_chars, doc_id % p.ns AS shard,
         |      least(15, n_chars // 32) AS band,
         |      md5('lb|' || CAST(doc_id AS VARCHAR)) AS draw
         |    FROM documents CROSS JOIN $packShardsSql p))
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,
    "t30_line_dedup" ->
      s"""WITH w2 AS (
         |  SELECT doc_id, t.ord AS ord, t.word AS word FROM (
         |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
         |      i -> struct_pack(ord := i, word := w[i]))) AS t
         |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
         |ch AS (
         |  SELECT doc_id, (ord - 1) // $LineW AS chunk_idx,
         |    string_agg(word, ' ' ORDER BY ord) AS chunk_text
         |  FROM w2 GROUP BY 1, 2),
         |st AS (
         |  SELECT md5(chunk_text) AS h, count(DISTINCT doc_id) AS df,
         |    min(doc_id * $ChunkShift + chunk_idx) AS canon
         |  FROM ch GROUP BY 1),
         |k AS (
         |  SELECT c.doc_id, c.chunk_idx, c.chunk_text,
         |    (s.df <= $LineMaxDf OR s.canon = c.doc_id * $ChunkShift + c.chunk_idx) AS keep
         |  FROM ch c JOIN st s ON md5(c.chunk_text) = s.h)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |  CAST(length(coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
         |    FILTER (WHERE keep), '')) AS BIGINT) AS clean_chars,
         |  md5(coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
         |    FILTER (WHERE keep), '')) AS clean_md5
         |FROM k GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // t31: the identical synthetic page built in SQL, the identical
    // extraction chain ((?s) spans, tag strip, entity decode with &amp;
    // last, explicit whitespace class) — the md5 pins every character
    "t32_text_normalize" -> {
      // identical dirt strings and fold table, escaped into SQL literals
      // from the SAME Scala constants the engine uses
      def q(s: String) = s.replace("'", "''")
      val folds = NormPairs.foldLeft("lower(aug)") {
        case (e, (f, t)) => s"replace($e, '${q(f)}', '${q(t)}')"
      }
      s"""WITH a AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0 THEN '${q(DirtA)}' ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0 THEN '${q(DirtB)}' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0 THEN '${q(DirtC)}' ELSE '' END AS aug
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, aug,
         |    trim(regexp_replace($folds, '[ \t\n\r]+', ' ', 'g')) AS norm
         |  FROM a)
         |SELECT doc_id, CAST(length(aug) AS BIGINT) AS n_raw,
         |  CAST(length(norm) AS BIGINT) AS n_norm,
         |  CAST(CASE WHEN aug <> norm THEN 1 ELSE 0 END AS BIGINT) AS changed,
         |  md5(norm) AS norm_md5
         |FROM n ORDER BY doc_id""".stripMargin
    },
    "t31_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title><style>body{margin:0}</style><script>var k="' || md5(text)
        |    || '";</script></head><body><nav>Home | About | <a href="/">Index</a></nav><h1>Doc '
        |    || CAST(doc_id AS VARCHAR)
        |    || '</h1><p>' || text
        |    || ' &amp; more &lt;tags&gt; &quot;quoted&quot;&nbsp;end</p><a href="/d/'
        |    || CAST((doc_id * 31) % 997 AS VARCHAR) || '">next</a>'
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN '<a href="/d/' || CAST((doc_id * 17) % 997 AS VARCHAR) || '">rel</a>'
        |         ELSE '' END
        |    || '<footer>(c) corp</footer></body></html>' AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&nbsp;', ' '), '&amp;', '&'),
        |      '[ \t\n\r]+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id,
        |  regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
        |  CAST((length(html) - length(replace(html, '<a href=', ''))) // 8 AS BIGINT) AS n_links,
        |  CAST(length(clean) AS BIGINT) AS extracted_len,
        |  md5(clean) AS extract_hash
        |FROM c ORDER BY doc_id""".stripMargin,
    "t28_pii_redaction" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |              || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0
        |         THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
        |              || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        |         ELSE '' END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(aug, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')) AS clean_hash
        |FROM aug
        |WHERE len(regexp_extract_all(aug, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+'))
        |    + len(regexp_extract_all(aug, '\d{3}-\d{3}-\d{4}'))
        |    + len(regexp_extract_all(aug, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) > 0
        |ORDER BY doc_id""".stripMargin,
    "s13_domain_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    md5('mix|' || CAST(doc_id AS VARCHAR)) AS draw,
        |    1 + (CAST(substr(source, 4) AS BIGINT) % 5) AS weight
        |  FROM documents),
        |per AS (
        |  SELECT source, weight, count(*) AS n_docs, sum(n_chars) AS sum_chars
        |  FROM d GROUP BY 1, 2),
        |tot AS (SELECT 2 * sum(n_docs) AS budget, sum(weight) AS sum_w FROM per),
        |q AS (
        |  SELECT per.*, (weight * budget) // sum_w AS quota,
        |    ((weight * budget) // sum_w) // n_docs AS full_epochs,
        |    ((weight * budget) // sum_w) % n_docs AS n_extra
        |  FROM per CROSS JOIN tot),
        |rk AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY draw, doc_id) AS rk
        |  FROM d),
        |extra AS (
        |  SELECT rk.source, sum(rk.n_chars) AS extra_chars
        |  FROM rk JOIN q ON rk.source = q.source AND rk.rk <= q.n_extra
        |  GROUP BY 1)
        |SELECT q.source, CAST(weight AS BIGINT) AS weight,
        |  CAST(n_docs AS BIGINT) AS n_docs, CAST(sum_chars AS BIGINT) AS sum_chars,
        |  CAST(quota AS BIGINT) AS quota, CAST(full_epochs AS BIGINT) AS full_epochs,
        |  CAST(n_extra AS BIGINT) AS n_extra,
        |  CAST(full_epochs * sum_chars + COALESCE(extra_chars, 0) AS BIGINT) AS total_chars
        |FROM q LEFT JOIN extra ON q.source = extra.source
        |ORDER BY 1""".stripMargin,
    // s15: s13's machinery with empirical α=0.5 weights — the sqrt is
    // per-row (correctly rounded), quantized to int BEFORE any sum
    "s15_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    md5('tmix|' || CAST(doc_id AS VARCHAR)) AS draw
        |  FROM documents),
        |per AS (
        |  SELECT source, count(*) AS n_docs, sum(n_chars) AS sum_chars,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000.0) AS BIGINT) AS weight
        |  FROM d GROUP BY 1),
        |tot AS (SELECT sum(n_docs) AS budget, sum(weight) AS sum_w FROM per),
        |q AS (
        |  SELECT per.*, (weight * budget) // sum_w AS quota,
        |    ((weight * budget) // sum_w) // n_docs AS full_epochs,
        |    ((weight * budget) // sum_w) % n_docs AS n_extra
        |  FROM per CROSS JOIN tot),
        |rk AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY draw, doc_id) AS rk
        |  FROM d),
        |extra AS (
        |  SELECT rk.source, sum(rk.n_chars) AS extra_chars
        |  FROM rk JOIN q ON rk.source = q.source AND rk.rk <= q.n_extra
        |  GROUP BY 1)
        |SELECT q.source, q.weight,
        |  CAST(n_docs AS BIGINT) AS n_docs, CAST(sum_chars AS BIGINT) AS sum_chars,
        |  CAST(quota AS BIGINT) AS quota, CAST(full_epochs AS BIGINT) AS full_epochs,
        |  CAST(n_extra AS BIGINT) AS n_extra,
        |  CAST(full_epochs * sum_chars + COALESCE(extra_chars, 0) AS BIGINT) AS total_chars
        |FROM q LEFT JOIN extra ON q.source = extra.source
        |ORDER BY 1""".stripMargin,
    "s6_epoch_shuffle" ->
      s"""SELECT doc_id, shard, u8,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY u8, doc_id) AS BIGINT)
         |    AS shuffle_pos
         |FROM (
         |  SELECT doc_id, doc_id % p.ns AS shard,
         |    substr(md5('epoch0|' || CAST(doc_id AS VARCHAR)), 1, 8) AS u8
         |  FROM documents CROSS JOIN $packShardsSql p)
         |ORDER BY doc_id""".stripMargin,
    "t8_sequence_packing" ->
      s"""SELECT doc_id, shard, n_tokens, cum_tokens,
         |  start_tok // 2048 AS pack_id,
         |  start_tok % 2048 AS pack_off
         |FROM (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
         |    CAST(sum(n_tokens) OVER w AS BIGINT) - n_tokens AS start_tok
         |  FROM (
         |    SELECT doc_id, doc_id % p.ns AS shard,
         |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |    FROM documents CROSS JOIN $packShardsSql p)
         |  WINDOW w AS (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      s"""SELECT doc_id,
         |  coalesce(
         |    list_min(list_transform(
         |      CASE WHEN len(w) >= 5 THEN list_transform(generate_series(1, len(w)-4), i -> array_to_string(w[i:i+4], ' ')) ELSE [] END,
         |      s -> md5('0|' || s))),
         |    md5(text)) AS fingerprint,
         |  md5(array_to_string(w[1:3], ' ')) AS head_hash
         |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
         |ORDER BY doc_id""".stripMargin
  )
}
