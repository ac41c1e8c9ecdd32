package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora at training-data scale:
  * exact (hash group), n-gram Jaccard (shared-shingle blocking), MinHash
  * LSH (banded candidate generation + exact verify; Broder 1997 minhash +
  * the standard banding construction), SimHash (Charikar 2002 random
  * hyperplane sketch, 16-bit variant).
  *
  * Scale posture:
  *   - exact dedup is one hash-aggregate (map-side partials, one shuffle);
  *   - Jaccard pairs shuffle by shingle, so the candidate space is bounded
  *     by co-occurring shingles, never the full n^2 cross join;
  *   - MinHash banding cuts candidates to pairs likely >= the threshold
  *     (P = 1-(1-j^2)^bands for band width 2), which is the 100 TB path —
  *     the shingle join then verifies ONLY those pairs;
  *   - SimHash reduces each doc to one 16-bit integer; equal-hash buckets
  *     are near-dup candidates at O(n) shuffle cost.
  */
object Dedup {

  /** Exact-duplicate groups keyed by md5(text). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col(idCol)).as("canonical_id"))

  /** Incremental exact dedup: match an arriving batch against a corpus
    * hash index that is BUCKETED BY text_hash on disk
    * ([[graft.sources.Bucketed]]) — the append-to-a-100TB-corpus shape:
    * the corpus side of both the per-hash canonical aggregation and the
    * match join reads its bucket layout exchange-free, so each increment
    * costs one shuffle of the INCREMENT only, never of the corpus.
    * Output: idCol, text_hash, canonical_id (the corpus's min id for that
    * text, -1 when unseen), is_known 0/1.
    */
  def incrementalExact(
      increment: DataFrame,
      corpusHashes: DataFrame, // (corpus_id, text_hash), bucketed by text_hash
      idCol: String,
      textCol: String): DataFrame = {
    val canon = corpusHashes
      .groupBy(col("text_hash"))
      .agg(min(col("corpus_id")).as("corpus_canonical"))
    increment
      .select(col(idCol), md5(col(textCol).cast("binary")).as("text_hash"))
      .join(canon, Seq("text_hash"), "left")
      .select(
        col(idCol),
        col("text_hash"),
        coalesce(col("corpus_canonical"), lit(-1L)).as("canonical_id"),
        when(col("corpus_canonical").isNotNull, lit(1L)).otherwise(lit(0L)).as("is_known"))
  }

  /** (doc_id, shingle) pairs over the DISTINCT n-gram shingle set. Uses
    * the single-pass [[graft.functions.WordShingles]] expression (same
    * semantics as the composable tokens->transform->slice form, ~2x
    * faster on the explode hot path).
    */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(graft.functions.WordShingles.wordShingles(col(textCol), n)))
        .as("shingle"))

  /** Drop shingles whose document frequency exceeds `maxDf`. At corpus
    * scale the shared-shingle join is quadratic in per-shingle document
    * frequency, and ubiquitous shingles dominate that cost while carrying
    * almost no similarity signal — capping df bounds the join at
    * O(distinct_shingles * maxDf^2). Sizes must then be computed over the
    * SAME filtered set so Jaccard stays a proper ratio (callers pass the
    * result to [[jaccardPairs]] wholesale). Not used by the oracle-gate
    * queries (their corpora are small); this is the 100 TB knob.
    */
  def dropHotShingles(sh: DataFrame, maxDf: Long): DataFrame = {
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("shingle")
    sh.join(broadcast(hot), Seq("shingle"), "left_anti")
  }

  /** Benchmark decontamination: per corpus document, how many of its
    * distinct shingles appear anywhere in the benchmark set. The benchmark
    * shingle vocabulary is tiny relative to the corpus (eval suites are
    * KBs-to-MBs against TBs of training text), so it is broadcast and the
    * corpus side joins map-side with NO shuffle of the big table; the only
    * shuffle is the per-doc count of MATCHED rows, which is at most the
    * contaminated subset. Inputs are shingle frames from [[shingleSet]].
    */
  def contaminationCounts(corpusSh: DataFrame, benchSh: DataFrame): DataFrame =
    corpusSh
      .join(broadcast(benchSh.select("shingle").distinct()), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))

  /** Exact pairwise Jaccard over shingle sets for every pair sharing at
    * least one shingle. Output: doc_a < doc_b, n_common, n_union, jaccard.
    */
  def jaccardPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh
      .as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_common"))
      .withColumn("jaccard", col("n_common") / col("n_union"))
      .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
  }

  /** Asymmetric containment over the same shared-shingle join as
    * [[jaccardPairs]]: C(A,B) = |S(A)∩S(B)| / |S(A)|. Containment is the
    * subset-duplication detector Jaccard structurally misses — a short
    * doc pasted inside a long one has tiny Jaccard (union is the long
    * doc) but containment ≈ 1 from the short side. Canonical doc_a <
    * doc_b rows carry both directions (cont_a, cont_b); callers filter
    * on greatest(cont_a, cont_b). Same O(shingles·df²) shuffle bound as
    * Jaccard — the expensive intersect join is shared work, not a new
    * pass, when fed the same persisted shingle frame.
    */
  def containmentPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh
      .as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("cont_a", col("n_common") / col("sz_a"))
      .withColumn("cont_b", col("n_common") / col("sz_b"))
      .select("doc_a", "doc_b", "n_common", "sz_a", "sz_b", "cont_a", "cont_b")
  }

  /** Exact containment restricted to a given candidate pair set — the
    * verify stage of banded containment dedup (t19b): same
    * candidates-broadcast shape as [[jaccardForCandidates]], but scoring
    * n_common against EACH side's size instead of the union. Zero-overlap
    * band collisions drop out of the intersect join, which is harmless
    * here because every downstream consumer thresholds containment ≥
    * some positive value (unlike d18, whose gated surface keeps flag-0
    * rows via [[jaccardForAllCandidates]]). Output schema matches
    * [[containmentPairs]].
    */
  def containmentForCandidates(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = broadcast(cands.select(col("doc_a"), col("doc_b")))
    val aSide = pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
    val bSide = sh.withColumnRenamed("doc_id", "b_id").withColumnRenamed("shingle", "b_shingle")
    val inter = aSide
      .join(bSide, col("doc_b") === col("b_id") && col("shingle") === col("b_shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("cont_a", col("n_common") / col("sz_a"))
      .withColumn("cont_b", col("n_common") / col("sz_b"))
      .select("doc_a", "doc_b", "n_common", "sz_a", "sz_b", "cont_a", "cont_b")
  }

  /** Exact Jaccard restricted to a given candidate pair set — the verify
    * stage of LSH dedup. The candidate set is small (banding already
    * filtered), so it broadcasts against the shingle table and only the
    * candidates' intersections are ever materialized, instead of the full
    * co-occurrence pair space. Output schema matches [[jaccardPairs]].
    */
  def jaccardForCandidates(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = broadcast(cands.select(col("doc_a"), col("doc_b")))
    val aSide = pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
    val bSide = sh.withColumnRenamed("doc_id", "b_id").withColumnRenamed("shingle", "b_shingle")
    val inter = aSide
      .join(bSide, col("doc_b") === col("b_id") && col("shingle") === col("b_shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_common"))
      .withColumn("jaccard", col("n_common") / col("n_union"))
      .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
  }

  /** As [[jaccardForCandidates]] but EVERY candidate pair survives, even
    * ones whose shingle sets are disjoint (n_common 0, jaccard 0.0) — the
    * verify stage for an LSH probe whose false-candidate rate is itself
    * part of the contract (d18): a minhash component collision between
    * unrelated docs must surface as a measured flag-0 row, not silently
    * vanish because the intersection join found nothing to join. The
    * intersection stays candidates-only; zero-overlap pairs get their
    * n_union from the per-doc sizes alone.
    */
  def jaccardForAllCandidates(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = cands.select(col("doc_a"), col("doc_b"))
    val aSide = broadcast(pairs).join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
    val bSide = sh.withColumnRenamed("doc_id", "b_id").withColumnRenamed("shingle", "b_shingle")
    val inter = aSide
      .join(bSide, col("doc_b") === col("b_id") && col("shingle") === col("b_shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      // inter is candidates-bounded: broadcast the RIGHT side (the only
      // legal build side of a left outer join)
      .join(broadcast(inter), Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_common"))
      .withColumn("jaccard", col("n_common") / col("n_union"))
      .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
  }

  /** Banded-LSH candidate pairs from a k-component MinHash signature with
    * band width 2: docs agreeing on any (m_{2i}, m_{2i+1}) band.
    * Output: doc_a < doc_b, n_shared_bands.
    */
  def minhashBandCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      k: Int): DataFrame =
    minhashBandCandidatesFromShingles(shingleSet(docs, idCol, textCol, shingleN), k)

  /** As [[minhashBandCandidates]] but over a pre-built (doc_id, shingle)
    * frame, so callers computing Jaccard too share one shingle explode.
    */
  /** Per-doc k-component minhash signatures from the EXPLODED shingle
    * set in one aggregation pass, with all k components sliced from ONE
    * md5 per shingle (5 hex chars = 20 bits each): k independent
    * min-hashes at 1/k of the hashing cost. (The array-HOF form
    * re-derived the shingle array per component once CollapseProject
    * inlined the alias — measured ~3x slower at sf0.1.) Returns
    * (doc_id, m0..m{k-1}).
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    require(k * 5 <= 32, "k*5 hex chars must fit one md5")
    val md5h = md5(concat(lit("0|"), col("shingle")).cast("binary"))
    sh.groupBy(col("doc_id"))
      .agg(
        min(substring(md5h, 1, 5)).as("m0"),
        (1 until k).map(i => min(substring(md5h, i * 5 + 1, 5)).as(s"m$i")): _*)
  }

  /** (doc_id, band_idx, band_hash) rows of the width-2 banding over a
    * k-component signature — the unit the LSH index stores. Exposed so
    * the incremental path (d18) can persist the corpus half and probe it
    * with increment bands, sharing one construction with the batch
    * candidate join below.
    */
  def minhashBands(sh: DataFrame, k: Int): DataFrame = {
    require(k % 2 == 0, "band width 2 needs an even k")
    val sig = minhashSignatures(sh, k)
    sig.select(
      col("doc_id"),
      posexplode(array((0 until k / 2).map(b =>
        md5(concat(col(s"m${2 * b}"), lit("|"), col(s"m${2 * b + 1}")).cast("binary"))): _*))
        .as(Seq("band_idx", "band_hash")))
  }

  /** Width-ONE banding: each of the k signature components is its own
    * band (band_hash = the component). The loosest banding — candidate
    * recall is highest and the false-candidate rate is deliberately
    * non-trivial, which is what the incremental near-dup gate (d18) wants
    * to measure: sub-threshold band collisions are the operator's
    * precision surface, so the banding must actually produce some.
    */
  def minhashBands1(sh: DataFrame, k: Int): DataFrame = {
    val sig = minhashSignatures(sh, k)
    sig.select(
      col("doc_id"),
      posexplode(array((0 until k).map(i => col(s"m$i")): _*)).as(Seq("band_idx", "band_hash")))
  }

  def minhashBandCandidatesFromShingles(sh: DataFrame, k: Int): DataFrame = {
    val bands = minhashBands(sh, k)
    bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 16-bit SimHash per document over the token multiset. */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val withV = toks.withColumn("v16", expr(TextAnalysis.simhashTokenValueSql))
    val contribs = withV.select(col("doc_id") +: TextAnalysis.simhashContribs(col("v16")): _*)
    val sums = contribs
      .groupBy(col("doc_id"))
      .agg(sum(col("c0")).as("s0"), (1 until 16).map(j => sum(col(s"c$j")).as(s"s$j")): _*)
    val hash = (0 until 16)
      .map(j => when(col(s"s$j") > 0, lit(1L << (15 - j))).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), hash.as("simhash16"))
  }

  /** Exact long-substring overlap pairs (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the suffix-array exact
    * substring family, re-expressed as k-token shingle matching so it
    * shuffles instead of building a global index): two docs pair iff they
    * contain an identical k-token run (k ~ 15-50 in production; 3-gram
    * Jaccard cannot see the difference between scattered shared phrases
    * and one long verbatim copy — this operator can).
    *
    * DETECTION BOUND (SubstringBoundarySpec pins every clause): shingles
    * slide at STRIDE 1, so a shared run of L >= k whole whitespace
    * tokens yields exactly L-k+1 shared grams — the bound is the exact
    * >= k of the suffix-array family at TOKEN granularity (not the
    * >= 2k-1 a chunked k-aligned scheme would give), n_shared doubles
    * as a run-length witness, and the two deliberate trades are (a) the
    * detection unit is the whole token — character overlap off a token
    * boundary only counts its fully shared tokens — and (b) the df cap
    * below forfeits runs whose every gram is boilerplate-hot. Grams are
    * md5-hashed BEFORE the shuffle so shuffle rows stay 32 hex chars at
    * any k, and grams shared by more than `maxDf` docs are dropped first
    * ([[Similarity.capBySize]] — one window pass; a boilerplate k-gram
    * shared by millions of docs would otherwise make the pair join
    * quadratic in its df). Sizes are computed over the SAME capped frame
    * so containment stays a proper ratio. Output: doc_a < doc_b,
    * n_shared (distinct shared k-grams), containment =
    * n_shared / min(|grams_a|, |grams_b|).
    */
  def substringOverlapPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxDf: Long): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol, k)
      .select(col("doc_id"), md5(col("shingle").cast("binary")).as("gh"))
    val cool = Similarity.capBySize(sh, "gh", maxDf)
    val sizes = cool.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cool
      .as("a")
      .join(cool.as("b"), col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("containment", col("n_shared") / least(col("sz_a"), col("sz_b")))
      .select("doc_a", "doc_b", "n_shared", "containment")
  }

  /** Keep-one policy over duplicate groups: mark all but the canonical
    * (min-id) member of each group for removal.
    */
  def markDuplicates(docs: DataFrame, idCol: String, groupCol: Column): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol))
    docs.withColumn("is_duplicate", row_number().over(w) > 1)
  }
}
