package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.{DocQueries, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic tests for the training-data pipeline operators. Engine-vs-
  * oracle correctness is covered by the Verify gate; these pin the
  * LIBRARY-level contracts: dedup policies, LSH candidate quality,
  * similarity ranking invariants.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("exact dedup groups duplicates and markDuplicates keeps one per group") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length == 2)
    val dupGroup = groups.find(_.getLong(1) == 2L).get
    assert(dupGroup.getLong(2) == 1L) // canonical = min id
    val marked = Dedup
      .markDuplicates(docs, "doc_id", md5(col("text").cast("binary")))
      .filter(col("is_duplicate"))
      .select("doc_id").as[Long].collect()
    assert(marked.toSeq == Seq(2L))
  }

  test("jaccard pairs: identical docs score 1.0, disjoint docs produce no pair") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"), // identical to 1
      (3L, "p q r s t") // disjoint
    ).toDF("doc_id", "text")
    val pairs = Dedup
      .jaccardPairs(Dedup.shingleSet(docs, "doc_id", "text", 3))
      .collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L)
    assert(p.getDouble(p.fieldIndex("jaccard")) == 1.0)
  }

  test("minhash-LSH candidates recover the planted near-dups found by full jaccard") {
    val d2 = DocQueries.jaccardNearDup(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val d3 = DocQueries.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(d3.subsetOf(d2), "LSH must never invent pairs the exact measure rejects")
    // recall on this fixture: banding (3 bands of width 2) over jac>=0.5 pairs
    assert(d3.size >= (d2.size * 0.8).toInt, s"LSH recall too low: ${d3.size}/${d2.size}")
  }

  test("simhash: high-jaccard pairs land within small hamming distance") {
    val sig = Dedup.simhash16(Tables.documents(spark, sf), "doc_id", "text")
    val pairs = DocQueries.jaccardNearDup(spark, sf).filter(col("jaccard") >= 0.9)
    val joined = pairs
      .join(sig.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash16", "h_a"), "doc_a")
      .join(sig.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash16", "h_b"), "doc_b")
      .select(bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .as[Int].collect()
    assert(joined.nonEmpty)
    assert(joined.forall(_ <= 6), s"hamming distances: ${joined.mkString(",")}")
  }

  test("brute-force top-k: k rows per query, ranks dense, cosine non-increasing") {
    val topk = VectorQueries.cosineTopK(spark, sf).collect()
    val perQuery = topk.groupBy(_.getLong(0))
    assert(perQuery.size == 64) // fixed 64-id query set (O(1) broadcast side)
    perQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to 5L))
      val cosines = sorted.map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("sign-LSH ANN: every neighbor shares the query's bucket and is imperfect-but-sane") {
    val ann = VectorQueries.annSignLsh(spark, sf)
    val base = Tables.embeddings(spark, sf)
      .select(
        col("vec_id"),
        Similarity.signBucket(Similarity.quantize(col("embedding")), 8).as("bucket"))
    val bad = ann
      .join(base.withColumnRenamed("vec_id", "query_id").withColumnRenamed("bucket", "qb"), "query_id")
      .filter(col("bucket") =!= col("qb"))
    assert(bad.count() == 0)
  }

  test("binary rerank: planted twin wins at hamming 0; output shape and order law hold") {
    // a duplicated vector signs identically under EVERY hyperplane, so
    // the twin sits at hamming 0, survives any shortlist, and the exact
    // rescore puts it at rank 1 with cosine 1.0 — the BQ contract that
    // quantization can attenuate recall but never lose an exact match
    val base = Tables.embeddings(spark, sf).limit(200)
    val twin = base
      .filter(col("vec_id") < 4)
      .withColumn("vec_id", col("vec_id") + lit(100000L))
    val planes = Similarity.hyperplanes(7L, 62, 64)
    val res = Similarity
      .binaryRerankTopK(
        base.unionByName(twin), "vec_id", "embedding",
        col("vec_id") < 4, planes, 62, 20, 5)
      .collect()
    val perQuery = res.groupBy(_.getLong(0))
    assert(perQuery.keySet == Set(0L, 1L, 2L, 3L))
    perQuery.foreach { case (q, rows) =>
      val top = rows.minBy(_.getLong(2))
      assert(top.getLong(1) == q + 100000L, s"query $q must retrieve its planted twin first")
      assert(top.getLong(3) == 0L, "an identical vector must sit at hamming 0")
      assert(math.abs(top.getDouble(4) - 1.0) < 1e-12)
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to 5L))
      val cosines = sorted.map(_.getDouble(4)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("sign-LSH ANN cap: a degenerate all-positive corpus yields zero candidates, not Θ(n²)") {
    // Every all-positive vector shares the ONE 8-bit bucket; with the cap
    // below the corpus size the bucket is dropped wholesale, so the probe
    // self-join sees no rows at all (bounded work, approximate recall —
    // the documented contract, mirrored by the v2 oracle's QUALIFY).
    val rnd = new scala.util.Random(13)
    def vec(): Array[Float] =
      Array.fill(64)((0.1 + 0.9 * rnd.nextDouble()).toFloat)
    val emb = (0 until 40).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")
    val capped = Similarity.signBucketTopK(emb, "vec_id", "embedding", 8, 1, maxBucket = 16L)
    assert(capped.count() == 0, "hot bucket must be excluded from the ANN probe")
    val uncapped = Similarity.signBucketTopK(emb, "vec_id", "embedding", 8, 1, maxBucket = 1000L)
    assert(uncapped.count() == 40, "below the cap every vector keeps its top-1 neighbor")
  }

  test("LSH-blocked embedding near-dup: subset of exact, recall >= 0.9 (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = VectorQueries.queries("d5_embed_neardup")(spark, sf01)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val blocked = VectorQueries.queries("d6_embed_neardup_lsh")(spark, sf01)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact), "blocking must never invent pairs the exact verify rejects")
    assert(
      blocked.size >= math.ceil(exact.size * 0.9).toInt,
      s"blocked recall too low: ${blocked.size}/${exact.size}")
  }

  test("random-hyperplane near-dup (d8): subset of exact, recall >= 0.9 (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = VectorQueries.queries("d5_embed_neardup")(spark, sf01)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val rp = VectorQueries.queries("d8_embed_neardup_rp")(spark, sf01)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(rp.subsetOf(exact), "RP blocking must never invent pairs the exact verify rejects")
    assert(
      rp.size >= math.ceil(exact.size * 0.9).toInt,
      s"RP recall too low: ${rp.size}/${exact.size}")
  }

  test("random hyperplanes are deterministic ±1 and lift the bits*tables <= dim ceiling") {
    val p1 = Similarity.hyperplanes(42L, 8, 16)
    val p2 = Similarity.hyperplanes(42L, 8, 16)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq, "pure function of (seed, k, j)")
    assert(p1.flatten.forall(v => v == 1L || v == -1L))
    assert(p1.flatten.count(_ == 1L) > 8 && p1.flatten.count(_ == -1L) > 8, "both signs present")
    // The ceiling, concretely: at n = 10^12 the derived b = bitlength(n/32)
    // = 35 leaves the disjoint-slice family ONE table (64/35 = 1) — recall
    // collapses; the RP family keeps all 16 tables at the capped b.
    val hugeBits = Similarity.autoBits(1000000000000L, 32L, 4)
    assert(hugeBits >= 32)
    assert(64 / hugeBits <= 1, "disjoint slices are down to one table at 10^12 corpus")
    val rpBits = math.min(16, hugeBits)
    assert(rpBits == 16) // b capped, T untouched: 16 independent tables remain
  }

  test("SemDeDup (d9): marked dups are exactly higher ids of in-cell exact pairs (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val exactBs = VectorQueries.queries("d5_embed_neardup")(spark, sf01)
      .select("vec_b").as[Long].collect().toSet
    val d9 = VectorQueries.queries("d9_semdedup")(spark, sf01).cache()
    val marked = d9.filter(col("is_dup") === 1L).select("vec_id").as[Long].collect().toSet
    assert(marked.nonEmpty, "the gate corpus has near-dups; cluster scoping should find some")
    assert(
      marked.subsetOf(exactBs),
      s"every marked dup must be the higher id of a true near-dup pair: ${marked.diff(exactBs)}")
    // keep-one policy: lowest id of every pair is never marked purely by
    // being in a pair (it can only be marked via a pair where IT is vec_b)
    val n = Tables.embeddings(spark, sf01).count()
    assert(d9.count() == n, "no cell exceeds the cap at gate scale - every vector present")
  }

  test("d7 operating point (threshold .97, b=16/T=4): planted near-dups recalled exactly") {
    // Mixed-sign vectors with |component| >= 0.1 and sign-preserving noise
    // 0.005: a planted copy agrees with its source on EVERY sign bit, so it
    // collides in all 4 tables deterministically; random pairs sit near
    // cosine 0 and cannot cross 0.97. This is the non-vacuous twin of the
    // d7 parquet gate (that corpus has no pairs above 0.9 at all).
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] =
      Array.fill(64)((0.1 + 0.9 * rnd.nextDouble()) * (if (rnd.nextBoolean()) 1 else -1))
        .map(_.toFloat)
    val bases = (0 until 50).map(i => (i.toLong, vec()))
    val copies = (0 until 10).map { i =>
      (100L + i, bases(i)._2.map(x => x + (if (x > 0) 0.005f else -0.005f)))
    }
    val emb = (bases ++ copies).toDF("vec_id", "embedding")
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.97)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val blocked = Similarity.nearDupPairsBlocked(emb, "vec_id", "embedding", 0.97, 16, 4, 256L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.size == 10, s"expected the 10 planted pairs, got $exact")
    assert(blocked == exact, s"selective-LSH recall must be 1.0 on sign-identical pairs: $blocked vs $exact")
  }

  test("hot-bucket cap drops degenerate buckets; survivors bounded by the cap") {
    // All-positive vectors: every vector lands in the ONE table-0 bucket
    // (bits=16, tables=1). Uncapped, that bucket routes all pairs (blocked
    // == exact); capped below the corpus size it is dropped wholesale.
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] =
      Array.fill(64)((0.1 + 0.9 * rnd.nextDouble()).toFloat)
    val emb = (0 until 30).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val uncapped = Similarity.nearDupPairsBlocked(emb, "vec_id", "embedding", 0.45, 16, 1, 1000L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(uncapped == exact, "single shared bucket must route every exact pair")
    val capped = Similarity.nearDupPairsBlocked(emb, "vec_id", "embedding", 0.45, 16, 1, 8L)
    assert(capped.count() == 0, "a bucket over the cap must be excluded from candidates")
    val cooled = Similarity.dropHotBuckets(
      Similarity.signBucketsExploded(emb, "vec_id", "embedding", 16, 1), 8L)
    assert(cooled.count() == 0)
  }

  test("ANN recall@1 (sf0.01): trained IVF beats untrained seeds; both measured vs exact") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("rnk") === 1)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val exact = top1(Similarity.bruteForceTopK(emb, "vec_id", "embedding", lit(true), 1))
    def recall(ann: Map[Long, Long]): Double =
      exact.count { case (q, v) => ann.get(q).contains(v) }.toDouble / exact.size
    val trained = recall(top1(Similarity.ivfTopK(emb, "vec_id", "embedding", 16, 1, 2)))
    val untrained = recall(top1(Similarity.ivfTopK(emb, "vec_id", "embedding", 16, 1, 0)))
    val signLsh = recall(top1(Similarity.signBucketTopK(emb, "vec_id", "embedding", 8, 1)))
    val multiProbe = recall(top1(VectorQueries.queries("v4_ann_ivf_multiprobe")(spark, sf01)))
    val singleProbe = recall(top1(VectorQueries.queries("v3_ann_ivf")(spark, sf01)))
    info(f"recall@1 exact-baseline=1.0 ivf-trained=$trained%.3f ivf-untrained=$untrained%.3f " +
      f"sign-lsh=$signLsh%.3f nprobe1=$singleProbe%.3f nprobe4=$multiProbe%.3f")
    // The corpus is near-random (no planted NN structure), so nprobe=1
    // recall is intrinsically modest; the gates pin the ORDERING (training
    // helps, probing more cells helps) and floors that catch regressions.
    assert(trained >= untrained, f"Lloyd training should not hurt recall: $trained%.3f < $untrained%.3f")
    assert(trained >= 0.25, f"trained IVF recall@1 regressed: $trained%.3f")
    assert(
      multiProbe > singleProbe,
      f"nprobe=4 must beat nprobe=1 on a boundary-heavy corpus: $multiProbe%.3f vs $singleProbe%.3f")
    assert(multiProbe >= 0.5, f"multi-probe recall@1 regressed: $multiProbe%.3f")
  }

  test("char-ngram language heuristic separates obvious english from german text") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      "the cat and the dog sing of things",
      "ein schönes haus in der schweiz machen").toDF("text")
    val scored = df.select(
      TextAnalysis.charNgramScore(col("text"), TextAnalysis.charTrigramProfiles.toMap.apply("en")).as("en"),
      TextAnalysis.charNgramScore(col("text"), TextAnalysis.charTrigramProfiles.toMap.apply("de")).as("de"))
      .as[(Long, Long)].collect()
    assert(scored(0)._1 > scored(0)._2, s"english text misscored: ${scored(0)}")
    assert(scored(1)._2 > scored(1)._1, s"german text misscored: ${scored(1)}")
  }

  test("quality + langid + fingerprint produce total, deterministic outputs") {
    assert(DocQueries.qualityScore(spark, sf).filter(col("quality_score").isNull).count() == 0)
    val langs = DocQueries.langId(spark, sf).select("lang_pred").distinct().as[String].collect()
    assert(langs.forall(TextAnalysis.langProfiles.map(_._1).contains))
    assert(DocQueries.docFingerprint(spark, sf).filter(col("fingerprint").isNull).count() == 0)
  }

  test("banded containment (t19b) misses an asymmetric subset pair that exact t19 catches") {
    // Doc B is a 5-token snippet of the 60-token doc A: containment_b =
    // 1.0 but Jaccard ≈ 3/56 — the operating-point loss t19b declares
    // and t19r pins. These texts are chosen so ALL THREE width-2 bands
    // of the 6-component signature disagree (deterministic md5 math, not
    // luck), so the banding yields no candidate while the exact pair
    // join finds the pair at containment 1.0.
    val a = "group window column join scan agg batch table part big hash query agg vector order " +
      "data agg batch key key batch dup batch part key agg table query big window dup scan scan " +
      "query window agg query query join agg dup agg part the column filter key column part big " +
      "query filter part table slow customer big query query scan"
    val b = "hash query agg vector order"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val sh = Dedup.shingleSet(docs, "doc_id", "text", 3)
    val exact = Dedup
      .containmentPairs(sh)
      .filter(greatest(col("cont_a"), col("cont_b")) >= 0.8)
      .collect()
    assert(exact.length == 1 && exact(0).getDouble(6) == 1.0, s"exact missed: ${exact.toSeq}")
    val cands = Dedup.minhashBandCandidatesFromShingles(sh, 6)
    assert(cands.isEmpty, s"banding unexpectedly produced candidates: ${cands.collect().toSeq}")
    assert(Dedup.containmentForCandidates(cands, sh).isEmpty)
  }
}
