package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k via a broadcast of the query
  *     side — the baseline, O(|queries| * n);
  *   - [[signBucketTopK]]: sign-LSH (axis-aligned hyperplanes on the first
  *     b dimensions) bucketing, so candidate generation is an equi-join on
  *     the bucket key — the scale path: shuffle by bucket instead of a
  *     cross join. Recall is approximate by construction.
  *
  * Arithmetic: components are quantized to exact integer micros before the
  * dot product, so sums are order-independent integers and the derived
  * cosine double is bit-identical across engines/partitionings (the same
  * trick FeatureQueries uses for money). Norms/dots stay far below 2^53.
  *
  * Multi-pass operators ([[nearDupPairsBlocked]], [[ivfTopK]]) persist the
  * prepared (vec_id, qv, nrm) projection (MEMORY_AND_DISK): candidate
  * generation and verify both read it, and at corpus scale one spill-able
  * materialization is cheaper than re-scanning the source parquet per pass.
  */
object Similarity {

  /** Quantized vector: round(double(x) * 1e6) per component. */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * 1000000).cast("long"))

  /** Scale-derived LSH bit width: the smallest b >= floorBits with
    * n / targetBucket < 2^b, i.e. the bit length of n/targetBucket — so the
    * expected bucket size stays ~targetBucket as the corpus grows instead
    * of buckets absorbing n/2^const vectors (the round-2 scale-killer: a
    * constant bucket count makes every in-bucket self-join quadratic
    * again). Integer-exact (no float log2), so the DuckDB oracle reproduces
    * it verbatim via length(bin(n // target)).
    */
  def autoBits(n: Long, targetBucket: Long, floorBits: Int): Int = {
    val x = math.max(1L, n / targetBucket)
    math.max(floorBits, 64 - java.lang.Long.numberOfLeadingZeros(x))
  }

  /** Scale-derived IVF cell count: floor(sqrt(n)), clamped to
    * [floorCells, capCells] — the classic IVF operating point. Cells ~
    * sqrt(n) balances the two costs that pull in opposite directions:
    * centroid assignment is O(n * cells * d) (so cells must grow far
    * slower than n — the round-3 derivation cells = n/32 made assignment
    * O(n^2/32), a scale-killer) while the in-cell probe join is
    * O(n * n/cells), so cells must still grow with n. sqrt(n) gives
    * O(n^1.5) total instead of O(n^2), and `capCells` bounds the broadcast
    * centroid table absolutely (65536 * 64 longs ~ 32 MB). The clamp also
    * guards the Int overflow a raw toInt invites at 100 TB corpus counts.
    */
  def autoCells(n: Long, floorCells: Int, capCells: Int): Int =
    math.min(capCells.toLong, math.max(floorCells.toLong, math.sqrt(n.toDouble).toLong)).toInt

  /** Training-sample rate divisor for k-means: keep ~perCell sample
    * vectors per centroid (sample size ~ cells * perCell), so Lloyd cost
    * is bounded by the CELL count, not the corpus; [[trainSample]] draws
    * the ~1/stride subset by id hash.
    */
  def trainStride(n: Long, nCells: Int, perCell: Long): Long =
    math.max(1L, n / (nCells.toLong * perCell))

  /** ~1/stride hash sample of the prepared frame for k-means training.
    * Keyed on md5 of the id, NOT `vec_id % stride` — an id-modulo filter
    * assumes dense ids, and a post-dedup / post-sample corpus (the normal
    * input downstream of this very pipeline) can have ids that never hit
    * a residue class, silently starving the training set. The md5 draw is
    * uniform for ANY id distribution and engine-portable (the oracle
    * reproduces it via `('0x' || substr(md5(...), 1, 8))::BIGINT % s`).
    */
  def trainSample(base: DataFrame, stride: Long): DataFrame =
    if (stride > 1L) base.filter(Sketches.hash32("kmtrain", col("vec_id")) % stride === 0)
    else base

  /** Exact integer self dot product (squared norm). */
  def normSq(q: Column): Column = dot(q, q)

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd expression; the composable HOF form
    * (`aggregate(zip_with(...))`) measured ~10x slower on the all-pairs
    * hot path.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.LongDotProduct.dotLong(a, b)

  /** Cosine from exact integer dot/norms (identical formula to oracle). */
  def cosine(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))

  /** Embeddings with quantized vector + squared norm. */
  def prepared(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    emb
      .withColumn("qv", quantize(col(embCol)))
      .withColumn("nrm", normSq(col("qv")))
      .select(col(idCol).as("vec_id"), col("qv"), col("nrm"))

  /** [[prepared]], persisted for multi-pass consumers (count + bucket +
    * verify sides read it; the CacheManager dedups identical plans, so
    * repeated calls share one materialization). Lifetime: the block lives
    * until the session's harness scope ends — see [[graft.CacheScope]]
    * for why a lazy builder cannot unpersist its own frame and how batch
    * consumers reclaim it.
    */
  private def preparedCached(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    prepared(emb, idCol, embCol).persist(StorageLevel.MEMORY_AND_DISK)

  /** Keep only rows whose `key` group has at most `cap` members — ONE
    * hash exchange on `key` (a window count), which downstream group-bys /
    * joins keyed on the same column reuse, instead of a separate
    * count-aggregate + anti-join pass.
    */
  def capBySize(df: DataFrame, key: String, cap: Long): DataFrame =
    df.withColumn("__grp_sz", count(lit(1)).over(Window.partitionBy(col(key))))
      .filter(col("__grp_sz") <= cap)
      .drop("__grp_sz")

  /** Exact cosine top-k for a query subset (broadcast the small side).
    *
    * The per-query top-k is a bounded-heap [[graft.functions.BottomKAgg]]
    * on key (-cosine, vec_id), NOT a rank window: a window partitioned by
    * query_id would shuffle the full |queries| x n scored frame onto
    * |queries| partitions and sort a corpus-sized run in each — at 100x
    * data that is a billions-of-rows sort on a handful of tasks. The
    * aggregate reduces every input partition to <= k pairs per query
    * map-side, shuffles O(|queries| * k) pairs, and sorts nothing. The
    * negation is exact (IEEE sign flip), so ranks and the recovered
    * cosine are bit-identical to the window form the DuckDB oracle runs.
    */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val base = prepared(emb, idCol, embCol)
    val queries = broadcast(
      base
        .filter(queryPred)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm")))
    base
      .join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(dot(col("q_qv"), col("qv")), col("q_nrm"), col("nrm")))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomKAgg.bottomK(negate(col("cosine")), col("vec_id"), k).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(
        col("query_id"),
        col("e.id").as("vec_id"),
        col("e.rnk").as("rnk"),
        negate(col("e.key")).as("cosine"))
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein,
    * SIGIR 1998): greedily select `selectK` results per query maximizing
    * relevance MINUS the max similarity to anything already selected —
    * the diversity-aware retrieval/sampling shape (λ=0.5, where argmax of
    * λ·rel − (1−λ)·maxSim reduces to argmax of rel − maxSim).
    *
    * Scale shape: the EXPENSIVE stage is the distributed candidate cut
    * (brute-force top-`candK` per query against the full corpus — the v1
    * plan); the greedy re-rank then runs over the bounded candidate frame
    * (|queries|·candK rows) and its pairwise-sim frame (·candK²), both
    * persisted and broadcast-joined, with selectK−1 deterministic
    * argmax-window rounds composed lazily — no driver-side loop over
    * data, no action per round. Every comparison is on doubles derived
    * from the same integer dot/norm formula both engines share, with
    * vec_id tiebreaks, so selection is total-order deterministic.
    *
    * Output: (query_id, rnk 1..selectK, vec_id, rel, maxsim) where maxsim
    * is the max similarity to the previously selected set at selection
    * time (NULL for rnk 1).
    */
  def mmrTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      candK: Int,
      selectK: Int): DataFrame = {
    val base = prepared(emb, idCol, embCol)
    val queries = broadcast(
      base
        .filter(queryPred)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm")))
    // candidate cut via the bounded-heap bottom-k aggregate (the
    // bruteForceTopK plan shape — map-side partials, no corpus-sized
    // per-query sort), then one keyed join to re-attach (qv, nrm) to the
    // |queries| * candK survivors (AQE broadcasts the tiny id side)
    val candIds = base
      .join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("rel", cosine(dot(col("q_qv"), col("qv")), col("q_nrm"), col("nrm")))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomKAgg.bottomK(negate(col("rel")), col("vec_id"), candK).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.id").as("vec_id"), negate(col("e.key")).as("rel"))
    val wRel = Window.partitionBy(col("query_id")).orderBy(col("rel").desc, col("vec_id"))
    val cand = candIds
      .join(base, "vec_id")
      .select(col("query_id"), col("vec_id"), col("rel"), col("qv"), col("nrm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = cand
      .as("a")
      .join(
        cand.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.query_id").as("query_id"),
        col("a.vec_id").as("pa"),
        col("b.vec_id").as("pb"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candSlim = cand.select("query_id", "vec_id", "rel")
    val sel1 = candSlim
      .withColumn("rn", row_number().over(wRel))
      .filter(col("rn") === 1)
      .select(
        col("query_id"),
        lit(1L).as("rnk"),
        col("vec_id"),
        col("rel"),
        lit(null).cast("double").as("maxsim"))
    // each greedy round reads the running `state` TWICE (the pick's window
    // + the next state's join through the pick), so composing the rounds
    // lazily DOUBLES the plan per round — the beamSearch disease (round-12
    // fix): the composed v9 plan measured 11,628 formatted lines / 981
    // Exchanges / 813 parquet scans for 4 rounds. `state` is bounded
    // (|queries| * candK rows, corpus-independent), so localCheckpoint per
    // round keeps the plan LINEAR in rounds at one tiny job each — the
    // graph-rounds convention.
    var state = candSlim
      .join(sel1.select(col("query_id"), col("vec_id").as("sel_id")), "query_id")
      .filter(col("vec_id") =!= col("sel_id"))
      .join(
        broadcast(pairs.withColumnRenamed("pa", "vec_id").withColumnRenamed("pb", "sel_id")),
        Seq("query_id", "vec_id", "sel_id"))
      .select(col("query_id"), col("vec_id"), col("rel"), col("sim").as("maxsim"))
      .localCheckpoint()
    var out = sel1
    val wMmr = Window
      .partitionBy(col("query_id"))
      .orderBy((col("rel") - col("maxsim")).desc, col("vec_id"))
    for (r <- 2 to selectK) {
      val pick = state
        .withColumn("rn", row_number().over(wMmr))
        .filter(col("rn") === 1)
        .select(col("query_id"), lit(r.toLong).as("rnk"), col("vec_id"), col("rel"), col("maxsim"))
      out = out.unionByName(pick)
      if (r < selectK) {
        state = state
          .join(pick.select(col("query_id"), col("vec_id").as("sel_id")), "query_id")
          .filter(col("vec_id") =!= col("sel_id"))
          .join(
            broadcast(
              pairs.withColumnRenamed("pa", "vec_id").withColumnRenamed("pb", "sel_id")),
            Seq("query_id", "vec_id", "sel_id"))
          .select(
            col("query_id"),
            col("vec_id"),
            col("rel"),
            greatest(col("maxsim"), col("sim")).as("maxsim"))
          .localCheckpoint()
      }
    }
    out
  }

  /** Sign-LSH bucket key: the sign bits of the first b QUANTIZED
    * components (quantization preserves sign, and deriving buckets from
    * `qv` lets every consumer share the one prepared frame instead of
    * re-reading the raw embedding column).
    */
  def signBucket(qv: Column, b: Int): Column =
    concat((1 to b).map(i =>
      when(element_at(qv, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** One bucket key per hash table: table t reads the sign bits of
    * components [t*b+1, t*b+b] (disjoint component slices, so tables are
    * independent). The table index is prefixed into the key, so a single
    * equi-join on the key string covers all tables at once.
    */
  def signBuckets(qv: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      concat(
        lit(s"$t:") +: (1 to bits).map(i =>
          when(element_at(qv, t * bits + i) >= 0, lit("1")).otherwise(lit("0"))): _*)
    }: _*)

  /** Default hot-bucket / hot-cell caps (see [[dropHotBuckets]]). */
  val DefaultMaxBucket: Long = 256L
  val DefaultMaxCell: Long = 4096L

  /** Top-k in-bucket neighbor per vector (approximate ANN; vectors alone
    * in their bucket yield no row — that is the LSH contract). Buckets
    * holding more than `maxBucket` vectors are dropped BEFORE the
    * self-join ([[capBySize]]): one degenerate sign pattern (e.g. an
    * all-positive corpus) would otherwise collapse everything into a
    * single bucket and make the join Θ(n²). Vectors whose bucket is
    * dropped emit nothing — approximate recall, mirrored by the oracle.
    */
  def signBucketTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      bits: Int,
      k: Int,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val base = prepared(emb, idCol, embCol)
      .withColumn("bucket", signBucket(col("qv"), bits))
    val cool = capBySize(base, "bucket", maxBucket)
    val paired = cool
      .as("a")
      .join(cool.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("vec_id"),
        col("a.bucket").as("bucket"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    paired
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "bucket", "rnk", "cosine")
  }

  /** Binary-quantization ANN — the vector-DB "BQ + rescore" shape (the
    * public Faiss IndexBinaryFlat / BQ-rescoring pattern): every corpus
    * vector is compressed to a `bits`-bit SIGN SIGNATURE packed into one
    * BIGINT (bit i = sign of the exact integer dot with md5-derived ±1
    * hyperplane i — [[hyperplanes]]), the query scans the SIGNATURE
    * column by Hamming distance (`bit_count(sig ^ q_sig)` — one xor +
    * popcount per candidate instead of a d-component float dot, the
    * 32–96× compression that makes a full scan affordable), keeps a
    * `shortlist` per query, and only the shortlist pays the exact
    * integer-cosine rerank against the full vectors.
    *
    * Scale shape: pass 1 broadcasts the |queries| 8-byte query signatures
    * against the (vec_id, sig) projection — 16 bytes/row regardless of
    * embedding dimension, so the scan reads ~d/2 times less than v1's
    * brute force and shuffles only (query, hamming) pairs; pass 2 joins
    * |queries|·shortlist ids back to the vectors (AQE broadcasts the tiny
    * shortlist side). `bits <= 62` keeps the packed signature's bit sum
    * strictly inside BIGINT in both engines (no sign-bit overflow
    * ambiguity to reproduce). Ties break on (hamming, vec_id) and
    * (cosine desc, vec_id), so the result is total-order deterministic
    * and the DuckDB oracle reproduces it bit-for-bit from the same plane
    * literals.
    */
  def binaryRerankTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      planes: Array[Array[Long]],
      bits: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(bits >= 1 && bits <= 62, s"packed signature needs 1..62 bits, got $bits")
    require(planes.length >= bits, s"need $bits hyperplanes, got ${planes.length}")
    val base = preparedCached(emb, idCol, embCol)
    // one codegen'd pass over the plane matrix per row — the composed
    // 62-term CASE/dot sum blew past the whole-stage-codegen method limit
    // and dropped the WHOLE scan to interpreted evaluation (measured 4.5 s
    // vs sub-second; see graft.functions.PackedSignBits)
    val sig = graft.functions.PackedSignBits.packedSigns(col("qv"), planes.take(bits))
    val signed = base.select(col("vec_id"), sig.as("sig"))
    val qSigs = broadcast(
      signed.filter(queryPred).select(col("vec_id").as("query_id"), col("sig").as("q_sig")))
    // Hamming shortlist via the bounded-heap bottom-k aggregate
    // ([[graft.functions.BottomKAgg]] — the Faiss IndexBinaryFlat heap
    // scan): every scan partition reduces to <= shortlist pairs per query
    // BEFORE the exchange, so the shuffle carries |queries| * shortlist
    // pairs and no per-query sort exists. A query_id rank window here
    // would funnel the FULL corpus-sized scan onto |queries| partitions —
    // the plan this operator's 32-96x compression pitch forbids.
    // Hamming <= 62 is exact in the aggregate's double key.
    val short = signed
      .join(qSigs, col("vec_id") =!= col("query_id"))
      .withColumn("hamming", expr("bit_count(sig ^ q_sig)").cast("long"))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomKAgg
        .bottomK(col("hamming").cast("double"), col("vec_id"), shortlist).as("sl"))
      .select(col("query_id"), explode(col("sl")).as("e"))
      .select(col("query_id"), col("e.id").as("vec_id"), col("e.key").cast("long").as("hamming"))
    val queries = broadcast(
      base
        .filter(queryPred)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    short
      .join(queries, Seq("query_id"))
      .join(base, Seq("vec_id"))
      .withColumn("cosine", cosine(dot(col("q_qv"), col("qv")), col("q_nrm"), col("nrm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "hamming", "cosine")
  }

  /** Nearest-centroid assignment by exact integer squared distance
    * (`|a|^2 + |c|^2 - 2<a,c>`): broadcast the centroids against every
    * vector, rank by (dist2, cell) for a deterministic tie-break. The
    * broadcast side is bounded by [[autoCells]]'s capCells (it never grows
    * with the corpus), so per-vector cost is O(cells * d) flat.
    */
  private[graft] def assignCells(base: DataFrame, centroids: DataFrame, probes: Int = 1): DataFrame =
    // Bounded-heap aggregate, NOT a rank window: the window form shuffled
    // the FULL |base| x |cells| cross-join output — every candidate row
    // still carrying the d-long vector — onto |base| partitions and sorted
    // each (at sf0.1 that is ~10M rows x ~600 B through one exchange, per
    // assignment pass; at 100 TB it is the index build's wall). The cross
    // join is against a broadcast, so every vector's candidate rows are
    // partition-local and the aggregate reduces them to one buffer per
    // vector BEFORE the exchange — O(n) narrow rows shuffled, no sort.
    // Selection is identical: bottomK orders by (key, id) = (dist2, cell),
    // exactly the window's orderBy, and dist2 is exact in the double key
    // (quantized micros: |comp| <= ~2^21, d <= 64 => dist2 < 2^50 << 2^53).
    // qv/nrm are constant within a vec_id group, so first() is determinate.
    base
      .crossJoin(broadcast(centroids))
      .withColumn("dist2", col("nrm") + col("c_nrm") - lit(2L) * dot(col("qv"), col("c_qv")))
      .groupBy(col("vec_id"))
      .agg(
        first(col("qv")).as("qv"),
        first(col("nrm")).as("nrm"),
        graft.functions.BottomKAgg
          .bottomK(col("dist2").cast("double"), col("cell"), probes).as("__tk"))
      .select(col("vec_id"), col("qv"), col("nrm"), explode(col("__tk")).as("__e"))
      .select(col("vec_id"), col("qv"), col("nrm"), col("__e.id").as("cell"))

  /** Deterministic k-means (Lloyd) over the quantized vectors: seed with
    * the `nCells` training vectors of smallest md5-rank (order by
    * (md5("kmseed|" + vec_id), vec_id) — a pure function of the id, so
    * seeding is DENSITY-FREE: a post-dedup / post-sample corpus with
    * sparse or shifted ids still yields exactly nCells seeds, where the
    * previous `vec_id < nCells * stride` filter silently under-seeded),
    * then `iters` rounds of assign + component-wise integer-rounded mean.
    * All arithmetic is exact-integer or a single deterministic double
    * division + round-to-0-decimals, so the oracle reproduces the
    * centroids bit-for-bit. The seed rank is TakeOrderedAndProject over
    * (vec_id, 8-hex-hash) rows — per-partition heaps of nCells narrow
    * rows, never a global sort of the vectors. Each Lloyd round is one
    * broadcast assignment plus one (cell, component) aggregation over the
    * TRAINING set only — pass a hash sample ([[trainSample]]) so Lloyd
    * cost scales with the cell count, not the corpus.
    */
  def kmeansCentroids(train: DataFrame, nCells: Int, iters: Int): DataFrame = {
    val seedIds = train
      .select(col("vec_id"), Sampling.hashUniformHex("kmseed", col("vec_id")).as("__h"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(nCells)
      .select("vec_id")
    val seed = train
      .join(seedIds, "vec_id")
      .select(col("vec_id").as("cell"), col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    (1 to iters).foldLeft(seed) { (cent, _) =>
      val assigned = assignCells(train, cent)
      val comps = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .withColumn("comp", round(col("s").cast("double") / col("c")).cast("long"))
      comps
        .groupBy(col("cell"))
        .agg(
          transform(
            array_sort(collect_list(struct(col("pos"), col("comp")))),
            x => x.getField("comp")).as("c_qv"))
        .withColumn("c_nrm", normSq(col("c_qv")))
    }
  }

  /** IVF-style ANN: a deterministic k-means coarse quantizer
    * ([[kmeansCentroids]]), each vector assigned to its nearest centroid
    * by exact integer squared distance, then top-k search restricted to
    * the query's cell. Scale posture:
    *   - cell count ~ sqrt(n), capped ([[autoCells]] via [[ivfTopKAuto]]):
    *     assignment O(n * sqrt(n)), probe O(n / sqrt(n)) per query, and
    *     the broadcast centroid table is absolutely bounded;
    *   - k-means trains on a hash sample (`trainStride` rate via
    *     `trainSample`), so Lloyd rounds never scan the full corpus;
    *   - cells larger than `maxCell` are dropped before the probe join
    *     ([[capBySize]]) — one degenerate cell cannot make the self-join
    *     quadratic; vectors in a dropped cell emit nothing (approximate
    *     recall, mirrored by the oracle).
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nCells: Int,
      k: Int,
      lloydIters: Int = 0,
      maxCell: Long = DefaultMaxCell,
      trainStrideN: Long = 1L): DataFrame =
    ivfFromPrepared(preparedCached(emb, idCol, embCol), nCells, k, lloydIters, maxCell, trainStrideN)

  /** [[ivfTopK]] with every parameter derived from the corpus count:
    * cells = clamp(sqrt(n)) and a training-sample rate keeping ~perCell sample
    * vectors per centroid. The one count() materializes the shared
    * prepared frame, so candidate and verify passes read the cache.
    */
  def ivfTopKAuto(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      floorCells: Int,
      capCells: Int,
      k: Int,
      lloydIters: Int,
      maxCell: Long = DefaultMaxCell,
      perCell: Long = 64L,
      nProbe: Int = 1): DataFrame = {
    val base = preparedCached(emb, idCol, embCol)
    val n = base.count()
    val nCells = autoCells(n, floorCells, capCells)
    ivfFromPrepared(base, nCells, k, lloydIters, maxCell, trainStride(n, nCells, perCell), nProbe)
  }

  /** FILTERED IVF ANN — the vector-DB "filtered search" shape: one index
    * serves every metadata filter because the constraint is applied
    * INSIDE the probe join (an extra equi-key next to the cell key),
    * before ranking — never a post-top-k re-query (which under-fills k)
    * and never a per-filter index rebuild. Here the constraint is
    * same-`metaCol` (each query's neighbors must share its label — the
    * "among my category" retrieval); metadata rides the capped cell
    * assignment via one keyed join, so probe cost stays bounded by the
    * cell cap exactly as in the unfiltered path.
    */
  def ivfTopKFilteredAuto(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      metaCol: String,
      floorCells: Int,
      capCells: Int,
      k: Int,
      lloydIters: Int,
      maxCell: Long = DefaultMaxCell,
      perCell: Long = 64L): DataFrame = {
    val base = preparedCached(emb, idCol, embCol)
    val meta = emb.select(col(idCol).as("vec_id"), col(metaCol).cast("long").as("meta"))
    val n = base.count()
    val nCells = autoCells(n, floorCells, capCells)
    val train = trainSample(base, trainStride(n, nCells, perCell))
    val centroids = kmeansCentroids(train, nCells, lloydIters)
    val assigned = capBySize(assignCells(base, centroids), "cell", maxCell)
      .join(meta, "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val scored = assigned
      .as("a")
      .join(
        assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id") &&
          col("a.meta") === col("b.meta"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("vec_id"),
        col("a.cell").as("cell"),
        col("a.meta").as("meta"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("cosine"))
    topKScored(scored, k, extraKeys = Seq("meta"))
      .select("query_id", "vec_id", "cell", "meta", "rnk", "cosine")
  }

  /** IVF-probed radius retrieval — [[rangeSearch]]'s scale path: the
    * same coarse quantizer as [[ivfTopKAuto]] narrows each query to its
    * (capped) cell, and the threshold filter replaces the top-k rank —
    * per-query cost is cellSize, not corpus size, and the probe join is
    * the one equi-join. Recall loss is exactly IVF's (a true neighbor in
    * another cell), pinned by the v26 monitor the way v6 pins top-k.
    */
  def ivfRangeSearchAuto(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      threshold: Double,
      floorCells: Int,
      capCells: Int,
      lloydIters: Int,
      maxCell: Long = DefaultMaxCell,
      perCell: Long = 64L,
      nProbe: Int = 1): DataFrame = {
    val base = preparedCached(emb, idCol, embCol)
    val n = base.count()
    val nCells = autoCells(n, floorCells, capCells)
    val train = trainSample(base, trainStride(n, nCells, perCell))
    val centroids = kmeansCentroids(train, nCells, lloydIters)
    val assigned = capBySize(assignCells(base, centroids), "cell", maxCell)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // multi-probe fans out the QUERY side only (the v4 nprobe knob): a
    // radius query's recall loss is cell-boundary truncation, and probing
    // the nProbe nearest cells recovers most of it at nProbe * cellSize
    // cost per query. Each corpus vector lives in exactly one capped
    // cell, so no pair can be emitted twice.
    val queries =
      if (nProbe == 1) assigned.filter(queryPred)
      else assignCells(base.filter(queryPred), centroids, nProbe)
    queries
      .as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("vec_id"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  private def ivfFromPrepared(
      base: DataFrame,
      nCells: Int,
      k: Int,
      lloydIters: Int,
      maxCell: Long,
      trainStrideN: Long,
      nProbe: Int = 1): DataFrame = {
    val train = trainSample(base, trainStrideN)
    val centroids = kmeansCentroids(train, nCells, lloydIters)
    // the probe self-join reads the assignment on both sides — persist it
    // so the Lloyd chain runs once, not per subtree (plan-deduped with
    // semDedup's identical assignment across queries)
    val assigned = capBySize(assignCells(base, centroids), "cell", maxCell)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Multi-probe: the QUERY side fans out to its nProbe nearest cells
    // (recall at cell boundaries — the classic IVF nprobe knob); the data
    // side stays the capped single-cell assignment, so probe cost is
    // nProbe * cellSize per query, still bounded. nProbe=1 degenerates to
    // the plain in-cell search and reuses the cached assignment.
    val queries =
      if (nProbe == 1) assigned
      else assignCells(base, centroids, nProbe)
    val scored = queries
      .as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("vec_id"),
        col("b.cell").as("cell"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("cosine"))
    topKScored(scored, k)
  }

  /** Per-query top-k of an in-cell scored frame — a per-(query, cell)
    * bounded-heap partial ([[graft.functions.BottomKAgg]]) feeding one
    * BOUNDED rank window, NOT a rank window over the raw scored rows: the
    * raw frame is |queries| x nProbe x cellSize and the window shuffled
    * and sorted ALL of it by query_id; the per-cell heap collapses each
    * cell's candidates to <= k map-side (the join's cell partitioning
    * makes every (query, cell) group partition-local), so both remaining
    * exchanges carry O(|queries| * nProbe * k) rows. The union of per-cell
    * top-k contains the global top-k, the (negated-cosine, vec_id) heap
    * order equals the window's (cosine DESC, vec_id) order, and the
    * negation is an exact IEEE sign flip — selection, ranks, and the
    * recovered cosine are bit-identical (the bruteForceTopK argument).
    */
  private[graft] def topKScored(scored: DataFrame, k: Int, extraKeys: Seq[String] = Nil): DataFrame = {
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    val groupCols = (Seq("query_id", "cell") ++ extraKeys).map(col)
    val outCols = Seq("query_id", "vec_id", "cell") ++ extraKeys ++ Seq("rnk", "cosine")
    scored
      .groupBy(groupCols: _*)
      .agg(graft.functions.BottomKAgg.bottomK(negate(col("cosine")), col("vec_id"), k).as("__tk"))
      .select((groupCols :+ explode(col("__tk")).as("__e")): _*)
      .withColumn("vec_id", col("__e.id"))
      .withColumn("cosine", negate(col("__e.key")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(outCols.head, outCols.tail: _*)
  }

  /** SemDeDup-style cluster-scoped embedding dedup (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster with the IVF coarse quantizer, then compare
    * pairs ONLY within a cluster and mark the higher id of every pair at
    * cosine >= threshold as a duplicate (keep-lowest-id, the greedy
    * keep-one policy). Output: (vec_id, cell, is_dup 0/1) for every vector
    * whose cell survives the size cap.
    *
    * Scale posture is v3's: sqrt-n cells, sample-trained centroids,
    * bounded centroid broadcast, capped cells — so the in-cell pair scan
    * is O(n * cellSize) with cellSize capped, never all-pairs. Like every
    * blocked path, recall is approximate: a near-dup pair split across two
    * cells (or in a dropped hot cell) is not marked.
    */
  def semDedup(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      floorCells: Int,
      capCells: Int,
      lloydIters: Int,
      maxCell: Long = DefaultMaxCell,
      perCell: Long = 64L): DataFrame = {
    val base = preparedCached(emb, idCol, embCol)
    val n = base.count()
    val nCells = autoCells(n, floorCells, capCells)
    val stride = trainStride(n, nCells, perCell)
    val train = trainSample(base, stride)
    val centroids = kmeansCentroids(train, nCells, lloydIters)
    // both sides of the in-cell pair join and the final output read the
    // assignment — persist it so the Lloyd chain runs once, not per subtree
    val assigned = capBySize(assignCells(base, centroids), "cell", maxCell)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dups = assigned
      .as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("b.vec_id").as("dup_id"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select("dup_id")
      .distinct()
    assigned
      .join(dups, assigned("vec_id") === dups("dup_id"), "left")
      .select(
        col("vec_id"),
        col("cell"),
        when(col("dup_id").isNull, lit(0L)).otherwise(lit(1L)).as("is_dup"))
  }

  /** All pairs with cosine >= threshold (embedding near-dup detection).
    *
    * EXACT but O(n^2): the self-join has no equi-key, so Spark plans a
    * broadcast-nested-loop. Correctness baseline only — the scale path is
    * [[nearDupPairsBlocked]] (same output schema and threshold semantics,
    * approximate recall, LSH-bounded work).
    */
  def nearDupPairs(emb: DataFrame, idCol: String, embCol: String, threshold: Double): DataFrame = {
    val base = prepared(emb, idCol, embCol)
    base
      .as("a")
      .join(base.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact RADIUS retrieval (range search) — every corpus vector whose
    * cosine to the query is at least `threshold`, per query: the
    * threshold twin of [[bruteForceTopK]] and the QUERY form of
    * [[nearDupPairs]] (same scorer, query-set × corpus instead of
    * all-pairs). The query side broadcasts (bounded by contract, like
    * every query batch here); the corpus side is ONE linear scan with no
    * exchange anywhere — the output is result-sized, so unlike top-k no
    * per-query aggregate is even needed. The RAG shape top-k cannot
    * express: "everything at least this similar", where the answer size
    * is data-dependent (possibly zero) rather than fixed at k.
    */
  def rangeSearch(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      threshold: Double): DataFrame = {
    val base = prepared(emb, idCol, embCol)
    val queries = broadcast(
      base
        .filter(queryPred)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm")))
    base
      .join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(dot(col("q_qv"), col("qv")), col("q_nrm"), col("nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  /** LSH-blocked embedding near-dup: candidates from `tables` independent
    * sign-LSH hash tables (`bits` sign bits each, disjoint component
    * slices), then exact cosine verify on the distinct candidate pairs —
    * the d3 MinHash candidates->verify shape applied to vectors. Every
    * join is an equi-join (bucket key, then vec id), so the plan shuffles
    * by key instead of the all-pairs nested loop in [[nearDupPairs]].
    *
    * Parameter math (random hyperplane LSH, Goemans-Williamson): a pair at
    * cosine rho agrees on one sign bit w.p. 1 - acos(rho)/pi, on a b-bit
    * table w.p. p^b, and survives T tables w.p. 1-(1-p^b)^T. Callers derive
    * `bits` from corpus size ([[autoBits]]: b = bitlength(n/targetBucket))
    * so expected bucket size — and with it per-bucket join cost — stays
    * constant as n grows; a constant b is a disguised partitioned
    * cartesian (candidates ~ T*n^2/2^(b+1)). `maxBucket` bounds the worst
    * bucket absolutely ([[dropHotBuckets]]). At the gate (n=500,
    * threshold 0.45) derivation yields b=4/T=16: recall 1.0, p ~ 0.65 =>
    * per-table 0.18. Production near-dup thresholds (0.9+) push p toward
    * 0.95, letting b sit at 16 with few tables — candidate volume drops
    * exponentially in b (the d7 gate's operating point: b=16/T=4 leaves
    * buckets near-singleton); low thresholds are intrinsically unselective
    * for ANY LSH family, so growing n at fixed threshold 0.45 trades
    * recall (the derivation keeps cost, not recall, constant — documented
    * contract, same as every sub-quadratic LSH).
    *
    * CEILING: axis-aligned tables slice the component range disjointly, so
    * bits * tables <= dim — once autoBits pushes b past dim/2 only ONE
    * table fits and multi-table recall is gone. The random-hyperplane
    * variant ([[rpBucketsExploded]] / [[nearDupPairsRpAuto]], gated as d8)
    * removes the constraint: tables stay constant at any derived b.
    */
  /** (vec_id, bucket) pairs, one row per (vector, hash table). */
  def signBucketsExploded(emb: DataFrame, idCol: String, embCol: String, bits: Int, tables: Int): DataFrame =
    bucketsFromPrepared(prepared(emb, idCol, embCol), bits, tables)

  private def bucketsFromPrepared(base: DataFrame, bits: Int, tables: Int): DataFrame =
    base.select(col("vec_id"), explode(signBuckets(col("qv"), bits, tables)).as("bucket"))

  /** Drop buckets holding more than `maxBucket` vectors before candidate
    * generation — the vector-plane twin of [[Dedup.dropHotShingles]]. The
    * in-bucket self-join is quadratic in bucket size, so one degenerate
    * bucket (a sign pattern half the corpus shares) would dominate total
    * cost while pairing mostly-dissimilar vectors; capping bounds per-
    * bucket work at maxBucket^2 absolutely. Recall cost: a pair sharing a
    * dropped bucket survives only through another table whose bucket stays
    * under the cap — if EVERY bucket a pair shares is hot, the pair is
    * lost (recall 0 for that pair; the degenerate-corpus spec demonstrates
    * this). The oracle applies the identical cap, so parity holds; this is
    * the documented approximate-recall contract of the blocked path.
    */
  def dropHotBuckets(bucketed: DataFrame, maxBucket: Long): DataFrame =
    capBySize(bucketed, "bucket", maxBucket)

  def nearDupPairsBlocked(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      bits: Int = 4,
      tables: Int = 16,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    blockedFromPrepared(preparedCached(emb, idCol, embCol), threshold, bits, tables, maxBucket)

  /** Deterministic ±1 random hyperplanes: planes(k)(j) from md5 parity of
    * (seed, k, j) — a pure function of its arguments, so the DuckDB oracle
    * embeds the IDENTICAL literals and parity holds bit-for-bit.
    *
    * This is the full Goemans-Williamson random-hyperplane family: each
    * plane is an independent ±1 projection over ALL components, unlike
    * [[signBuckets]] whose axis-aligned planes must slice the component
    * range disjointly and therefore obey bits * tables <= dim. With random
    * planes the table count is independent of both dimensionality and the
    * derived bit count — the fix for the scale ceiling where autoBits
    * growth (b ~ log n) eats the table budget and recall collapses to a
    * single table at very large n.
    */
  def hyperplanes(seed: Long, count: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(count, dim) { (k, j) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"rp|$seed|$k|$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((h(0) & 1) == 0) 1L else -1L
    }

  /** (vec_id, bucket) pairs from random-hyperplane projections: bit i of
    * table t is the sign of <qv, planes(t*bits + i)>, computed by the
    * codegen'd [[graft.functions.LongDotProduct]] (exact integer dot, so
    * the oracle's list_sum reproduces every sign bit-for-bit).
    */
  def rpBucketsExploded(
      base: DataFrame,
      planes: Array[Array[Long]],
      bits: Int,
      tables: Int): DataFrame = {
    require(planes.length >= bits * tables, "need bits*tables hyperplanes")
    val buckets = array((0 until tables).map { t =>
      concat(lit(s"$t:") +: (0 until bits).map { i =>
        val dotP = graft.functions.LongDotProduct.dotLong(
          col("qv"),
          typedLit(planes(t * bits + i).toSeq))
        when(dotP >= 0, lit("1")).otherwise(lit("0"))
      }: _*)
    }: _*)
    base.select(col("vec_id"), explode(buckets).as("bucket"))
  }

  /** [[nearDupPairsBlocked]] over random hyperplanes with bits derived
    * from the corpus count (clamped to capBits) and a table count chosen
    * FREELY — the 10^12-corpus shape: as autoBits grows with n the table
    * budget no longer shrinks (the disjoint-slice variant forces
    * T <= dim/bits, i.e. one table once b > dim/2). Same candidates ->
    * cap -> verify pipeline and output contract as [[nearDupPairsBlocked]].
    */
  def nearDupPairsRpAuto(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      seed: Long,
      targetBucket: Long,
      floorBits: Int,
      capBits: Int,
      tables: Int,
      dim: Int,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val base = preparedCached(emb, idCol, embCol)
    val bits = math.min(capBits, autoBits(base.count(), targetBucket, floorBits))
    val planes = hyperplanes(seed, capBits * tables, dim)
    val cool = dropHotBuckets(rpBucketsExploded(base, planes, bits, tables), maxBucket)
    verifyCandidates(base, cool, threshold)
  }

  /** [[nearDupPairsBlocked]] with `bits`/`tables` derived from the corpus
    * count ([[autoBits]]); the count() doubles as the materialization of
    * the shared prepared frame, so it costs one scan total, not one per
    * pass.
    */
  def nearDupPairsBlockedAuto(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      targetBucket: Long,
      floorBits: Int,
      maxTables: Int,
      dim: Int,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val base = preparedCached(emb, idCol, embCol)
    val bits = autoBits(base.count(), targetBucket, floorBits)
    // clamped to >= 1: once the derived bits exceed dim, dim / bits is 0
    // and the query would silently return empty instead of degrading to a
    // single (truncated) table — past that point use nearDupPairsRpAuto,
    // whose random planes keep the table count free at any derived b
    val tables = math.max(1, math.min(maxTables, dim / bits))
    blockedFromPrepared(base, threshold, bits, tables, maxBucket)
  }

  private def blockedFromPrepared(
      base: DataFrame,
      threshold: Double,
      bits: Int,
      tables: Int,
      maxBucket: Long): DataFrame =
    verifyCandidates(
      base,
      dropHotBuckets(bucketsFromPrepared(base, bits, tables), maxBucket),
      threshold)

  /** Candidates -> exact verify, shared by the disjoint-slice and
    * random-hyperplane block variants. `cool` is the capped (vec_id,
    * bucket) frame; `base` the prepared (vec_id, qv, nrm) frame.
    */
  private def verifyCandidates(
      base: DataFrame,
      cool: DataFrame,
      threshold: Double): DataFrame = {
    // Pair expansion via one grouped collect instead of a bucket self-join:
    // the cap guarantees each collected list holds <= maxBucket ids, so the
    // in-row double explode is bounded work (maxBucket^2 worst case). The
    // groupBy reuses the cap's hash exchange on `bucket` (capBySize is a
    // window over the same key), so candidate generation costs ONE shuffle
    // of the bucketed rows total.
    val cands = cool
      .groupBy(col("bucket"))
      .agg(collect_list(col("vec_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("vec_a"), col("ids"))
      .select(col("vec_a"), explode(col("ids")).as("vec_b"))
      .filter(col("vec_a") < col("vec_b"))
    // Dedup AFTER the threshold filter, not before the verify: a pair
    // colliding in k <= tables buckets costs k - 1 redundant dot products
    // (bounded, cheap) but skipping the pre-verify distinct() drops a full
    // shuffle of the candidate set — the largest intermediate in the plan.
    // The cosine is deterministic integer math, so duplicate rows are
    // bit-identical and the final distinct is exact.
    cands
      .join(
        base.select(col("vec_id").as("vec_a"), col("qv").as("a_qv"), col("nrm").as("a_nrm")),
        "vec_a")
      .join(
        base.select(col("vec_id").as("vec_b"), col("qv").as("b_qv"), col("nrm").as("b_nrm")),
        "vec_b")
      .select(
        col("vec_a"),
        col("vec_b"),
        cosine(dot(col("a_qv"), col("b_qv")), col("a_nrm"), col("b_nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
