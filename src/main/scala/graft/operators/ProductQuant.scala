package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization for vector search (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split the
  * embedding into `m` disjoint subspaces, train an independent `k`-codeword
  * codebook per subspace with the same deterministic integer k-means
  * discipline as [[Similarity.kmeansCentroids]], and represent every corpus
  * vector by its `m` code ids. Query scoring is the asymmetric form: the
  * query keeps its exact (quantized-integer) subvectors, builds an m×k
  * lookup table of per-subspace dots against the codebook, and scores a
  * corpus vector as the SUM OF TABLE LOOKUPS addressed by its codes — the
  * corpus's full vectors are never touched at query time.
  *
  * Scale shape: the codebook is m·k rows (O(1) in corpus size, broadcast);
  * training runs on a hash sample so Lloyd cost scales with k, not n;
  * code assignment is one broadcast join over the corpus (m rows per
  * vector); serving joins the codes table against the broadcast lookup
  * table — per query O(n·m) narrow integer rows, with memory per vector
  * m·log2(k) bits instead of the full embedding. All arithmetic is exact
  * integers (quantized micros; the only rounding is the same
  * deterministic mean-round the IVF trainer uses), so ranks are
  * engine-exact.
  */
object ProductQuant {

  /** Sub-vector rows: one (vec_id, sub, sv, sv_nrm) row per subspace.
    * `d` = dims per subspace; slices are 1-based contiguous.
    */
  def subRows(base: DataFrame, m: Int, d: Int): DataFrame =
    base
      .select(col("vec_id"), col("qv"), explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .withColumn("sv", expr(s"slice(qv, sub * $d + 1, $d)"))
      .withColumn("sv_nrm", Similarity.normSq(col("sv")))
      .select("vec_id", "sub", "sv", "sv_nrm")

  private def dist(svNrm: Column, cNrm: Column, sv: Column, cSv: Column): Column =
    svNrm + cNrm - lit(2L) * Similarity.dot(sv, cSv)

  /** Nearest codeword per (vec, sub): broadcast the m·k codebook, argmin
    * by exact integer squared distance with (dist, code) tie-break — as a
    * `min_by` over a (dist, code) struct rather than a rank window, so
    * the argmin combines MAP-SIDE (partial aggregation) and the exchange
    * carries n·m narrow rows, not the n·m·k joined rows a window
    * partition would shuffle. The struct key is unique (code is in it),
    * so the min is the same row the rank-1 window would pick.
    */
  def assignCodes(sub: DataFrame, codebook: DataFrame): DataFrame =
    sub
      .join(broadcast(codebook), "sub")
      .groupBy(col("vec_id"), col("sub"))
      .agg(
        min_by(
          col("code"),
          struct(dist(col("sv_nrm"), col("c_nrm"), col("sv"), col("c_sv")), col("code")))
          .as("code"))
      .select(col("vec_id"), col("sub"), col("code"))

  /** Per-subspace deterministic k-means: seeds are the k training vectors
    * of smallest md5-rank (density-free, the kmeansCentroids discipline)
    * — each seed vector contributes its slice to EVERY subspace's initial
    * codebook, labeled by the seed's vec_id — followed by `iters` rounds
    * of assign + component-wise integer-rounded mean, all grouped by
    * (sub, code) so the m codebooks train in the same passes.
    */
  def trainCodebooks(trainBase: DataFrame, m: Int, d: Int, k: Int, iters: Int): DataFrame = {
    val seedIds = trainBase
      .select(col("vec_id"), Sampling.hashUniformHex("pqseed", col("vec_id")).as("__h"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(k)
      .select("vec_id")
    val trainSub = subRows(trainBase, m, d)
    val seed = trainSub
      .join(seedIds, "vec_id")
      .select(
        col("sub"),
        col("vec_id").as("code"),
        col("sv").as("c_sv"),
        col("sv_nrm").as("c_nrm"))
    (1 to iters).foldLeft(seed) { (cb, _) =>
      val assigned = trainSub
        .join(broadcast(cb), "sub")
        .groupBy(col("vec_id"), col("sub"))
        .agg(
          min_by(
            struct(col("code"), col("sv")),
            struct(dist(col("sv_nrm"), col("c_nrm"), col("sv"), col("c_sv")), col("code")))
            .as("mc"))
        .select(col("sub"), col("mc.code").as("code"), col("mc.sv").as("sv"))
      val comps = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .withColumn("comp", round(col("s").cast("double") / col("c")).cast("long"))
      comps
        .groupBy(col("sub"), col("code"))
        .agg(
          transform(
            array_sort(collect_list(struct(col("pos"), col("comp")))),
            x => x.getField("comp")).as("c_sv"))
        .withColumn("c_nrm", Similarity.normSq(col("c_sv")))
    }
  }

  /** IVF+PQ composed — the two halves of the production ANN stack in one
    * serving plan (the IVFADC scheme of Jégou, Douze & Schmid 2011 §IV,
    * the architecture FAISS ships as IndexIVFPQ): the IVF coarse
    * quantizer restricts each query's candidate set to its `nProbe`
    * nearest cells, and PQ asymmetric table lookups score ONLY those
    * candidates — neither the full corpus is scanned (IVF's win) nor any
    * full vector touched at scoring time (PQ's win). Per query the cost
    * is nProbe · cellSize · m narrow integer rows, against n·m for flat
    * PQ (v10) and nProbe · cellSize · d full-width dots for plain IVF
    * (v4). Both trainers keep their own deterministic disciplines, so the
    * composed ranks stay engine-exact; candidates come from the capped
    * single-cell corpus assignment, so a vector appears at most once per
    * query and no post-join dedup is needed.
    */
  def ivfPqTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      floorCells: Int,
      capCells: Int,
      lloydIters: Int,
      maxCell: Long,
      perCell: Long,
      nProbe: Int,
      m: Int,
      d: Int,
      k: Int,
      iters: Int,
      topK: Int,
      pqStrideN: Long): DataFrame = {
    val base = Similarity
      .prepared(emb, idCol, embCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // IVF half: sqrt-n cells, sample-trained, capped — v3's discipline
    val n = base.count()
    val nCells = Similarity.autoCells(n, floorCells, capCells)
    val centroids = Similarity.kmeansCentroids(
      Similarity.trainSample(base, Similarity.trainStride(n, nCells, perCell)),
      nCells,
      lloydIters)
    val assigned = Similarity.capBySize(Similarity.assignCells(base, centroids), "cell", maxCell)
    val queries = base.filter(queryPred)
    val qcells = Similarity
      .assignCells(queries, centroids, nProbe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val cand = qcells
      .join(assigned.select(col("vec_id"), col("cell")), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "cell")
    // PQ half: sample-trained codebooks, corpus codes — v10's discipline
    val train =
      if (pqStrideN > 1L) base.filter(Sketches.hash32("pqtrain", col("vec_id")) % pqStrideN === 0)
      else base
    val codebook = trainCodebooks(train, m, d, k, iters)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val codes = assignCodes(subRows(base, m, d), codebook)
    val tab = subRows(queries, m, d)
      .select(col("vec_id").as("query_id"), col("sub"), col("sv").as("q_sv"))
      .join(codebook, "sub")
      .select(
        col("query_id"),
        col("sub"),
        col("code"),
        Similarity.dot(col("q_sv"), col("c_sv")).as("tdot"))
    // ADC scan: candidates × m code rows, each resolved against the
    // broadcast |queries|·m·k lookup table
    val scored = cand
      .join(codes, "vec_id")
      .join(broadcast(tab), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"), col("cell"))
      .agg(sum(col("tdot")).as("approx_dot"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("approx_dot").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select("query_id", "vec_id", "cell", "rnk", "approx_dot")
  }

  /** End-to-end PQ top-k: train codebooks on a hash sample, encode the
    * corpus, score `queryPred` queries by asymmetric table lookups,
    * return (query_id, vec_id, rnk, approx_dot). `strideN` > 1 samples
    * the training set (hash32("pqtrain") % stride == 0).
    */
  def pqTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      m: Int,
      d: Int,
      k: Int,
      iters: Int,
      topK: Int,
      strideN: Long): DataFrame = {
    val base = Similarity
      .prepared(emb, idCol, embCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val train =
      if (strideN > 1L) base.filter(Sketches.hash32("pqtrain", col("vec_id")) % strideN === 0)
      else base
    val codebook = trainCodebooks(train, m, d, k, iters)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val codes = assignCodes(subRows(base, m, d), codebook)
    val qSub = subRows(base.filter(queryPred), m, d)
      .select(col("vec_id").as("query_id"), col("sub"), col("sv").as("q_sv"))
    val tab = qSub
      .join(codebook, "sub")
      .select(
        col("query_id"),
        col("sub"),
        col("code"),
        Similarity.dot(col("q_sv"), col("c_sv")).as("tdot"))
    val scored = codes
      .join(broadcast(tab), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("tdot")).as("approx_dot"))
    // the ADC scan scores the FULL corpus per query — the top-k cut is
    // the bounded-heap bottom-k aggregate, not a query_id rank window
    // (which would sort a corpus-sized run per query on |queries| tasks).
    // approx_dot stays far below 2^53 (micros dots, Similarity contract),
    // so the negated double key recovers the exact long.
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomKAgg
        .bottomK(negate(col("approx_dot").cast("double")), col("vec_id"), topK).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(
        col("query_id"),
        col("e.id").as("vec_id"),
        col("e.rnk").as("rnk"),
        negate(col("e.key")).cast("long").as("approx_dot"))
  }
}
