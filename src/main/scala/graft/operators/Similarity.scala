package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  */
object Similarity {

  /** Quantized vector: round(double(x) * 1e6) per component. */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * 1000000).cast("long"))

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

  /** Exact cosine top-k for a query subset (broadcast the small side). */
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
    val scored = base
      .join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(dot(col("q_qv"), col("qv")), col("q_nrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "cosine")
  }

  /** Sign-LSH bucket key: the sign bits of the first b raw components. */
  def signBucket(embedding: Column, b: Int): Column =
    concat((1 to b).map(i =>
      when(element_at(embedding, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Top-1 in-bucket neighbor per vector (approximate ANN; vectors alone
    * in their bucket yield no row — that is the LSH contract).
    */
  def signBucketTopK(emb: DataFrame, idCol: String, embCol: String, bits: Int, k: Int): DataFrame = {
    val base = prepared(emb, idCol, embCol)
      .join(
        emb.select(col(idCol).as("vec_id"), signBucket(col(embCol), bits).as("bucket")),
        "vec_id")
    val paired = base
      .as("a")
      .join(base.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
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

  /** IVF-style ANN: a deterministic coarse quantizer (the first
    * `nCells` vectors act as centroids — standing in for trained k-means
    * centroids), each vector assigned to its nearest centroid by exact
    * integer squared distance (`|a|^2 + |c|^2 - 2<a,c>`), then top-k
    * search restricted to the query's cell. Scale path: candidate
    * generation is an equi-join on cell id — probe cost n/nCells per
    * query instead of n.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nCells: Int,
      k: Int): DataFrame = {
    val base = prepared(emb, idCol, embCol)
    val centroids = broadcast(
      base
        .filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"), col("qv").as("c_qv"), col("nrm").as("c_nrm")))
    // nearest centroid per vector: distance^2 = nrm + c_nrm - 2*dot (exact)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cell"))
    val assigned = base
      .crossJoin(centroids)
      .withColumn("dist2", col("nrm") + col("c_nrm") - lit(2L) * dot(col("qv"), col("c_qv")))
      .withColumn("arnk", row_number().over(wAssign))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("qv"), col("nrm"), col("cell"))
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    assigned
      .as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("vec_id"),
        col("a.cell").as("cell"),
        cosine(dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm")).as("cosine"))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "cell", "rnk", "cosine")
  }

  /** All pairs with cosine >= threshold (embedding near-dup detection). */
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
}
