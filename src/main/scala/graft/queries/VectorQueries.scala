package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the `embeddings` table: brute-force
  * cosine top-k (exact baseline), sign-LSH bucketed ANN (scale path),
  * k-means IVF ANN, and embedding near-dup pairs (exact all-pairs baseline
  * + the LSH-blocked scale path). Components quantize to integer micros so
  * the cosine doubles are bit-identical to the DuckDB oracle (see
  * [[graft.operators.Similarity]]).
  */
object VectorQueries {

  private val TopK = 5
  private val LshBits = 8
  private val NearDupThreshold = 0.45

  /** Fixed-size query set: the first NQueries ids. A CONSTANT number of
    * queries keeps the broadcast side O(1) in corpus size (a fractional
    * predicate like `vec_id % 10 == 0` makes the exact baseline O(n^2/10)
    * — a scale-killer flagged in round 1).
    */
  private val NQueries = 64

  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame =
    Similarity
      .bruteForceTopK(
        Tables.embeddings(spark, sfDir),
        "vec_id",
        "embedding",
        col("vec_id") < NQueries,
        TopK)
      .transform(orderedOutput(_, col("query_id"), col("rnk")))

  def annSignLsh(spark: SparkSession, sfDir: String): DataFrame =
    Similarity
      .signBucketTopK(Tables.embeddings(spark, sfDir), "vec_id", "embedding", LshBits, 1)
      .transform(orderedOutput(_, col("query_id"), col("rnk")))

  def embedNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity
      .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", NearDupThreshold)
      .transform(orderedOutput(_, col("vec_a"), col("vec_b")))

  /** d6: same contract as d5, LSH-blocked (the 100 TB path). */
  private val BlockBits = 4
  private val BlockTables = 16

  def embedNearDupLsh(spark: SparkSession, sfDir: String): DataFrame =
    Similarity
      .nearDupPairsBlocked(
        Tables.embeddings(spark, sfDir),
        "vec_id",
        "embedding",
        NearDupThreshold,
        BlockBits,
        BlockTables)
      .transform(orderedOutput(_, col("vec_a"), col("vec_b")))

  private val IvfCells = 16
  private val LloydIters = 2

  def annIvf(spark: SparkSession, sfDir: String): DataFrame =
    Similarity
      .ivfTopK(Tables.embeddings(spark, sfDir), "vec_id", "embedding", IvfCells, 1, LloydIters)
      .transform(orderedOutput(_, col("query_id"), col("rnk")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_cosine_topk" -> (cosineTopK(_, _)),
    "v2_ann_signlsh" -> (annSignLsh(_, _)),
    "v3_ann_ivf" -> (annIvf(_, _)),
    "d5_embed_neardup" -> (embedNearDup(_, _)),
    "d6_embed_neardup_lsh" -> (embedNearDupLsh(_, _)))

  /** Quantized-vector CTE shared by the oracles (DuckDB dialect). */
  private val prep =
    """n AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv,
      |         embedding
      |  FROM embeddings),
      |base AS (
      |  SELECT vec_id, qv, embedding,
      |         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm
      |  FROM n)""".stripMargin

  private val cosineExpr =
    """CAST(CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))""".stripMargin

  /** One Lloyd round in SQL: assign to nearest centroid (exact integer
    * dist^2, (dist2, cell) tie-break), then component-wise integer-rounded
    * mean. Mirrors [[Similarity.kmeansCentroids]] exactly.
    */
  private def lloydRound(centIn: String, n: Int): String =
    s"""a$n AS (
       |  SELECT vec_id, qv, nrm, cell FROM (
       |    SELECT b.vec_id, b.qv, b.nrm, c.cell,
       |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
       |        b.nrm + c.c_nrm
       |          - 2 * CAST(list_sum(list_transform(list_zip(b.qv, c.c_qv), p -> p[1] * p[2])) AS BIGINT),
       |        c.cell) AS arnk
       |    FROM base b CROSS JOIN $centIn c)
       |  WHERE arnk = 1),
       |m$n AS (
       |  SELECT cell, pos,
       |    CAST(round(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS comp
       |  FROM (SELECT cell, unnest(generate_series(1, len(qv))) AS pos, unnest(qv) AS v FROM a$n)
       |  GROUP BY cell, pos),
       |cent$n AS (
       |  SELECT cell, c_qv, CAST(list_sum(list_transform(c_qv, x -> x * x)) AS BIGINT) AS c_nrm
       |  FROM (SELECT cell, list(comp ORDER BY pos) AS c_qv FROM m$n GROUP BY cell))""".stripMargin

  val oracle: Map[String, String] = Map(
    "v1_cosine_topk" ->
      s"""WITH $prep,
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         |    $cosineExpr AS cosine
         |  FROM base a JOIN base b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < $NQueries)
         |SELECT query_id, vec_id, rnk, cosine FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin,
    "v2_ann_signlsh" -> {
      val bucketExpr = (1 to LshBits)
        .map(i => s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH $prep,
         |bucketed AS (SELECT *, $bucketExpr AS bucket FROM base),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, a.bucket AS bucket,
         |    $cosineExpr AS cosine
         |  FROM bucketed a
         |  JOIN bucketed b ON a.bucket = b.bucket AND b.vec_id != a.vec_id)
         |SELECT query_id, vec_id, bucket, rnk, cosine FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= 1 ORDER BY query_id, rnk""".stripMargin
    },
    "v3_ann_ivf" ->
      s"""WITH $prep,
         |cent0 AS (
         |  SELECT vec_id AS cell, qv AS c_qv, nrm AS c_nrm FROM base WHERE vec_id < $IvfCells),
         |${lloydRound("cent0", 1)},
         |${lloydRound("cent1", 2)},
         |assigned AS (
         |  SELECT vec_id, qv, nrm, cell FROM (
         |    SELECT b.vec_id, b.qv, b.nrm, c.cell,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |        b.nrm + c.c_nrm
         |          - 2 * CAST(list_sum(list_transform(list_zip(b.qv, c.c_qv), p -> p[1] * p[2])) AS BIGINT),
         |        c.cell) AS arnk
         |    FROM base b CROSS JOIN cent2 c)
         |  WHERE arnk = 1),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, a.cell AS cell,
         |    $cosineExpr AS cosine
         |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND b.vec_id != a.vec_id)
         |SELECT query_id, vec_id, cell, rnk, cosine FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= 1 ORDER BY query_id, rnk""".stripMargin,
    "d5_embed_neardup" ->
      s"""WITH $prep
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  $cosineExpr AS cosine
         |FROM base a JOIN base b ON a.vec_id < b.vec_id
         |WHERE $cosineExpr >= $NearDupThreshold
         |ORDER BY vec_a, vec_b""".stripMargin,
    "d6_embed_neardup_lsh" -> {
      val bucketExpr = (1 to BlockBits)
        .map(i => s"CASE WHEN embedding[t * $BlockBits + $i] >= 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH $prep,
         |bucketed AS (
         |  SELECT vec_id, CAST(t AS VARCHAR) || ':' || $bucketExpr AS bucket
         |  FROM base CROSS JOIN range(0, $BlockTables) r(t)),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b, cosine FROM (
         |  SELECT c.vec_a, c.vec_b,
         |    $cosineExpr AS cosine
         |  FROM cand c JOIN base a ON c.vec_a = a.vec_id JOIN base b ON c.vec_b = b.vec_id)
         |WHERE cosine >= $NearDupThreshold
         |ORDER BY vec_a, vec_b""".stripMargin
    }
  )
}
