package graft

import graft.functions.GraftFunctions
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom expression semantics + SQL registration + IVF ANN contract. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  test("long_dot and word_shingles callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b").createOrReplaceTempView("v")
    assert(spark.sql("SELECT long_dot(a, b) AS d FROM v").as[Long].head() == 32L)
    val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    assert(spark.sql("SELECT word_shingles('a b', 3) AS s").as[Seq[String]].head().isEmpty)
    // the custom AGGREGATE registers too: SQL form == Column form
    (1L to 500L).map(i => (i % 3, i % 97)).toDF("g", "v").createOrReplaceTempView("kv")
    val viaSql = spark
      .sql("SELECT g, kmv_distinct(v, 64, 'kmv').est_nd AS e FROM kv GROUP BY g")
      .as[(Long, Long)].collect().toSet
    val viaCol = Seq((1L to 500L).map(i => (i % 3, i % 97)): _*)
      .toDF("g", "v")
      .groupBy(col("g"))
      .agg(graft.functions.KmvDistinctAgg.kmvDistinct(col("v"), 64, "kmv").as("k"))
      .select(col("g"), col("k.est_nd"))
      .as[(Long, Long)].collect().toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("word_shingles matches the composable HOF form on edge cases") {
    val texts = Seq("x", "a b", "a b c", "a  b c", "a b c ", " a b c", "w1 w2 w3 w4 w5")
    val df = texts.toDF("text")
    val viaExpr = df.select(
      graft.functions.WordShingles.wordShingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    val viaHof = df
      .withColumn("w", split(col("text"), " "))
      .select(graft.operators.TextAnalysis.shingles(col("w"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(viaExpr.toSeq == viaHof.toSeq)
  }

  test("packShards: gate corpus derives the legacy 8; big corpora scale out") {
    import graft.queries.DocQueries.packShards
    assert(packShards(500L) == 8L) // gate corpus: hashes move only by design
    assert(packShards(800000L) == 8L)
    assert(packShards(800001L) == 9L)
    assert(packShards(1000000000L) == 10000L) // 10^9 docs -> 10^4-way cumsum
    assert(packShards(100L * 1000L * 1000L * 1000L) == 1000000L) // 10^11 docs
  }

  test("IVF ANN: every neighbor shares the query's cell; cells cover all vectors") {
    import graft.operators.{Similarity, Sketches}
    import graft.operators.Similarity.{autoCells, trainStride}
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    // cell ids are the SEED vectors' vec_ids: members of the md5-hash
    // training sample (kmeansCentroids seeds by md5-rank within it)
    val c = autoCells(n, 16, 65536)
    val s = trainStride(n, c, 64L)
    val trainIds = Similarity.trainSample(
      emb.select(col("vec_id")), s).as[Long].collect().toSet
    val ann = VectorQueries.annIvf(spark, sf).cache()
    assert(ann.count() > 0)
    val cells = ann.select("cell").distinct().as[Long].collect()
    assert(cells.forall(trainIds.contains), "cell ids must be training-sample vec_ids")
    // each query appears at most once (k=1) with rank 1
    assert(ann.groupBy("query_id").count().filter(col("count") > 1).count() == 0)
    assert(ann.filter(col("rnk") =!= 1).count() == 0)
  }

  test("BloomAgg: partitioning-independent bits, no false negatives, bounded FP rate") {
    import spark.implicits._
    import graft.functions.{BloomAgg, BloomHash}
    val rows = (0L until 2000L).map(i => (i % 4, i))
    def run(parts: Int) = rows
      .toDF("g", "v")
      .repartition(parts)
      .groupBy(col("g"))
      .agg(BloomAgg.bloomAgg(col("v"), 1 << 14, 5).as("bf"))
      .as[(Long, Array[Byte])]
      .collect()
      .toMap
    val one = run(1)
    val many = run(17)
    assert(one.keySet == many.keySet &&
      one.forall { case (g, b) => java.util.Arrays.equals(b, many(g)) },
      "bit-OR merge makes the packed array partitioning-independent")
    // NO false negative is possible: every inserted value tests positive
    rows.foreach { case (g, v) =>
      assert(BloomHash.mightContain(one(g), 5, v), s"false negative for $v in group $g")
    }
    // false-positive rate on values never inserted stays near theory
    // ((1-e^{-kn/m})^k ~ 2.4e-4 at k=5, n=500, m=16384)
    val fp = (100000L until 110000L).count(v => BloomHash.mightContain(one(0L), 5, v))
    assert(fp < 50, s"$fp false positives in 10000 probes — far above the designed rate")
    // serialized size is nBits/8 regardless of row count
    assert(one(0L).length == (1 << 14) / 8)
  }

  test("KmvDistinctAgg: partitioning-independent, duplicate-blind, O(k) state") {
    import spark.implicits._
    import graft.functions.KmvDistinctAgg.kmvDistinct
    val rows = (1L to 5000L).map(i => (i % 7, i % 911)) // dups per group
    def run(parts: Int) = rows
      .toDF("g", "v")
      .repartition(parts)
      .groupBy(col("g"))
      .agg(kmvDistinct(col("v"), 64, "kmv").as("kmv"))
      .select(col("g"), col("kmv.m"), col("kmv.hk"), col("kmv.est_nd"))
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSet
    val one = run(1)
    assert(one == run(13) && one == run(32),
      "the k smallest distinct hashes are order- and partitioning-independent")
    // duplicate-blind: every group saw 911 distinct values at most — the
    // sketch saturates at k=64 and the estimate is within KMV's relative
    // error of the truth (deterministic given the fixed md5 draw)
    one.foreach { case (_, m, _, est) =>
      assert(m == 64L)
      assert(est > 500 && est < 1500, s"estimate $est wildly off 911")
    }
    // serialized partial state is bounded by k, never by the data
    val agg = graft.functions.KmvDistinctAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("v")), 64, "kmv")
    val buf = agg.createAggregationBuffer()
    (1L to 100000L).foreach(i => buf.add(i))
    assert(agg.serialize(buf).length == 4 + 8 * 64)
    // an empty group evaluates to NULL, not a zero-struct
    assert(agg.eval(agg.createAggregationBuffer()) == null)
  }

  test("k-means seeding is density-free: sparse ids still yield nCells seeds") {
    import graft.operators.Similarity
    val sf = "/root/testdata/sf0.001"
    // post-dedup-shaped ids: vec_id * 1000 + 7 never hits a small residue
    // class or a dense prefix — the old `vec_id < nCells` seed filter
    // found ONE seed here (only id 7 qualifies); md5-rank finds all 16
    val sparse = Tables.embeddings(spark, sf)
      .withColumn("vec_id", col("vec_id") * 1000L + 7L)
    val prep = Similarity.prepared(sparse, "vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(prep, 16, 1)
    assert(cents.count() == 16L, "sparse-id corpus must still seed nCells centroids")
  }
}
