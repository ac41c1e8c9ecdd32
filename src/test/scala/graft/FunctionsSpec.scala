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

  test("IVF ANN: every neighbor shares the query's cell; cells cover all vectors") {
    import graft.operators.Similarity.{autoCells, trainStride}
    val sf = "/root/testdata/sf0.001"
    val n = Tables.embeddings(spark, sf).count()
    // cell ids are the SEED vectors' vec_ids: multiples of the training
    // stride below nCells * stride (kmeansCentroids seeds from the strided
    // sample), so the id space is bounded but not contiguous
    val c = autoCells(n, 16, 65536)
    val s = trainStride(n, c, 64L)
    val ann = VectorQueries.annIvf(spark, sf).cache()
    assert(ann.count() > 0)
    assert(ann.filter(col("cell") >= c * s || col("cell") < 0 || col("cell") % s =!= 0).count() == 0)
    // each query appears at most once (k=1) with rank 1
    assert(ann.groupBy("query_id").count().filter(col("count") > 1).count() == 0)
    assert(ann.filter(col("rnk") =!= 1).count() == 0)
  }
}
