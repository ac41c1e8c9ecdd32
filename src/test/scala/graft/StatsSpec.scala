package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form sanity checks for the round-8 nonparametric estimators:
  * the oracle gates pin engine parity on the fixture; these pin the
  * MATH on inputs with known answers (monotone data → ρ = 1, separated
  * groups → AUC = 1, identical distributions → KS D = 0), so a formula
  * slip that happened to match a mirrored slip in the oracle SQL would
  * still fail.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  private def rank2(c: org.apache.spark.sql.Column) =
    rank().over(Window.orderBy(c)) * 2L + count(lit(1)).over(Window.partitionBy(c)) - 1L

  test("doubled-rank Spearman: perfectly monotone pairs score exactly 1.0") {
    val d38 = "decimal(38,0)"
    val df = Seq((1L, 10L), (2L, 20L), (3L, 25L), (4L, 70L), (5L, 71L))
      .toDF("x", "y")
      .withColumn("rx2", rank2(col("x")))
      .withColumn("ry2", rank2(col("y")))
    val r = df
      .agg(
        count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"),
        sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("ry2")).as("sxy"),
        sum(col("rx2") * col("rx2")).as("sxx"),
        sum(col("ry2") * col("ry2")).as("syy"))
      .withColumn(
        "rho",
        (col("n").cast(d38) * col("sxy").cast(d38) - col("sx").cast(d38) * col("sy").cast(d38))
          .cast("double") /
          (sqrt((col("n").cast(d38) * col("sxx").cast(d38) - col("sx").cast(d38) * col("sx").cast(d38)).cast("double")) *
            sqrt((col("n").cast(d38) * col("syy").cast(d38) - col("sy").cast(d38) * col("sy").cast(d38)).cast("double"))))
      .head()
    // the INTEGER identity is exact (no ties -> rx2 == ry2, so the
    // covariance and both variance terms coincide); the exported double
    // may sit 1 ulp under 1.0 because sqrt(d)*sqrt(d) != d in general
    assert(r.getAs[Long]("sxx") == r.getAs[Long]("sxy"))
    assert(math.abs(r.getAs[Double]("rho") - 1.0) < 1e-12,
      s"monotone data must score rho ~1.0, got ${r.getAs[Double]("rho")}")
  }

  test("doubled-rank ties: three equal values share the textbook average rank") {
    // values (5, 5, 5, 9): average rank of the 5s is 2 -> doubled 4; 9 is rank 4 -> doubled 8
    val df = Seq(5L, 5L, 5L, 9L).toDF("x").withColumn("r2", rank2(col("x")))
    val got = df.select("x", "r2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 4L), (9L, 8L)), s"got $got")
  }

  test("Mann-Whitney doubled-U: fully separated groups give AUC exactly 1 and 0") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 11L))
      .toDF("g", "v")
      .withColumn("r2", rank2(col("v")))
    val row = df
      .agg(
        sum(when(col("g") === "b", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "a", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "b", col("r2")).otherwise(0L)).as("r1x2"))
      .withColumn("u1x2", col("r1x2") - col("n1") * (col("n1") + 1L))
      .withColumn("auc", col("u1x2").cast("double") / (col("n1") * col("n2") * 2L))
      .head()
    assert(row.getAs[Double]("auc") == 1.0, "every b beats every a -> AUC 1")
    assert(row.getAs[Long]("u1x2") == 2L * row.getAs[Long]("n1") * row.getAs[Long]("n2"))
  }

  test("KS integer numerator: identical samples D = 0, disjoint samples D = 1") {
    def ks(a: Seq[Long], b: Seq[Long]): Double = {
      val df = (a.map(("a", _)) ++ b.map(("b", _)))
        .toDF("g", "v")
        .groupBy(col("v"))
        .agg(
          sum(when(col("g") === "a", 1L).otherwise(0L)).as("d1"),
          sum(when(col("g") === "b", 1L).otherwise(0L)).as("d2"))
      val wc = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy()
      df.withColumn("c1", sum(col("d1")).over(wc))
        .withColumn("c2", sum(col("d2")).over(wc))
        .withColumn("n1", sum(col("d1")).over(wn))
        .withColumn("n2", sum(col("d2")).over(wn))
        .withColumn("num", abs(col("c1") * col("n2") - col("c2") * col("n1")))
        .agg(max(col("num")).as("ksn"), first(col("n1") * col("n2")).as("den"))
        .select((col("ksn").cast("double") / col("den").cast("double")).as("d"))
        .head()
        .getAs[Double]("d")
    }
    assert(ks(Seq(1, 2, 3, 4), Seq(1, 2, 3, 4)) == 0.0)
    assert(ks(Seq(1, 2, 3), Seq(10, 11, 12)) == 1.0)
  }

  test("Poisson bootstrap weights: thresholds reproduce Poisson(1) pmf mass on the 32-bit scale") {
    // P(0)=e^-1: threshold/2^32 must sit within 1e-6 of e^-1, and the
    // four cumulative thresholds must be increasing and < 2^32
    val t = Seq(1580030168L, 3160060337L, 3950075421L, 4213413782L)
    val e1 = math.exp(-1.0)
    assert(math.abs(t(0).toDouble / 4294967296.0 - e1) < 1e-6)
    assert(math.abs(t(1).toDouble / 4294967296.0 - 2 * e1) < 1e-6)
    assert(math.abs(t(2).toDouble / 4294967296.0 - 2.5 * e1) < 1e-6)
    assert(math.abs(t(3).toDouble / 4294967296.0 - (2 + 2.0 / 3) * e1) < 1e-6)
    assert(t == t.sorted && t.last < 4294967296L)
  }
}
