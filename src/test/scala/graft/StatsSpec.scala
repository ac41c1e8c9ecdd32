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

  /** Events fixture for the sfDir-shaped gates: write (event_id, ts from
    * epoch micros, user_id, event_type, value, props) to a per-test temp
    * dir so the PRODUCTION query (not a re-derived formula) runs on
    * known-answer data.
    */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_fix").toString
    rows
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .select(
        col("event_id"),
        timestamp_micros(col("us")).as("ts"),
        col("user_id"),
        col("event_type"),
        col("value"),
        lit("{}").as("props"))
      .write
      .parquet(dir + "/events.parquet")
    dir
  }

  test("a33 normal equations: a perfect planar fit y = 3x + 5z + c recovers both betas EXACTLY") {
    // 14 days x 24 hours, cents = 3*hour + 5*dow + 17: for an exact fit
    // the Cramer numerators are exactly 3*det and 5*det, every quantity
    // is far below 2^53, so the one double division is exact
    val rows = for { d <- 0 until 14; h <- 0 until 24 } yield (
      (d * 24 + h).toLong,
      d.toLong * 86400000000L + h.toLong * 3600000000L,
      1L,
      "purchase",
      (3 * h + 5 * (d % 7) + 17) / 100.0)
    val r = queries.FeatureQueries.queries("a33_multireg")(spark, eventsDir(rows)).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("beta_x") == 3.0, s"beta_x: ${r(0).getAs[Double]("beta_x")}")
    assert(r(0).getAs[Double]("beta_z") == 5.0, s"beta_z: ${r(0).getAs[Double]("beta_z")}")
  }

  test("a32 ANOVA cells: equal group means give ssb exactly 0; within-SS matches the closed form") {
    // group a: (10, 20) cents, group b: (15, 15) -> both means 15 = grand
    // mean, so every between-group cell is exactly 0.0; ssw_a = 50, ssw_b = 0
    val rows = Seq(
      (1L, 1000000L, 1L, "a", 0.10),
      (2L, 2000000L, 1L, "a", 0.20),
      (3L, 3000000L, 2L, "b", 0.15),
      (4L, 4000000L, 2L, "b", 0.15))
    val r = queries.FeatureQueries
      .queries("a32_anova")(spark, eventsDir(rows))
      .collect()
      .map(x => x.getAs[String]("event_type") -> x)
      .toMap
    assert(r("a").getAs[Double]("ssb_g") == 0.0 && r("b").getAs[Double]("ssb_g") == 0.0)
    assert(r("a").getAs[Double]("ssw_g") == 50.0, s"ssw_a: ${r("a").getAs[Double]("ssw_g")}")
    assert(r("b").getAs[Double]("ssw_g") == 0.0)
  }

  test("w30 pattern match: contiguity and the per-hop gap bound both gate a match") {
    val H = 3600000000L
    val rows = Seq(
      // user 1: view -> click -> purchase inside the gap: ONE match
      (1L, 0L, 1L, "view", 1.0),
      (2L, 1 * H, 1L, "click", 1.0),
      (3L, 2 * H, 1L, "purchase", 1.0),
      // user 2: second hop exceeds 24h: no match
      (4L, 0L, 2L, "view", 1.0),
      (5L, 1 * H, 2L, "click", 1.0),
      (6L, 26 * H, 2L, "purchase", 1.0),
      // user 3: an interleaved error breaks contiguity: no match
      (7L, 0L, 3L, "view", 1.0),
      (8L, 1 * H, 3L, "error", 1.0),
      (9L, 2 * H, 3L, "click", 1.0),
      (10L, 3 * H, 3L, "purchase", 1.0))
    val r = queries.FeatureQueries.queries("w30_event_pattern")(spark, eventsDir(rows)).collect()
    assert(r.length == 1, s"expected exactly user 1's match, got ${r.mkString("; ")}")
    assert(r(0).getAs[Long]("user_id") == 1L && r(0).getAs[Long]("start_id") == 1L &&
      r(0).getAs[Long]("end_id") == 3L && r(0).getAs[Long]("span_us") == 2 * H)
  }

  test("a34 Theil-Sen: a degenerate corpus (< 2 distinct days) emits ZERO rows, like the oracle") {
    // one day's worth of events: the pairwise-slope frame is empty, and
    // Spark's global agg over an empty frame would emit one all-null row
    // where DuckDB's `WHERE rn = (n+1)//2` emits none — the gate guards it
    val D = 86400000000L
    val oneDay = Seq(
      (1L, 1000L, 1L, "view", 2.0),
      (2L, 2000L, 2L, "click", 3.0),
      (3L, 3000L, 1L, "purchase", 4.0))
    assert(queries.FeatureQueries.queries("a34_theil_sen")(spark, eventsDir(oneDay)).count() == 0,
      "empty pair frame must yield zero rows, not one null row")
    // two days: exactly one median row, slope = (day2 sum - day1 sum)/1
    val twoDays = oneDay ++ Seq((4L, D + 1000L, 1L, "view", 9.0))
    val r = queries.FeatureQueries.queries("a34_theil_sen")(spark, eventsDir(twoDays)).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_pairs") == 1L)
    assert(r(0).getAs[Double]("med_slope") == (900.0 - 900.0))
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
