package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor generator for the empirical 100 TB-posture runs: produces
  * `documents` / `embeddings` / `events` tables with the same schema and
  * distribution SHAPE as the driver's testdata (TESTDATA.md) at any row
  * count, so heavy gates can be timed at sf0.1-equivalent and sf1 sizes
  * FROM THE SAME GENERATOR and the runtime ratio read as pure scaling
  * (generator-vs-generator, never driver-data-vs-my-data).
  *
  * Shape matched against /root/testdata/sf0.1 (measured, not assumed):
  * documents — the exact 31-word vocabulary, uniform token draws, 10-100
  * tokens/doc, ~41% en + 4 other langs, 20 uniform sources, planted exact
  * dups (~1/125) and near-dups (~1/40, one trailing token dropped);
  * embeddings — 64-dim floats in ~N(0, 0.125) as 10 labeled clusters
  * (center ±0.2, noise ±0.1), planted near-identical pairs (~1/150);
  * events — users ≈ rows/67, 30 days of 2024-01 timestamps, 5 uniform
  * event types, exp(mean 50)-ish value capped at 560, {"k": int} props.
  *
  * Everything is a pure Column function of the row id (xxhash64 draws),
  * generated DISTRIBUTED via spark.range — no driver-side loop, so the
  * generator itself scales to any sf.
  */
object ScaleGen {

  /** The corpus vocabulary (driver testdata's exact 31 words). */
  val Vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast", "filter",
    "group", "hash", "join", "key", "line", "merge", "order", "part", "query", "row",
    "scan", "slow", "small", "sort", "spark", "stream", "table", "the", "value", "vector",
    "window")

  /** Deterministic uniform draw in [0, m) from (seed, id, k). */
  private def draw(seed: String, id: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
    pmod(xxhash64(lit(seed), id, k), lit(1000000007L))

  def documents(spark: SparkSession, n: Long): DataFrame = {
    val vocabCol = array(Vocab.map(lit): _*)
    // near-dup plant: ids ≡ 1 (mod 40) regenerate their predecessor's
    // tokens then drop the last (3-shingle Jaccard ~0.9); exact-dup
    // plant: ids ≡ 3 (mod 125) regenerate id-2 verbatim
    val base = when(pmod(col("id"), lit(40L)) === 1L && col("id") >= 1L, col("id") - 1L)
      .when(pmod(col("id"), lit(125L)) === 3L && col("id") >= 2L, col("id") - 2L)
      .otherwise(col("id"))
    val trim = when(pmod(col("id"), lit(40L)) === 1L && col("id") >= 1L, lit(1)).otherwise(lit(0))
    val lang = pmod(xxhash64(lit("lang"), col("id")), lit(100L))
    spark
      .range(0L, n, 1L, 32)
      .withColumn("base_id", base)
      .withColumn("len", (pmod(xxhash64(lit("len"), col("base_id")), lit(91L)) + 10L).cast("int"))
      .withColumn(
        "words",
        transform(
          sequence(lit(0), col("len") - 1 - trim),
          i => element_at(vocabCol, (draw("tok", col("base_id"), i.cast("long")) % 31).cast("int") + 1)))
      .select(
        col("id").as("doc_id"),
        array_join(col("words"), " ").as("text"),
        when(lang < 41, "en")
          .when(lang < 56, "zh")
          .when(lang < 71, "es")
          .when(lang < 86, "fr")
          .otherwise("de")
          .as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20L)).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    // center(label, d) in ±0.2, noise(vec, d) in ±0.1; near-dup plant:
    // ids ≡ 1 (mod 150) sit at their predecessor's point with ±0.005 jitter
    val base = when(pmod(col("id"), lit(150L)) === 1L && col("id") >= 1L, col("id") - 1L)
      .otherwise(col("id"))
    val tight = when(pmod(col("id"), lit(150L)) === 1L && col("id") >= 1L, lit(0.005))
      .otherwise(lit(0.1))
    spark
      .range(0L, n, 1L, 32)
      .withColumn("label", pmod(col("id"), lit(10L)).cast("int"))
      .withColumn("base_id", base)
      .select(
        col("id").as("vec_id"),
        transform(
          sequence(lit(0), lit(63)),
          d => (
            ((draw("center", pmod(col("id"), lit(10L)), d.cast("long")) % 2001L) - 1000L)
              .cast("double") / 5000.0 +
              ((draw("noise", col("base_id"), d.cast("long")) % 2001L) - 1000L)
                .cast("double") / 1000.0 * tight
          ).cast("float")).as("embedding"),
        col("label"))
  }

  def events(spark: SparkSession, n: Long): DataFrame = {
    val users = math.max(100L, n / 67L)
    val spanUs = 30L * 86400L * 1000000L // 30 days
    val startUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val types = array(Seq("click", "error", "purchase", "signup", "view").map(lit): _*)
    val u = (pmod(xxhash64(lit("val"), col("id")), lit(1000000L)).cast("double") + 1.0) / 1000000.0
    spark
      .range(0L, n, 1L, 32)
      .select(
        col("id").as("event_id"),
        timestamp_micros(
          lit(startUs) + pmod(xxhash64(lit("ts"), col("id")), lit(spanUs))).as("ts"),
        pmod(xxhash64(lit("user"), col("id")), lit(users)).as("user_id"),
        element_at(types, pmod(xxhash64(lit("type"), col("id")), lit(5L)).cast("int") + 1)
          .as("event_type"),
        round(least(lit(560.0), lit(-50.0) * log(u)), 2).as("value"),
        concat(lit("{\"k\": "), pmod(xxhash64(lit("k"), col("id")), lit(100L)), lit("}"))
          .as("props"))
  }

  /** Minimal lineitem for the graph gates (orderkey/partkey/suppkey —
    * the only columns g4/g5/g6 touch): 1–7 hash-drawn lines per order
    * (mean 4, the TPC-H shape), part and supplier universes scaled like
    * the driver testdata (20k parts / 1k suppliers per 600k lines).
    *
    * The VARIABLE order size is load-bearing for g12's scale cell: a
    * flat 4-lines-per-order corpus yields a co-occurrence degree
    * distribution so narrow (median 90, p90 111 per 600k lines) that
    * k=80 peeling quenches — every node loses its neighbors in the same
    * round, and rounds 3–4 of the k-core loop run against empty frames
    * (SCALE_r09's 0→0 survivor counters). The 1–7 mix reproduces the
    * driver corpus's measured degree spread (median ~119, p90 ~151) and
    * its peeling behavior: survivors shrink strictly but stay non-empty
    * through all four rounds at both harness scales, so the multi-round
    * ratio prices real per-round work.
    */
  def lineitem(spark: SparkSession, n: Long): DataFrame = {
    val parts = math.max(200L, n / 30L)
    val supps = math.max(100L, n / 600L)
    val nOrders = (n + 3L) / 4L
    spark
      .range(0L, nOrders, 1L, 32)
      .select(
        col("id").as("l_orderkey"),
        explode(sequence(lit(1L), pmod(xxhash64(lit("sz"), col("id")), lit(7L)) + 1L)).as("i"))
      .select(
        col("l_orderkey"),
        (pmod(xxhash64(lit("part"), col("l_orderkey"), col("i")), lit(parts)) + 1L)
          .as("l_partkey"),
        (pmod(xxhash64(lit("supp"), col("l_orderkey"), col("i")), lit(supps)) + 1L)
          .as("l_suppkey"),
        // uniform 1..50, the TPC-H quantity band (g21's edge weights)
        (pmod(xxhash64(lit("qty"), col("l_orderkey"), col("i")), lit(50L)) + 1L)
          .cast("double")
          .as("l_quantity"))
  }

  /** Orders universe implied by [[lineitem]] (`l_orderkey = id / 4`):
    * one row per distinct orderkey. q18 (market basket) reads this table
    * as the transaction count `N`; g14 (HITS) additionally joins
    * `o_custkey`, drawn over a TPC-H-shaped customer universe
    * (customers = orders/10) so hub degrees stay scale-invariant.
    */
  def orders(spark: SparkSession, nLines: Long): DataFrame = {
    val nOrders = (nLines + 3L) / 4L
    val custs = math.max(100L, nOrders / 10L)
    spark
      .range(0L, nOrders, 1L, 32)
      .select(
        col("id").as("o_orderkey"),
        (pmod(xxhash64(lit("cust"), col("id")), lit(custs)) + 1L).as("o_custkey"))
  }

  /** Supplier dim matching [[lineitem]]'s supplier universe (`1..supps`,
    * supps = nLines/600 like the driver corpus) with nation keys drawn
    * over the TPC-H 25-nation universe — the columns g10's seed-set join
    * touches, at the driver schema's types.
    */
  def supplier(spark: SparkSession, nLines: Long): DataFrame = {
    val supps = math.max(100L, nLines / 600L)
    spark
      .range(0L, supps, 1L, 32)
      .select(
        (col("id") + 1L).as("s_suppkey"),
        pmod(xxhash64(lit("snat"), col("id")), lit(25L)).cast("int").as("s_nationkey"))
  }

  /** 25-nation dim with the driver corpus's NATION_<k> naming (g10's
    * seed filter matches on `n_name = 'NATION_0'`).
    */
  def nation(spark: SparkSession): DataFrame =
    spark
      .range(0L, 25L, 1L, 1)
      .select(
        col("id").cast("int").as("n_nationkey"),
        concat(lit("NATION_"), col("id").cast("string")).as("n_name"))

  def writeAll(spark: SparkSession, outDir: String, nDocs: Long, nVecs: Long, nEvents: Long): Unit = {
    documents(spark, nDocs).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, nVecs).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    events(spark, nEvents).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    lineitem(spark, nEvents * 6L).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    writeDims(spark, outDir, nEvents * 6L)
  }

  /** The relational dims the round-9 scale heavies (q18/g10) read —
    * separable so existing corpora gain them without regenerating the
    * large tables.
    */
  def writeDims(spark: SparkSession, outDir: String, nLines: Long): Unit = {
    orders(spark, nLines).write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    supplier(spark, nLines).write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    nation(spark).write.mode("overwrite").parquet(s"$outDir/nation.parquet")
  }

  /** args: `outDir nDocs nVecs nEvents` (full corpus),
    * `--dims outDir nEvents` (just the q18/g10 dim tables), or
    * `--rel outDir nEvents` (lineitem + dims — the relational plane
    * only, for regenerating after a lineitem shape change without
    * touching the unchanged documents/embeddings/events).
    */
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    if (args(0) == "--dims") writeDims(spark, args(1), args(2).toLong * 6L)
    else if (args(0) == "--rel") {
      val nLines = args(2).toLong * 6L
      lineitem(spark, nLines).write.mode("overwrite").parquet(s"${args(1)}/lineitem.parquet")
      writeDims(spark, args(1), nLines)
    } else writeAll(spark, args(0), args(1).toLong, args(2).toLong, args(3).toLong)
    spark.stop()
  }
}
