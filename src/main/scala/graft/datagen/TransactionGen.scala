package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transaction generator reproducing the
  * reference's data plane (SURVEY.md §6, FIXTURES.md §1; reference
  * `notebooks/0_prepare_transactions_dataset.ipynb`):
  *
  *   - nCards 16-digit card numbers, nTxns transactions over [start, end)
  *     with ascending timestamps (O2 invariant);
  *   - bucketed amount distribution: 5% in $0.01-1, 7.5% $1-11,
  *     52.5% $10-100, 25% $100-1000, 10% $1000-10000 (ipynb:430);
  *   - md5 transaction ids over (ts, card, amount) (F9, ipynb:524);
  *   - fraudRate of rows injected as fraud CHAINS of 3-10 transactions,
  *     30-120 s apart, all on one card (ipynb:609-611,673,746).
  *
  * All randomness is counter-based (`xxhash64(seed, index)`), so the
  * output is a pure function of (seed, params) — independent of
  * partitioning and cluster size, reproducible at any scale. Generation
  * is pure Column expressions (codegen, no UDFs, no driver loops).
  */
object TransactionGen {

  case class Params(
      nCards: Int = 1000,
      nTxns: Long = 100000L,
      startEpochSec: Long = 1577836800L, // 2020-01-01
      endEpochSec: Long = 1590969600L, // 2020-06-01
      fraudRate: Double = 0.0025,
      seed: Long = 123L)

  /** Uniform double in [0, 1) derived from (seed, tag, index). */
  private def u(seed: Long, tag: Int, idx: Column): Column =
    (pmod(xxhash64(lit(seed), lit(tag), idx), lit(1000000000L)) / lit(1e9))

  /** Card number: 16 digits, nCards distinct (4000....0000 + card index). */
  private def cardNumber(cardIdx: Column): Column =
    (lit(4000000000000000L) + cardIdx).cast("long")

  /** Bucketed amount from two uniforms (bucket pick + in-bucket position),
    * rounded to cents.
    */
  private def amount(pick: Column, pos: Column): Column = {
    val raw = when(pick < 0.05, lit(0.01) + pos * lit(0.99))
      .when(pick < 0.125, lit(1.0) + pos * lit(10.0))
      .when(pick < 0.65, lit(10.0) + pos * lit(90.0))
      .when(pick < 0.90, lit(100.0) + pos * lit(900.0))
      .otherwise(lit(1000.0) + pos * lit(9000.0))
    round(raw, 2)
  }

  /** Deterministic merchant / zip_code payload fields (reference payload
    * shape `notebooks/4_streaming_predictions.ipynb:188-202`; its own
    * simulator sends placeholder values, so any deterministic non-null
    * string is faithful — these hash to 1,000 merchants / valid-format
    * 5-digit zips).
    */
  private def merchant(seed: Long, tag: Int, idx: Column): Column =
    concat(lit("merchant-"), lpad(pmod(xxhash64(lit(seed), lit(tag), idx), lit(1000L)).cast("string"), 4, "0"))

  private def zipCode(seed: Long, tag: Int, idx: Column): Column =
    lpad(pmod(xxhash64(lit(seed), lit(tag), idx), lit(100000L)).cast("string"), 5, "0")

  /** Legit transactions: ascending timestamps with jitter, hashed cards. */
  private def legit(spark: SparkSession, p: Params): DataFrame = {
    val span = p.endEpochSec - p.startEpochSec
    val step = span.toDouble / p.nTxns
    spark
      .range(0, p.nTxns)
      .select(
        col("id"),
        (lit(p.startEpochSec) + (col("id") * lit(step)).cast("long")).as("ts_sec"),
        cardNumber(pmod(xxhash64(lit(p.seed), lit(1), col("id")), lit(p.nCards.toLong))).as("cc_num"),
        merchant(p.seed, 4, col("id")).as("merchant"),
        amount(u(p.seed, 2, col("id")), u(p.seed, 3, col("id"))).as("amount"),
        zipCode(p.seed, 5, col("id")).as("zip_code"),
        lit(0).as("fraud_label"))
  }

  /** Fraud chains: chains of 3-10 txns on one card each, consecutive gaps
    * uniform in [30, 120] s, truncated to EXACTLY nTxns*fraudRate rows.
    *
    * Chain length cycles deterministically (len = 3 + chain % 8, uniform
    * over 3..10, mean 6.5), which makes the global row index of (chain,
    * pos) CLOSED FORM: prefix(c) = 3c + 28*floor(c/8) + r(r-1)/2 with
    * r = c % 8. The exact-count cutoff is then a plain filter — the
    * previous `row_number() OVER (ORDER BY id)` forced every fraud row
    * through ONE partition (the WindowExec single-partition warning in
    * every bench log) and would serialize at scale; this is O(1) per row
    * with no shuffle at all.
    */
  private def fraud(spark: SparkSession, p: Params): DataFrame = {
    val targetRows = math.round(p.nTxns * p.fraudRate)
    // enough cycling chains to cover targetRows (mean len 13/2) + cushion
    val nChains = math.max(1L, 2L * targetRows / 13L + 3L)
    val span = p.endEpochSec - p.startEpochSec
    val chains = spark
      .range(0, nChains)
      .select(
        col("id").as("chain"),
        (lit(3L) + pmod(col("id"), lit(8L))).as("len"),
        (lit(p.startEpochSec) +
          (u(p.seed, 11, col("id")) * lit(span.toDouble - 1500)).cast("long")).as("chain_start"),
        // affine map (odd multiplier, coprime to any nCards power of 10)
        // gives each chain a DISTINCT card while nChains <= nCards, so two
        // chains never interleave on one card and chain gaps stay analyzable
        cardNumber(pmod(col("id") * lit(2654435761L) + lit(p.seed), lit(p.nCards.toLong))).as("cc_num"))
    // closed-form global row index of (chain, pos) under cyclic lengths
    val rem = pmod(col("chain"), lit(8L))
    val fullCycles = ((col("chain") - rem) / 8).cast("long")
    val prefix = lit(3L) * col("chain") + lit(28L) * fullCycles + (rem * (rem - 1) / 2).cast("long")
    chains
      .select(
        col("chain"),
        col("cc_num"),
        col("chain_start"),
        posexplode(sequence(lit(0), col("len") - 1)).as(Seq("pos", "_m")))
      // exact fraud row count with a DETERMINISTIC, shuffle-free cutoff
      .filter(prefix + col("pos") < targetRows)
      // cumulative gap: sum over j in [1, pos] of gap(chain, j), gaps in
      // [30, 120]. pos=0 must be guarded: sequence(1, 0) counts DOWN.
      .withColumn(
        "ts_sec",
        col("chain_start") + when(col("pos") === 0, lit(0L)).otherwise(
          aggregate(
            sequence(lit(1), col("pos")),
            lit(0L),
            (acc, j) => acc + (pmod(xxhash64(lit(p.seed), lit(13), col("chain"), j), lit(91L)) + 30))))
      .select(
        (col("chain") * 1000 + col("pos") + lit(10000000000L)).as("id"),
        col("ts_sec"),
        col("cc_num"),
        merchant(p.seed, 16, col("chain") * 1000 + col("pos")).as("merchant"),
        amount(u(p.seed, 14, col("chain") * 1000 + col("pos")),
          u(p.seed, 15, col("chain") * 1000 + col("pos"))).as("amount"),
        zipCode(p.seed, 17, col("chain") * 1000 + col("pos")).as("zip_code"),
        lit(1).as("fraud_label"))
  }

  /** Full table: tid, datetime (TimestampType), cc_num, merchant, amount,
    * zip_code, fraud_label — the reference's table plus its streaming
    * payload fields.
    */
  def transactions(spark: SparkSession, p: Params = Params()): DataFrame =
    legit(spark, p)
      .unionByName(fraud(spark, p))
      .select(
        md5(concat_ws("|",
          col("ts_sec").cast("string"),
          col("cc_num").cast("string"),
          col("amount").cast("string")).cast("binary")).as("tid"),
        timestamp_seconds(col("ts_sec")).as("datetime"),
        col("cc_num"),
        col("merchant"),
        col("amount"),
        col("zip_code"),
        col("fraud_label"))
      .orderBy(col("datetime"), col("tid"))
}
