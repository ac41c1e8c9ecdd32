package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at cluster scale (SURVEY.md §7.4
  * risk 8). AQE's skew-join splitting covers sort-merge joins; these cover
  * the cases it does not: skewed AGGREGATIONS (two-phase salted partials)
  * and broadcast-ineligible joins against a replicable small side.
  *
  * All salting here is deterministic (hash of real columns, never rand()),
  * so results are reproducible and retries are safe.
  */
object Salting {

  /** Two-phase salted sum/count: groupBy(key, salt) partials, then final
    * groupBy(key). Result identical to a direct groupBy — the salt only
    * splits hot keys across `buckets` reducers in phase one.
    *
    * @param saltSource a high-cardinality column used to derive the salt
    */
  def saltedSumCount(
      df: DataFrame,
      key: Seq[String],
      valueCol: String,
      saltSource: Column,
      buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(key.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** Skew-safe exact top-k per key: phase one ranks within (key, salt)
    * and keeps each bucket's top k; phase two ranks the <= k * buckets
    * survivors within key. A plain per-key window funnels a hot key's
    * ENTIRE row set through one task (partial aggregation rescues salted
    * sums, but nothing rescues a window sort — this is where skew
    * genuinely bites Spark); the salted form bounds any task's sort at
    * its bucket and the final pass at k * buckets rows per key. Exact,
    * not approximate: every global top-k row ranks <= k inside its own
    * bucket, so phase one never discards a winner. `order` must be a
    * TOTAL order (include a tie-break column) or survivors at the cut are
    * nondeterministic. Output: the input columns plus `rnk` (1-based).
    */
  def saltedTopK(
      df: DataFrame,
      key: Seq[String],
      order: Seq[Column],
      k: Int,
      saltSource: Column,
      buckets: Int): DataFrame = {
    val w1 = Window.partitionBy((key.map(col) :+ col("__salt")): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= k)
      .drop("__salt", "__r1")
  }

  /** Skewed equi-join: salt the big side deterministically, replicate the
    * small side across all salt values, join on (key, salt). Use when the
    * small side is too big to broadcast but cheap to replicate `buckets`x.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
