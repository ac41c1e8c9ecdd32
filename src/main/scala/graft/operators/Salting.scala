package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
