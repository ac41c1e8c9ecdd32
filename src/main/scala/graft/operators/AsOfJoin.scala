package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General as-of join: each left row picks the single right row with the
  * greatest `rightTime <= leftTime` for its key (the temporal lookup under
  * every point-in-time-correct feature join; the reference's staleness
  * gate in `ServingJoin` is the one-snapshot special case).
  *
  * Spark-first shape: instead of a per-row range join (which Catalyst
  * plans as a broadcast-nested-loop over the time inequality), UNION the
  * tagged sides and run ONE `last(ignoreNulls)` window over
  * (key, time, side) — a single hash exchange + sort, linear scan per
  * key, no quadratic anything; the same plan shape the trailing windows
  * use, so it scales identically. Right rows order BEFORE left rows at
  * equal time, so an exactly-simultaneous snapshot matches (>= semantics,
  * matching DuckDB's ASOF JOIN, which the oracle uses verbatim). The
  * matched row travels as ONE struct, so all payload columns come from the
  * SAME right row even if some of its fields are null.
  *
  * Left rows with no prior right row keep NULL payloads (ASOF LEFT JOIN
  * contract); callers coalesce if they need totals.
  */
object AsOfJoin {

  /** @param payload right-side columns carried to the matched left rows
    * @return left columns + `asof_ts` (matched rightTime) + payload columns
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val otherLeft = leftCols.filterNot(_ == key)
    val matchStruct = struct(col(rightTime).as("asof_ts") +: payload.map(col): _*)
    val taggedRight = right.select(
      col(key) +:
        col(rightTime).as("__t") +:
        lit(1).as("__is_right") +:
        matchStruct.as("__m") +:
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val nullMatch = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        right.schema(rightTime).copy(name = "asof_ts") +: payload.map(right.schema(_))))
    val taggedLeft = left.select(
      col(key) +:
        col(leftTime).as("__t") +:
        lit(0).as("__is_right") +:
        nullMatch.as("__m") +:
        otherLeft.map(col): _*)
    // right first at equal time => >= match semantics
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight
      .unionByName(taggedLeft)
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(
        (Seq(col(key)) ++
          otherLeft.map(col) ++
          Seq(col("__m.asof_ts").as("asof_ts")) ++
          payload.map(c => col(s"__m.$c").as(c))): _*)
  }
}
