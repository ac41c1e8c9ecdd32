package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream time-interval join — the attribution shape ("which
  * click preceded this purchase?") as ONE code path for both planes,
  * the [[WindowedAgg]] dual-plane contract: `withWatermark` is a no-op
  * on a batch frame, so the BATCH call is oracle-gated (j6) and the
  * STREAMING call — two watermarked sources joined with the identical
  * function — is held to the batch output bit-for-bit by spec.
  *
  * Semantics: inner join of a left event to every right event of the
  * SAME key whose event time falls in [left - windowUs, left]. In
  * streaming this is exactly Spark's watermarked interval join: the
  * watermark + upper/lower time bounds let the engine expire right-side
  * state once no future left row can reach it — state is bounded by
  * (watermark + window), never the stream length, which is what makes
  * the operator runnable forever on an unbounded source.
  */
object StreamStreamJoin {

  /** `left`/`right`: frames with `keyCol`, `tsUsCol` (epoch micros) and
    * `idCol`. Output: one row per qualifying pair with the exact
    * integer gap. Column names are prefixed l_/r_ so self-joins of one
    * source stay unambiguous.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsUsCol: String,
      idCol: String,
      windowUs: Long,
      watermarkSecs: Long): DataFrame = {
    val l = left
      .select(
        col(keyCol).as("l_key"),
        col(idCol).as("l_id"),
        timestamp_micros(col(tsUsCol)).as("l_ts"))
      .withWatermark("l_ts", s"$watermarkSecs seconds")
    val r = right
      .select(
        col(keyCol).as("r_key"),
        col(idCol).as("r_id"),
        timestamp_micros(col(tsUsCol)).as("r_ts"))
      .withWatermark("r_ts", s"$watermarkSecs seconds")
    l.join(
        r,
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") - expr(s"interval $windowUs microseconds") &&
          col("r_ts") <= col("l_ts"))
      .select(
        col("l_key").as("key"),
        col("l_id"),
        col("r_id"),
        (unix_micros(col("l_ts")) - unix_micros(col("r_ts"))).as("gap_us"))
  }
}
