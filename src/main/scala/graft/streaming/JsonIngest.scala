package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream codec parity (SURVEY.md §2.1 S2/S3, §2.6 F6/F7): the reference's
  * transaction payloads are JSON records (base64-wrapped at the Lambda
  * boundary) with JSONPath column mapping
  * (`notebooks/4_streaming_predictions.ipynb:188-202`,
  * `src/lambda/StreamingIngestAggFeatures/lambda_function.py:43-44`,
  * `notebooks/1_setup.ipynb:504-507`).
  *
  * Spark-native mapping: `unbase64` -> `from_json(schema)` -> typed
  * columns; the producer side is `to_json(struct(...))`. Works identically
  * on batch frames and `readStream` sources (Kafka value, file source).
  */
object JsonIngest {

  /** Reference payload shape (cc_num/merchant/amount/zip_code/trans_ts). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("cc_num", LongType),
    StructField("merchant", StringType),
    StructField("amount", DoubleType),
    StructField("zip_code", StringType),
    StructField("trans_ts", DoubleType))) // epoch seconds (reference F4)

  /** Producer: typed columns -> JSON string (F7). */
  def encode(ccNum: Column, merchant: Column, amount: Column, zip: Column, transTs: Column): Column =
    to_json(struct(
      ccNum.as("cc_num"),
      merchant.as("merchant"),
      amount.as("amount"),
      zip.as("zip_code"),
      transTs.as("trans_ts")))

  /** Decode a base64-wrapped JSON payload column into typed fields (F6). */
  def decodeBase64(df: DataFrame, payload: Column): DataFrame =
    decodeJson(df, unbase64(payload).cast("string"))

  /** Decode a JSON string column into typed fields. */
  def decodeJson(df: DataFrame, json: Column): DataFrame =
    df.withColumn("p", from_json(json, payloadSchema)).select(col("p.*"))

  /** Typed payload -> the streaming-agg input contract (exact cents,
    * epoch-seconds -> micros). EVENT-TIME mode: `ordUs` is the payload's
    * own `trans_ts` — the documented semantic upgrade over the reference
    * (SURVEY §2.7 T1).
    */
  def toStreamEvents(decoded: DataFrame): DataFrame =
    decoded.select(
      col("cc_num").as("userId"),
      (col("trans_ts") * 1000000).cast("long").as("ordUs"),
      round(col("amount") * 100).cast("long").as("cents"))

  /** ARRIVAL-TIME parity mode (SURVEY §2.7 T1): `ordUs` is stamped from an
    * injectable arrival clock instead of the payload timestamp, which is
    * exactly KDA ROWTIME — the reference's continuous query windows
    * `RANGE INTERVAL '10' MINUTE PRECEDING` over the row's stream-entry
    * time, not `trans_ts` (`notebooks/1_setup.ipynb` STREAM_PUMP window).
    * Downstream trailing windows ([[StreamingAgg.trailingAgg]]) then
    * reproduce ROWTIME semantics verbatim: a late-arriving event is
    * windowed where it ARRIVED, so its frame counts everything that
    * arrived in the preceding horizon regardless of how stale its payload
    * is — where event-time mode windows it back at its own `trans_ts`.
    *
    * `arrivalUs` is a Column so the clock is injectable: production
    * ingest stamps `unix_micros(current_timestamp())` per micro-batch;
    * tests and replays pass a recorded arrival column for deterministic
    * parity runs.
    */
  def toStreamEventsArrival(decoded: DataFrame, arrivalUs: Column): DataFrame =
    decoded.select(
      col("cc_num").as("userId"),
      arrivalUs.cast("long").as("ordUs"),
      round(col("amount") * 100).cast("long").as("cents"))
}
