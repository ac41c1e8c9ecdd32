package graft.store

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Online keyed feature store: last-write-wins upsert with event-time
  * versioning and point lookups (SURVEY.md §1.4; reference semantics of
  * `put_record`/`get_record`,
  * `src/lambda/StreamingIngestAggFeatures/lambda_function.py:25-56`,
  * `src/lambda/InvokeFraudEndpointLambda/lambda_function.py:230-277`).
  *
  * Semantics reproduced:
  *   - `put` fully replaces the record for a key iff the new event time is
  *     >= the stored one (last-write-wins; equal times: latest put wins);
  *   - `get` returns the latest record or None;
  *   - values are typed in-engine; [[recordAsStrings]] provides the
  *     reference's ValueAsString codec at the boundary.
  *
  * Scale posture: this in-memory TrieMap is the single-node serving tier
  * (the reference's equivalent was a managed online store). The engine
  * never depends on it for distributed work — [[snapshot]] exposes the
  * contents as a DataFrame for broadcast stream-static joins, and
  * [[upsertBatch]] is the foreachBatch sink boundary where a cluster
  * deployment would swap in an external KV writer via foreachPartition.
  */
final class OnlineFeatureStore(val featureNames: Seq[String]) {

  /** key -> (eventTimeUs, feature values aligned with featureNames). */
  private val records = TrieMap.empty[Long, (Long, Array[Double])]

  def put(key: Long, eventTimeUs: Long, values: Array[Double]): Unit = {
    require(values.length == featureNames.length)
    records.updateWith(key) {
      case existing @ Some((t, _)) if t > eventTimeUs => existing
      case _ => Some((eventTimeUs, values))
    }
  }

  def get(key: Long): Option[(Long, Array[Double])] = records.get(key)

  /** Remove a key — the reference store's DeleteRecord twin (the online
    * half of a table-side row erasure; the change-feed sync path applies
    * `delete` feed rows through this).
    */
  def delete(key: Long): Unit = { records.remove(key); () }

  /** Record-level TTL read — the reference online store's TtlDuration
    * semantics (record expiry was added to the managed store as a
    * record-level duration): a record whose event time is `ttlUs` or
    * more behind `asOfUs` is INVISIBLE to reads immediately, regardless
    * of whether the background cleaner ([[expire]]) has physically
    * removed it yet. Expiry is strict at the boundary: a record exactly
    * `ttlUs` old is expired.
    */
  def getLive(key: Long, asOfUs: Long, ttlUs: Long): Option[(Long, Array[Double])] =
    records.get(key).filter { case (t, _) => t + ttlUs > asOfUs }

  /** TTL-filtered [[snapshot]] — the serving view under record expiry
    * (what a stream-static join against the store must see when TTL is
    * declared).
    */
  def snapshotLive(spark: SparkSession, asOfUs: Long, ttlUs: Long): DataFrame =
    snapshot(spark).filter(col("event_time_us") + lit(ttlUs) > lit(asOfUs))

  /** The background cleaner: physically remove every expired record.
    * Returns the removed count. Reads never depend on it running —
    * [[getLive]]/[[snapshotLive]] filter regardless — so the cleaner's
    * cadence is purely a memory-reclaim policy.
    */
  def expire(asOfUs: Long, ttlUs: Long): Int = {
    val dead = records.collect { case (k, (t, _)) if t + ttlUs <= asOfUs => k }.toList
    dead.foreach(records.remove)
    dead.size
  }

  def getFeature(key: Long, name: String): Option[Double] = {
    val idx = featureNames.indexOf(name)
    if (idx < 0) None else records.get(key).map(_._2(idx))
  }

  /** Reference-parity string codec (`ValueAsString`). */
  def recordAsStrings(key: Long): Option[Map[String, String]] =
    records.get(key).map { case (t, vs) =>
      (featureNames.zip(vs.map(_.toString)) :+ ("event_time_us" -> t.toString)).toMap
    }

  def size: Int = records.size

  /** Upsert every row of a batch; expects columns (key, event_time_us,
    * featureNames*). Collecting is the driver-side serving boundary, not a
    * distributed operator — see class doc.
    */
  def upsertBatch(df: DataFrame): Unit = {
    val names = featureNames
    df.select(
        (Seq(col("key").cast("long"), col("event_time_us").cast("long")) ++
          names.map(n => col(n).cast("double"))): _*)
      .collect()
      .foreach { r =>
        put(r.getLong(0), r.getLong(1), names.indices.map(i => r.getDouble(i + 2)).toArray)
      }
  }

  /** Current contents as a DataFrame for broadcast/stream-static joins. */
  def snapshot(spark: SparkSession): DataFrame = {
    val schema = StructType(
      StructField("key", LongType) +: StructField("event_time_us", LongType) +:
        featureNames.map(n => StructField(n, DoubleType)))
    val rows = records.map { case (k, (t, vs)) =>
      Row.fromSeq(k +: t +: vs.toSeq)
    }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Persist / restore the snapshot as parquet. */
  def save(spark: SparkSession, path: String): Unit =
    snapshot(spark).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): Unit =
    spark.read.parquet(path).collect().foreach { r =>
      put(
        r.getLong(0),
        r.getLong(1),
        featureNames.indices.map(i => r.getDouble(i + 2)).toArray)
    }
}
