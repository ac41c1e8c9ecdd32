package graft.store

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Schema-typed online feature store: the [[OnlineFeatureStore]] semantics
  * (last-write-wins by event time, point lookup, snapshot) with per-feature
  * types driven by a [[FeatureGroupSchema]] instead of all-double values.
  *
  * The wire format is the reference's record codec — FeatureName ->
  * ValueAsString pairs (`src/lambda/StreamingIngestAggFeatures/
  * lambda_function.py:41-51`, `InvokeFraudEndpointLambda/lambda_function
  * .py:230-277`): [[putRecord]] parses each string by its declared type
  * (Integral -> Long, Fractional -> Double, String kept), so a 16-digit
  * bigint record identifier survives exactly where a double would round
  * above 2^53.
  *
  * Same scale posture as [[OnlineFeatureStore]]: a single-node serving
  * boundary fed |keys| rows; [[snapshot]] exposes contents for broadcast
  * stream-static joins.
  */
final class TypedFeatureStore(val schema: FeatureGroupSchema) {

  import FeatureGroupSchema.FeatureType

  private val records = TrieMap.empty[Any, Array[Any]]

  private val idIdx = schema.features.indexWhere(_.name == schema.recordIdentifier)
  private val timeIdx = schema.features.indexWhere(_.name == schema.eventTimeFeature)

  private def parse(tpe: FeatureType, s: String): Any = tpe match {
    case FeatureType.Integral => s.toLong
    case FeatureType.Fractional => s.toDouble
    case FeatureType.FString => s
  }

  /** Event-time comparison for LWW, per declared type: Longs compare as
    * Long (coercing to Double would lose precision above 2^53 — the exact
    * rounding failure this typed store exists to avoid for Integral
    * columns), Doubles as Double; mixed/unknown representations fall back
    * to the string codec's numeric parse on BOTH sides.
    */
  private def newerOrSame(a: Array[Any], b: Array[Any]): Boolean =
    (a(timeIdx), b(timeIdx)) match {
      case (x: Long, y: Long) => x >= y
      case (x: Double, y: Double) => x >= y
      case (x, y) => x.toString.toDouble >= y.toString.toDouble
    }

  /** Upsert one record in the reference wire format (ValueAsString in).
    * Replaces the key's record iff the new event time is >= the stored one
    * (LWW; equal times: latest put wins).
    */
  def putRecord(record: Map[String, String]): Unit = {
    val vals = schema.features.map { f =>
      parse(
        f.tpe,
        record.getOrElse(
          f.name,
          throw new IllegalArgumentException(s"record missing feature '${f.name}'")))
    }.toArray
    val key = vals(idIdx)
    records.updateWith(key) {
      case existing @ Some(old) if !newerOrSame(vals, old) => existing
      case _ => Some(vals)
    }
  }

  /** Point lookup: typed values by feature name. */
  def getRecord(key: Any): Option[Map[String, Any]] =
    records.get(key).map(vals => schema.features.map(_.name).zip(vals).toMap)

  /** Point lookup in the reference's ValueAsString codec. */
  def getRecordAsStrings(key: Any): Option[Map[String, String]] =
    records.get(key).map(vals =>
      schema.features.map(_.name).zip(vals.map(_.toString)).toMap)

  def size: Int = records.size

  /** Current contents as a typed DataFrame (schema = [[FeatureGroupSchema.structType]]). */
  def snapshot(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(records.values.map(vals => Row.fromSeq(vals.toSeq)).toSeq, 1),
      schema.structType)
}
