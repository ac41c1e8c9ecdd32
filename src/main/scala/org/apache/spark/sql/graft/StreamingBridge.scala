package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's `private[sql]` streaming-DataFrame constructor —
  * what a custom v1 streaming `Source.getBatch` must return (the
  * MicroBatchExecution asserts `isStreaming`; FileStreamSource builds its
  * batches the same way). Lives in the org.apache.spark.sql namespace
  * like [[ColumnBridge]], the standard no-fork extension seam.
  */
object StreamingBridge {

  /** Re-wrap a (batch) DataFrame's physical rows as a STREAMING frame of
    * the same schema — lazy (the underlying RDD is the query's
    * `toRdd`, nothing materializes until the micro-batch runs).
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd,
      df.schema,
      isStreaming = true)
  }

  /** An empty streaming frame of `schema` (a micro-batch in which no
    * version landed).
    */
  def emptyStreamingFrame(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema,
      isStreaming = true)
  }
}
