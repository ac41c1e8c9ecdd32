package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink parity (SURVEY.md §2.1 S1/S4; reference
  * `notebooks/2_batch_ingestion.ipynb:255-268,295-300`).
  *
  * The reference reads a header-bearing CSV with `header=False` under an
  * explicit schema, so the header row nulls out under PERMISSIVE parsing
  * and is dropped later (§1.3). [[readTyped]] is the fixed form;
  * [[readReferenceQuirk]] reproduces the quirk exactly for parity tests.
  */
object Csv {

  /** Typed scan, header handled properly — the engine's default. */
  def readTyped(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Reference-faithful scan: header=false + PERMISSIVE => one all-null
    * artifact row per file, removed by na.drop like the reference's dropna.
    */
  def readReferenceQuirk(
      spark: SparkSession,
      path: String,
      schema: StructType,
      dropNullArtifacts: Boolean = true): DataFrame = {
    val raw = spark.read
      .schema(schema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)
    if (dropNullArtifacts) raw.na.drop("all") else raw
  }

  /** Training-set export: single CSV file with header, overwrite (S4).
    * `coalesce(1)` is kept ONLY for fixture parity — at scale write
    * many parts (the default) and let consumers glob.
    */
  def writeSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Scale-path export: parallel parts, optionally bucketed by a key. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
