package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc A/B probe for the t10 term-importance plan shapes
  * (Test/runMain graft.ProbeT10 [sfDir]): r6's double-explode + join vs
  * the one-explode window form, timed alternately in one JVM.
  */
object ProbeT10 {

  private def consume(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
      .agg(bit_xor(col("h")))
      .collect()
    ()
  }

  def oldShape(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val toks = docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tf.join(df, Seq("token"))
      .withColumn("score", col("tf") * (lit(n) - col("df")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("doc_id", "rnk", "token", "tf", "df", "score")
      .repartition(1)
      .sortWithinPartitions(col("doc_id"), col("rnk"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    consume(SparkEntry.entry(spark)) // warm
    for (r <- 1 to 5) {
      val t0 = System.nanoTime()
      consume(oldShape(spark, sfDir))
      val t1 = System.nanoTime()
      consume(graft.queries.DocQueries.termImportance(spark, sfDir))
      val t2 = System.nanoTime()
      println(f"[probe] rep $r old=${(t1 - t0) / 1e9}%6.2f s  new=${(t2 - t1) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
