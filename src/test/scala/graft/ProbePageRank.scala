package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe for the g3 PageRank plan
  * (Test/runMain graft.ProbePageRank [sfDir]): times the gate query
  * end-to-end a few times in one JVM and prints the per-rep seconds plus
  * the physical-plan exchange count of one iteration's join.
  */
object ProbePageRank {

  private def consume(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
      .agg(bit_xor(col("h")))
      .collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    consume(SparkEntry.entry(spark)) // warm
    (1 to 4).foreach { rep =>
      CacheScope.scoped(spark) {
        val t0 = System.nanoTime()
        consume(queries.RelationalQueries.pagerank(spark, sfDir))
        println(f"rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val plan = CacheScope.scoped(spark) {
      val df = queries.RelationalQueries.pagerank(spark, sfDir)
      df.queryExecution.executedPlan.toString
    }
    val exchanges = "Exchange".r.findAllIn(plan).length
    println(s"exchange operators in final plan: $exchanges")
    spark.stop()
  }
}
