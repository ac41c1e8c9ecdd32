package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

import java.nio.file.{Files, Paths}

/** Dev measurement harness for the optimization rounds (guide §1): time a
  * subset of the declared queries in isolation (same full-result consumer
  * as [[Bench]], so numbers are comparable to bench gates) and dump each
  * query's `.explain("formatted")` to a file so plan claims are auditable
  * offline. Not part of the driver contract — Bench/Verify are unchanged.
  *
  * Usage: runMain graft.PlanLab <sfDir> <outDir> <reps> [query ...]
  *   (no query names = all declared queries)
  */
object PlanLab {
  private def consume(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
      .agg(bit_xor(col("h")))
      .collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val reps = args(2).toInt
    val names = args.drop(3).toSeq
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    val all = SparkEntry.queries
    val selected =
      if (names.isEmpty) all.toSeq.sortBy(_._1)
      else names.map(n => n -> all(n))
    val lines = collection.mutable.ArrayBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      CacheScope.scoped(spark) {
        spark.sparkContext.setJobDescription(s"planlab: $name")
        val runs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          consume(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        val med = Bench.median(if (runs.size > 1) runs.drop(1) else runs)
        val line = f"$name%-28s med=$med%7.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}"
        println(s"PLANLAB $line")
        lines += line
      }
    }
    Files.writeString(Paths.get(s"$outDir/_timings.txt"), lines.mkString("", "\n", "\n"))
    spark.stop()
  }
}
