package graft

/** Ad-hoc timing probe for the graph gates (Test/runMain graft.ProbeGraph
  * [sfDir]): times g4/g5/g6 with the shared persisted edge/triangle
  * frames under a CacheScope batch, the way Bench runs them.
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    val qs = Map(
      "g4_triangles" -> SparkEntry.queries("g4_triangles"),
      "g5_khop_reach" -> SparkEntry.queries("g5_khop_reach"),
      "g6_edge_jaccard" -> SparkEntry.queries("g6_edge_jaccard"))
    CacheScope.scoped(spark) {
      val timings = Bench.timeQueries(spark, sfDir, qs, reps = 4)
      timings.foreach { t =>
        println(f"[probe] ${t.name}%-18s med=${t.med}%.2f runs=${t.runs.map(r => f"$r%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
