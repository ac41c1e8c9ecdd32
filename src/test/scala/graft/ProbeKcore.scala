package graft

/** Ad-hoc probe for the g12 bench outlier (Test/runMain graft.ProbeKcore). */
object ProbeKcore {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    ProbeMain.time("g12 rep1") {
      queries.RelationalQueries.kCore(spark, sf).count()
    }
    ProbeMain.time("g12 rep2") {
      queries.RelationalQueries.kCore(spark, sf).count()
    }
    ProbeMain.time("g13 rep1") {
      queries.RelationalQueries.labelPropagation(spark, sf).count()
    }
    queries.RelationalQueries.kCore(spark, sf).explain("formatted")
  }
}
