package graft

import org.apache.spark.sql.{Column, DataFrame}

package object queries {

  /** Deterministic total ordering for gate outputs WITHOUT a global
    * orderBy: `orderBy` adds a rangepartitioning exchange whose sampling
    * pass re-executes the entire upstream plan (measured 4.2 s of a 4.5 s
    * query). Gate outputs are small, so shuffle them to one partition and
    * sort there — upstream parallelism is preserved (repartition is a
    * shuffle boundary, unlike coalesce) and the plan runs once.
    *
    * Only for oracle-gate outputs; production paths never globally sort.
    */
  private[queries] def orderedOutput(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
