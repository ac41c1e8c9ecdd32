package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `SELECT long_dot(a, b)` / `word_shingles(text, 3)` work from plain
  * Spark SQL (SURVEY.md §2.8 posture item (c): expressions registered via
  * SparkSessionExtensions — plus a runtime registrar for sessions that
  * already exist).
  */
object GraftFunctions {

  private def buildLongDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "long_dot(arrayA, arrayB)")
    LongDotProduct(exprs(0), exprs(1))
  }

  private def buildKmvDistinct(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "kmv_distinct(entity, k, seed)")
    (exprs(1), exprs(2)) match {
      case (Literal(k: Int, _), Literal(seed, _)) =>
        KmvDistinctAgg(exprs(0), k, seed.toString).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"kmv_distinct k and seed must be literals, got $other")
    }
  }

  private def buildWordShingles(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "word_shingles(text, n)")
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"word_shingles n must be an integer literal, got $other")
    }
    WordShingles(exprs(0), n)
  }

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("long_dot", buildLongDot, "scala_udf")
    registry.createOrReplaceTempFunction("word_shingles", buildWordShingles, "scala_udf")
    registry.createOrReplaceTempFunction("kmv_distinct", buildKmvDistinct, "scala_udf")
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` deployment path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
      (exprs: Seq[Expression]) => LongDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(n: Int, _) => WordShingles(exprs(0), n)
        case other => throw new IllegalArgumentException(
          s"word_shingles n must be an integer literal, got $other")
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinctAgg].getName, "kmv_distinct"),
      (exprs: Seq[Expression]) => (exprs(1), exprs(2)) match {
        case (Literal(k: Int, _), Literal(seed, _)) =>
          KmvDistinctAgg(exprs(0), k, seed.toString).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"kmv_distinct k and seed must be literals, got $other")
      }))
  }
}
