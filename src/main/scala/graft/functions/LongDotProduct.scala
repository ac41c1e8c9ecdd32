package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns as a native
  * codegen'd Catalyst expression.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) builds
  * per-row lambda interpreters and intermediate arrays — measured ~10x
  * slower on the similarity-search hot path. This stays inside
  * whole-stage codegen with a primitive long[] loop. Used by
  * [[graft.operators.Similarity]] for dots and squared norms over
  * micro-quantized embeddings (SURVEY.md §2.8 posture: prefer a custom
  * `Expression` over UDFs when built-ins can't express the hot path
  * efficiently).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += x(i) * y(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $y = $b.toLongArray();
         |int $n = Math.min($x.length, $y.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) { $s += $x[$i] * $y[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  /** Column-level entry point: dot(a, b) over array<bigint>. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
