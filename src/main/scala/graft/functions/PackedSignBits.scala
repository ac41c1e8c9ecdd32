package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `planes.length` sign bits of a binary-quantization signature in ONE
  * codegen'd pass: bit i of the result is set iff `<qv, planes(i)> >= 0`
  * (exact integer dots, identical arithmetic to summing per-plane
  * `CASE WHEN longdotproduct(qv, plane_i) >= 0 THEN 1<<i ELSE 0 END`).
  *
  * Exists because the composed per-plane form defeats execution: 62
  * chained CASE/[[LongDotProduct]] terms build an expression tree large
  * enough that whole-stage codegen fails to compile and the scan falls
  * back to interpreted per-operator evaluation — each row then pays 62
  * interpreted evals, each of which re-materializes BOTH the row's vector
  * and the constant plane via `toLongArray()` (124 array copies per row).
  * Here the plane matrix is one reference object hoisted out of the loop
  * and the row's vector materializes once, so the signature scan stays
  * inside whole-stage codegen with a primitive `long[][]` loop (the
  * SURVEY.md §2.8 posture, same as [[LongDotProduct]]).
  */
case class PackedSignBits(child: Expression, planes: Array[Array[Long]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 62,
    s"packed signature needs 1..62 planes, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"packed_sign_bits expects array<bigint>, got $other")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(x.length, p.length)
      var s = 0L
      var i = 0
      while (i < n) {
        s += x(i) * p(i)
        i += 1
      }
      if (s >= 0L) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $x = $a.toLongArray();
         |long $sig = 0L;
         |for (int $b = 0; $b < $planesRef.length; $b++) {
         |  long[] $p = $planesRef[$b];
         |  int $n = Math.min($x.length, $p.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) { $s += $x[$i] * $p[$i]; }
         |  if ($s >= 0L) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackedSignBits {
  /** Column-level entry point: the packed `planes.length`-bit sign
    * signature of an `array<bigint>` vector.
    */
  def packedSigns(qv: Column, planes: Array[Array[Long]]): Column =
    ColumnBridge.column(PackedSignBits(ColumnBridge.expression(qv), planes))
}
