package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The built-in formulation — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0d, (acc,v) -> acc+v)` — materializes a products array and dispatches
  * interpreted lambdas per element; on a 2.5M-pair × 64-dim near-dup join
  * it dominates the runtime (and JITs poorly, causing 10× run-to-run
  * swings). This expression is one fused multiply-add loop.
  *
  * Float math parity: the loop performs exactly the fold's IEEE op
  * sequence (`acc = acc + a(i)*b(i)` in index order), so results are
  * bit-identical to the built-ins version and the DuckDB oracle rounding
  * stays valid. A NULL element poisons the result to NULL, matching
  * `zip_with`/`aggregate` semantics; length mismatch follows zip_with's
  * pad-with-NULL → NULL.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ArrayDot requires array<double> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dot = nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Double ${ev.value}_boxed = graft.functions.ArrayDot.compute($a, $b);
         |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
       """.stripMargin)
    dot
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Shared kernel; returns null (boxed) on length mismatch or any NULL
    * element, matching the zip_with/aggregate formulation.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = acc + a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def arrayDot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(ArrayDot(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
