package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<double>` or `array<float>` columns.
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
  *
  * Float arrays are accepted DIRECTLY (each element widened in the
  * loop): float→double conversion is exact, so the result is
  * bit-identical to casting the whole array first — but the pairwise
  * join stage that feeds this expression then ships 4-byte floats
  * instead of 8-byte doubles, halving the dominant shuffle of every
  * embedding near-dup pipeline. The oracle keeps its `::DOUBLE[]` cast.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isAccepted(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, r) if isAccepted(l) && isAccepted(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ArrayDot requires array<double|float> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val dot = nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Double ${ev.value}_boxed = graft.functions.ArrayDot.compute($a, $b, $lf, $rf);
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
    * element, matching the zip_with/aggregate formulation. `af`/`bf`
    * flag float-element inputs (widened — exact). Each type combination
    * gets its OWN branch-free loop: a per-element `if (af)` in the one
    * shared loop defeats JIT vectorization and cost ~40% on the
    * pair-join benchmarks, which is more than the float shuffle saves.
    */
  def compute(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    if (af && bf) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getFloat(i).toDouble * b.getFloat(i); i += 1
      }
    } else if (!af && !bf) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i); i += 1
      }
    } else if (af) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getFloat(i); i += 1
      }
    }
    acc
  }

  def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    compute(a, b, false, false)

  def arrayDot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(ArrayDot(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
