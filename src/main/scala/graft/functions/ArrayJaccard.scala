package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaccard similarity of two DISTINCT string arrays (shingle sets).
  *
  * Replaces `size(array_intersect(a,b)) / size(array_union(a,b))` in the
  * LSH verification step: the built-ins build two fresh arrays (plus an
  * internal hash set each) per candidate pair; this is one set build +
  * one probe pass, no array materialization, codegen-friendly.
  *
  * Inputs are assumed distinct (bigrams/shingle sets are) — |A∪B| is
  * computed as |A|+|B|-|A∩B|, which matches array_union's dedup exactly
  * under that assumption.
  *
  * Empty∪empty returns 0.0 — the DuckDB oracle's `CASE WHEN len(...)=0
  * THEN 0.0` guard. NB the built-ins formulation divides 0/0 → NaN, and
  * Spark orders NaN ABOVE every threshold, so two empty docs would pass a
  * `jaccard >= t` filter — a latent cross-engine divergence this
  * expression removes.
  */
case class ArrayJaccard(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ArrayJaccard requires array<string> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}

object ArrayJaccard {
  /** Shared kernel: |A∩B| / (|A|+|B|-|A∩B|) over distinct string arrays;
    * 0.0 when both sides are empty.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    // probe the smaller side against a set of the larger
    val (small, nSmall, large, nLarge) =
      if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val set = new java.util.HashSet[UTF8String](nLarge * 2)
    var i = 0
    while (i < nLarge) { set.add(large.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nSmall) {
      if (set.contains(small.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  def arrayJaccard(a: Column, b: Column): Column =
    GraftExpressionBridge.column(ArrayJaccard(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
