package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `PositionedWindowHashes(text, l, mod)` — the polynomial hash of EVERY
  * adjacent l-token window, IN POSITION ORDER (index i = the window
  * starting at token i): [[HashedWordNgrams]] without the sort/dedup,
  * because the span-dedup family (SpanDedup: ExactSubstr spans,
  * scrubbing, decontamination) needs to know WHERE a window sits, not
  * just that it exists.
  *
  * ≡ `transform(sequence(0, size(ws)-l), p -> PolyHash(concat_ws(" ",
  * slice(ws, p+1, l))))` over `ws = TextOps.tokens(text)`, but in one
  * byte scan with zero per-window string materialization and no
  * interpreted lambda dispatch — the same fold as [[HashedWordNgrams]]
  * (token bytes joined by one space, mod at every step), so the values
  * are bit-identical to the built-ins formulation and to the DuckDB
  * oracle's `rollhash(array_to_string(list_slice(...)))`.
  *
  * Docs shorter than l tokens return an empty array.
  */
case class PositionedWindowHashes(child: Expression, l: Int, mod: Long)
    extends UnaryExpression {
  require(l >= 1, "window length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"PositionedWindowHashes requires a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    PositionedWindowHashes.compute(input.asInstanceOf[UTF8String], l, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PositionedWindowHashes.compute($c, $l, ${mod}L)")

  override protected def withNewChildInternal(
      newChild: Expression): PositionedWindowHashes =
    copy(child = newChild)
}

object PositionedWindowHashes {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, l: Int, mod: Long): ArrayData = {
    val ws = TextTokens.tokenize(s)
    if (ws.length < l) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](ws.length - l + 1)
    var i = 0
    while (i <= ws.length - l) {
      var acc = 0L
      var j = 0
      while (j < l) {
        if (j > 0) acc = (acc * 31 + 32) % mod // the joining space
        val w = ws(i + j)
        val bytes = w.numBytes()
        var b = 0
        while (b < bytes) {
          acc = (acc * 31 + w.getByte(b)) % mod
          b += 1
        }
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  def positionedWindowHashes(c: Column, l: Int,
      mod: Long = graft.operators.TextOps.HashMod): Column =
    GraftExpressionBridge.column(
      PositionedWindowHashes(GraftExpressionBridge.expression(c), l, mod))
}
