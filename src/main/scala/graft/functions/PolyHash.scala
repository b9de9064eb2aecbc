package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash: fold over the string's code points of
  * `(acc * 31 + cp) % mod`, starting from 0.
  *
  * This is the inner loop of every dedup signature (MinHash shingle
  * hashing, SimHash token hashing). The built-in-only formulation —
  * `aggregate(transform(regexp_extract_all(s, '.'), ascii), 0, fold)` —
  * allocates a per-character array and dispatches two interpreted lambdas
  * per character (higher-order functions don't participate in whole-stage
  * codegen). This expression evaluates in one tight loop and participates
  * in codegen via a static call, ~10× less work per string.
  *
  * Semantics match the DuckDB oracle fragment
  * `list_reduce(list_prepend(0, list_transform(regexp_extract_all(s,'.'),
  * ascii)), (a,b) -> (a*31+b) % mod)` for any string (code-point
  * iteration, like RE2's '.').
  */
case class PolyHash(child: Expression, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PolyHash requires a string child, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.compute($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, mod: Long): Long = {
    var acc = 0L
    val str = s.toString
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  def polyHash(c: Column, mod: Long): Column =
    GraftExpressionBridge.column(PolyHash(GraftExpressionBridge.expression(c), mod))
}
