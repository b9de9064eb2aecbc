package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizers for the text-analysis/dedup hot path.
  *
  * Every LLM-pipeline query tokenizes `documents.text` first, and the
  * built-in formulation — `regexp_extract_all(lower(text), '[a-z0-9]+')`
  * plus higher-order `zip_with`/`filter`/`array_distinct` for shingles —
  * pays a java.util.regex scan per row and an interpreted lambda dispatch
  * per element (higher-order functions don't participate in whole-stage
  * codegen). These expressions do the same work in one tight byte scan
  * and participate in codegen via a static call.
  *
  * Exact-equivalence argument (TextOpsSpec asserts it differentially):
  * the token pattern `[a-z0-9]+` only matches ASCII, and in UTF-8 every
  * non-ASCII code point is encoded with bytes ≥ 0x80 — so after applying
  * the same Unicode lowercasing as Spark's `lower()` (UTF8String
  * .toLowerCase), maximal runs of ASCII `[a-z0-9]` BYTES are precisely
  * the regex matches, in the same order.
  */
object TextTokens {

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Token list of `s` (lowercased alnum runs), as UTF8String slices over
    * one shared byte array — no per-token copies.
    */
  def tokenize(s: UTF8String): Array[UTF8String] = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      if (isWordByte(bytes(i))) {
        val start = i
        while (i < n && isWordByte(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    out.toArray(new Array[UTF8String](out.size))
  }

  def computeTokens(s: UTF8String): ArrayData =
    new GenericArrayData(tokenize(s).asInstanceOf[Array[Any]])

  /** Distinct adjacent-token bigrams ("w1 w2"), first-occurrence order —
    * byte-for-byte what `array_distinct(filter(zip_with(ws, slice(ws, 2,
    * …), concat(_, " ", _)), notNull))` produces.
    */
  def computeBigrams(s: UTF8String): ArrayData = computeNgrams(s, 2)

  /** Distinct space-joined n-gram shingles, first-occurrence order.
    * n=1 degenerates to distinct tokens; <n tokens → empty.
    */
  def computeNgrams(s: UTF8String, n: Int): ArrayData = {
    val ws = tokenize(s)
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= ws.length - n) {
      var g = ws(i)
      var j = 1
      while (j < n) { g = UTF8String.concat(g, TextTokens.Space, ws(i + j)); j += 1 }
      seen.add(g)
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[UTF8String](seen.size))
      .asInstanceOf[Array[Any]])
  }

  /** ALL space-joined n-gram occurrences, in order, duplicates kept —
    * the counting unit for within-doc repetition stats, where the
    * distinct sets used by dedup would erase exactly the signal
    * (how often each n-gram repeats) being measured.
    */
  def computeNgramsAll(s: UTF8String, n: Int): ArrayData = {
    val ws = tokenize(s)
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](ws.length - n + 1)
    var i = 0
    while (i <= ws.length - n) {
      var g = ws(i)
      var j = 1
      while (j < n) { g = UTF8String.concat(g, TextTokens.Space, ws(i + j)); j += 1 }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  val Space: UTF8String = UTF8String.fromString(" ")
}

/** `AsciiWords(text)` ≡ `regexp_extract_all(lower(text), '[a-z0-9]+', 0)`. */
case class AsciiWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"AsciiWords requires a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextTokens.computeTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextTokens.computeTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiWords =
    copy(child = newChild)
}

/** `WordBigrams(text)` ≡ distinct adjacent bigrams of `AsciiWords(text)`. */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"WordBigrams requires a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextTokens.computeBigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextTokens.computeBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

/** `WordNgrams(text, n)` ≡ distinct adjacent n-grams of `AsciiWords(text)`. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"WordNgrams requires a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextTokens.computeNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextTokens.computeNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `WordNgramsAll(text, n)` ≡ every adjacent n-gram occurrence of
  * `AsciiWords(text)` in order, duplicates kept (repetition counting).
  */
case class WordNgramsAll(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"WordNgramsAll requires a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextTokens.computeNgramsAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextTokens.computeNgramsAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsAll =
    copy(child = newChild)
}

object AsciiWords {
  def asciiWords(c: Column): Column =
    GraftExpressionBridge.column(AsciiWords(GraftExpressionBridge.expression(c)))
}

object WordNgramsAll {
  def wordNgramsAll(c: Column, n: Int): Column =
    GraftExpressionBridge.column(WordNgramsAll(GraftExpressionBridge.expression(c), n))
}

object WordBigrams {
  def wordBigrams(c: Column): Column =
    GraftExpressionBridge.column(WordBigrams(GraftExpressionBridge.expression(c)))
}

object WordNgrams {
  def wordNgrams(c: Column, n: Int): Column =
    GraftExpressionBridge.column(WordNgrams(GraftExpressionBridge.expression(c), n))
}
