package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `HashedWordNgrams(text, n, mod)` — the SORTED DISTINCT polynomial
  * hashes of the text's adjacent word n-grams, in one byte scan.
  *
  * ≡ `array_sort(array_distinct(transform(WordNgrams(text, n), s ->
  * PolyHash(s, mod))))`, but the n-gram strings are never materialized:
  * the hash of "w1 w2" folds over w1's bytes, one space (32), then w2's
  * bytes, straight from the tokenizer's shared byte array (tokens are
  * lowercase ASCII alnum runs, so code points ARE bytes).
  *
  * This is the relation the pairwise dedup verify step ships and
  * compares: per doc it is ~8 bytes/shingle instead of a ~12-char UTF8
  * string + offsets, and the per-pair Jaccard ([[SortedLongJaccard]])
  * becomes a branch-predictable long merge instead of a hash-set build
  * over strings. At 100 TB the verify join duplicates one such array
  * into every surviving candidate pair — array width is the dominant
  * shuffle cost, which is exactly what this halves.
  *
  * Hash collisions (mod 1e9+7) merge distinct shingles; the DuckDB
  * oracle applies `list_distinct(list_transform(..., rollhash))` so both
  * engines see the identical hashed set and the comparison stays exact.
  */
case class HashedWordNgrams(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"HashedWordNgrams requires a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    HashedWordNgrams.compute(input.asInstanceOf[UTF8String], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedWordNgrams.compute($c, $n, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): HashedWordNgrams =
    copy(child = newChild)
}

object HashedWordNgrams {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int, mod: Long): ArrayData = {
    val ws = TextTokens.tokenize(s)
    if (ws.length < n) return new GenericArrayData(Array.empty[Long])
    val raw = new Array[Long](ws.length - n + 1)
    var i = 0
    while (i <= ws.length - n) {
      var acc = 0L
      var j = 0
      while (j < n) {
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
      raw(i) = acc
      i += 1
    }
    java.util.Arrays.sort(raw)
    // in-place dedup over the sorted run
    var out = 0
    i = 0
    while (i < raw.length) {
      if (out == 0 || raw(out - 1) != raw(i)) { raw(out) = raw(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, out))
  }

  def hashedWordNgrams(c: Column, n: Int,
      mod: Long = graft.operators.TextOps.HashMod): Column =
    GraftExpressionBridge.column(
      HashedWordNgrams(GraftExpressionBridge.expression(c), n, mod))
}

/** Jaccard similarity of two SORTED DISTINCT long arrays (hashed shingle
  * sets, [[HashedWordNgrams]] output): one linear merge, no allocation,
  * no per-element hashing — the per-pair kernel of the dedup verify join.
  *
  * Empty∪empty → 0.0 (same guard as [[ArrayJaccard]]; the built-ins'
  * 0/0 → NaN orders ABOVE every threshold in Spark).
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"SortedLongJaccard requires array<bigint> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedLongJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedLongJaccard {
  /** Static kernel: |A∩B| / (|A|+|B|-|A∩B|) by sorted merge. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  def sortedLongJaccard(a: Column, b: Column): Column =
    GraftExpressionBridge.column(SortedLongJaccard(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
