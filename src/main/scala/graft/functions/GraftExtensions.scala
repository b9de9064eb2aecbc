package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native expressions: register once, then every
  * expression is callable from `spark.sql(...)` / SQL-string pipelines —
  * not only from the Scala Column API.
  *
  * Two integration paths, same function set:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the standard Spark extension-library hook), or
  *  - [[GraftExtensions.register]] on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def long(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every exposed function. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash",
      info("graft_poly_hash", "graft_poly_hash(str[, mod]) - rolling polynomial hash, mod at every step"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => PolyHash(s, graft.operators.TextOps.HashMod)
        case Seq(s, m) => PolyHash(s, long(m, "mod"))
        case _ => throw new IllegalArgumentException("graft_poly_hash(str[, mod])")
      }),
    ("graft_tokens",
      info("graft_tokens", "graft_tokens(str) - lowercased alphanumeric word tokens"),
      (args: Seq[Expression]) => AsciiWords(args.head)),
    ("graft_bigrams",
      info("graft_bigrams", "graft_bigrams(str) - distinct adjacent word bigrams"),
      (args: Seq[Expression]) => WordBigrams(args.head)),
    ("graft_ngrams",
      info("graft_ngrams", "graft_ngrams(str, n) - distinct adjacent word n-grams"),
      (args: Seq[Expression]) => WordNgrams(args.head, long(args(1), "n").toInt)),
    ("graft_window_hashes",
      info("graft_window_hashes", "graft_window_hashes(str, l) - positioned polynomial hashes of every adjacent l-token window (index = start token)"),
      (args: Seq[Expression]) => PositionedWindowHashes(args.head,
        long(args(1), "l").toInt, graft.operators.TextOps.HashMod)),
    ("graft_array_jaccard",
      info("graft_array_jaccard", "graft_array_jaccard(a, b) - Jaccard similarity of distinct string arrays"),
      (args: Seq[Expression]) => ArrayJaccard(args.head, args(1))),
    ("graft_array_dot",
      info("graft_array_dot", "graft_array_dot(a, b) - dot product of double arrays"),
      (args: Seq[Expression]) => ArrayDot(args.head, args(1))),
    // aggregates: the analyzer wraps a registered AggregateFunction in
    // its AggregateExpression automatically, so these compose with
    // GROUP BY / FILTER like any built-in
    ("graft_misra_gries",
      info("graft_misra_gries", "graft_misra_gries(item, capacity) - one-pass bounded-memory heavy hitters; array<struct<item, count_lower>> by (count DESC, item)"),
      (args: Seq[Expression]) =>
        MisraGries(args.head, long(args(1), "capacity").toInt)),
    ("graft_topk_by",
      info("graft_topk_by", "graft_topk_by(struct, k) - exact per-group top-k structs, descending, bounded-heap aggregate"),
      (args: Seq[Expression]) =>
        TopKBy(args.head, long(args(1), "k").toInt)),
    ("graft_gram",
      info("graft_gram", "graft_gram(array<bigint>) - one-pass Gram/covariance sufficient statistics: struct<n, comps: array<struct<i, s>>, pairs: array<struct<i, j, s>>>"),
      (args: Seq[Expression]) => Gram(args.head)))

  /** Register the function set on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.GraftExpressionBridge.registerFunction(spark, name, i, builder)
    }
}
