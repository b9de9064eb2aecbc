package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence-length bucketing for training batches: documents pad to the
  * next power-of-two token length (the standard bucketed-batching
  * scheme), and the report prices the padding — per (source, bucket):
  * how many docs, how many real tokens, how many padded slots, and the
  * waste in basis points. The planning counterpart of [[Pack]] (which
  * packs a token BUDGET; this shapes the BATCHES).
  *
  * Scale shape: the bucket is scan-stage integer arithmetic on each
  * row's token count; the report is ONE hash aggregate keyed by
  * (source, bucket) with map-side partials. No window, no join, no
  * second scan.
  *
  * Determinism: the power-of-two ceiling is computed from the BINARY
  * STRING length of n−1 (`shiftleft(1, length(bin(n-1)))`), not from
  * `pow(2, ceil(log2 n))` — binary logs of exact powers of two land on
  * representation boundaries where IEEE log/pow round differently across
  * engines, while the bit-length form is integer-exact on both (DuckDB:
  * `1::BIGINT << length(bin(n-1))`). All aggregate cells are integer
  * counts/sums; the only double is the final waste share, rounded at
  * 4 dp.
  */
object Batching {

  /** Smallest power of two ≥ n, with n ≤ 1 mapping to 1. */
  def pow2Bucket(n: Column): Column =
    when(n <= 1, lit(1L))
      .otherwise(call_function("shiftleft", lit(1L), length(bin(n - 1))))

  /** Per (groupCol, bucket): n_docs, sum_tokens, padded_tokens
    * (= n_docs · bucket) and waste_bp = (padded − real) / padded in
    * basis points. Token counts use the corpus convention
    * (`[a-z0-9]+` over lowercased text — [[TextOps.tokensBuiltins]]).
    */
  def paddingReport(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(groupCol),
        size(TextOps.tokensBuiltins(col(textCol))).cast("long")
          .as("n_tokens"))
      .withColumn("bucket", pow2Bucket(col("n_tokens")))
      .groupBy(groupCol, "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
      .withColumn("waste_bp",
        round((col("padded_tokens") - col("sum_tokens")) * 10000.0 /
          col("padded_tokens"), 4))
      .orderBy(groupCol, "bucket")
}
