package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window document chunking: split each document into overlapping
  * windows of `window` tokens starting every `stride` tokens — the
  * context-window slicing step of a pretraining pipeline (and of RAG
  * indexing), run BEFORE packing/sharding.
  *
  * Chunk i of a doc with n tokens covers tokens [i·stride, i·stride +
  * window); starts run 0, stride, 2·stride, … while start < n, so every
  * token is covered and the final chunk may be short (`n_tokens` carries
  * each chunk's true length). With stride < window consecutive chunks
  * overlap by window - stride tokens — the standard boundary-context
  * trade.
  *
  * Scale shape: pure scan-stage row multiplication — tokenize once
  * (codegen'd [[TextOps.tokens]]), explode the start sequence, slice the
  * token array. No shuffle, no window function, no driver involvement;
  * output volume is ≈ (window/stride)× the corpus, produced exactly
  * where the input partition lives.
  */
object Chunk {

  /** @param carryCols extra input columns copied onto every chunk row
    *                   (e.g. `source` for downstream packing)
    * @return (idCol, carryCols..., chunk_idx, n_tokens, chunk_text) —
    *         one row per chunk; docs with zero tokens produce no rows
    */
  def chunkByTokens(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1, "stride must be >= 1")
    val carried = carryCols.map(col)
    graft.util.Parallelism.ensure(docs)
      .select(col(idCol) +: carried :+ TextOps.tokens(col(textCol)).as("__ws"): _*)
      .withColumn("__n", size(col("__ws")).cast("long"))
      .filter(col("__n") > 0)
      .select(col(idCol) +: carried ++: Seq(col("__ws"), col("__n"),
        explode(sequence(lit(0L),
          ceil(col("__n").cast("double") / stride).cast("long") - 1)).as("__ci")): _*)
      .select(col(idCol) +: carried ++: Seq(
        col("__ci").cast("int").as("chunk_idx"),
        least(col("__n") - col("__ci") * stride, lit(window.toLong)).as("n_tokens"),
        array_join(slice(col("__ws"),
          (col("__ci") * stride + 1).cast("int"), lit(window)), " ").as("chunk_text")): _*)
  }
}
