package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chat-transcript columns — the SFT/instruction-data shape: a
  * document holding role-marked turns (`user: ...` / `assistant: ...`,
  * one per line), parsed to turn grain and audited for the properties
  * an instruction-tuning pipeline filters on (turn counts, role
  * balance, strict alternation, per-role token mass).
  *
  * Everything is scan-stage line/string math on the codegen'd builtin
  * functions — split / posexplode / substring_index — no UDFs; the
  * turn relation multiplies rows in the scan stage exactly like
  * [[Multimodal.sampleFrames]] and stays columnar.
  */
object Chat {

  /** Parse role-marked transcripts to TURN grain: (doc_id, turn_idx,
    * role, n_tokens). A line's role is the text before the first
    * `": "`; lines without a marker parse as role `unknown` with the
    * whole line as body. Blank lines drop BEFORE indexing — turn_idx
    * is 0-based over the non-blank turns, so blank separator lines
    * between turns do not shift the parity that [[turnStats]]'s
    * alternation check relies on (the blank filter runs inside the
    * array, before posexplode, keeping indices contiguous without a
    * window).
    */
  def parseTurns(chats: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val line = col("line")
    val hasMarker = line.contains(": ")
    chats
      .select(col(idCol).as("doc_id"),
        posexplode(filter(split(col(textCol), "\n"),
          l => length(trim(l)) > 0)).as(Seq("turn_idx", "line")))
      .select(col("doc_id"), col("turn_idx"),
        when(hasMarker, substring_index(line, ": ", 1))
          .otherwise(lit("unknown")).as("role"),
        size(split(
          when(hasMarker, expr("substring(line, instr(line, ': ') + 2)"))
            .otherwise(line), " ")).as("n_tokens"))
  }

  /** Per-document conversation audit off the turn relation:
    * (doc_id, n_turns, n_user_turns, n_assistant_turns, user_tokens,
    * assistant_tokens, alternates) — `alternates` = the transcript
    * strictly alternates starting with `user` (turn parity predicts
    * the role, so the check is a conditional aggregate — no window).
    */
  def turnStats(chats: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    parseTurns(chats, idCol, textCol)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L))
          .as("n_user_turns"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant_turns"),
        sum(when(col("role") === "user", col("n_tokens")).otherwise(0L))
          .as("user_tokens"),
        sum(when(col("role") === "assistant", col("n_tokens"))
          .otherwise(0L)).as("assistant_tokens"),
        min(col("role") === when(col("turn_idx") % 2 === 0, "user")
          .otherwise("assistant")).as("alternates"))
      .orderBy("doc_id")

  /** Deterministic chat payload table from the documents fixture —
    * structure derives from doc_id alone (the [[Multimodal]] synthesis
    * convention), so the SQL oracle recomputes expected stats by pure
    * arithmetic: nTurns = 2 + id%5, turn i has 3 + (id+i)%5 tokens,
    * roles alternate starting user.
    */
  def synthesizeChats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = graft.util.Parallelism.ensure(docs)
      .select("doc_id").rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = 2 + (id % 5).toInt
          val text = (0 until n).map { i =>
            val role = if (i % 2 == 0) "user" else "assistant"
            val k = 3 + ((id + i) % 5).toInt
            role + ": " + (0 until k).map(j => s"t$j").mkString(" ")
          }.mkString("\n")
          Row(id, text)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))))
  }
}
