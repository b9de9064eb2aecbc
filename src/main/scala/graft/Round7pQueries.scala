package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Chat

/** Round-7 part eleven: chat-transcript parsing and the
  * instruction-data conversation audit.
  */
object Round7pQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q214_chat_turns" -> ((s, dir) =>
      Chat.turnStats(
        Chat.synthesizeChats(Tables.load(s, dir, "documents")))))

  val oracleSql: Map[String, String] = Map(
    // synthesis structure is doc_id arithmetic (the q180/q207
    // convention): nTurns = 2 + id%5, turn i carries 3 + (id+i)%5
    // tokens, roles alternate starting user
    "q214_chat_turns" ->
      """WITH t AS (SELECT doc_id, CAST(i AS BIGINT) AS i
        |  FROM documents, unnest(range(2 + doc_id % 5)) u(i)),
        |k AS (SELECT doc_id, i, i % 2 = 0 AS is_user,
        |    3 + (doc_id + i) % 5 AS tok FROM t)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  CAST(sum(CASE WHEN is_user THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_user_turns,
        |  CAST(sum(CASE WHEN is_user THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_assistant_turns,
        |  CAST(sum(CASE WHEN is_user THEN tok ELSE 0 END) AS BIGINT)
        |    AS user_tokens,
        |  CAST(sum(CASE WHEN is_user THEN 0 ELSE tok END) AS BIGINT)
        |    AS assistant_tokens,
        |  true AS alternates
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
