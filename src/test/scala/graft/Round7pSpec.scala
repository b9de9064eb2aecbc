package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chat

/** Round-7 part eleven: chat-turn parsing. */
class Round7pSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parseTurns: markers, unknown lines, blanks, token counts") {
    import spark.implicits._
    val chats = Seq(
      (1L, "user: hello there\nassistant: hi\n\nno marker line"),
      (2L, "assistant: starts wrong"))
      .toDF("doc_id", "text")
    val r = Chat.parseTurns(chats).collect()
      .map(x => (x.getLong(0), x.getInt(1)) ->
        (x.getString(2), x.getInt(3))).toMap
    assert(r((1L, 0)) == ("user", 2))
    assert(r((1L, 1)) == ("assistant", 1))
    // the blank line drops BEFORE indexing: turn_idx stays contiguous
    // (a gap would flip the alternation parity downstream)
    assert(r((1L, 2)) == ("unknown", 3))
    assert(!r.contains((1L, 3)))
    assert(r((2L, 0)) == ("assistant", 2))
  }

  test("turnStats: blank separator lines do not break alternation") {
    import spark.implicits._
    // genuinely alternating transcript with blank lines between turns
    // — under line-index parity this misreported alternates=false
    val chats = Seq(
      (1L, "user: a\n\nassistant: b\n\nuser: c"),
      (2L, "user: a\n\nuser: b")) // still a real violation
      .toDF("doc_id", "text")
    val r = Chat.turnStats(chats).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(6), "blank-separated alternation must pass")
    assert(r(1L).getLong(1) == 3L)
    assert(!r(2L).getBoolean(6))
  }

  test("turnStats: alternation flag binds both ways") {
    import spark.implicits._
    val chats = Seq(
      (1L, "user: a\nassistant: b c\nuser: d"),
      (2L, "user: a\nuser: b"),       // double user -> not alternating
      (3L, "assistant: a\nuser: b"))  // starts wrong -> not alternating
      .toDF("doc_id", "text")
    val r = Chat.turnStats(chats).collect()
      .map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getLong(1) == 3L && d1.getLong(2) == 2L && d1.getLong(3) == 1L)
    assert(d1.getLong(4) == 2L && d1.getLong(5) == 2L)
    assert(d1.getBoolean(6))
    assert(!r(2L).getBoolean(6) && !r(3L).getBoolean(6))
  }

  test("synthesizeChats round-trips through the parser") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val stats = Chat.turnStats(Chat.synthesizeChats(docs)).collect()
    assert(stats.length == 500)
    stats.foreach { s =>
      val id = s.getLong(0)
      assert(s.getLong(1) == 2 + id % 5)
      assert(s.getBoolean(6), s"doc $id must alternate")
      val userTok = (0L until (2 + id % 5)).filter(_ % 2 == 0)
        .map(i => 3 + (id + i) % 5).sum
      assert(s.getLong(4) == userTok)
    }
  }
}
