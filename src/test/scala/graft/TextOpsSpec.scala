package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect().head.getAs[T]("r")

  private def strs(c: org.apache.spark.sql.Column, text: String): List[String] =
    Seq(text).toDF("text").select(c.as("r")).collect().head.getSeq[String](0).toList

  test("tokens lowercase and split on non-alphanumerics") {
    assert(strs(TextOps.tokens(col("text")), "Hello, World! x2")
      == List("hello", "world", "x2"))
  }

  test("bigrams of a 4-token doc") {
    assert(strs(TextOps.bigrams(col("text")), "a b c d")
      == List("a b", "b c", "c d"))
  }

  test("bigrams guard: <2 tokens gives empty, not a sequence error") {
    assert(strs(TextOps.bigrams(col("text")), "solo") == Nil)
    assert(strs(TextOps.bigrams(col("text")), "") == Nil)
  }

  test("rollingHash matches the hand-computed polynomial") {
    // "ab": ((0*31+97)%M)*31 + 98 = 3105
    assert(one[Long](TextOps.rollingHash(col("text")), "ab") == 3105L)
    assert(one[Long](TextOps.rollingHash(col("text")), "") == 0L)
  }

  test("native PolyHash agrees with the built-ins fold on fixture text") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(200)
    val diff = docs.select(
      TextOps.rollingHash(col("text")).as("native"),
      TextOps.rollingHashBuiltins(col("text")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("native tokenizer/bigrams agree with the regex+lambda built-ins on fixture text") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(200)
    val tokDiff = docs.select(
      TextOps.tokens(col("text")).as("native"),
      TextOps.tokensBuiltins(col("text")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(tokDiff == 0)
    val bgDiff = docs.select(
      TextOps.bigrams(col("text")).as("native"),
      TextOps.bigramsBuiltins(col("text")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(bgDiff == 0)
    // non-ASCII + empty edge cases: Unicode lowercasing must stay in sync
    val edge = Seq("", "  ", "Größe STRASSE über", "İstanbul KK", "a", "Ab1 cD2")
      .toDF("text")
    val edgeDiff = edge.select(
      TextOps.tokens(col("text")).as("n"), TextOps.tokensBuiltins(col("text")).as("r"),
      TextOps.bigrams(col("text")).as("nb"), TextOps.bigramsBuiltins(col("text")).as("rb"))
      .filter(col("n") =!= col("r") || col("nb") =!= col("rb")).count()
    assert(edgeDiff == 0)
  }

  test("hashedNgrams ≡ sort(distinct(rollingHash over ngrams)) on fixture + edge text") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(200)
      .select(col("text"))
      .unionByName(Seq("", " ", "solo", "a b", "Größe ÜBER über x").toDF("text"))
    for (n <- Seq(2, 3)) {
      val diff = docs.select(
        TextOps.hashedNgrams(col("text"), n).as("native"),
        array_sort(array_distinct(transform(
          TextOps.ngrams(col("text"), n), s => TextOps.rollingHash(s)))).as("ref"))
        .filter(col("native") =!= col("ref")).count()
      assert(diff == 0, s"n=$n")
    }
  }

  test("SortedLongJaccard over hashed shingles ≡ ArrayJaccard over string shingles") {
    // the fixture vocabulary is collision-free under the rolling hash, so
    // the hashed-set Jaccard must equal the string-set Jaccard exactly
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(60)
      .select(col("doc_id"), col("text"))
    val a = docs.select(col("doc_id").as("ida"),
      TextOps.bigrams(col("text")).as("sa"), TextOps.hashedNgrams(col("text")).as("ha"))
    val b = docs.select(col("doc_id").as("idb"),
      TextOps.bigrams(col("text")).as("sb"), TextOps.hashedNgrams(col("text")).as("hb"))
    val diff = a.join(b, col("ida") < col("idb"))
      .select(
        graft.functions.ArrayJaccard.arrayJaccard(col("sa"), col("sb")).as("s"),
        graft.functions.SortedLongJaccard.sortedLongJaccard(col("ha"), col("hb")).as("h"))
      .filter(col("s") =!= col("h")).count()
    assert(diff == 0)
    // empty∪empty guard on both kernels
    val e = Seq(("", "")).toDF("ta", "tb").select(
      graft.functions.SortedLongJaccard.sortedLongJaccard(
        TextOps.hashedNgrams(col("ta")), TextOps.hashedNgrams(col("tb"))).as("j"))
      .collect().head.getDouble(0)
    assert(e == 0.0)
  }

  test("fingerprint is order- and repetition-invariant") {
    val df = Seq("the cat sat", "sat THE cat cat", "the dog sat").toDF("text")
    val fps = df.select(TextOps.fingerprint(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("quality score stays in [0,1] and rewards stopword-bearing prose") {
    val good = one[Double](TextOps.qualityScore(col("text")),
      ("the quick brown fox jumps over the lazy dog and it is a fine day " * 4))
    val junk = one[Double](TextOps.qualityScore(col("text")), "@@@ ### !!!")
    assert(good > junk)
    assert(good >= 0.0 && good <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }

  test("predictedLang picks marker-matching language, und for no hits") {
    assert(one[String](TextOps.predictedLang(col("text")),
      "der hund und die katze ist da") == "de")
    assert(one[String](TextOps.predictedLang(col("text")),
      "el que es la casa y los") == "es")
    assert(one[String](TextOps.predictedLang(col("text")), "xyzzy qwerty") == "und")
    // tie (zero-overlap marker counts equal) → first language in list order
    assert(one[String](TextOps.predictedLang(col("text")), "und le") == "de")
  }
}
