package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.{Sessionize, TextOps}
import graft.util.SkewJoin

class ExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: gap strictly greater than threshold starts a new session") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 1.0),
      (2L, ts("2024-01-01 00:30:00"), 10L, 2.0), // gap == 1800 → same session
      (3L, ts("2024-01-01 01:00:01"), 10L, 3.0), // gap 1801 → new session
      (4L, ts("2024-01-01 09:00:00"), 10L, 4.0), // new session
      (5L, ts("2024-01-01 00:00:00"), 20L, 5.0)  // other user
    ).toDF("event_id", "ts", "user_id", "value")
    val r = Sessionize.sessionSummary(ev, 1800L).orderBy("user_id", "session_idx")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (10L, 1L, 2L, 1800L), // events 1+2 span exactly the gap
      (10L, 2L, 1L, 0L),
      (10L, 3L, 1L, 0L),
      (20L, 1L, 1L, 0L)))
  }

  test("sessionize: deterministic tiebreak on equal timestamps") {
    val t0 = ts("2024-01-01 00:00:00")
    val ev = Seq((2L, t0, 1L, 1.0), (1L, t0, 1L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val r = Sessionize.assignSessions(ev, 60L).orderBy("event_id")
      .select("session_idx").collect().map(_.getLong(0))
    assert(r.toSeq == Seq(1L, 1L)) // same instant → one session regardless of order
  }

  test("salted join returns exactly the plain join's rows") {
    val sf = "/root/testdata/sf0.001"
    val o = Tables.load(spark, sf, "orders").select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val l = Tables.load(spark, sf, "lineitem").select(col("l_orderkey").as("k"), col("l_extendedprice"))
    val plain = o.join(l, "k")
    val salted = SkewJoin.saltedInnerJoin(o, l, Seq("k"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    // exact multiset equality via groupBy-count anti-join in both directions
    val pg = plain.groupBy(plain.columns.map(col): _*).count()
    val sg = salted.groupBy(salted.columns.map(col): _*).count()
    assert(pg.except(sg).isEmpty && sg.except(pg).isEmpty)
  }

  test("word n-grams: n=1 is distinct tokens, n=3 is trigrams, short docs empty") {
    def run(c: org.apache.spark.sql.Column, s: String) =
      Seq(s).toDF("text").select(c.as("r")).collect().head.getSeq[String](0).toList
    assert(run(TextOps.ngrams(col("text"), 1), "b a b a") == List("b", "a"))
    assert(run(TextOps.ngrams(col("text"), 3), "a b c d") == List("a b c", "b c d"))
    assert(run(TextOps.ngrams(col("text"), 3), "a b") == Nil)
    assert(run(TextOps.ngrams(col("text"), 2), "x y x y") ==
      run(TextOps.bigrams(col("text")), "x y x y"))
  }

  test("tfidf: corpus-wide terms score zero, distinctive terms rank first") {
    val docs = Seq(
      (1L, "a", "common apple apple"),
      (2L, "a", "common banana"),
      (3L, "b", "common cherry")).toDF("doc_id", "source", "text")
    val scored = graft.operators.Relevance.tfidf(docs, "source")
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        r.getAs[Double]("tfidf")).toMap
    assert(scored(("common", 1L)) == 0.0) // df = N → ln(1) = 0
    assert(math.abs(scored(("apple", 1L)) - 2.0 * math.log(3.0)) < 1e-12)
    val top = graft.operators.Relevance.topTerms(docs, "source", 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top("a") == "apple" && top("b") == "cherry")
  }

  test("labelProfile: identical members give cohesion 1, count and norm right") {
    val e = Seq(
      (0L, 0L, Array(3.0f, 4.0f)), (1L, 0L, Array(3.0f, 4.0f)),
      (2L, 1L, Array(1.0f, 0.0f)), (3L, 1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val r = graft.operators.Similarity.labelProfile(e)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r(0L) == ((2L, 5.0, 1.0)))
    assert(r(1L)._1 == 2L && math.abs(r(1L)._3 - math.cos(math.Pi / 4)) < 1e-3)
  }

  test("incremental monitor: first run profiles all, second run skips unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-incr").toString
    // copy two fixture tables into a mutable dir
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("nation", "region"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$tmp/$t.parquet"))
    val state = new graft.state.StateStore(tmp + "/state")
    val sink = graft.core.MetricSink("incr-test")
    val first = graft.run.IncrementalMonitor.run(spark, tmp, Seq("nation", "region"), state, sink)
    assert(first.toSet == Set("nation", "region"))
    val second = graft.run.IncrementalMonitor.run(spark, tmp, Seq("nation", "region"), state, sink)
    assert(second.isEmpty)
    // touch one table → only it is re-profiled
    val f = new java.io.File(s"$tmp/nation.parquet")
    assert(f.setLastModified(System.currentTimeMillis() + 5000))
    val third = graft.run.IncrementalMonitor.run(spark, tmp, Seq("nation", "region"), state, sink)
    assert(third == Seq("nation"))
  }

  test("parallel monitor fan-out loses no state rows or metrics") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-par").toString
    val targets = Seq("nation", "region", "supplier", "customer")
    val metrics = graft.run.MonitorRunner.run(spark, "/root/testdata/sf0.001",
      targets, tmp + "/state", parallelism = 4)
    val keys = metrics.select("key").collect().map(_.getString(0)).toSet
    targets.foreach(t => assert(keys.contains(s"$t.record_count"), s"missing $t metric"))
    // concurrent snapshot rewrites must not drop any table's state
    val state = new graft.state.StateStore(tmp + "/state")
    targets.foreach { t =>
      assert(state.get(spark, t, "record_count").nonEmpty, s"lost state for $t")
      assert(state.get(spark, t, "columns").nonEmpty)
    }
  }

  test("native expressions are callable from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT graft_poly_hash('ab') AS h,
             graft_tokens('Hello, World!') AS t,
             graft_ngrams('a b c d', 3) AS g,
             graft_array_jaccard(array('x','y'), array('y','z')) AS j,
             graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
             graft_window_hashes('a b c d', 3) AS wh
    """).collect().head
    assert(r.getAs[Long]("h") == 3105L)
    // positioned: [hash('a b c'), hash('b c d')] — mirrors graft_ngrams
    assert(r.getSeq[Long](5).length == 2)
    assert(r.getSeq[String](1).toList == List("hello", "world"))
    assert(r.getSeq[String](2).toList == List("a b c", "b c d"))
    assert(math.abs(r.getAs[Double]("j") - 1.0 / 3) < 1e-9)
    assert(r.getAs[Double]("d") == 11.0)
    // and through a full SQL pipeline over a temp view
    Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)
      .createOrReplaceTempView("docs_sqlfn")
    val n = spark.sql(
      "SELECT count(*) FROM docs_sqlfn WHERE size(graft_bigrams(text)) > 0")
      .collect().head.getLong(0)
    assert(n > 0)
  }

  test("connected components merge transitive near-dup chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 8L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))
    val sizes = graft.operators.Dedup.clusterSizes(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 7L -> 3L, 20L -> 2L))
  }

  test("prep pipeline: normalize, quality-filter and dedup compose") {
    val prose = "the quick brown fox jumps and it is a fine day in the field " * 3
    val docs = Seq(
      (1L, "a", prose + " https://x.example/path"),
      (2L, "a", prose), // same token set as 1 after URL strip → retired
      (3L, "a", "@@@@ ####"), // junk → quality-filtered
      (4L, "b", prose + " extra words here")
    ).toDF("doc_id", "source", "text")
    val kept = graft.operators.Pipeline.prepareCorpus(docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L))
    val report = graft.operators.Pipeline.corpusReport(docs, 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(report("a") == ((3L, 1L)) && report("b") == ((1L, 1L)))
  }

  test("normalize strips URLs, collapses whitespace, trims") {
    def one(s: String) = Seq(s).toDF("text")
      .select(TextOps.normalize(col("text")).as("r")).collect().head.getString(0)
    assert(one("  see https://ex.com/a?b=1 now\n\tok  ") == "see now ok")
    assert(one("no urls here") == "no urls here")
    assert(one("http://only.example ") == "")
  }
}
