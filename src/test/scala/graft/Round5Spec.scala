package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Deciles, TextOps}

class Round5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokenDocs = Tables.load(spark, sf, "documents")
    .select(col("source"), col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))

  test("approx deciles: populations track the exact deciles within tolerance") {
    val exact = Deciles.report(tokenDocs, "source", "n_tokens", "doc_id",
        exact = true)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val approx = Deciles.report(tokenDocs, "source", "n_tokens", "doc_id",
        exact = false)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // same groups; decile ids in range
    assert(approx.keys.map(_._1).toSet == exact.keys.map(_._1).toSet)
    assert(approx.keys.forall { case (_, d) => d >= 1 && d <= 10 })
    // per-source totals identical (classification is total: every row
    // lands in exactly one bucket)
    val exactTotals = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val approxTotals = approx.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(approxTotals == exactTotals)
    // each bucket within 50% + 2 of the ideal equal share (ties group
    // together in the approx path where ntile splits them — the fixture's
    // token counts repeat heavily at small SF, hence the loose band)
    approxTotals.foreach { case (src, n) =>
      val ideal = n.toDouble / 10
      (1 to 10).foreach { d =>
        val got = approx.getOrElse((src, d), 0L).toDouble
        assert(got <= ideal * 2.5 + 2,
          s"approx decile ($src, $d) holds $got of ~$ideal rows")
      }
    }
  }

  test("approx decile assignment is total and ordered by value") {
    val assigned = Deciles.assign(tokenDocs, "source", "n_tokens", "doc_id",
      exact = false)
    assert(assigned.filter(col("decile") < 1 || col("decile") > 10).count() == 0)
    // monotone: a doc with strictly more tokens never lands in a lower decile
    val perSource = assigned
      .groupBy("source", "decile")
      .agg(min("n_tokens").as("lo"), max("n_tokens").as("hi"))
      .orderBy("source", "decile")
      .collect()
    perSource.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) <= b.getLong(2),
            s"decile ${b.getInt(1)} starts below decile ${a.getInt(1)}'s max")
        case _ => ()
      }
    }
  }

  test("q61/q61a: capped minhash output is a subset of the exact q34 pairs") {
    val d = Tables.load(spark, sf, "documents")
    val exact = graft.operators.Dedup.minhashNearDups(d)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.Caches.releaseAll()
    val capped = graft.operators.Dedup.minhashNearDups(d,
        maxBucketSize = Some(Round4Queries.TightBucketCap))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.Caches.releaseAll()
    assert(capped.subsetOf(exact), "the cap may only DROP pairs, never add")
  }

  test("round-5 queries are wired with oracles (q58a rows-only by design)") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    Seq("q58a_token_deciles_approx", "q62a_asof_strict", "q62b_asof_left",
      "q64a_split_leakage_safe", "q61a_minhash_cap_bind").foreach { q =>
      assert(qs.contains(q), s"$q missing from SparkEntry.queries")
    }
    Seq("q61_minhash_capped", "q61a_minhash_cap_bind", "q62a_asof_strict",
      "q62b_asof_left", "q64a_split_leakage_safe").foreach { q =>
      assert(os.contains(q), s"$q missing from SparkEntry.oracleSql")
    }
    assert(!os.contains("q58a_token_deciles_approx"),
      "q58a is sketch-based — rows-only by design, like q43")
  }
}
