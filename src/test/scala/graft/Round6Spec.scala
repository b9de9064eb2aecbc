package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup}

/** Round-6 stop-shingle cap semantics: the caps only remove intersection
  * evidence, so capped survivors are a SUBSET of the uncapped exact tier
  * with pointwise-smaller overlap counts — and the test caps are tight
  * enough to BIND at the fixture SF (assertions would pass vacuously on
  * a cap that drops nothing).
  */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  test("containmentPairs: capped survivors ⊆ uncapped, inter pointwise ≤") {
    val tau = Round5eQueries.ContainmentTau
    val un = Dedup.containmentPairs(docs, "lang", tau)
      .select("doc_a", "doc_b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cap=6 binds at sf0.001 (3 of 18 pairs survive) without emptying
    // the result — both halves of the subset law stay non-vacuous
    val cp = Dedup.containmentPairs(docs, "lang", tau,
      maxShingleDocs = Some(6L))
      .select("doc_a", "doc_b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cp.nonEmpty, "capped result empty — cap too tight to test subset law")
    assert(cp.size < un.size, "cap did not bind (no pairs dropped)")
    cp.foreach { case (k, interC) =>
      assert(un.contains(k), s"capped pair $k absent from uncapped result")
      assert(interC <= un(k), s"capped inter > uncapped for $k")
    }
  }

  test("sourceOverlap: capped n_common pointwise ≤, sizes exact, binds") {
    val un = CorpusStats.sourceOverlap(docs)
      .select("source_a", "source_b", "n_a", "n_b", "n_common").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cp = CorpusStats.sourceOverlap(docs, maxShingleSources = Some(2L))
      .select("source_a", "source_b", "n_a", "n_b", "n_common").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // full matrix on both sides: same pair set regardless of the cap
    assert(cp.keySet == un.keySet, "capped matrix lost scaffold pairs")
    var dropped = 0L
    cp.foreach { case (k, (na, nb, common)) =>
      val (una, unb, uncommon) = un(k)
      assert(na == una && nb == unb, s"cap changed exact sizes for $k")
      assert(common <= uncommon, s"capped n_common > uncapped for $k")
      dropped += uncommon - common
    }
    assert(dropped > 0, "cap did not bind (no common shingles dropped)")
  }

  test("q97a/q76a: hot-set guard joins broadcast (plan gate)") {
    for (q <- Seq("q97a_containment_capped", "q76a_source_overlap_capped")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
        s"$q: stop-shingle anti-join not broadcast:\n$p")
    }
  }
}
