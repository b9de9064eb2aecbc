package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SketchRollup
import graft.storage.StorageMonitor

/** Round-10 part five: count-min-sketch laws (never-underestimate,
  * cell-wise mergeability, exactness when the width dominates the
  * vocabulary — including the BINDING regime the oracle can't hold)
  * and the compaction planner's next-fit arithmetic.
  */
class Round10fSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def census(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("token", "cnt")
  }

  test("cmsCells: cells of a union are the cell-wise sum of the parts " +
    "(the mergeable-sketch law)") {
    val a = census(("alpha", 5L), ("beta", 3L))
    val b = census(("alpha", 2L), ("gamma", 7L))
    val all = census(("alpha", 7L), ("beta", 3L), ("gamma", 7L))
    def cells(df: org.apache.spark.sql.DataFrame) =
      SketchRollup.cmsCells(df, d = 3, w = 16).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged === cells(all))
  }

  test("cms estimate never underestimates, and is exact when the " +
    "width dominates the vocabulary") {
    import spark.implicits._
    // 40 tokens: t0 x40, t1 x39, ... (distinct counts, total order)
    val docs = (0 until 40).flatMap(i => Seq.fill(40 - i)(s"t$i"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    // wide sketch: zero collisions possible to matter at w=8192
    val wide = SketchRollup
      .cmsTopTokensChecked(docs, d = 3, w = 8192, topK = 10).collect()
    assert(wide.length === 10)
    wide.foreach { r =>
      assert(r.getLong(3) === r.getLong(2), r.toString) // est == exact
      assert(r.getBoolean(4), r.toString)
    }
    assert(wide.map(_.getString(1)).toSeq ===
      (0 until 10).map(i => s"t$i"), "exact top-k order (count desc)")
    graft.util.Caches.releaseAll()
    // BINDING regime: w=4 forces collisions — est strictly >= exact
    // still holds for every candidate (the one-sided CMS guarantee)
    val tight = SketchRollup
      .cmsTopTokensChecked(docs, d = 2, w = 4, topK = 10).collect()
    tight.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2),
        s"CMS underestimated: $r")
    }
    assert(tight.exists(r => r.getLong(3) > r.getLong(2)),
      "w=4 over 40 tokens must collide somewhere")
    graft.util.Caches.releaseAll()
  }

  test("cmsBucket is deterministic and seed-decorrelated") {
    import spark.implicits._
    val toks = (0 until 100).map(i => s"tok$i").toDF("token")
    val b = toks.select(
      SketchRollup.cmsBucket(col("token"), 0, 64).as("b0"),
      SketchRollup.cmsBucket(col("token"), 1, 64).as("b1")).collect()
    assert(b.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    // different seeds must not be the same permutation
    assert(b.count(r => r.getLong(0) === r.getLong(1)) < 20)
  }

  test("compactionPlan: next-fit cumulative-sum bucketing, hand case") {
    import spark.implicits._
    // name order a(600) b(500) c(400) d(300): cum_before 0/600/1100/1500
    // at target 1000 -> bins 0,0,1,1
    val inv = Seq(("a", 600L), ("b", 500L), ("c", 400L), ("d", 300L))
      .toDF("file_name", "size_bytes")
    val plan = StorageMonitor.compactionPlan(inv, 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(plan.toSeq === Seq(
      (0L, 2L, 1100L, "a", "b"),
      (1L, 2L, 700L, "c", "d")), plan.mkString("; "))
  }

  test("compactionPlan: a file spanning several targets skips bin ids " +
    "and totals are conserved") {
    import spark.implicits._
    val inv = Seq(("a", 100L), ("big", 5000L), ("z", 100L))
      .toDF("file_name", "size_bytes")
    val plan = StorageMonitor.compactionPlan(inv, 1000L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // cum_before: a=0, big=100, z=5100 -> bins 0, 0, 5
    assert(plan === Map(0L -> (2L, 5100L), 5L -> (1L, 100L)),
      plan.toString)
    assert(plan.values.map(_._2).sum === 5200L, "byte conservation")
  }
}
