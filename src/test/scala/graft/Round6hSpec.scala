package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, SketchRollup}

/** Round-6 part nine: information gain, HLL sketch rollup laws, SQL
  * registration of the Gram aggregate.
  */
class Round6hSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------ information gain

  test("informationGain: label-identical feature saturates, noise gains 0") {
    import spark.implicits._
    val df = Seq(
      ("a", "x", true), ("a", "x", true), ("b", "x", false), ("b", "x", false))
      .toDF("copy", "const", "y")
    val r = Correlate.informationGain(df, Seq("copy", "const"), col("y"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // H(Y) = ln 2 nano-nats on both rows
    val ln2 = math.round(0.5 * math.log(2.0) * 1e9) * 2
    assert(r("copy")._1 == ln2 && r("const")._1 == ln2)
    assert(r("copy")._2 == 0L)              // feature determines label
    assert(r("copy")._3 == ln2)             // IG = H(Y)
    assert(r("const")._2 == ln2)            // constant feature: no info
    assert(r("const")._3 == 0L)
    graft.util.Caches.releaseAll()
  }

  test("informationGain: IG is non-negative and bounded by H(Y) on fixtures") {
    val r = Correlate.informationGain(
      Tables.load(spark, sf, "documents")
        .withColumn("len_bucket", expr("n_chars div 100")),
      Seq("source", "lang", "len_bucket"), col("lang") === "en").collect()
    assert(r.length == 3)
    assert(r.forall(x => x.getLong(5) >= -2 /* nano rounding slack */))
    assert(r.forall(x => x.getLong(5) <= x.getLong(3) + 2))
    val byF = r.map(x => x.getString(0) -> x.getLong(5)).toMap
    assert(byF("lang") >= byF("source")) // lang saturates by construction
    graft.util.Caches.releaseAll()
  }

  // ------------------------------------------------------- sketch rollup

  test("weeklyDistinct: union of daily sketches ≡ sketching the raw week") {
    val ev = Tables.load(spark, sf, "events")
    val viaRollup = SketchRollup.weeklyDistinct(ev).collect()
      .map(r => r.getDate(0).toString -> r.getLong(3)).toMap
    val direct = ev
      .groupBy(date_trunc("week", to_date(col("ts"))).cast("date")
        .as("week_start"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("distinct_est"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(viaRollup == direct)
  }

  test("weeklyDistinct: estimate within the HLL band of the exact count") {
    val ev = Tables.load(spark, sf, "events")
    val est = SketchRollup.weeklyDistinct(ev).collect()
      .map(r => r.getDate(0).toString -> r.getLong(3)).toMap
    val exact = ev
      .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("w"))
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (w, d) =>
      assert(math.abs(est(w) - d) <= math.max(3L, (d * 0.05).toLong),
        s"week $w: est ${est(w)} vs exact $d")
    }
  }

  test("weeklyDistinctExact: buckets/accounting match the sketch path") {
    val ev = Tables.load(spark, sf, "events")
    // (week, n_days, n_rows) must agree between the sketch rollup and
    // the exact twin — only the distinct column differs in method
    val sketch = SketchRollup.weeklyDistinct(ev).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val exact = SketchRollup.weeklyDistinctExact(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(exact.nonEmpty &&
      exact.map(e => e._1 -> (e._2, e._3)).toMap == sketch)
    exact.foreach(e => assert(e._4 >= 1L && e._4 <= e._3))
  }

  // ------------------------------------------------------ gram in SQL

  test("graft_gram registered: SQL ≡ Column API covariance core") {
    graft.functions.GraftExtensions.register(spark)
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("emb_g")
    val viaSql = spark.sql(
      """SELECT g.n AS n, g.pairs[0].s AS s11 FROM (
        |  SELECT graft_gram(transform(CAST(embedding AS ARRAY<DOUBLE>),
        |    x -> CAST(round(x * 1e6) AS BIGINT))) AS g FROM emb_g) t
        |""".stripMargin).collect().head
    val viaApi = graft.operators.Similarity
      .covarianceMatrix(Tables.load(spark, sf, "embeddings"))
      .filter(col("i") === 1 && col("j") === 1).collect().head
    assert(viaSql.getLong(0) == viaApi.getLong(2)) // n
    assert(viaSql.getLong(1) == viaApi.getLong(5)) // Σx₁x₁
  }
}
