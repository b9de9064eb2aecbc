package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Layout
import graft.sources.Sources

/** Round-7 part nineteen: layout clustering advisor + validated
  * semi-structured reads.
  */
class Round7ySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clusteringReport: sorted column prunes, scattered column doesn't") {
    import spark.implicits._
    // repartitionByRange on x gives disjoint x ranges per partition;
    // y is uncorrelated so every partition spans the whole y domain
    val df = (0 until 4000).map(i => (i.toLong, (i * 2654435761L) % 1000))
      .toDF("x", "y")
      .repartitionByRange(8, col("x"))
    val r = Layout.clusteringReport(df, Seq("x", "y")).collect()
      .map(row => row.getString(0) -> row.getLong(4)).toMap
    assert(r("x") == 0L, s"range-partitioned x must not overlap: $r")
    assert(r("y") > 900000L, s"scattered y must overlap nearly always: $r")
    graft.util.Caches.releaseAll()
  }

  /** Reference O(K²) pair-join overlap count — the implementation the
    * sweep replaced, kept HERE as the equivalence oracle.
    */
  private def pairJoinReport(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): Map[String, (Long, Long, Long)] = {
    val aggCols = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        min(col(c)).cast("long").as(s"mn_$c"),
        max(col(c)).cast("long").as(s"mx_$c")))
    val parts = df.withColumn("__pid", spark_partition_id())
      .groupBy("__pid").agg(aggCols.head, aggCols.tail: _*).cache()
    val out = cols.map { c =>
      val a = parts.select(col("__pid").as("pa"),
        col(s"mn_$c").as("amn"), col(s"mx_$c").as("amx"))
      val b = parts.select(col("__pid").as("pb"),
        col(s"mn_$c").as("bmn"), col(s"mx_$c").as("bmx"))
      val r = a.join(b, col("pa") < col("pb"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("amn") <= col("bmx") &&
            col("bmn") <= col("amx"), 1L).otherwise(0L)).as("ov"))
        .collect()(0)
      val k = parts.count()
      c -> (k, r.getLong(0), r.getLong(1))
    }.toMap
    parts.unpersist()
    out
  }

  test("clusteringReport sweep == pair join on both layout shapes") {
    import spark.implicits._
    val base = (0 until 4000).map(i =>
      (i.toLong, (i * 2654435761L) % 1000))
    // layout A: range-partitioned x (disjoint), scattered y (overlaps)
    // layout B: round-robin — BOTH columns overlap across partitions
    val layouts = Seq(
      base.toDF("x", "y").repartitionByRange(8, col("x")),
      base.toDF("x", "y").repartition(8))
    for (df <- layouts) {
      val exp = pairJoinReport(df, Seq("x", "y"))
      val got = Layout.clusteringReport(df, Seq("x", "y")).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == exp, s"sweep=$got pairJoin=$exp")
      graft.util.Caches.releaseAll()
    }
  }

  test("clusteringReport: null-bounds partitions count pairs, not overlaps") {
    import spark.implicits._
    // one partition carries only null y values: it must stay in the
    // pair denominator but never the overlap numerator (the pair
    // join's null-condition otherwise(0) contract)
    val df = (0 until 100).map { i =>
      val y: java.lang.Long = if (i % 4 == 3) null
        else java.lang.Long.valueOf(i.toLong % 7)
      (i.toLong, y, i % 4)
    }.toDF("x", "y", "p").repartitionByRange(4, col("p"))
    val exp = pairJoinReport(df, Seq("y"))
    val got = Layout.clusteringReport(df, Seq("y")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == exp, s"sweep=$got pairJoin=$exp")
    graft.util.Caches.releaseAll()
  }

  test("readValidated: malformed rows land in _corrupt_record") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "part.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "name": "ok"}""")
    w.println("""{"id": "not a number", "name": "bad type"}""")
    w.println("""not json at all""")
    w.println("""{"id": 3, "name": "fine"}""")
    w.close()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val df = Sources.readValidated(spark, f.getPath, schema).cache()
    val clean = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2L)
    assert(clean.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
    assert(bad.count() == 2L)
    // the raw malformed text is preserved for quarantine
    assert(bad.collect().forall(r =>
      r.getAs[String]("_corrupt_record").nonEmpty))
    df.unpersist()
  }
}
