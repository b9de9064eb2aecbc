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
