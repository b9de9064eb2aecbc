package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.MetricSink
import graft.run.{Monitors, MonitorRunner}
import graft.state.StateStore
import graft.util.{Flatten, PathOps}

/** Conformance: each monitor emits exactly the metric families its
  * reference README "Scope of Observability" documents (the only contract
  * the reference publishes — SURVEY §5.1).
  */
class ConformanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("database monitor: Redshift/Snowflake DB-monitor metric scope") {
    val sink = MetricSink("db-run")
    Monitors.databaseMonitor(spark, sf, sink)
    val keys = sink.keys.toSet
    // Redshift README: number of tables; min/max/mean/median of column and
    // row counts; disk capacity/free/used
    assert(keys.contains("db.table_count"))
    for (stat <- Seq("max", "min", "mean", "median"); dim <- Seq("row", "column"))
      assert(keys.contains(s"db.${stat}_${dim}_count"), s"$stat $dim")
    for (k <- Seq("disk.capacity_gb", "disk.used_gb", "disk.free_gb", "disk.used_pct"))
      assert(keys.contains(k))
    // Snowflake DB README: per-table row and column counts
    for (t <- Tables.warehouse) {
      assert(keys.contains(s"db.$t.row_count"))
      assert(keys.contains(s"db.$t.column_count"))
    }
    assert(sink.get("db.largest_table").flatMap(_.valueString) == Some("lineitem"))
    // corrected-min semantics: min column count must be a true min
    val minCols = sink.get("db.min_column_count").flatMap(_.valueDouble).get
    val maxCols = sink.get("db.max_column_count").flatMap(_.valueDouble).get
    assert(minCols < maxCols)
  }

  test("table monitor: record/dupe/null/stat metrics + cross-run delta and drift") {
    val statePath = Files.createTempDirectory("graft-tm").toString + "/state"
    val state = new StateStore(statePath)
    val sink1 = MetricSink("run1")
    Monitors.tableMonitor(spark, sf, "orders", sink1, state)
    val k1 = sink1.keys.toSet
    assert(k1.contains("orders.record_count"))
    assert(k1.contains("orders.duplicate_count"))
    assert(k1.exists(_.startsWith("orders.schema.")))
    assert(k1.contains("orders.null_count.o_totalprice"))
    for (stat <- Seq("min", "max", "mean", "median", "stddev"))
      assert(k1.contains(s"orders.o_totalprice.$stat"), stat)
    assert(!k1.contains("orders.record_delta")) // no previous run yet

    val sink2 = MetricSink("run2")
    Monitors.tableMonitor(spark, sf, "orders", sink2, state)
    assert(sink2.get("orders.record_delta").flatMap(_.valueDouble) == Some(0.0))
    assert(sink2.get("orders.columns_changed").flatMap(_.valueDouble) == Some(0.0))
  }

  test("storage monitor: key + prefix + largest-of metric scope") {
    val sink = MetricSink("s3-run")
    Monitors.storageMonitor(spark, Seq(sf), sink)
    val keys = sink.keys.toSet
    assert(keys.contains("key.orders.parquet.size_mb"))
    assert(keys.contains("key.orders.parquet.content_type"))
    assert(keys.contains("key.orders.parquet.storage_class"))
    assert(keys.contains("key.orders.parquet.last_modified"))
    assert(keys.contains(s"prefix.$sf.num_objects"))
    assert(keys.contains(s"prefix.$sf.total_size_mb"))
    assert(keys.contains(s"prefix.$sf.max_size_mb"))
    assert(keys.contains(s"prefix.$sf.largest_key"))
    assert(keys.contains("largest_prefix_by_count"))
    assert(keys.contains("largest_prefix_by_size"))
    val expectedLargest = new java.io.File(sf).listFiles()
      .maxBy(f => (f.length, f.getName)).getName
    assert(sink.get(s"prefix.$sf.largest_key").flatMap(_.valueString)
      == Some(expectedLargest))
  }

  test("trackQuery: DataFrames-template metric scope over a SQL result") {
    Tables.load(spark, sf, "orders").createOrReplaceTempView("orders_v")
    val sink = MetricSink("q-run")
    val df = Monitors.trackQuery(spark,
      "SELECT o_orderkey, o_totalprice FROM orders_v LIMIT 100", "q", sink)
    assert(df.count() == 100)
    val keys = sink.keys.toSet
    assert(keys.contains("q.rows"))
    assert(keys.contains("q.columns"))
    assert(keys.contains("q.o_totalprice.p25"))
    assert(keys.contains("q.o_totalprice.median"))
    assert(keys.contains("q.o_totalprice.p75"))
    assert(keys.contains("q.o_totalprice.distinct_count"))
    assert(keys.contains("q.o_orderkey.nulls"))
  }

  test("runner: fan-out over targets + fan-in means, metrics flushed") {
    val tmp = Files.createTempDirectory("graft-runner").toString
    val m = MonitorRunner.run(spark, sf, Seq("region", "nation"),
      tmp + "/state", Some(tmp + "/metrics"))
    val keys = m.select("key").as[String].collect().toSet
    assert(keys.contains("region.record_count"))
    assert(keys.contains("nation.record_count"))
    assert(keys.contains("all_tables.mean_record_count"))
    val persisted = spark.read.parquet(tmp + "/metrics")
    assert(persisted.count() == m.count())
  }

  test("PathOps parses S3-style URIs like the reference") {
    val p = PathOps.parseUri("s3://my-bucket/some/prefix/file.csv/")
    assert(p.scheme == "s3" && p.bucket == "my-bucket")
    assert(p.key == "some/prefix/file.csv")
    assert(p.basename == "file.csv")
    assert(PathOps.parseUri("s3://just-bucket").key == "")
  }

  test("Flatten: nested structs to parent__child columns; maps to env") {
    val df = spark.sql(
      "SELECT 1 AS a, named_struct('x', 2, 'y', named_struct('z', 3)) AS n")
    val flat = Flatten.flattenStructs(df)
    assert(flat.columns.toSeq == Seq("a", "n__x", "n__y__z"))
    assert(flat.collect().head.toSeq == Seq(1, 2, 3))

    val env = Flatten.toEnv(Map("core" -> Map("databand_url" -> "http://x"), "flag" -> true))
    assert(env == Map("CORE_DATABAND_URL" -> "http://x", "FLAG" -> "true"))
  }
}
