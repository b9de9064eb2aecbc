package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Deciles

/** Round-11 part one: the distributed exact-ntile (census offsets +
  * per-value partitioned rank) must be BIT-IDENTICAL to the SQL-window
  * ntile it replaces in q250 — across uneven splits (N mod n ≠ 0),
  * heavy value ties, N < n, and n = 1.
  */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(values: Seq[Long], n: Int): Unit = {
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(3) // assignment must not depend on layout
    val w = Window.orderBy(col("v"), col("id"))
    val expected = df.withColumn("t", ntile(n).over(w))
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Deciles.ntileExact(df, "v", "id", n, "t")
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expected, s"values=$values n=$n")
    graft.util.Caches.releaseAll()
  }

  test("ntileExact == window ntile: even split") {
    check(Seq(5L, 3L, 9L, 1L, 7L, 2L, 8L, 4L, 6L, 0L), 5)
  }

  test("ntileExact == window ntile: uneven split (first buckets take " +
    "the extra row)") {
    check(Seq(5L, 3L, 9L, 1L, 7L, 2L, 8L), 3) // 7 = 3+2+2
    check((0L until 23L).map(i => (i * 7) % 23), 10) // 23 over 10 bins
  }

  test("ntileExact == window ntile: heavy ties resolved by the unique " +
    "order column") {
    check(Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 1L, 2L, 3L), 4)
    check(Seq.fill(9)(42L), 3) // one value, pure tiebreak ordering
  }

  test("ntileExact == window ntile: N < n and n = 1") {
    check(Seq(3L, 1L, 2L), 10) // one row per bucket, buckets 4..10 empty
    check(Seq(3L, 1L, 2L, 5L), 1) // single bucket
  }

  test("compact executes its own plan: per-bin round trip (files in " +
    "each bin -> ONE output file, rows and bytes conserved bin-wise)") {
    import graft.storage.StorageMonitor
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-compact").toFile.getAbsolutePath
    val staged = s"$tmp/staged"
    val out = s"$tmp/out"
    // 6 deterministic shards of 300 rows -> 6 small files
    (0L until 300L).map(i => (i, s"payload-$i", i % 6))
      .toDF("id", "payload", "shard")
      .repartition(col("shard"))
      .write.partitionBy("shard").parquet(staged)
    val inv = StorageMonitor.inventory(spark, Seq(staged))
      .filter(col("extension") === "parquet")
    val target = 4096L
    val plan = StorageMonitor.compactionPlan(inv, target).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val manifest = StorageMonitor.compact(spark, inv, target, out).collect()
    assert(manifest.nonEmpty && manifest.length === plan.size,
      "manifest must carry exactly the planned bins")
    manifest.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val (nFiles, bytes) = plan(bin)
      assert(r.getAs[Long]("n_files_in") === nFiles)
      assert(r.getAs[Long]("bytes_in") === bytes)
      assert(r.getAs[Long]("n_files_out") === 1L,
        s"bin $bin must compact to exactly one file")
      assert(r.getAs[Long]("n_rows") > 0L)
    }
    assert(manifest.map(_.getAs[Long]("n_rows")).sum === 300L,
      "row conservation through the full read->bin->write->read-back")
    // per-bin row counts must equal the sum of each bin's INPUT files'
    // rows (conservation at bin grain, not just in total)
    val srcRows = spark.read.parquet(staged)
      .withColumn("__src", input_file_name())
      .groupBy("__src").count().collect()
      .map(r => r.getString(0).replaceFirst("^[a-zA-Z0-9+.-]+:/+", "")
        -> r.getLong(1)).toMap
    val binRows = StorageMonitor.binAssignments(inv, target).collect()
      .groupBy(_.getAs[Long]("bin"))
      .view.mapValues(_.map(r => srcRows(
        r.getAs[String]("path").replaceFirst("^[a-zA-Z0-9+.-]+:/+", ""))).sum)
      .toMap
    manifest.foreach { r =>
      assert(r.getAs[Long]("n_rows") === binRows(r.getAs[Long]("bin")),
        s"bin ${r.getAs[Long]("bin")} rows must equal its input files' rows")
    }
    graft.util.Caches.releaseAll()
  }

  test("ntileExact: no unpartitioned window touches the data relation " +
    "(the census window rides distinct values only)") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("id", "v")
    val plan = Deciles.ntileExact(df, "v", "id", 10, "t")
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val emptySpecChildMax = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        // the only unpartitioned window is over the value census: its
        // subtree must aggregate before the window (grain change) — the
        // census arrives either as a logical Aggregate or already cached
        // as an InMemoryRelation whose physical plan aggregated
        w.child.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
          case m: org.apache.spark.sql.execution.columnar.InMemoryRelation
            if m.cachedPlan.toString.contains("HashAggregate") => m
        }.isDefined
    }
    assert(emptySpecChildMax.forall(identity),
      "unpartitioned window over a non-aggregated (data-grain) relation")
    graft.util.Caches.releaseAll()
  }
}
