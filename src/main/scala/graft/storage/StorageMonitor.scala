package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Object-store inventory monitor (SURVEY S11-S13, §3.3).
  *
  * The reference walks S3 with boto3 on a single worker — HEAD per key
  * (`/root/reference/AWS_S3/s3_key_monitor.py:66-86`), paginated prefix
  * listing with a hand-rolled single-pass max
  * (`/root/reference/AWS_S3/s3_key_monitor.py:111-123`), and a full-bucket
  * loop its own docs warn is "naive ... not suitable for large buckets"
  * (`/root/reference/AWS_S3/s3_bucket_monitor.py:44,69`).
  *
  * Here listing is DISTRIBUTED: roots are parallelized across executors and
  * each task walks its subtree via the Hadoop FileSystem API (works for
  * file://, hdfs://, s3a://). A 100M-object bucket splits into prefixes so
  * no single task lists more than one subtree, and every downstream
  * aggregate is a partial+final agg — the reference's manual streaming max
  * and driver-side dict transposition collapse into one `groupBy`.
  */
object StorageMonitor {

  /** Multipart-part-size model for `parts_count` (the S3 multipart default
    * part size): the Hadoop FS API exposes no upload-part metadata, so the
    * count is derived deterministically from the object size — 1 for
    * anything under one part, ceil(size/part) above.
    */
  val MultipartPartSizeBytes: Long = 8L * 1024 * 1024

  /** One row per object: the S3-key-metadata relation. `content_type` is
    * derived from the extension (the HDFS API has no MIME metadata —
    * SURVEY S11); `storage_class` defaults like the reference's
    * `"s3 standard"` fallback (`s3_key_monitor.py:82-86`); `parts_count`
    * and the user-`metadata` map mirror the reference's key metrics
    * (`s3_key_monitor.py:78-86`) — the filesystem API carries no user
    * metadata, so the map is empty (a store with tags would fill it).
    */
  def inventory(spark: SparkSession, roots: Seq[String]): DataFrame = {
    import spark.implicits._
    // Ship the driver's Hadoop conf to executors: spark.hadoop.* settings
    // (s3a credentials/endpoints, hdfs nameservices) live in the session
    // conf, and a bare `new Configuration()` built inside the closure
    // would drop them — file:// happens to work, authenticated stores fail.
    val serConf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val inv = spark.sparkContext
      .parallelize(roots, math.max(1, roots.size))
      .flatMap { root =>
        val rootPath = new Path(root)
        val fs = rootPath.getFileSystem(serConf.value)
        val it = fs.listFiles(rootPath, true)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, String, Long, Long)]
        while (it.hasNext) {
          val st = it.next()
          val p = st.getPath
          buf += ((root, p.toString, p.getName, st.getLen, st.getModificationTime))
        }
        buf
      }
      .toDF("root", "path", "file_name", "size_bytes", "modification_ms")
    inv.withColumn("extension",
        when(col("file_name").contains("."),
          element_at(split(col("file_name"), "\\."), -1)).otherwise(lit("")))
      .withColumn("content_type",
        when(col("extension") === "parquet", lit("application/vnd.apache.parquet"))
          .when(col("extension") === "json", lit("application/json"))
          .when(col("extension") === "csv", lit("text/csv"))
          .otherwise(lit("application/octet-stream")))
      .withColumn("storage_class", lit("s3 standard"))
      .withColumn("parts_count",
        greatest(lit(1L), ceil(col("size_bytes") / lit(MultipartPartSizeBytes.toDouble)))
          .cast("int"))
      .withColumn("metadata", map().cast("map<string,string>"))
  }

  /** Per-root (prefix) aggregate block — the whole `monitor_S3_prefix`
    * body (`s3_key_monitor.py:113-133`) as one aggregation: object count,
    * total/max/mean size, largest key (deterministic argmax).
    */
  def prefixSummary(inventory: DataFrame): DataFrame =
    inventory.groupBy("root").agg(
      count(lit(1)).as("num_objects"),
      sum("size_bytes").as("total_bytes"),
      max("size_bytes").as("max_bytes"),
      round(avg("size_bytes"), 4).as("avg_bytes"),
      max_by(col("file_name"), struct(col("size_bytes"), col("file_name"))).as("largest_file"))

  /** Filesystem capacity stats (SURVEY S8): the `stv_partitions`
    * capacity/used/free-GB block
    * (`/root/reference/AWS_Redshift/redshift_database_monitor.py:50-57,111-116`)
    * re-expressed over the Hadoop FileSystem status API.
    */
  def diskStats(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val p = new Path(root)
    val st = p.getFileSystem(spark.sessionState.newHadoopConf()).getStatus(p)
    val gb = 1024.0 * 1024 * 1024
    val (cap, used, free) = (st.getCapacity / gb, st.getUsed / gb, st.getRemaining / gb)
    Seq((math.rint(cap * 100) / 100, math.rint(used * 100) / 100,
      math.rint(free * 100) / 100,
      if (cap == 0) 0.0 else math.rint(used / cap * 10000) / 100))
      .toDF("capacity_gb", "used_gb", "free_gb", "used_pct")
  }

  /** Largest object per root with a deterministic tiebreak (path asc) —
    * the fan-in argmax (`s3_key_monitor.py:179-184,209-220`).
    */
  def largestObjects(inventory: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("root")
      .orderBy(col("size_bytes").desc, col("path").asc)
    inventory.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("root", "path", "file_name", "size_bytes")
      .orderBy("root")
  }

  /** Small-files COMPACTION PLAN over an inventory relation
    * (file_name, size_bytes): files in deterministic name order pack
    * into ≈`targetBytes` bins by cumulative-sum bucketing — bin =
    * (bytes before this file) div target — the planning step of an
    * OPTIMIZE/compaction job (the lakehouse maintenance the reference's
    * bucket monitor can only observe the need for: thousands of tiny
    * objects, `AWS_S3/s3_bucket_monitor.py:44,69`). Next-fit semantics:
    * a bin may overshoot the target by less than one file; bin ids may
    * skip where a single file spans several targets.
    *
    * Scale shape — a DISTRIBUTED prefix sum, never a global window:
    * file-metadata grain is millions of rows at 100 TB, and an
    * unpartitioned cumsum window would sort all of them through one
    * task. Instead the two-level scan (the `Pack.assignShards` idiom,
    * transposed to a string order key via a RangePartitioner):
    *
    *   1. ONE range partitioning by `file_name` spreads the inventory
    *      over P sorted, contiguous buckets (the partitioner's sampled
    *      boundaries are fixed at construction, so both passes below
    *      see the identical layout — and the second job reuses the
    *      first's shuffle files outright);
    *   2. per-bucket byte subtotals — P stat values — collect to the
    *      driver and prefix-scan into bucket start offsets, the only
    *      cross-bucket communication;
    *   3. each bucket streams its local running sum rebased by its
    *      offset, in parallel, assigning bins on the fly.
    *
    * Values are identical to the global-window form (prefix sums don't
    * care where chunk boundaries fall). Ties on `file_name` (possible
    * across roots) order arbitrarily within a bucket — the same
    * nondeterminism the window form had.
    *
    * Output per bin: (bin, n_files, total_bytes, first_file,
    * last_file).
    */
  def compactionPlan(inventory: DataFrame,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val spark = inventory.sparkSession
    import spark.implicits._
    val pairs = inventory
      .select(col("file_name").cast("string"), col("size_bytes").cast("long"))
      .na.drop()
      .as[(String, Long)].rdd
    val nBuckets = math.max(spark.sparkContext.defaultParallelism,
      pairs.getNumPartitions)
    val part = new org.apache.spark.RangePartitioner(nBuckets, pairs)
    val sorted = pairs.repartitionAndSortWithinPartitions(part)
    // step 2: P subtotal stat values (empty buckets emit 0), driver scan
    val subs = sorted.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(subs.scanLeft(0L)(_ + _))
    // step 3: bucket-local running sums, rebased — shuffle files reused
    val binned = sorted.mapPartitionsWithIndex { case (pid, it) =>
      var cum = offsets.value(pid)
      it.map { case (name, sz) =>
        val bin = cum / targetBytes; cum += sz; (bin, name, sz)
      }
    }
    binned.toDF("bin", "file_name", "size_bytes")
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum("size_bytes").cast("long").as("total_bytes"),
        min("file_name").as("first_file"),
        max("file_name").as("last_file"))
      .orderBy("bin")
  }
}
