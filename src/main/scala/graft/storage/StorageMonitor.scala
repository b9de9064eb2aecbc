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
    * skip where a single file spans several targets. One window cumsum
    * at file-inventory grain (metadata rows, not data) — at real scale
    * the window partitions by table prefix, here the inventory is one
    * table directory per file.
    *
    * Output per bin: (bin, n_files, total_bytes, first_file,
    * last_file).
    */
  def compactionPlan(inventory: DataFrame,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window.orderBy("file_name")
    inventory
      .select(col("file_name"), col("size_bytes").cast("long"))
      .withColumn("cum_before", coalesce(
        sum("size_bytes").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $targetBytes"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum("size_bytes").cast("long").as("total_bytes"),
        min("file_name").as("first_file"),
        max("file_name").as("last_file"))
      .orderBy("bin")
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
