package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table registry.
  *
  * The reference addresses warehouse tables as `db.schema.table` and pulls
  * them through JDBC hooks (`/root/reference/Snowflake/snowflake_table_monitor.py:75-78`,
  * `/root/reference/AWS_Redshift/redshift_table_monitor.py:47-51`). Here a
  * "database" is a directory of Parquet tables; Spark's vectorized Parquet
  * reader + Catalyst column pruning/predicate pushdown replace the
  * warehouse-side execution. At 100 TB these would be partitioned
  * directories or catalog tables — nothing in this API assumes a single
  * file.
  */
object Tables {
  /** All tables of the synthetic "database" (see TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The star-schema + events tables the DB monitors roll up over. */
  val warehouse: Seq[String] = all.filterNot(Set("documents", "embeddings"))

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.ts` has shipped in two physical shapes across fixture
    * generations: Parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects outright — read as long via the legacy nanosAsLong
    * conf, then integer-divide: epoch-nanos ≈ 1.7e18 exceeds a double's
    * 2^53 exact-integer range, so a floating-point path would silently
    * corrupt timestamps) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (which Spark 4 infers as TIMESTAMP_NTZ — unusable for watermarks
    * and epoch arithmetic). Both normalize to plain TimestampType under
    * the session's UTC zone, matching how DuckDB's oracle reads the same
    * files.
    */
  private val nanoTsCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    normalizeNanoTs(spark.read.parquet(path(dir, name)), name)
  }

  /** Convert legacy-read nano-long / NTZ-inferred columns to TimestampType. */
  def normalizeNanoTs(df: DataFrame, name: String): DataFrame =
    nanoTsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (!d.schema.fieldNames.contains(c)) d
      else d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, d(c).cast(org.apache.spark.sql.types.TimestampType))
        case _ => d
      }
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
