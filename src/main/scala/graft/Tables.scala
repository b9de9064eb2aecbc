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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
