package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source abstraction (SURVEY S1/S2/S14).
  *
  * The reference reaches data through warehouse hooks —
  * `get_pandas_df(query)` (`/root/reference/Snowflake/snowflake_database_monitor.py:56`),
  * `hook.get_records(sql)` (`/root/reference/AWS_Redshift/redshift_database_monitor.py:74`)
  * and a generic SQLAlchemy `QUERY` entry point
  * (`/root/reference/DataFrames/databand_tracking_template.py:5-19`). The
  * Spark-native equivalents: the JDBC DataSource (pushes the query to the
  * warehouse exactly like the reference), file readers for lake formats,
  * and `spark.sql` over registered views as the generic entry point.
  *
  * Scale notes: `jdbcQuery` ships ONE query to the warehouse (the
  * reference's behavior); `jdbcTable` with partitioning options reads a
  * big table with N parallel range-partitioned connections — the knob the
  * reference lacks and recommends `LIMIT` workarounds for
  * (`/root/reference/AWS_Redshift/README.md:72`).
  */
object Sources {

  /** Push an arbitrary SQL query to a JDBC warehouse (Snowflake/Redshift/
    * Postgres/...). Result materializes as a DataFrame exactly like
    * `get_pandas_df`.
    */
  def jdbcQuery(spark: SparkSession, url: String, query: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url).option("query", query)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Read a whole JDBC table with optional range partitioning: with
    * (partitionColumn, lowerBound, upperBound, numPartitions) set, Spark
    * opens `numPartitions` parallel connections, each scanning one range.
    */
  def jdbcTable(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Lake-format reader: parquet / csv / json by extension or explicit
    * format. CSV/JSON get schema inference like pandas `read_*`.
    */
  def file(spark: SparkSession, path: String, format: String = ""): DataFrame = {
    val fmt = if (format.nonEmpty) format
      else path.split("\\.").lastOption.getOrElse("parquet") match {
        case "csv" => "csv"
        case "json" => "json"
        case _ => "parquet"
      }
    val r = spark.read.format(fmt)
    (if (fmt == "csv") r.option("header", "true").option("inferSchema", "true")
     else r).load(path)
  }

  /** Schema-enforced JSONL/CSV reader with CORRUPT-RECORD capture —
    * the production posture for semi-structured feeds: the caller's
    * schema is the contract (no inference drift run-to-run), malformed
    * rows land in `_corrupt_record` instead of silently nulling or
    * failing the job (PERMISSIVE mode made explicit), and the quality
    * decision — drop, quarantine, alert on corrupt-rate — stays with
    * the pipeline, not the parser.
    *
    * Returns the data columns plus `_corrupt_record` (NULL for clean
    * rows). Scan-stage only; pairs with [[graft.operators.Constraints]]
    * for the quarantine-rate gate.
    */
  def readValidated(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      format: String = "json"): DataFrame = {
    require(Seq("json", "csv").contains(format), s"format: $format")
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val r = spark.read.format(format)
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }

  /** The generic query entry point (S14): ANSI SQL over registered views. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
