package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink abstraction: lake-format writes with the layout knobs that matter
  * at scale. The reference's only sinks are the metric/profile tracker
  * (→ `core.MetricSink`) and warehouse tables it never writes; a Spark
  * engine's natural sink is partitioned columnar files.
  *
  * Scale notes: `partitionBy` gives partition-pruned reads downstream;
  * `maxRecordsPerFile` bounds file sizes without a repartition shuffle;
  * writers should NOT coalesce(1) large outputs (only metric-sized results
  * do that, e.g. Verify's stat dumps).
  */
object Sinks {

  def parquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite, maxRecordsPerFile: Long = 0L): Unit = {
    var w = df.write.mode(mode)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    w.parquet(path)
  }

  /** Bucketed managed table: rows are hash-partitioned into `buckets` files
    * per partition by `bucketCols` and sorted within buckets. Two tables
    * bucketed the SAME way join WITHOUT a shuffle (and without the
    * per-bucket sort when sortCols match) — the co-located-join layout for
    * repeated fact⋈fact joins at 100 TB, where one upfront bucketed write
    * amortizes over every later join. Bucketing requires the catalog
    * (`saveAsTable`), not a bare path.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def csv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}
