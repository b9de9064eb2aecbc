package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide ↔ long reshaping: pivot (one column pair per category) and
  * unpivot/melt (wide columns back to rows) — the report layout the
  * reference's per-target stat tables imply (one fetched metric per
  * column, e.g. `/root/reference/databand_airflow_monitor.py`'s per-DAG
  * counters laid out side by side) expressed as first-class relational
  * operators.
  *
  * Scale shape: pivot with an EXPLICIT category list is ONE hash
  * aggregate over the scan — Spark skips the extra distinct-scan job it
  * runs when values are unlisted, the output schema is stable (a moving
  * schema is a downstream-breaking bug at any scale), and map-side
  * partials collapse each partition to |keys| rows before the single
  * shuffle. Unpivot is a scan-stage row multiplication (no shuffle).
  *
  * Determinism: category value sums quantize to integer micro-points at
  * the scan (the q53/q83/q99 convention) so every pivot cell is an
  * integer sum; absent (key, category) cells coalesce to 0 on both
  * engines.
  */
object Reshape {

  /** Daily event pivot: one row per calendar day; per category `c` the
    * columns `{c}_n` (event count) and `{c}_value` (value sum, 4 dp).
    * Categories not in `categories` are dropped — pinning the list is
    * what keeps the schema stable and the plan single-scan.
    */
  def pivotDaily(events: DataFrame, categories: Seq[String],
      tsCol: String = "ts", catCol: String = "event_type",
      valCol: String = "value"): DataFrame = {
    require(categories.nonEmpty, "categories must be non-empty")
    val wide = events
      .select(to_date(col(tsCol)).as("day"), col(catCol).as("cat"),
        round(col(valCol).cast("double") * 1000000.0).cast("long")
          .as("vm"))
      .groupBy("day")
      .pivot("cat", categories)
      .agg(count(lit(1)).as("n"), sum("vm").as("vm"))
    val cols = col("day").cast("string").as("day") +: categories.flatMap {
      c =>
        Seq(coalesce(col(s"${c}_n"), lit(0L)).as(s"${c}_n"),
          round(coalesce(col(s"${c}_vm"), lit(0L)) / 1000000.0, 4)
            .as(s"${c}_value"))
    }
    wide.select(cols: _*).orderBy("day")
  }

  /** Generic unpivot: melt `valueCols` into (`keyName`, `valueName`)
    * rows, carrying `idCols`. The inverse reshaping of [[pivotDaily]]'s
    * layout (Round5gSpec proves the roundtrip); pure scan-stage —
    * `stack` multiplies rows inside the projection, nothing shuffles.
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      keyName: String = "key", valueName: String = "value"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val pairs = valueCols
      .map(c => s"'${c.replace("'", "''")}', `$c`").mkString(", ")
    df.select((idCols.map(col) :+
      expr(s"stack(${valueCols.size}, $pairs) AS (`$keyName`, `$valueName`)"))
      : _*)
  }
}
