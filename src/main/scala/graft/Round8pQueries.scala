package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Experiment

/** Round-8 part sixteen: Wald's SPRT — always-on sequential
  * monitoring of a success rate with α/β guaranteed by construction.
  */
object Round8pQueries {

  val P0 = 400000L
  val P1 = 500000L
  val Alpha = 50000L
  val Beta = 50000L

  /** Frozen nano-LLR constants shared with the oracle (the
    * discountNano convention — no runtime ln crosses engines).
    */
  private def lnNano(x: Double) = math.round(math.log(x) * 1e9)
  private val PosInc = lnNano(P1.toDouble) - lnNano(P0.toDouble)
  private val NegInc = lnNano(1e6 - P1) - lnNano(1e6 - P0)
  private val Upper = lnNano(1e6 - Beta) - lnNano(Alpha.toDouble)
  private val Lower = lnNano(Beta.toDouble) - lnNano(1e6 - Alpha)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Is each event type's "value > 5" rate at 40% or 50% — stop per
    // type the moment the sequential evidence crosses a Wald bound.
    "q259_sprt" -> ((s, dir) =>
      Experiment.sprtReport(Tables.load(s, dir, "events"),
        "event_type", Seq("ts", "event_id"), col("value") > 5.0,
        P0, P1, Alpha, Beta)))

  val oracleSql: Map[String, String] = Map(
    "q259_sprt" ->
      s"""WITH p AS (SELECT event_type AS g,
         |    CASE WHEN value > 5.0 THEN 1 ELSE 0 END AS y,
         |    row_number() OVER w AS rn,
         |    sum(CASE WHEN value > 5.0 THEN $PosInc
         |      ELSE $NegInc END) OVER (PARTITION BY event_type
         |      ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS llr
         |  FROM events
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts,
         |    event_id)),
         |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS n_pos,
         |    min(CASE WHEN llr >= $Upper THEN rn END) AS first_h1,
         |    min(CASE WHEN llr <= $Lower THEN rn END) AS first_h0
         |  FROM p GROUP BY 1)
         |SELECT g AS event_type, n, n_pos,
         |  $PosInc * n_pos + $NegInc * (n - n_pos)
         |    AS llr_final_nano,
         |  CASE WHEN first_h1 IS NOT NULL AND (first_h0 IS NULL OR
         |      first_h1 <= first_h0) THEN 'h1'
         |    WHEN first_h0 IS NOT NULL THEN 'h0'
         |    ELSE 'none' END AS decision,
         |  least(first_h1, first_h0) AS n_at_decision
         |FROM a ORDER BY event_type""".stripMargin)
}
