package graft.util

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side collect guards. Several stat-grain operators finish a
  * ≤K-row relation on the driver in exact BigInt arithmetic (the house
  * K-row-stat allowance — see bradleyTerry / kruskalWallis /
  * removalEffect). The allowance is only safe if K actually stays
  * small, so every such collect goes through [[countedCollect]]: it
  * pulls at most cap+1 rows in ONE action and fails loudly — with the
  * operator's name — before an over-cardinality census can OOM the
  * driver. A silent full collect is never the failure mode.
  */
object Guards {

  /** Hard cap on rows any driver-side stat finish may collect. */
  val MaxCensusRows: Long = 100000L

  /** Collect at most cap rows; require the relation fits. The extra
    * +1 row is fetched only to detect overflow — no count() pre-pass,
    * no second job.
    */
  def countedCollect(df: DataFrame, op: String,
      cap: Long = MaxCensusRows): Array[Row] = {
    // the cap feeds limit() as an Int: a cap at or above Int.MaxValue
    // would silently wrap negative and the guard would misbehave
    // instead of guarding — reject it loudly
    require(cap > 0 && cap < Int.MaxValue,
      s"$op: collect cap must be in (0, Int.MaxValue), got $cap")
    val rows = df.limit((cap + 1).toInt).collect()
    require(rows.length <= cap,
      s"$op: stat relation exceeds the driver-side cap of $cap rows " +
        "— aggregate to a coarser grain before the driver-side finish")
    rows
  }
}
