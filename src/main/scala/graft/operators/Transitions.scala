package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over a keyed event stream: for
  * each consecutive pair of states within a key's timeline, the count
  * and row-conditional probability P(to | from) — the user-journey /
  * clickstream summary (where do sessions go after a `view`?), and the
  * input to next-event prediction baselines and anomaly scoring
  * (improbable transitions).
  *
  * Shape: ONE key shuffle for the lag window (deterministic (ts, tie)
  * order), then the pair census is STATE-domain (S² rows at most) — the
  * per-from totals ride a window over those stat rows, never the data.
  * Probability is a single double division rounded at 6 dp
  * (deterministic cross-engine).
  */
object Transitions {

  def transitionMatrix(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val byKey = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("tie").asc)
    val pairs = events
      .select(col(keyCol).as("key"), col(stateCol).as("state"),
        col(tsCol).as("ts"), col(tieCol).as("tie"))
      .withColumn("from_state", lag("state", 1).over(byKey))
      .filter(col("from_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("state").as("to_state"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("__total",
        sum("n").over(Window.partitionBy("from_state")))
      .withColumn("p", round(col("n").cast("double") / col("__total"), 6))
      .select("from_state", "to_state", "n", "p")
      .orderBy("from_state", "to_state")
  }
}
