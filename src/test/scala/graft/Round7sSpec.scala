package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Anomaly
import graft.plans.Lineage

/** Round-7 part fourteen: seasonal residual anomalies + column-level
  * lineage introspection.
  */
class Round7sSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("seasonalResidualReport: weekly rhythm is baseline, not anomaly") {
    import spark.implicits._
    // two weeks: weekdays 10 events, Sundays 2 events — perfectly
    // seasonal, so nothing flags; then a 30-event weekday spike does
    val days = (1 to 14).map(d => f"2024-01-$d%02d") // Jan 1 2024 = Monday
    val ev = days.zipWithIndex.flatMap { case (d, i) =>
      val dow = (i + 1) % 7 // Jan 7 and 14 are Sundays
      val base = if (dow == 0) 2 else 10
      val n = if (d == "2024-01-10") 40 else base
      (1 to n).map(k => (1L, ts(s"$d 12:00:00"), "click"))
    }.toDF("user_id", "ts", "event_type")
    val r = Anomaly.seasonalResidualReport(ev, "event_type",
        thresholdPermille = 500L)
      .collect().map(x => x.getDate(1).toString ->
        (x.getLong(3), x.getLong(5), x.getBoolean(6))).toMap
    // Sundays sit exactly on their weekday mean: residual 0, unflagged
    assert(r("2024-01-07") == (2L, 0L, false))
    assert(r("2024-01-14") == (2L, 0L, false))
    // the spike day flags, and it drags its weekday-mate (Jan 3) out
    // of band too: mean of (10, 40) = 25, both 15 away > 12.5
    assert(r("2024-01-10")._3 && r("2024-01-03")._3)
    // a normal weekday against a clean mean does not flag
    assert(!r("2024-01-01")._3 && !r("2024-01-08")._3)
  }

  test("columnLineage: outputs trace to their true source columns") {
    val dir = "/root/testdata/sf0.001"
    val lin1 = Lineage.columnLineage(
      SparkEntry.queries("q01_pricing_summary")(spark, dir)).toMap
    assert(lin1("sum_qty") == Set("lineitem.l_quantity"))
    assert(lin1("sum_disc_price") ==
      Set("lineitem.l_extendedprice", "lineitem.l_discount"))
    assert(lin1("count_order") == Set.empty)
    val lin3 = Lineage.columnLineage(
      SparkEntry.queries("q03_join_broadcast")(spark, dir)).toMap
    assert(lin3("r_name") == Set("region.r_name"))
    assert(lin3("avg_bal") == Set("customer.c_acctbal"))
    // grouping passthrough keeps identity lineage
    assert(lin1("l_returnflag") == Set("lineitem.l_returnflag"))
  }

  test("columnLineage: union fan-in reports EVERY branch's sources") {
    val dir = "/root/testdata/sf0.001"
    // the engine's own O2 fan-in idiom: reduce(_ unionByName _) over
    // per-source monitors — a Union's output reuses the FIRST child's
    // exprIds, so without the Union case branches 2..n vanish
    val a = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
    val b = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
    val c = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("k"), col("s_acctbal").as("v"))
    val lin = Lineage.columnLineage(
      Seq(a, b, c).reduce(_ unionByName _)).toMap
    assert(lin("k") == Set("orders.o_custkey", "customer.c_custkey",
      "supplier.s_suppkey"), s"all three branches must appear: $lin")
    assert(lin("v") == Set("orders.o_totalprice", "customer.c_acctbal",
      "supplier.s_acctbal"), s"all three branches must appear: $lin")
    // downstream of the union, derived columns keep the merged set
    val agg = Seq(a, b).reduce(_ unionByName _)
      .groupBy("k").agg(sum("v").as("total"))
    val lin2 = Lineage.columnLineage(agg).toMap
    assert(lin2("total") ==
      Set("orders.o_totalprice", "customer.c_acctbal"))
  }

  test("columnLineage: Intersect merges branches, Except stays left") {
    val dir = "/root/testdata/sf0.001"
    val a = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("k"))
    val b = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"))
    // Intersect output values exist in BOTH children → positional union
    val li = Lineage.columnLineage(a.intersect(b)).toMap
    assert(li("k") == Set("orders.o_custkey", "customer.c_custkey"))
    // Except values flow from the left only; the right side is a row
    // filter, and filter predicates are routing by convention
    val le = Lineage.columnLineage(a.except(b)).toMap
    assert(le("k") == Set("orders.o_custkey"))
  }

  test("columnLineage: explode and window columns trace through") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "xs")
      .select(col("id"), explode(col("xs")).as("x"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy("x")))
    val lin = Lineage.columnLineage(df).toMap
    // the local fixture's leaf attributes are the tuple fields _1/_2
    assert(lin("x") == Set("localrelation._2"))
    assert(lin("rn") == Set("localrelation._1", "localrelation._2"))
  }
}
