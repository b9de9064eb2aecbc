package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.Lineage

/** Round-9 part three: column lineage through the S14 SQL entry point.
  * `spark.sql` plans keep CTEs as WithCTE/CTERelationRef in the
  * ANALYZED tree (inlining is an optimizer rule) and every `WITH`
  * reference mints fresh exprIds, so the DataFrame-plan walk alone
  * would lose the true table columns behind any CTE. These specs pin
  * the SQL path end-to-end: CTEs (chained), subquery aliases, UNION
  * ALL inside SQL, and a GraftExtensions native function in the
  * projection.
  */
class Round9cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def view(name: String): Unit =
    Tables.load(spark, dir, name).createOrReplaceTempView(name)

  test("SQL lineage: chained CTEs + subquery alias resolve to true " +
    "table columns") {
    view("orders"); view("customer")
    val df = spark.sql(
      """WITH big AS (
        |  SELECT o_custkey AS k, o_totalprice AS v FROM orders
        |  WHERE o_totalprice > 100
        |), agg AS (
        |  SELECT k, sum(v) AS sv FROM big GROUP BY k
        |)
        |SELECT sub.k AS cust, sub.sv AS spend, c.c_acctbal AS bal
        |FROM (SELECT * FROM agg) sub
        |JOIN customer c ON c.c_custkey = sub.k""".stripMargin)
    val lin = Lineage.columnLineage(df).toMap
    assert(lin("cust") == Set("orders.o_custkey"), lin.toString)
    assert(lin("spend") == Set("orders.o_totalprice"), lin.toString)
    assert(lin("bal") == Set("customer.c_acctbal"), lin.toString)
  }

  test("SQL lineage: UNION ALL inside SQL reports every branch, " +
    "through a CTE") {
    view("orders"); view("customer"); view("supplier")
    val df = spark.sql(
      """WITH fanin AS (
        |  SELECT o_custkey AS k, o_totalprice AS v FROM orders
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, s_acctbal FROM supplier
        |)
        |SELECT k, sum(v) AS total_v FROM fanin GROUP BY k""".stripMargin)
    val lin = Lineage.columnLineage(df).toMap
    assert(lin("k") == Set("orders.o_custkey", "customer.c_custkey",
      "supplier.s_suppkey"), lin.toString)
    assert(lin("total_v") == Set("orders.o_totalprice",
      "customer.c_acctbal", "supplier.s_acctbal"), lin.toString)
  }

  test("SQL lineage: a CTE referenced twice keeps one source set; a " +
    "CTE built on an earlier CTE chains") {
    view("lineitem")
    val df = spark.sql(
      """WITH q AS (
        |  SELECT l_orderkey AS ok, l_quantity AS qty FROM lineitem
        |), q2 AS (
        |  SELECT ok, qty * 2 AS dqty FROM q
        |)
        |SELECT a.ok AS left_ok, a.dqty AS left_d, b.dqty AS right_d
        |FROM q2 a JOIN q2 b ON a.ok = b.ok""".stripMargin)
    val lin = Lineage.columnLineage(df).toMap
    assert(lin("left_ok") == Set("lineitem.l_orderkey"), lin.toString)
    assert(lin("left_d") == Set("lineitem.l_quantity"), lin.toString)
    assert(lin("right_d") == Set("lineitem.l_quantity"), lin.toString)
  }

  test("SQL lineage: GraftExtensions native functions trace their " +
    "argument columns") {
    graft.functions.GraftExtensions.register(spark)
    view("documents")
    val df = spark.sql(
      """WITH t AS (
        |  SELECT doc_id, graft_tokens(text) AS toks,
        |    graft_poly_hash(text) AS h
        |  FROM documents
        |)
        |SELECT doc_id, size(toks) AS n_tokens, h FROM t""".stripMargin)
    val lin = Lineage.columnLineage(df).toMap
    assert(lin("doc_id") == Set("documents.doc_id"), lin.toString)
    assert(lin("n_tokens") == Set("documents.text"), lin.toString)
    assert(lin("h") == Set("documents.text"), lin.toString)
  }
}
