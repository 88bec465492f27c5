package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL entry path: the same ANSI SQL string executed by spark.sql over
  * registered temp views AND by the DuckDB oracle — one dialect, two
  * engines, hash-equal results. Demonstrates the engine's SQL surface
  * is first-class (not just the DataFrame DSL). */
object SqlSurface {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents")

  private def registerViews(s: SparkSession, d: String): Unit =
    tables.foreach(t => Tables.t(s, d, t).createOrReplaceTempView(t))

  /** Dual-dialect SQL: runs verbatim in Spark and DuckDB. */
  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  SUM(CAST(FLOOR((l_extendedprice)*100 + 0.5) AS BIGINT))/CAST(100.0 AS DOUBLE) AS sum_base_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val topCustomersSql: String =
    """SELECT c_custkey, c_name,
      |  SUM(CAST(FLOOR((o_totalprice)*100 + 0.5) AS BIGINT))/CAST(100.0 AS DOUBLE) AS total_spend,
      |  COUNT(*) AS n_orders
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |HAVING COUNT(*) >= 12
      |ORDER BY total_spend DESC, c_custkey
      |LIMIT 25""".stripMargin

  /** Explicit GROUPING SETS with GROUPING() null-vs-total markers —
    * the generalization rollup/cube specialize; SQL-only surface in
    * Spark (the DataFrame DSL exposes only rollup/cube). */
  val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  SUM(l_quantity) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  def sqlGroupingSets(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d); s.sql(groupingSetsSql)
  }

  def sqlPricingSummary(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d); s.sql(pricingSummarySql)
  }

  def sqlTopCustomers(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d); s.sql(topCustomersSql)
  }

  /** Bag-semantics set operators — UNION ALL / INTERSECT ALL /
    * EXCEPT ALL (the multiset forms the DISTINCT-flavored set_* queries
    * don't exercise; duplicate multiplicities matter and are pinned by
    * the per-key counts). */
  val setOpsAllSql: String =
    """WITH a AS (SELECT CAST(c_nationkey AS INT) AS k FROM customer
      |           WHERE c_acctbal > 0),
      |     b AS (SELECT CAST(s_nationkey AS INT) AS k FROM supplier)
      |SELECT 'except_all' AS op, k, n FROM (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |    SELECT k FROM b EXCEPT ALL SELECT k FROM a) GROUP BY k)
      |UNION ALL
      |SELECT 'intersect_all' AS op, k, n FROM (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |    SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k)
      |UNION ALL
      |SELECT 'union_all' AS op, k, n FROM (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |    SELECT k FROM a UNION ALL SELECT k FROM b) GROUP BY k)
      |ORDER BY op, k""".stripMargin

  /** Null-semantics surface: NULLIF-produced nulls, null-skipping vs
    * null-counting aggregates, and the standard aggregate FILTER
    * clause — the null-handling rules both engines must agree on
    * bit-for-bit (COUNT(col) skips nulls, COUNT(*) doesn't,
    * COUNT(DISTINCT col) ignores nulls, FILTER restricts the input
    * bag). */
  val nullSemanticsSql: String =
    """WITH t AS (SELECT o_orderpriority AS p,
      |             NULLIF(o_orderstatus, 'O') AS st,
      |             CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
      |           FROM orders)
      |SELECT p,
      |  COUNT(*) AS n_rows,
      |  COUNT(st) AS n_nonnull,
      |  CAST(COUNT(*) FILTER (WHERE st IS NULL) AS BIGINT) AS n_null,
      |  CAST(SUM(cents) FILTER (WHERE st IS NULL) AS BIGINT) AS open_cents,
      |  COUNT(DISTINCT st) AS n_statuses
      |FROM t GROUP BY p ORDER BY p""".stripMargin

  /** LATERAL correlated subquery — top-3 suppliers per nation via a
    * per-row derived table. Exercises Catalyst's lateral-join
    * decorrelation (DomainJoin → window rewrite): the correlated
    * ORDER BY ... LIMIT subquery becomes a ranked window over the
    * joined input, one shuffle keyed on the correlation key — the
    * plan you'd hand-write, recovered from the declarative form.
    * s_acctbal passes through unchanged (no float arithmetic), and
    * every ordering float-ties on s_name, so cross-engine hash
    * equality is safe. */
  val lateralTopKSql: String =
    """SELECT n_name, s_name, s_acctbal
      |FROM nation n, LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier s
      |  WHERE s.s_nationkey = n.n_nationkey
      |  ORDER BY s_acctbal DESC, s_name LIMIT 3) t
      |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin

  def sqlLateralTopK(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d); s.sql(lateralTopKSql)
  }

  def sqlSetOpsAll(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d); s.sql(setOpsAllSql)
  }

  def sqlNullSemantics(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d); s.sql(nullSemanticsSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_pricing_summary" -> sqlPricingSummary,
    "sql_top_customers" -> sqlTopCustomers,
    "sql_grouping_sets" -> sqlGroupingSets,
    "sql_set_ops_all" -> sqlSetOpsAll,
    "sql_null_semantics" -> sqlNullSemantics,
    "sql_lateral_topk" -> sqlLateralTopK)

  val oracle: Map[String, String] = Map(
    "sql_pricing_summary" -> pricingSummarySql,
    "sql_top_customers" -> topCustomersSql,
    "sql_grouping_sets" -> groupingSetsSql,
    "sql_set_ops_all" -> setOpsAllSql,
    "sql_null_semantics" -> nullSemanticsSql,
    "sql_lateral_topk" -> lateralTopKSql)
}
