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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_pricing_summary" -> sqlPricingSummary,
    "sql_top_customers" -> sqlTopCustomers,
    "sql_grouping_sets" -> sqlGroupingSets)

  val oracle: Map[String, String] = Map(
    "sql_pricing_summary" -> pricingSummarySql,
    "sql_top_customers" -> topCustomersSql,
    "sql_grouping_sets" -> groupingSetsSql)
}
