package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-quality constraint auditing and blocked record linkage — the
  * Deequ/Great-Expectations tier of a production lake: before any
  * corpus or fact table feeds a training run, assert its referential
  * integrity, key uniqueness, and value ranges IN ONE PASS SHAPE that
  * survives 100 TB, and resolve entities across heterogeneous sources
  * without an n² compare.
  *
  * Reference analog: none (SURVEY §2.2's apps assume clean inputs);
  * beyond-reference data-engineering surface.
  */
object DataAudit {

  // ------------------------------------------- referential audit
  /** One row per declared constraint: `check_name, n_checked,
    * n_violations, pass`. Three constraint families:
    *
    *  - foreign keys (orders→customer, lineitem→orders/part/supplier):
    *    LEFT OUTER join against the parent's key projection, violation
    *    = unmatched child. The parent key's own uniqueness is audited
    *    by the pk_ rows below, so a fanout that would double-count a
    *    child here is never silent.
    *  - primary keys: COUNT(*) − COUNT(DISTINCT pk) on the parent.
    *  - value ranges / NOT NULL: per-row predicates folded into ONE
    *    aggregate per table (stack() fans the single agg row out to
    *    one row per constraint — no extra scan per check).
    *
    * Scale shape: each FK branch is one shuffle join on the key (AQE
    * may broadcast a small parent; neither side is collected) followed
    * by a map-side-partial count; each scalar family is one scan.
    * Branches are independent — the union is planning-only — so the
    * audit parallelizes across the cluster and its output is O(number
    * of constraints) rows regardless of input size. */
  def referentialAudit(s: SparkSession, d: String): DataFrame =
    referentialAuditOn(orders(s, d), lineitem(s, d), customer(s, d),
      part(s, d), supplier(s, d))

  /** Core audit over caller-supplied frames — separated so specs can
    * plant orphans, duplicate keys, and range violations (the synthetic
    * tables are clean, and an all-pass run alone proves little). */
  def referentialAuditOn(o: DataFrame, l: DataFrame, c: DataFrame,
      p: DataFrame, sup: DataFrame): DataFrame = {
    def fk(name: String, fact: DataFrame, fkCol: String,
        dim: DataFrame, pkCol: String): DataFrame =
      fact.select(col(fkCol)).join(dim.select(col(pkCol)),
          col(fkCol) === col(pkCol), "left_outer")
        .agg(count(lit(1)).as("n_checked"),
          coalesce(sum(when(col(pkCol).isNull, 1L)), lit(0L))
            .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"),
          col("n_violations"))

    // scalar families: one aggregate per table, stack() → 1 row/check
    val ordersScalar = o.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("o_totalprice").isNull ||
          col("o_totalprice") <= 0, 1L)), lit(0L)).as("v_price"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"))
      .select(expr(
        """stack(2,
          |  'ck_orders_totalprice_positive', n, v_price,
          |  'pk_orders_orderkey_unique', n, v_dup)
          |  AS (check_name, n_checked, n_violations)""".stripMargin))
    val lineitemScalar = l.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("l_quantity").isNull ||
          col("l_quantity") < 1 || col("l_quantity") > 50, 1L)),
          lit(0L)).as("v_qty"),
        coalesce(sum(when(col("l_discount").isNull ||
          col("l_discount") < 0 || col("l_discount") > 0.1, 1L)),
          lit(0L)).as("v_disc"),
        coalesce(sum(when(col("l_shipdate").isNull, 1L)), lit(0L))
          .as("v_ship"))
      .select(expr(
        """stack(3,
          |  'ck_lineitem_quantity_range', n, v_qty,
          |  'ck_lineitem_discount_range', n, v_disc,
          |  'nn_lineitem_shipdate', n, v_ship)
          |  AS (check_name, n_checked, n_violations)""".stripMargin))
    val customerScalar = c.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("v_dup"))
      .select(lit("pk_customer_custkey_unique").as("check_name"),
        col("n").as("n_checked"), col("v_dup").as("n_violations"))

    fk("fk_orders_customer", o, "o_custkey", c, "c_custkey")
      .unionByName(fk("fk_lineitem_orders", l, "l_orderkey", o, "o_orderkey"))
      .unionByName(fk("fk_lineitem_part", l, "l_partkey", p, "p_partkey"))
      .unionByName(fk("fk_lineitem_supplier", l, "l_suppkey", sup, "s_suppkey"))
      .unionByName(ordersScalar)
      .unionByName(lineitemScalar)
      .unionByName(customerScalar)
      .withColumn("pass", col("n_violations") === 0)
      .orderBy(col("check_name"))
  }

  val referentialAuditSql: String =
    """WITH fko AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS v
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
      |fklo AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS v
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |fklp AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS v
      |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey),
      |fkls AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE s.s_suppkey IS NULL) AS v
      |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |osc AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE o_totalprice IS NULL
      |      OR o_totalprice <= 0) AS v_price,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup
      |  FROM orders),
      |lsc AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE l_quantity IS NULL
      |      OR l_quantity < 1 OR l_quantity > 50) AS v_qty,
      |    COUNT(*) FILTER (WHERE l_discount IS NULL
      |      OR l_discount < 0 OR l_discount > 0.1) AS v_disc,
      |    COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS v_ship
      |  FROM lineitem),
      |csc AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) - COUNT(DISTINCT c_custkey) AS v_dup
      |  FROM customer),
      |rows_out AS (
      |  SELECT 'fk_orders_customer' AS check_name, n AS n_checked,
      |    v AS n_violations FROM fko
      |  UNION ALL SELECT 'fk_lineitem_orders', n, v FROM fklo
      |  UNION ALL SELECT 'fk_lineitem_part', n, v FROM fklp
      |  UNION ALL SELECT 'fk_lineitem_supplier', n, v FROM fkls
      |  UNION ALL SELECT 'ck_orders_totalprice_positive', n, v_price FROM osc
      |  UNION ALL SELECT 'pk_orders_orderkey_unique', n, v_dup FROM osc
      |  UNION ALL SELECT 'ck_lineitem_quantity_range', n, v_qty FROM lsc
      |  UNION ALL SELECT 'ck_lineitem_discount_range', n, v_disc FROM lsc
      |  UNION ALL SELECT 'nn_lineitem_shipdate', n, v_ship FROM lsc
      |  UNION ALL SELECT 'pk_customer_custkey_unique', n, v_dup FROM csc)
      |SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
      |  CAST(n_violations AS BIGINT) AS n_violations,
      |  n_violations = 0 AS pass
      |FROM rows_out ORDER BY check_name""".stripMargin

  // --------------------------------------------- blocked fuzzy link
  /** Entity resolution across heterogeneous sources (customer vs
    * supplier registries) with BLOCKING — the standard record-linkage
    * topology: a cheap deterministic blocking key (here the numeric id
    * suffix both registries embed in their names) turns the n²
    * all-pairs compare into an equi-join, and only within-block pairs
    * pay the edit-distance score. `linked` requires both a close name
    * (Levenshtein ≤ 5 — "Customer"/"Supplier" differ by exactly 5
    * substitutions, so the synthetic registries sit ON the boundary)
    * and a matching nation — a two-signal match rule.
    *
    * Scale shape: block-key extraction is a per-row projection; the
    * join shuffles both sides on the block key (broadcast would also
    * work for a small registry, but is deliberately not forced — at
    * 100 TB both registries are large); per-pair CPU is one bounded
    * Levenshtein. Pair count = Σ per-block |A|·|B|, controlled by
    * blocking-key selectivity, never n². */
  def linkBlockedFuzzy(s: SparkSession, d: String): DataFrame =
    linkBlockedFuzzyOn(customer(s, d), supplier(s, d))

  /** Core linkage over caller-supplied registries — separated so specs
    * can plant same-block / cross-block and near/far-name pairs. */
  def linkBlockedFuzzyOn(c: DataFrame, sup: DataFrame): DataFrame = {
    val cb = c.select(
      regexp_extract(col("c_name"), "([0-9]+)$", 1).cast("long")
        .as("block_id"),
      col("c_custkey"), col("c_name"), col("c_nationkey"))
    val sb = sup.select(
      regexp_extract(col("s_name"), "([0-9]+)$", 1).cast("long")
        .as("sblock"),
      col("s_suppkey"), col("s_name"), col("s_nationkey"))
    cb.join(sb, col("block_id") === col("sblock"))
      .select(col("block_id"), col("c_custkey"), col("s_suppkey"),
        levenshtein(col("c_name"), col("s_name")).cast("long")
          .as("name_dist"),
        (col("c_nationkey") === col("s_nationkey")).as("same_nation"))
      .withColumn("linked",
        col("name_dist") <= 5 && col("same_nation"))
      .orderBy(col("block_id"), col("c_custkey"), col("s_suppkey"))
  }

  val linkBlockedFuzzySql: String =
    """WITH cb AS (
      |  SELECT CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
      |    AS block_id, c_custkey, c_name, c_nationkey
      |  FROM customer),
      |sb AS (
      |  SELECT CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT)
      |    AS sblock, s_suppkey, s_name, s_nationkey
      |  FROM supplier)
      |SELECT block_id, c_custkey, s_suppkey,
      |  CAST(levenshtein(c_name, s_name) AS BIGINT) AS name_dist,
      |  c_nationkey = s_nationkey AS same_nation,
      |  levenshtein(c_name, s_name) <= 5
      |    AND c_nationkey = s_nationkey AS linked
      |FROM cb JOIN sb ON block_id = sblock
      |ORDER BY block_id, c_custkey, s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audit_referential" -> referentialAudit,
    "link_blocked_fuzzy" -> linkBlockedFuzzy)

  val oracle: Map[String, String] = Map(
    "audit_referential" -> referentialAuditSql,
    "link_blocked_fuzzy" -> linkBlockedFuzzySql)
}
