package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** TPC-H-shaped analytics adapted to the testdata star schema (the
  * reference paper benchmarks TPC-DS/TPC-H-class queries via
  * spark-sql-perf, BASELINE.md): multi-way joins with disjunctive
  * predicates, correlated scalar subqueries, HAVING over aggregates,
  * ratio-of-sums market shares, and grouped anti-joins. All revenue math
  * uses exact decimal sums (Exact.dsum) so every query is DuckDB-exact.
  */
object TpchStyle extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)
  private val rev = "l_extendedprice*(1.0-l_discount)"

  /** Q7-style: trade volume between two nation pairs by ship year. */
  val q7Volume: QueryDef = QueryDef(
    "q120_nation_trade_volume",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT supp_nation, cust_nation, l_year, ${dsumSql(rev)} AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 l_extendedprice, l_discount
          FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")
    },
    Some(s"""
      SELECT supp_nation, cust_nation, l_year, ${dsumSql(rev)} AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice, l_discount
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** Q8-style market share: one supplier nation's revenue share per year —
    * ratio of two exact decimal sums (identical IEEE division). */
  val q8Share: QueryDef = QueryDef(
    "q121_market_share",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      val joined = li
        .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(t(s, d, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
        .select(year($"o_orderdate").as("o_year"),
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("volume"),
          $"n_name")
      joined.groupBy($"o_year")
        .agg((dsum(when($"n_name" === "NATION_3", $"volume").otherwise(0.0)) /
          dsum($"volume")).as("mkt_share"))
        .orderBy($"o_year")
    },
    Some(s"""
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        ${dsumSql(s"CASE WHEN n_name = 'NATION_3' THEN $rev ELSE 0.0 END")}
          / ${dsumSql(rev)} AS mkt_share
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1"""))

  /** Q9-style product profit by nation and year (cost proxied from
    * p_retailprice since the schema has no partsupp). */
  val q9Profit: QueryDef = QueryDef(
    "q122_product_profit",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(t(s, d, "part")), $"l_partkey" === $"p_partkey")
        .join(broadcast(t(s, d, "supplier")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
        .filter($"p_name".contains("widget"))
        .groupBy($"n_name", year($"o_orderdate").cast(IntegerType).as("o_year"))
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") -
          $"p_retailprice" * 0.5 * $"l_quantity").as("profit"))
        .orderBy($"n_name", $"o_year".desc)
    },
    Some(s"""
      SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        ${dsumSql(s"$rev - p_retailprice*0.5*l_quantity")} AS profit
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY n_name, 2 ORDER BY n_name, o_year DESC"""))

  /** Q10-style returned-item ranking: top 20 customers by lost revenue. */
  val q10Returns: QueryDef = QueryDef(
    "q123_returned_items",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem").filter($"l_returnflag" === "R")
        .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, n_name, ${dsumSql(rev)} AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** Q11-style important stock: parts whose lineitem value exceeds a
    * fraction of the total (HAVING vs a scalar subquery). */
  val q11Stock: QueryDef = QueryDef(
    "q124_important_parts",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT l_partkey, ${dsumSql("l_extendedprice*l_quantity")} AS value
        FROM lineitem GROUP BY l_partkey
        HAVING ${dsumSql("l_extendedprice*l_quantity")} > (
          SELECT 0.006 * ${dsumSql("l_extendedprice*l_quantity")} FROM lineitem)
        ORDER BY value DESC, l_partkey""")
    },
    Some(s"""
      SELECT l_partkey, ${dsumSql("l_extendedprice*l_quantity")} AS value
      FROM lineitem GROUP BY l_partkey
      HAVING ${dsumSql("l_extendedprice*l_quantity")} > (
        SELECT 0.006 * ${dsumSql("l_extendedprice*l_quantity")} FROM lineitem)
      ORDER BY value DESC, l_partkey"""))

  /** Q12-style: quantity-band × priority counts with CASE aggregation. */
  val q12Bands: QueryDef = QueryDef(
    "q125_quantity_bands",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .filter(year($"l_shipdate") === 1998)
        .groupBy(when($"l_quantity" >= 25, "high").otherwise("low").as("qty_band"))
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast(LongType).as("high_prio"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast(LongType).as("low_prio"))
        .orderBy($"qty_band")
    },
    Some("""
      SELECT CASE WHEN l_quantity >= 25 THEN 'high' ELSE 'low' END AS qty_band,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_prio,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_prio
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(l_shipdate) = 1998
      GROUP BY 1 ORDER BY 1"""))

  /** Q14-style promo revenue share per month. */
  val q14Promo: QueryDef = QueryDef(
    "q126_promo_share",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), $"l_partkey" === $"p_partkey")
        .filter(year($"l_shipdate") === 1997)
        .groupBy(month($"l_shipdate").as("mo"))
        .agg((lit(100.0) *
          dsum(when($"p_type" === "PROMO",
            $"l_extendedprice" * (lit(1.0) - $"l_discount")).otherwise(0.0)) /
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("promo_pct"))
        .orderBy($"mo")
    },
    Some(s"""
      SELECT CAST(month(l_shipdate) AS INT) AS mo,
        100.0 * ${dsumSql(s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0.0 END")}
          / ${dsumSql(rev)} AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1997
      GROUP BY 1 ORDER BY 1"""))

  /** Q17-style: revenue of small-quantity lines vs the per-part average
    * (correlated scalar subquery — rewritten by Catalyst to a join). */
  val q17SmallQty: QueryDef = QueryDef(
    "q127_small_quantity_orders",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
        FROM lineitem l1
        WHERE l_quantity < (
          SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey)""")
    },
    Some(s"""
      SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
      FROM lineitem l1
      WHERE l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey)"""))

  /** Q18-style large orders: HAVING over the fact aggregate, then joined
    * back to orders/customer. */
  val q18Large: QueryDef = QueryDef(
    "q128_large_orders",
    (s, d) => {
      import s.implicits._
      val bigOrders = t(s, d, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 150.0)
      t(s, d, "orders").join(bigOrders, $"o_orderkey" === $"l_orderkey")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"o_orderkey", $"total_qty")
        .orderBy($"total_qty".desc, $"o_orderkey")
        .limit(25)
    },
    Some("""
      SELECT c_name, o_orderkey, total_qty FROM orders
        JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(l_quantity) > 150.0) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
      ORDER BY total_qty DESC, o_orderkey LIMIT 25"""))

  /** Q19-style disjunctive predicate revenue (OR-of-ANDs across the
    * join — the planner pushes the common join key through). */
  val q19Disjunct: QueryDef = QueryDef(
    "q129_disjunctive_revenue",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
            $"l_quantity".between(1, 20)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) &&
            $"l_quantity".between(10, 30)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(20, 50) &&
            $"l_quantity".between(20, 50)))
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    },
    Some(s"""
      SELECT ${dsumSql(rev)} AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
             AND l_quantity BETWEEN 20 AND 50)"""))

  /** Q22-style: idle customers (no orders) with above-average balance,
    * grouped by a name-derived code — correlated NOT EXISTS + scalar
    * subquery. */
  val q22Idle: QueryDef = QueryDef(
    "q130_idle_customers",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT substring(c_name, 10, 1) AS code, COUNT(*) AS numcust,
          ${dsumSql("c_acctbal")} AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT ${dsumSql("c_acctbal")} / COUNT(*) FROM customer
            WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1 ORDER BY 1""")
    },
    Some(s"""
      SELECT substring(c_name, 10, 1) AS code, COUNT(*) AS numcust,
        ${dsumSql("c_acctbal")} AS totacctbal
      FROM customer
      WHERE c_acctbal > (
          SELECT ${dsumSql("c_acctbal")} / COUNT(*) FROM customer
          WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1 ORDER BY 1"""))

  /** Q2-style min-cost supplier: per-part supplier ranking where the
    * winning row is selected by a correlated scalar MIN subquery
    * (Catalyst decorrelates to an aggregate + join on the part key). */
  val q2MinCost: QueryDef = QueryDef(
    "q174_min_cost_supplier",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        WITH cost AS (
          SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS minp
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT p_partkey, s_name, minp
        FROM part JOIN cost ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_size < 10 AND minp = (
          SELECT MIN(c2.minp) FROM cost c2 WHERE c2.l_partkey = p_partkey)
        ORDER BY p_partkey, s_name""")
    },
    Some("""
      WITH cost AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS minp
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT p_partkey, s_name, minp
      FROM part JOIN cost ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_size < 10 AND minp = (
        SELECT MIN(c2.minp) FROM cost c2 WHERE c2.l_partkey = p_partkey)
      ORDER BY p_partkey, s_name"""))

  /** Q15-style top supplier: revenue view + scalar MAX subquery selecting
    * the argmax row(s) — the view/subquery composition shape. */
  val q15TopSupplier: QueryDef = QueryDef(
    "q175_top_supplier",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        CREATE OR REPLACE TEMPORARY VIEW graft_revenue0 AS
        SELECT l_suppkey AS supplier_no, ${dsumSql(rev)} AS total_revenue
        FROM lineitem WHERE year(l_shipdate) = 1997
        GROUP BY l_suppkey""")
      s.sql("""
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN graft_revenue0 ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM graft_revenue0)
        ORDER BY s_suppkey""")
    },
    Some(s"""
      WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no, ${dsumSql(rev)} AS total_revenue
        FROM lineitem WHERE year(l_shipdate) = 1997
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
      ORDER BY s_suppkey"""))

  /** Q16-style supplier counts: COUNT(DISTINCT) per part attribute with a
    * NOT IN exclusion subquery (null-aware anti join). */
  val q16SupplierCnt: QueryDef = QueryDef(
    "q176_supplier_part_counts",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size""")
    },
    Some("""
      SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM part JOIN lineitem ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY p_brand, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_size"""))

  /** Q20-style: IN over a grouped subquery whose HAVING holds a
    * correlated scalar aggregate against the group key — the doubly
    * nested decorrelation shape. Quantities are integral doubles, so the
    * sums compare exactly. */
  val q20Promotion: QueryDef = QueryDef(
    "q177_heavy_shippers",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem l1 JOIN part ON l_partkey = p_partkey
          WHERE p_size < 10
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > (
            SELECT 0.15 * SUM(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey))
        ORDER BY s_name""")
    },
    Some("""
      SELECT s_name FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem l1 JOIN part ON l_partkey = p_partkey
        WHERE p_size < 10
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > (
          SELECT 0.15 * SUM(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey))
      ORDER BY s_name"""))

  /** Q21-style sole-fault supplier: EXISTS another supplier on the order
    * + NOT EXISTS another at-fault supplier (returnflag proxies the
    * late-receipt predicate — this dataset carries no receipt dates).
    * Two correlated self-joins of the fact table, the hardest
    * decorrelation in the TPC-H suite. */
  val q21Waiting: QueryDef = QueryDef(
    "q178_sole_fault_supplier",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
    },
    Some("""
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""))

  override def defs: Seq[QueryDef] = Seq(
    q7Volume, q8Share, q9Profit, q10Returns, q11Stock, q12Bands,
    q14Promo, q17SmallQty, q18Large, q19Disjunct, q22Idle,
    q2MinCost, q15TopSupplier, q16SupplierCnt, q20Promotion, q21Waiting)
}
