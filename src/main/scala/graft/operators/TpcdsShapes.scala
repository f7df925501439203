package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** The reference paper's OLAP bench quartet — TPC-DS Q5/Q16/Q94/Q95
  * (Paper §5.2, BASELINE.md §OLAP) — translated shape-for-shape onto the
  * testdata star schema so "bench vs BASELINE" compares the SAME plan
  * shapes instead of TPC-H analogies:
  *
  *  - Q16/Q94: date-windowed COUNT(DISTINCT order) + money rollup gated by
  *    a correlated EXISTS (another lineitem of the same order from a
  *    DIFFERENT supplier — TPC-DS's "shipped from two warehouses") and a
  *    correlated NOT EXISTS (no returned lineitem — TPC-DS's catalog/web
  *    returns table, expressed here through l_returnflag). Catalyst plans
  *    these as one left-semi and one left-anti hash join on l_orderkey —
  *    no per-row subquery execution, the shape that scales.
  *  - Q95: the same result set but forced through TPC-DS's self-join
  *    formulation (`ws_wh` CTE): a DISTINCT self-join builds the
  *    multi-supplier order set, then two IN-subqueries (semi joins) gate
  *    the aggregate — one directly, one through the returns side.
  *  - Q5: multi-channel star — orders fan out into express/standard/
  *    economy channels (TPC-DS's store/web/catalog), sales vs returns
  *    split per channel, GROUP BY ROLLUP(channel, nation) over a
  *    date window, exact-decimal money.
  *
  * Spark and DuckDB run the IDENTICAL SQL text (both dialects accept it),
  * so the oracle checks the whole plan, not a re-phrasing.
  */
object TpcdsShapes extends QueryModule {

  private val rev = "l_extendedprice*(1.0-l_discount)"

  private def sqlQuery(name: String, sql: String): QueryDef =
    QueryDef(name,
      (s: SparkSession, d: String) => {
        Tables.registerAll(s, d); s.sql(sql): DataFrame
      },
      Some(sql))

  /** TPC-DS Q16 (catalog shipping): count distinct multi-supplier,
    * never-returned orders to a nation set inside a date window. */
  val q16Shipping: QueryDef = sqlQuery("q201_tpcds_q16_shipping", s"""
    SELECT CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
           ${dsumSql(rev)} AS total_revenue
    FROM lineitem l1
      JOIN orders ON l1.l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND n_name NOT IN ('NATION_2', 'NATION_4')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_returnflag = 'R')""")

  /** TPC-DS Q94 (web shipping): the same EXISTS/NOT-EXISTS gate on the
    * finished-order channel, with the tax rollup Q94 carries. */
  val q94Shipping: QueryDef = sqlQuery("q202_tpcds_q94_shipping", s"""
    SELECT CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
           ${dsumSql(rev)} AS total_revenue,
           ${dsumSql("l_extendedprice*l_tax")} AS total_tax
    FROM lineitem l1
      JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_returnflag = 'R')""")

  /** TPC-DS Q95: the multi-supplier order set built as a DISTINCT
    * self-join CTE (`ws_wh`), then required on BOTH the order and its
    * returns — two semi joins against the same derived set. */
  val q95MultiSupplier: QueryDef = sqlQuery("q203_tpcds_q95_multi_supplier", s"""
    WITH multi_supp AS (
      SELECT DISTINCT l1.l_orderkey AS mkey
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS order_count,
           ${dsumSql(rev)} AS total_revenue
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate <  TIMESTAMP '1998-04-01'
      AND l_orderkey IN (SELECT mkey FROM multi_supp)
      AND l_orderkey IN (SELECT l4.l_orderkey FROM lineitem l4
                         JOIN multi_supp ON l4.l_orderkey = mkey
                         WHERE l4.l_returnflag = 'R')""")

  /** TPC-DS Q5: per-channel sales/returns/profit with ROLLUP(channel, id)
    * over a date window; channels derived from order priority the way Q5
    * unions store/web/catalog. */
  val q5ChannelRollup: QueryDef = sqlQuery("q204_tpcds_q5_channel_rollup", s"""
    SELECT channel, n_name,
      ${dsumSql(s"CASE WHEN l_returnflag <> 'R' THEN $rev ELSE 0.0 END")} AS sales,
      ${dsumSql(s"CASE WHEN l_returnflag = 'R' THEN $rev ELSE 0.0 END")} AS returns_amt,
      ${dsumSql(s"$rev - l_extendedprice*l_tax")} AS profit
    FROM (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'express'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                  ELSE 'economy' END AS channel,
             n_name, l_returnflag, l_extendedprice, l_discount, l_tax
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1999-05-01'
        AND o_orderdate <  TIMESTAMP '1999-06-15')
    GROUP BY ROLLUP (channel, n_name)
    ORDER BY channel NULLS FIRST, n_name NULLS FIRST""")

  /** Q95 again, with the CTE MATERIALIZED: stock Spark inlines the
    * multi-supplier set into both IN-subqueries, so the heavy
    * lineitem⋈lineitem distinct runs twice (q203's plan has zero
    * ReusedExchange nodes — the two consumers canonicalize differently).
    * Here the derived set is computed once (localCheckpoint truncates it
    * to a cached (long)-key table, the size of the order-key domain) and
    * both gates become semi joins against it. Same rows, same oracle as
    * q203 — the q193/q194 anti-pattern-vs-fix pattern applied to CTE
    * recompute; BENCH records both. */
  val q95Materialized: QueryDef = QueryDef(
    "q205_tpcds_q95_cte_materialized",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val li = Tables.df(s, d, "lineitem")
      val multi = li.as("l1")
        .join(li.as("l2"),
          $"l1.l_orderkey" === $"l2.l_orderkey" &&
            $"l1.l_suppkey" =!= $"l2.l_suppkey")
        .select($"l1.l_orderkey".as("mkey")).distinct()
        .localCheckpoint() // the one computation of the heavy self-join
      val returnedMulti = li.filter($"l_returnflag" === "R")
        .join(multi, $"l_orderkey" === $"mkey", "left_semi")
        .select($"l_orderkey".as("rkey")).distinct()
      li.join(Tables.df(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-04-01").cast("timestamp"))
        .join(multi, $"l_orderkey" === $"mkey", "left_semi")
        .join(returnedMulti, $"l_orderkey" === $"rkey", "left_semi")
        .agg(countDistinct($"l_orderkey").as("order_count"),
          graft.functions.Exact.dsum(
            $"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("total_revenue"))
    },
    q95MultiSupplier.oracle) // identical result set by construction

  override def defs: Seq[QueryDef] =
    Seq(q16Shipping, q94Shipping, q95MultiSupplier, q5ChannelRollup,
      q95Materialized)
}
