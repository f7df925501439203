package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Modern SQL-surface coverage the reference's users reach through the
  * same `spark.sql`/Dataset entry points (SURVEY.md §2.13 long tail):
  *
  *  - `unpivot`/melt — the inverse of q26's Pivot (reference
  *    `RelationalGroupedDataset.scala:314` is the pivot seam; unpivot is
  *    its Spark-3.4+ dual, logical `Unpivot` → `Expand`).
  *  - SQL scalar + table UDFs (`CREATE TEMPORARY FUNCTION ... RETURNS
  *    [TABLE]`) — the declarative, catalyst-inlined modernization of the
  *    reference's `UserDefinedGenerator` (reference
  *    `sql/catalyst/.../expressions/generators.scala:68`): the body is
  *    substituted into the plan, so filters/pruning push straight through
  *    (no black-box closure).
  *  - GROUP BY ALL / ORDER BY ALL resolution.
  *  - VARIANT (`parse_json`/`variant_get`) — the open-type modernization
  *    of the reference's JSON-path family (reference
  *    `jsonExpressions.scala:119`).
  *  - Date-spine gap-fill — `sequence()` + explode against min/max
  *    bounds, the idiomatic Spark form of a reporting calendar spine
  *    (Spark has no `WITH RECURSIVE` generator; the spine is O(months)
  *    rows from a 1-row aggregate, so the explode is driver-trivial and
  *    the left join broadcasts the spine side).
  *
  * All five are DuckDB-oracle-checked (UNPIVOT / inline expansion /
  * GROUP BY ALL / json_extract_string / generate_series equivalents).
  */
object ModernSql extends QueryModule {

  /** Wide per-segment aggregate melted to (segment, metric, value) rows.
    * Unpivot is a zero-shuffle Expand over the already-aggregated (tiny)
    * wide relation — at 100 TB the only shuffle is the upstream groupBy.
    * Exact-decimal sum keeps the double values bit-identical to DuckDB. */
  val qUnpivot: QueryDef = QueryDef(
    "q188_unpivot_metrics",
    (s, d) => {
      import s.implicits._
      val wide = Tables.df(s, d, "customer")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).cast("double").as("n_cust"),
          sum($"c_acctbal".cast("decimal(18,6)")).cast("double").as("sum_bal"),
          max($"c_acctbal").as("max_bal"))
      wide.unpivot(
          Array($"c_mktsegment"),
          Array($"n_cust", $"sum_bal", $"max_bal"),
          "metric", "value")
        .orderBy($"c_mktsegment", $"metric")
    },
    Some("""
      WITH wide AS (
        SELECT c_mktsegment,
          CAST(COUNT(*) AS DOUBLE) AS n_cust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal,
          MAX(c_acctbal) AS max_bal
        FROM customer GROUP BY c_mktsegment)
      SELECT c_mktsegment, metric, value FROM wide
      UNPIVOT (value FOR metric IN (n_cust, sum_bal, max_bal))
      ORDER BY c_mktsegment, metric"""))

  /** SQL scalar UDF + SQL table UDF, composed: the table function filters
    * orders (predicate inlined by the analyzer, so the parquet scan still
    * gets the pushed filter), the scalar function computes the discounted
    * price inside the aggregate. The oracle is the inline expansion — by
    * construction the semantics SQL UDFs promise. */
  val qSqlUdfs: QueryDef = QueryDef(
    "q189_sql_udfs",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
               RETURNS DOUBLE RETURN p * (1.0 - d)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION big_orders(cutoff DOUBLE)
               RETURNS TABLE(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
               RETURN SELECT o_orderkey, o_custkey, o_totalprice
                      FROM orders WHERE o_totalprice > cutoff""")
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
                 CAST(SUM(CAST(disc_price(o_totalprice, 0.05) AS DECIMAL(18,6)))
                   AS DOUBLE) AS disc_total
               FROM big_orders(400000.0) b
               JOIN customer ON c_custkey = b.o_custkey
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice * (1.0 - 0.05) AS DECIMAL(18,6)))
          AS DOUBLE) AS disc_total
      FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0) b
      JOIN customer ON c_custkey = b.o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  private def same(name: String, sql: String): QueryDef = QueryDef(
    name, (s, d) => { Tables.registerAll(s, d); s.sql(sql) }, Some(sql))

  /** GROUP BY ALL / ORDER BY ALL — analyzer-resolved grouping over every
    * non-aggregate output column; identical syntax in DuckDB. */
  val qGroupByAll: QueryDef = same(
    "q190_group_by_all",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
       FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
       GROUP BY ALL ORDER BY ALL""")

  /** VARIANT ingestion + typed path extraction over the events JSON props.
    * parse_json is a map-side codegen'd expression; the shuffle carries
    * only the grouped partial aggregates, never the variant binary. */
  val qVariant: QueryDef = QueryDef(
    "q191_variant_extract",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT event_type,
                 CAST(SUM(variant_get(parse_json(props), '$.k', 'bigint'))
                   AS BIGINT) AS sum_k,
                 CAST(SUM(CASE WHEN variant_get(parse_json(props), '$.missing',
                   'bigint') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
                 COUNT(*) AS n
               FROM events GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
          AS BIGINT) AS sum_k,
        CAST(COUNT(*) AS BIGINT) AS n_missing,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Date-spine gap-fill: a month calendar spanning min..max order dates,
    * left-joined to per-month aggregates of the RARE (>450k) orders so
    * empty months report 0 — the everyday reporting shape. The spine
    * derives from a 1-row global aggregate (two scans of the pushed
    * o_orderdate column only), explodes to O(months) rows, and broadcasts
    * into the join; the fact side shuffles once for its own groupBy. */
  val qMonthSpine: QueryDef = QueryDef(
    "q192_month_spine_gapfill",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        WITH bounds AS (
          SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                 CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
          FROM orders),
        spine AS (
          SELECT explode(sequence(lo, hi, interval 1 month)) AS mth FROM bounds),
        m AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
          FROM orders WHERE o_totalprice > 450000.0 GROUP BY 1)
        SELECT date_format(spine.mth, 'yyyy-MM') AS month,
               COALESCE(n_orders, 0L) AS n_orders,
               COALESCE(total, 0.0) AS total
        FROM spine LEFT JOIN m ON spine.mth = m.mth ORDER BY month""")
    },
    Some("""
      WITH bounds AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
        FROM orders),
      spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mth FROM bounds),
      m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders WHERE o_totalprice > 450000.0 GROUP BY 1)
      SELECT strftime(spine.mth, '%Y-%m') AS month,
             COALESCE(n_orders, 0) AS n_orders,
             COALESCE(total, 0.0) AS total
      FROM spine LEFT JOIN m ON spine.mth = m.mth ORDER BY month"""))

  /** Named-parameter SQL (`spark.sql(text, args)`) — the injection-safe
    * programmatic entry point (parameters bind as literals in the parsed
    * plan, so pushdown sees constants, not strings). Oracle = the same
    * query with the literals inlined. */
  val qParameterizedSql: QueryDef = QueryDef(
    "q195_parameterized_sql",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n
           FROM orders WHERE o_totalprice > :cutoff AND o_orderstatus = :status
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        Map("cutoff" -> 300000.0, "status" -> "F"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders WHERE o_totalprice > 300000.0 AND o_orderstatus = 'F'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Lateral column alias: later select-list items reference earlier
    * aliases in the same SELECT (analyzer rewrite, no subquery needed) —
    * identical feature in DuckDB, so the SQL is shared verbatim. */
  val qLateralAlias: QueryDef = same(
    "q196_lateral_column_alias",
    """SELECT l_returnflag,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS revenue,
         revenue / COUNT(*) AS avg_revenue,
         avg_revenue * 0.1 AS fee
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** `df.observe` — named accumulator metrics collected DURING a pass
    * over the data with zero extra jobs (AccumulatorV2 under a
    * CollectMetrics node; the monitoring surface streaming/batch
    * pipelines attach SLO counters to). The query materializes one
    * filtered pass (localCheckpoint), reads the observed metrics, and
    * returns them as the result — so the DuckDB oracle independently
    * recomputes what the accumulators must have seen. */
  val qObserve: QueryDef = QueryDef(
    "q197_observe_metrics",
    (s, d) => {
      import org.apache.spark.sql.Observation
      val obs = Observation("graft_obs")
      Tables.df(s, d, "orders")
        .filter(col("o_totalprice") > 100000.0)
        .observe(obs,
          count(lit(1)).as("n_big"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("sum_big"),
          max(col("o_orderpriority")).as("max_prio"))
        .localCheckpoint() // one real pass; metrics land in the observation
      val m = obs.get
      import s.implicits._
      Seq((m("n_big").asInstanceOf[Long],
        m("sum_big").asInstanceOf[Double],
        m("max_prio").asInstanceOf[String]))
        .toDF("n_big", "sum_big", "max_prio")
    },
    Some("""
      SELECT COUNT(*) AS n_big,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_big,
        MAX(o_orderpriority) AS max_prio
      FROM orders WHERE o_totalprice > 100000.0"""))

  /** WITH RECURSIVE (Spark 4's UnionLoop execution — each step joins the
    * previous iteration against the tiny monthly aggregate): a running
    * month-over-month balance carried as EXACT decimal through ~80
    * iterations, so the result hash-matches DuckDB's recursion bit for
    * bit. The recursion depth is calendar-bounded (months, not rows) —
    * safely under spark.sql.cteRecursionLevelLimit at any data scale.
    * q192 is the idiomatic spine form; this is the SQL-standard one. */
  val qRecursiveCte: QueryDef = QueryDef(
    "q199_recursive_cte",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        WITH RECURSIVE monthly AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                   AS DECIMAL(20,6)) AS total
          FROM orders GROUP BY 1),
        cum AS (
          SELECT mth, total AS running FROM monthly
          WHERE mth = (SELECT MIN(mth) FROM monthly)
          UNION ALL
          SELECT m.mth, CAST(c.running + m.total AS DECIMAL(20,6))
          FROM cum c JOIN monthly m ON m.mth = add_months(c.mth, 1))
        SELECT date_format(mth, 'yyyy-MM') AS month,
               CAST(running AS DOUBLE) AS running
        FROM cum ORDER BY month""")
    },
    Some("""
      WITH RECURSIVE monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 AS DECIMAL(20,6)) AS total
        FROM orders GROUP BY 1),
      cum AS (
        SELECT mth, total AS running FROM monthly
        WHERE mth = (SELECT MIN(mth) FROM monthly)
        UNION ALL
        SELECT m.mth, CAST(c.running + m.total AS DECIMAL(20,6))
        FROM cum c JOIN monthly m
          ON m.mth = CAST(c.mth + INTERVAL 1 MONTH AS DATE))
      SELECT strftime(mth, '%Y-%m') AS month, CAST(running AS DOUBLE) AS running
      FROM cum ORDER BY month"""))

  override def defs: Seq[QueryDef] = Seq(
    qUnpivot, qSqlUdfs, qGroupByAll, qVariant, qMonthSpine,
    qParameterizedSql, qLateralAlias, qObserve, qRecursiveCte)
}
