package graft.operators

import org.apache.spark.sql.SparkSession

import graft.{QueryDef, QueryModule, Tables}

/** The `spark.sql` entry point (SURVEY.md §3.1): parser → analyzer →
  * optimizer, exercising subqueries (scalar / IN / NOT IN / correlated
  * EXISTS — rewritten to semi/anti joins by `RewritePredicateSubquery`,
  * reference `optimizer/subquery.scala:43`), CTEs, temp-view DDL, and
  * LATERAL VIEW explode (reference `GenerateExec.scala:52`).
  *
  * Oracle strings differ from the Spark text only where dialects diverge
  * (LATERAL VIEW vs unnest).
  */
object SqlSurface extends QueryModule {

  private def q(name: String, sparkSql: String, oracleSql: String): QueryDef =
    QueryDef(name, (s, d) => { Tables.registerAll(s, d); s.sql(sparkSql) },
      Some(oracleSql))

  private def same(name: String, sql: String): QueryDef = q(name, sql, sql)

  val qScalarSubquery: QueryDef = same(
    "q39_scalar_subquery",
    """SELECT o_orderstatus, COUNT(*) AS n FROM orders
       WHERE o_totalprice > (
         SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         FROM orders)
       GROUP BY o_orderstatus ORDER BY o_orderstatus""")

  val qInSubquery: QueryDef = same(
    "q40_in_subquery",
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
       WHERE o_custkey IN (
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
       GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  val qNotInSubquery: QueryDef = same(
    "q41_not_in_subquery",
    """SELECT COUNT(*) AS n_unsold_parts FROM part
       WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)""")

  val qExistsCorrelated: QueryDef = same(
    "q42_exists_correlated",
    """SELECT c_mktsegment, COUNT(*) AS n FROM customer
       WHERE EXISTS (
         SELECT 1 FROM orders
         WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
       GROUP BY c_mktsegment ORDER BY c_mktsegment""")

  val qCte: QueryDef = same(
    "q43_cte_top_suppliers",
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS total_revenue
         FROM lineitem GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       ORDER BY total_revenue DESC, s_suppkey LIMIT 5""")

  /** Temp-view DDL (reference `command/views.scala`): CREATE OR REPLACE
    * TEMPORARY VIEW then query it. */
  val qViewDdl: QueryDef = QueryDef(
    "q44_temp_view",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW high_value_orders AS
               SELECT * FROM orders WHERE o_totalprice > 400000.0""")
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
               FROM high_value_orders
               GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Generator / lateral view explode → word frequencies. At 100 TB the
    * explode multiplies rows ~80× but partial aggregation collapses them
    * map-side before the shuffle. */
  val qLateralExplode: QueryDef = q(
    "q45_lateral_explode",
    """SELECT word, COUNT(*) AS n
       FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word
       GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    """SELECT word, COUNT(*) AS n
       FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       GROUP BY word ORDER BY n DESC, word LIMIT 20""")

  /** posexplode with ordinality. */
  val qPosExplode: QueryDef = q(
    "q46_posexplode",
    """SELECT pos, COUNT(*) AS n, COUNT(DISTINCT word) AS nd
       FROM documents LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
       WHERE pos < 5 GROUP BY pos ORDER BY pos""",
    """SELECT pos, COUNT(*) AS n, COUNT(DISTINCT word) AS nd FROM (
         SELECT CAST(x.i - 1 AS INT) AS pos, d.w[x.i] AS word
         FROM (SELECT string_split(text, ' ') AS w FROM documents) d
         CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS i) x
         WHERE x.i <= len(d.w))
       GROUP BY pos ORDER BY pos""")

  /** VALUES inline relation (LocalTableScan, reference
    * `LocalTableScanExec.scala:29`). */
  val qValues: QueryDef = same(
    "q47_values_inline",
    """SELECT v, CAST(SUM(k) AS BIGINT) AS sk, COUNT(*) AS n
       FROM (VALUES (1, 'a'), (2, 'b'), (3, 'a'), (4, 'c'), (5, 'b')) AS t(k, v)
       GROUP BY v ORDER BY v""")

  /** spark.range / DuckDB range table function (reference
    * `basicPhysicalOperators.scala:331` RangeExec). */
  val qRange: QueryDef = q(
    "q48_range_agg",
    """SELECT CAST(SUM((id * id) % 1000007) AS BIGINT) AS checksum,
              COUNT(*) AS n
       FROM range(0, 1000000) WHERE id % 7 = 0""",
    """SELECT CAST(SUM((id * id) % 1000007) AS BIGINT) AS checksum,
              COUNT(*) AS n
       FROM range(0, 1000000) t(id) WHERE id % 7 = 0""")

  /** CTAS + INSERT INTO (reference `command/tables.scala`,
    * `InsertIntoHadoopFsRelationCommand`): create a managed parquet table
    * from a query, append more rows through the SQL write path, read the
    * union back. */
  val qCtasInsert: QueryDef = QueryDef(
    "q137_ctas_insert",
    (s, d) => {
      Tables.registerAll(s, d)
      val tbl = s"big_orders_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), tbl)
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
      s.sql(s"""CREATE TABLE $tbl USING parquet AS
                SELECT o_orderkey, o_orderpriority, o_totalprice
                FROM orders WHERE o_totalprice > 450000.0""")
      s.sql(s"""INSERT INTO $tbl
                SELECT o_orderkey, o_orderpriority, o_totalprice
                FROM orders WHERE o_totalprice < 50000.0""")
      s.sql(s"""SELECT o_orderpriority, COUNT(*) AS n
                FROM $tbl GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders WHERE o_totalprice > 450000.0 OR o_totalprice < 50000.0
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** DISTRIBUTE BY / SORT BY / CLUSTER BY / TABLESAMPLE — the Hive-SQL
    * physical-layout clauses (reference parser `SqlBase.g4`
    * queryOrganization; RepartitionByExpression in
    * `basicLogicalOperators.scala:776`). They steer partitioning, never
    * values, so wrapping them in an aggregate keeps the query
    * DuckDB-exact while the parse + RepartitionByExpression + local-sort
    * plan path is exercised for real. TABLESAMPLE (100 PERCENT) is the
    * deterministic member of the sampling grammar (RNG fractions stay in
    * q106's rows-only check). */
  val qDistributeSort: QueryDef = q(
    "q180_distribute_cluster_by",
    """WITH ds AS (SELECT l_orderkey, l_quantity
                   FROM lineitem TABLESAMPLE (100 PERCENT)
                   DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_quantity),
            cs AS (SELECT l_orderkey, l_quantity
                   FROM lineitem CLUSTER BY l_orderkey)
       SELECT (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) FROM ds)
                AS qty_distribute,
              (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) FROM cs)
                AS qty_cluster,
              (SELECT COUNT(*) FROM ds) AS n""",
    """SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_distribute,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_cluster,
              COUNT(*) AS n
       FROM lineitem""")

  override def defs: Seq[QueryDef] = Seq(
    qScalarSubquery, qInSubquery, qNotInSubquery, qExistsCorrelated,
    qCte, qViewDdl, qLateralExplode, qPosExplode, qValues, qRange,
    qCtasInsert, qDistributeSort)
}
