package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact.dsumSql

/** Spark-4-only SQL surface (SURVEY §2.14 continuation): the entry points
  * a user migrating off the reference meets first in a current Spark,
  * each proven equivalent to its classic formulation by a DuckDB oracle.
  *
  *  - SQL pipe syntax (`|>`) — the linear query form; the parser rewrites
  *    each operator onto the same logical nodes as nested SQL
  *    (EliminatePipeOperators), so the optimized plan — pushed filters,
  *    broadcast dim join, partial aggs — is IDENTICAL to q120's. Zero
  *    runtime cost, proven by the plain-SQL oracle.
  *  - String collations (`COLLATE UTF8_LCASE`) — collation-aware
  *    comparison/grouping/hashing in the engine (the modernization of
  *    lower()-wrapping every predicate; the reference normalizes case in
  *    userspace, e.g. its text pipeline lowercases before hashing).
  *    Group-by on a collated key hashes the collation key map-side, so
  *    the shuffle volume equals the lower() formulation exactly.
  *  - SQL scripting (compound `BEGIN … END`, DECLARE, WHILE, SET) — the
  *    procedural driver loop expressed engine-side; each contained
  *    statement is still a full Catalyst plan (scans pushed, aggregates
  *    partial), the script only sequences them.
  *  - Session variables + EXECUTE IMMEDIATE + IDENTIFIER() — dynamic SQL
  *    with injection-safe binding: values bind as literals (pushdown sees
  *    constants), table names bind through IDENTIFIER (no string
  *    concatenation), complementing q195's named-parameter args map.
  *  - approx_top_k — the frequent-items sketch as a first-class agg
  *    (partial sketches merge map-side like any TypedImperativeAggregate;
  *    the shuffle carries O(maxItemsTracked) per partition, never rows).
  *    With k ≥ the key's distinct count the sketch holds every item, so
  *    counts are EXACT and the DuckDB group-by oracle hash-matches —
  *    same trick as q157's exact-regime BloomFilter row.
  *  - Column DEFAULTs (CREATE TABLE … DEFAULT, INSERT partial columns,
  *    ALTER COLUMN SET DEFAULT) — catalog-resolved at INSERT time, so
  *    stored files carry materialized values (no read-side patching; a
  *    default change never rewrites data, it only affects later inserts).
  *
  * All six are DuckDB-oracle-checked; money/score sums go through the
  * exact-decimal route so results are bit-identical across engines.
  */
object Spark4Sql extends QueryModule {

  private def run(s: SparkSession, d: String, sql: String): DataFrame = {
    Tables.registerAll(s, d); s.sql(sql)
  }

  /** The q120-family star (orders⋈customer, date-windowed, per-segment
    * money rollup) written in pipe syntax. The pipe chain is sugar: the
    * optimizer sees the usual broadcast-dim + single-fact-shuffle plan. */
  val qPipeSyntax: QueryDef = QueryDef(
    "q206_pipe_syntax",
    (s, d) => run(s, d, s"""
      FROM orders
      |> WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |> JOIN customer ON o_custkey = c_custkey
      |> AGGREGATE COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
         GROUP BY c_mktsegment
      |> SELECT c_mktsegment, n, total, total / n AS avg_price
      |> WHERE n > 10
      |> ORDER BY c_mktsegment"""),
    Some("""
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
          AS avg_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      GROUP BY c_mktsegment HAVING COUNT(*) > 10
      ORDER BY c_mktsegment"""))

  /** Case-insensitive filter + group-by via UTF8_LCASE collation over a
    * deterministically mixed-case column; the oracle is the lower()
    * formulation the collation replaces. min(lower(seg)) is constant per
    * collated group, so the projection is deterministic. */
  val qCollatedGroup: QueryDef = QueryDef(
    "q207_collated_group",
    (s, d) => run(s, d, """
      WITH mixed AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer)
      SELECT min(lower(seg)) AS segment, COUNT(*) AS n
      FROM mixed
      WHERE seg COLLATE UTF8_LCASE <> 'machinery'
      GROUP BY seg COLLATE UTF8_LCASE
      ORDER BY segment"""),
    Some("""
      WITH mixed AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer)
      SELECT lower(seg) AS segment, CAST(COUNT(*) AS BIGINT) AS n
      FROM mixed
      WHERE lower(seg) <> 'machinery'
      GROUP BY lower(seg)
      ORDER BY segment"""))

  /** SQL scripting: a WHILE loop over the four quarters of 1995
    * accumulating an EXACT decimal total in a script variable — the
    * "driver program" of the reference's imperative clients expressed as
    * a compound statement. Each iteration's subquery is a normal pushed
    * scan + partial agg; COALESCE guards an empty quarter. The oracle is
    * the closed form (one filtered sum over the year). */
  val qSqlScripting: QueryDef = QueryDef(
    "q208_sql_scripting",
    (s, d) => {
      Tables.registerAll(s, d)
      // Additive parser capability; intentionally left enabled (same
      // session policy as the pipe syntax, which needs no flag).
      s.conf.set("spark.sql.scripting.enabled", "true")
      s.sql("""
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE total DECIMAL(20,6) DEFAULT 0;
          WHILE i <= 4 DO
            SET total = total + (
              SELECT COALESCE(
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  AS DECIMAL(20,6)), 0)
              FROM orders
              WHERE quarter(o_orderdate) = i AND year(o_orderdate) = 1995);
            SET i = i + 1;
          END WHILE;
          SELECT CAST(i - 1 AS INT) AS quarters,
                 CAST(total AS DOUBLE) AS total_1995;
        END""")
    },
    Some("""
      SELECT 4 AS quarters,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_1995
      FROM orders WHERE year(o_orderdate) = 1995"""))

  /** Dynamic SQL, fully bound: the table name arrives through
    * IDENTIFIER(:t) and the cutoff through :c, both supplied by session
    * variables via EXECUTE IMMEDIATE … USING. Pushdown sees a constant
    * predicate on a resolved relation — no string splicing anywhere. */
  val qExecuteImmediate: QueryDef = QueryDef(
    "q209_execute_immediate",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("DECLARE OR REPLACE VARIABLE graft_tbl STRING DEFAULT 'orders'")
      s.sql("DECLARE OR REPLACE VARIABLE graft_cutoff DOUBLE DEFAULT 300000.0")
      s.sql("""EXECUTE IMMEDIATE
        'SELECT o_orderpriority, COUNT(*) AS n
         FROM IDENTIFIER(:t) WHERE o_totalprice > :c
         GROUP BY o_orderpriority ORDER BY o_orderpriority'
        USING graft_tbl AS t, graft_cutoff AS c""")
    },
    Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice > 300000.0
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** approx_top_k in its exact regime: k=5 ≥ the 5 distinct priorities
    * and maxItemsTracked (default 10000) never evicts, so the merged
    * sketch holds exact counts at every scale — letting the group-by
    * oracle hash-match a "sketch" aggregate. The deterministic tiebreak
    * (n DESC, priority) fixes the row order on both sides. */
  val qApproxTopK: QueryDef = QueryDef(
    "q210_approx_top_k",
    (s, d) => run(s, d, """
      SELECT t.item AS priority, t.count AS n
      FROM (SELECT explode(approx_top_k(o_orderpriority, 5)) AS t
            FROM orders)
      ORDER BY n DESC, priority"""),
    Some("""
      SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority
      ORDER BY n DESC, priority"""))

  /** Column DEFAULTs over a persistent table: partial-column INSERTs fill
    * catalog defaults, ALTER COLUMN SET DEFAULT changes ONLY later
    * inserts (earlier files keep their materialized values — the
    * no-rewrite semantics that matter at 100 TB). Same db-per-sfdir
    * namespacing + warehouse cleanup as q163; the table outlives the
    * query so Verify's deferred write can still read it. */
  val qDefaultColumns: QueryDef = QueryDef(
    "q211_default_columns",
    (s, d) => {
      Tables.registerAll(s, d)
      val db = "graft_dflt_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      val dbPath = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"$db.db")
      dbPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(dbPath, true)
      s.sql(s"CREATE DATABASE $db")
      s.sql(s"""CREATE TABLE $db.flagged(
                  id BIGINT,
                  status STRING DEFAULT 'NEW',
                  score DOUBLE DEFAULT 1.5) USING parquet""")
      s.sql(s"""INSERT INTO $db.flagged (id)
                SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0""")
      s.sql(s"INSERT INTO $db.flagged VALUES (-1, DEFAULT, 9.9)")
      s.sql(s"ALTER TABLE $db.flagged ALTER COLUMN status SET DEFAULT 'RUSH'")
      s.sql(s"""INSERT INTO $db.flagged (id, score)
                SELECT o_orderkey, 2.5 FROM orders
                WHERE o_totalprice > 480000.0""")
      s.sql(s"""SELECT status, COUNT(*) AS n,
                  CAST(SUM(CAST(score AS DECIMAL(5,2))) AS DOUBLE) AS score_sum
                FROM $db.flagged GROUP BY status ORDER BY status""")
    },
    Some("""
      WITH t AS (
        SELECT 'NEW' AS status, 1.5 AS score
        FROM orders WHERE o_totalprice > 450000.0
        UNION ALL SELECT 'NEW', 9.9
        UNION ALL SELECT 'RUSH', 2.5
        FROM orders WHERE o_totalprice > 480000.0)
      SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(score AS DECIMAL(5,2))) AS DOUBLE) AS score_sum
      FROM t GROUP BY status ORDER BY status"""))

  override def defs: Seq[QueryDef] = Seq(
    qPipeSyntax, qCollatedGroup, qSqlScripting, qExecuteImmediate,
    qApproxTopK, qDefaultColumns)
}
