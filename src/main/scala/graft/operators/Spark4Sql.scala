package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact.dsumSql

/** Spark-4-era SQL surface (SURVEY §2.14 continuation): the entry points
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
  * Plus the error-handling / ordered-aggregation long tail the same
  * migration hits (q213–q215):
  *
  *  - `try_divide`/`try_cast`/`try_add`/`try_element_at` — NULL-on-error
  *    evaluation (the engine-level form of defensive parsing; the
  *    reference's CSV/JSON readers do this per-field in the parser).
  *    DuckDB's TRY_CAST / CASE-guards reproduce each semantics exactly.
  *  - `listagg(...) WITHIN GROUP (ORDER BY ...)` — ordered string
  *    aggregation (SQL:2016); the explicit ORDER BY makes the
  *    concatenation deterministic, so it oracle-matches DuckDB's
  *    string_agg ORDER BY form bit for bit.
  *  - `IGNORE NULLS` window fill (`last_value ... IGNORE NULLS` over a
  *    running frame) — forward-fill, the time-series/feature-pipeline
  *    staple. One window shuffle by partition key; the fill itself is a
  *    per-partition linear pass.
  *  - Named `WINDOW` clause (q216) and the approx_top_k accumulate/
  *    combine/estimate sketch algebra (q217).
  *
  * All are DuckDB-oracle-checked; money/score sums go through the
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

  /** The try_* family, each arm counting its non-error results: /0,
    * unparseable string, overflowing add, out-of-bounds element. Counts
    * are integers ⇒ deterministic; the oracle re-derives each arm with
    * TRY_CAST or an explicit CASE guard. */
  val qTryFunctions: QueryDef = QueryDef(
    "q213_try_functions",
    (s, d) => run(s, d, """
      SELECT l_returnflag,
        COUNT(try_divide(l_extendedprice, l_linenumber - 4)) AS n_div_ok,
        COUNT(try_cast(l_linestatus AS INT)) AS n_status_num,
        COUNT(try_cast(CASE WHEN l_linenumber <= 3 THEN CAST(l_linenumber AS STRING)
                       ELSE concat('x', l_linenumber) END AS INT)) AS n_cast_ok,
        COUNT(try_add(l_linenumber, 9223372036854775806L)) AS n_add_ok,
        COUNT(try_element_at(array(1, 2, 3), l_linenumber)) AS n_elem_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    Some("""
      SELECT l_returnflag,
        CAST(COUNT(CASE WHEN l_linenumber <> 4 THEN 1 END) AS BIGINT) AS n_div_ok,
        CAST(COUNT(TRY_CAST(l_linestatus AS INT)) AS BIGINT) AS n_status_num,
        CAST(COUNT(TRY_CAST(CASE WHEN l_linenumber <= 3 THEN CAST(l_linenumber AS VARCHAR)
                   ELSE concat('x', CAST(l_linenumber AS VARCHAR)) END AS INT))
          AS BIGINT) AS n_cast_ok,
        CAST(COUNT(CASE WHEN l_linenumber = 1 THEN 1 END) AS BIGINT) AS n_add_ok,
        CAST(COUNT(list_extract([1,2,3], l_linenumber)) AS BIGINT) AS n_elem_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Ordered string aggregation: the per-region nation roster. The
    * WITHIN GROUP ordering pins element order, so the concatenated
    * string is deterministic at any parallelism (partial aggregates
    * carry the values, the final sort happens once per group). */
  val qListAgg: QueryDef = QueryDef(
    "q214_listagg",
    (s, d) => run(s, d, """
      SELECT r_name,
        listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        COUNT(*) AS n
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""),
    Some("""
      SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** IGNORE NULLS forward-fill: every third order carries a price
    * observation; last_value IGNORE NULLS over a running frame fills the
    * gaps per customer. The summary row (counts + exact-decimal sum of
    * the filled series) pins every filled cell without emitting 1.5 M
    * rows at sf0.1. Spark spells it `last_value(x) IGNORE NULLS`,
    * DuckDB `last_value(x IGNORE NULLS)` — same SQL:2011 semantics. */
  val qIgnoreNullsFill: QueryDef = QueryDef(
    "q215_ignore_nulls_ffill",
    (s, d) => run(s, d, """
      WITH src AS (
        SELECT o_custkey, o_orderkey,
          CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS px
        FROM orders),
      filled AS (
        SELECT px,
          last_value(px) IGNORE NULLS OVER (
            PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px_filled
        FROM src)
      SELECT COUNT(*) AS n_rows, COUNT(px) AS n_obs, COUNT(px_filled) AS n_filled,
        CAST(SUM(CAST(px_filled AS DECIMAL(18,6))) AS DOUBLE) AS total_filled
      FROM filled"""),
    Some("""
      WITH src AS (
        SELECT o_custkey, o_orderkey,
          CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS px
        FROM orders),
      filled AS (
        SELECT px,
          last_value(px IGNORE NULLS) OVER (
            PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px_filled
        FROM src)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(px) AS BIGINT) AS n_obs,
        CAST(COUNT(px_filled) AS BIGINT) AS n_filled,
        CAST(SUM(CAST(px_filled AS DECIMAL(18,6))) AS DOUBLE) AS total_filled
      FROM filled"""))

  private val windowClauseSql = """
      SELECT * FROM (
        SELECT o_orderpriority, o_orderkey,
          CAST(rank() OVER w AS INT) AS rk,
          lead(o_orderkey) OVER w AS nxt_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rk <= 3 ORDER BY o_orderpriority, rk"""

  /** Named WINDOW clause (SQL:2003): one frame definition shared by
    * several window functions — and, crucially, ONE Window exec / one
    * sort for all of them (same dedup Catalyst applies to repeated
    * inline frames, but spelled once). o_orderkey tiebreaks the ordering
    * so rank and lead are deterministic. Spark and DuckDB run the
    * IDENTICAL text. */
  val qWindowClause: QueryDef = QueryDef(
    "q216_window_clause",
    (s, d) => run(s, d, windowClauseSql),
    Some(windowClauseSql))

  /** Sketch ALGEBRA: approx_top_k_accumulate builds per-shard sketches,
    * approx_top_k_combine merges them, approx_top_k_estimate reads the
    * merged result — the persistable-partial-aggregate pattern for
    * incremental corpus stats (store shard sketches, merge on demand,
    * never rescan). Same exact-regime argument as q210, so the merged
    * estimate hash-matches the true group-by. */
  val qTopKSketchAlgebra: QueryDef = QueryDef(
    "q217_topk_sketch_algebra",
    (s, d) => run(s, d, """
      WITH parts AS (
        SELECT o_orderkey % 4 AS shard,
               approx_top_k_accumulate(o_orderpriority, 10) AS sk
        FROM orders GROUP BY o_orderkey % 4),
      merged AS (SELECT approx_top_k_combine(sk) AS sk FROM parts)
      SELECT t.item AS priority, t.count AS n
      FROM (SELECT explode(approx_top_k_estimate(sk, 5)) AS t FROM merged)
      ORDER BY n DESC, priority"""),
    Some("""
      SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority
      ORDER BY n DESC, priority"""))

  override def defs: Seq[QueryDef] = Seq(
    qPipeSyntax, qCollatedGroup, qSqlScripting, qExecuteImmediate,
    qApproxTopK, qDefaultColumns, qTryFunctions, qListAgg, qIgnoreNullsFill,
    qWindowClause, qTopKSketchAlgebra)
}
